package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match DuckDB's jaro_winkler_similarity (probed)") {
    // every expected value below was read off DuckDB 1.x before the
    // kernel was written — the oracle's own implementation
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("abcd", "abdc") - 0.9333333333333333) < 1e-12)
    assert(math.abs(jw("ABCVWXYZ", "CABVWXYZ") - 0.9583333333333334) < 1e-12)
    assert(math.abs(jw("hello world", "hello wrold") - 0.9818181818181818) < 1e-12)
    assert(math.abs(jw("xabcde", "yabcde") - 0.888888888888889) < 1e-12)
    assert(math.abs(jw("prefixaaaa", "prefixzzzz") - 0.8400000000000001) < 1e-12)
  }

  test("boost threshold: prefix boost does NOT apply at jaro <= 0.7") {
    // jaro = 0.4667 with common prefix 2 — DuckDB reports it unboosted
    assert(math.abs(jw("abcdefghij", "abzzzzzzzz") - 0.4666666666666666) < 1e-12)
    assert(math.abs(jw("aaxxxxx", "aayyyyy") - 0.5238095238095238) < 1e-12)
  }

  test("degenerate shapes: window 0, empties, disjoint, identical") {
    assert(jw("ab", "ba") == 0.0) // window floor(2/2)-1 = 0: no matches
    // single-char pairs: the raw window formula goes to -1; the clamp at
    // 0 keeps position-0 self-matches alive (DuckDB probed: 1.0 / 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB convention (not the jw=1 one)
    assert(jw("abcdef", "uvwxyz") == 0.0)
    assert(jw("same string", "same string") == 1.0)
  }

  test("column face evaluates in a plan (codegen path)") {
    val out = Seq(("MARTHA", "MARHTA"), ("", ""))
      .toDF("a", "b")
      .select(jaro_winkler(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 0.9611111111111111) < 1e-12)
    assert(out(1) == 0.0)
  }
}
