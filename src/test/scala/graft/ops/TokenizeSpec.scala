package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wordVocab counts corpus frequency per distinct token") {
    val d = Seq((1L, "ab ab cd"), (2L, "ab CD")).toDF("doc_id", "text")
    val v = Tokenize.wordVocab(d, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("ab" -> 3L, "cd" -> 2L)) // lowercased merge
  }

  test("topBpePairs weights pairs by word frequency with multiplicity") {
    // 'aaa' x2 -> pair 'aa' twice per occurrence = 4; 'ab' x3 -> 'ab' = 3
    val d = Seq((1L, "aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("aa" -> 4L, "ab" -> 3L))
  }

  test("single-char tokens contribute no pair; ties break by pair asc") {
    val d = Seq((1L, "x y zw wz")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("wz" -> 1L, "zw" -> 1L))
  }

  test("the top pair is the first BPE merge on a realistic skew") {
    // 'the' dominates -> 'th' (and 'he') lead the count
    val d = Seq((1L, "the the the then he")).toDF("doc_id", "text")
    val top = Tokenize.topBpePairs(d, "text", k = 1).head
    assert(top.getString(0) == "he" && top.getLong(1) == 5L)
  }
}
