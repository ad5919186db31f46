package graft.functions

import graft.SparkTestSession
import graft.functions.{char_entropy, deflate_roundtrip_ok, deflate_size}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

class QualityExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("char_entropy matches hand-computed distributions") {
    val cases = Seq(
      "aabb" -> 1.0, // two symbols, uniform
      "abcd" -> 2.0, // four symbols, uniform
      "aaaa" -> 0.0, // one symbol
      "a" -> 0.0,
      "" -> 0.0,
      // p = (2/4, 1/4, 1/4): 0.5*1 + 2 * 0.25*2 = 1.5
      "aabc" -> 1.5,
      // multibyte code points count as single symbols
      "中中aa" -> 1.0)
    val got = cases.map(_._1).toDF("s")
      .select(char_entropy(col("s"))).as[Double].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"entropy mismatch: $g vs $w")
    }
  }

  test("char_entropy is null-safe and works through the SQL registration") {
    graft.functions.registerAll(spark)
    Seq(("x", Some("aabb")), ("y", None)).toDF("k", "s")
      .createOrReplaceTempView("qe_t")
    val rows = spark.sql(
      "SELECT k, char_entropy(s) AS e FROM qe_t ORDER BY k").collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(1).isNullAt(1))
  }

  test("deflate_size equals an independent Deflater run, and inflates back") {
    val texts = Seq("", "hello world", "ab" * 500,
      (0 until 400).map(i => ((i * 7919) % 94 + 33).toChar).mkString)
    for (t <- texts; level <- Seq(1, 6, 9)) {
      // independent single-shot deflate + inflate round trip
      val d = new java.util.zip.Deflater(level, true)
      d.setInput(t.getBytes(UTF_8)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val bytes = out.toByteArray
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes)
      val back = new java.io.ByteArrayOutputStream()
      while (!inf.finished()) back.write(buf, 0, inf.inflate(buf))
      inf.end()
      assert(new String(back.toByteArray, UTF_8) == t) // deflate is honest
      val got = DeflateKernel.deflateLen(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), level)
      assert(got == bytes.length, s"level $level len mismatch for '$t'")
    }
  }

  test("deflate kernel state does not leak across rows (thread-local reset)") {
    // alternating inputs through the SAME kernel must match fresh runs
    val a = "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val b = "the quick brown fox jumps over the lazy dog"
    def fresh(s: String): Int = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes(UTF_8)); d.finish()
      val buf = new Array[Byte](256)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    (0 until 5).foreach { _ =>
      assert(DeflateKernel.deflateLen(u(a), 6) == fresh(a))
      assert(DeflateKernel.deflateLen(u(b), 6) == fresh(b))
    }
  }

  test("compression ratio separates template spam from prose in a plan") {
    val df = Seq(
      ("spam", "buy now! " * 200),
      ("prose", "the library preserves operational data as typed parquet " +
        "snapshots while a streaming replicator follows the change feed " +
        "and a control plane pauses or resumes each pipeline on signal"))
      .toDF("kind", "text")
      .select(col("kind"),
        (deflate_size(col("text")).cast("double") /
          octet_length(col("text"))).as("ratio"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("spam") < 0.05, s"template spam should crush: ${m("spam")}")
    assert(m("prose") > 0.4, s"prose should resist: ${m("prose")}")
  }

  test("deflate_roundtrip_ok is uniformly true, including multibyte/edge inputs") {
    val texts = Seq("", "hello world", "ab" * 5000, "中文混合 ascii ✓ ÿ",
      (0 until 4096).map(i => ((i * 7919) % 0x2FF) + 1).map(_.toChar).mkString)
    val got = texts.toDF("s")
      .select(deflate_roundtrip_ok(col("s")).as("ok"),
        deflate_roundtrip_ok(col("s"), 1).as("ok1"),
        deflate_roundtrip_ok(col("s"), 9).as("ok9"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    }
    // null-safe + SQL registration
    graft.functions.registerAll(spark)
    val r = Seq(Option("x"), None).toDF("s")
      .createOrReplaceTempView("qe_rt")
    val rows = spark.sql(
      "SELECT deflate_roundtrip_ok(s) FROM qe_rt ORDER BY s NULLS LAST").collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
  }

  test("InflateKernel rejects truncated streams instead of spinning") {
    val full = DeflateKernel.deflateBytes(
      org.apache.spark.unsafe.types.UTF8String.fromString("some honest text " * 50), 6)
    intercept[java.util.zip.DataFormatException] {
      InflateKernel.inflate(full.take(full.length / 2))
    }
  }
}
