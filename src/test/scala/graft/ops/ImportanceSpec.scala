package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 1 (target): tokens a b a; doc 2 (raw only): tokens a c
  // vocab: a (raw 3, tgt 2), b (raw 1, tgt 1), c (raw 1, tgt 0)
  // totals: raw 5, tgt 3, V 3; lr(w) = ln((tgt+1)/6) - ln((raw+1)/8)
  private def docs = Seq(
    (1L, "a b a", true),
    (2L, "a c", false)
  ).toDF("doc_id", "text", "tgt")

  test("dsirScores matches the hand-computed log-likelihood ratios") {
    val out = Importance.dsirScores(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val lrA = 0.0 // ln(3/6) - ln(4/8)
    val lrB = math.log(2.0 / 6) - math.log(2.0 / 8)
    val lrC = math.log(1.0 / 6) - math.log(2.0 / 8)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(1L) == ((r6(2 * lrA + lrB), 3L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((r6(lrA + lrC), 2L)), s"doc2: ${out(2L)}")
  }

  test("target docs outscore raw docs on the real documents table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Importance.dsirScores(real, "doc_id", "text", col("lang") === "en")
      .join(real.select(col("doc_id"), (col("lang") === "en").as("tgt")), "doc_id")
    val means = scored.groupBy(col("tgt")).agg(avg(col("dsir_score")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target docs must score above raw docs on average: $means")
  }

  test("hashed variant reproduces unigram scores when buckets >> vocab") {
    val a = Importance.dsirScores(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Importance.dsirScoresHashed(docs, "doc_id", "text", col("tgt"),
      ngram = 1, buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, s"hashed (collision-free) must equal unigram: $a vs $b")
  }

  test("hashed bigram variant is finite and favors the target doc") {
    val many = Seq(
      (1L, "spark shuffle partition spark shuffle partition", true),
      (2L, "spark shuffle partition exchange reuse", true),
      (3L, "gardening tips for tomato plants in summer", false),
      (4L, "tomato plants need water and summer sun", false)
    ).toDF("doc_id", "text", "tgt")
    val out = Importance.dsirScoresHashed(many, "doc_id", "text", col("tgt"),
      ngram = 2, buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(v => !v.isNaN && !v.isInfinite), s"non-finite: $out")
    assert(out(1L) > out(3L), s"target bigrams must outscore raw: $out")
  }
}
