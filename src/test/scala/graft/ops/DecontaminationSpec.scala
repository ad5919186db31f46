package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val benchDoc = "alpha beta gamma delta epsilon zeta eta theta"

  test("planted 8-gram leak is flagged with the exact shared count") {
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val train = Seq(
      // contains the full benchmark 8-gram verbatim (classic leak)
      (1L, s"intro words then $benchDoc and a tail"),
      // shares only 7-grams (shifted window) — NOT contamination at n=8
      (2L, "beta gamma delta epsilon zeta eta theta iota"),
      // disjoint
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")

    val report = Decontamination
      .overlapReport(train, "doc_id", "text", bench, "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report == Map(1L -> 1L))

    val clean = Decontamination
      .decontaminate(train, "doc_id", "text", bench, "text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(2L, 3L))
  }

  test("docs shorter than n tokens cannot contaminate (no fallback shingle)") {
    val bench = Seq((100L, "tiny doc")).toDF("doc_id", "text")
    val train = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    // identical text, but only 2 tokens: no 8-gram exists on either side
    assert(Decontamination
      .overlapReport(train, "doc_id", "text", bench, "text", n = 8).isEmpty)
  }

  test("multiple shared grams count distinctly, repeats don't double-count") {
    val bench = Seq((100L, s"$benchDoc $benchDoc")).toDF("doc_id", "text")
    // two distinct 8-gram windows from the doubled benchmark text
    val train = Seq((1L, benchDoc + " " + benchDoc)).toDF("doc_id", "text")
    val n = Decontamination
      .overlapReport(train, "doc_id", "text", bench, "text", n = 8)
      .head.getLong(1)
    // 16 tokens -> 9 windows, but window 0 == window 8 (the repeat), so
    // 8 DISTINCT grams; train text identical -> all 8 shared
    assert(n == 8L)
  }

  test("bloomOverlapReport equals the broadcast-join path on fixture data") {
    val docs = spark.read
      .parquet(s"${graft.SparkTestSession.sf0001}/documents.parquet")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val exact = Decontamination
      .overlapReport(train, "doc_id", "text", bench, "text", n = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Decontamination
      .bloomOverlapReport(train, "doc_id", "text", bench, "text", n = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives (bloom property) and no false positives (the
    // verify join kills them): byte-identical reports
    assert(bloomed == exact)
    assert(exact.nonEmpty) // the comparison must actually exercise hits
  }

  test("bloomOverlapReport: minShared gates the report") {
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"$benchDoc extra tail tokens here"), // several shared 8-grams? no — one window
      (2L, "unrelated one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val strict = Decontamination.bloomOverlapReport(
      train, "doc_id", "text", bench, "text", n = 8, minShared = 2)
    assert(strict.isEmpty) // doc 1 shares exactly one distinct 8-gram
    val loose = Decontamination.bloomOverlapReport(
      train, "doc_id", "text", bench, "text", n = 8, minShared = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose == Map(1L -> 1L))
  }

  test("hashSplit: deterministic, complete, near-weight proportions") {
    val docs = spark.read
      .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every row lands in exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.7 &&
      counts("train").toDouble / total < 0.9)
    // pure function of the id: re-run identical
    val again = Sampling.hashSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select("doc_id", "split").collect().map(r => r.get(0) -> r.get(1)).toMap
    split.select("doc_id", "split").collect()
      .foreach(r => assert(again(r.get(0)) == r.get(1)))
    // weights must sum to 1
    intercept[IllegalArgumentException](
      Sampling.hashSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.2))))
  }

  test("contaminationSpans: planted benchmark passage maps to one exact span") {
    import spark.implicits._
    // doc 1 embeds the 5-token benchmark passage at positions 3-7: with
    // n=3 the matching gram STARTS are {3,4,5}, which merge to one span
    // covering 5 tokens. doc 2 is clean.
    val train = Seq(
      (1L, "a b c x1 x2 x3 x4 x5 d e"),
      (2L, "an entirely clean document with no leaked benchmark content inside")
    ).toDF("doc_id", "text")
    val bench = Seq("x1 x2 x3 x4 x5").toDF("text")
    val out = Decontamination.contaminationSpans(train, "doc_id", "text",
      bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((1L, 5L))),
      s"one span of exactly the 5 leaked tokens, got $out")
  }
}
