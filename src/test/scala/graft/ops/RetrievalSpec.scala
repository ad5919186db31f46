package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),          // tf=3 for 'spark', dl=4
    (2L, "spark engine"),                      // tf=1, dl=2
    (3L, "a much longer document about nothing with many many filler words spark"),
    (4L, "completely unrelated text here")     // no query terms
  ).toDF("doc_id", "text")

  test("bm25: hand-computed score on a tiny corpus") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N=4, df(spark)=3, idf = ln(1 + (4-3+0.5)/(3+0.5)) = ln(1+1.5/3.5)
    val idf = math.log(1 + 1.5 / 3.5)
    val avgdl = (4 + 2 + 12 + 4) / 4.0
    def s(tf: Int, dl: Int) =
      BigDecimal(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 has no hits
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == s(3, 4))
    assert(byId(2L) == s(1, 2))
    assert(byId(3L) == s(1, 12))
    assert(out.forall(_._3 == 1L)) // one distinct term hit each
  }

  test("bm25: rarer terms out-score common ones at equal tf") {
    val d = Seq(
      (1L, "common rare"), (2L, "common filler"), (3L, "common stuff"),
      (4L, "common words")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", Seq("common", "rare"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 hits both terms; 'rare' df=1 dominates its score
    assert(out(1L) > out(2L) * 2)
  }

  test("bm25: k truncates and ties break by doc_id") {
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", Seq("x"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("unigramNll: uniform corpus scores equal nll; rare tokens raise it") {
    val d = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a z")).toDF("doc_id", "text")
    val out = Retrieval.unigramNll(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    assert(out.map(_._2) == List(2L, 2L, 2L))
    // docs 1,2 identical -> identical nll; doc 3 carries the rare 'z'
    assert(out(0)._3 == out(1)._3)
    assert(out(2)._3 > out(0)._3)
    // hand value: p(a)=(3+1)/(6+3), p(b)=(2+1)/9 -> nll = -(ln(4/9)+ln(3/9))/2
    val expect = BigDecimal(-(math.log(4.0 / 9) + math.log(3.0 / 9)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 == expect)
  }

  test("unigramNll: empty/whitespace docs yield no row (no 0-token NaN)") {
    val d = Seq((1L, "some words"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val ids = Retrieval.unigramNll(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }
}
