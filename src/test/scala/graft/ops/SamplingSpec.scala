package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val docs = spark.read
    .parquet(s"${SparkTestSession.sf0001}/documents.parquet")

  test("stratified sample caps every stratum at k, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 10)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 10))
    assert(counts("en") == 10, "dominant stratum must be capped exactly")
    // re-run = identical sample (pure function of the data)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("deterministic fraction sample is stable and roughly proportional") {
    val n = docs.count()
    val s = Sampling.deterministicSample(docs, "doc_id", 0.3)
    val c1 = s.count()
    assert(math.abs(c1.toDouble / n - 0.3) < 0.1, s"got ${c1.toDouble / n}")
    assert(s.count() == c1) // stable across runs
    // subset property: a smaller fraction is a subset of a larger one
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "hash sampling must nest by fraction")
  }
}
