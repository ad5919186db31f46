package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property sharded pipelines rely on: merging per-shard HLL sketches
  * estimates the SAME value as sketching the whole corpus directly —
  * partial sketches can be persisted per shard and unioned later without
  * accuracy loss vs a single pass.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("union of per-group sketches == direct whole-corpus sketch") {
    val li = spark.read.parquet(s"${SparkTestSession.sf0001}/lineitem.parquet")
    val direct = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .head.getLong(0)
    val merged = li.groupBy(col("l_suppkey"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    assert(merged == direct,
      s"merged-estimate $merged != direct-estimate $direct — partial sketches lost accuracy")
    val exact = li.agg(count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(direct - exact).toDouble / exact <= 0.05,
      s"estimate $direct vs exact $exact beyond 5%")
  }
}
