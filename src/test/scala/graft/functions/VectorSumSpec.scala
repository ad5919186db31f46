package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sums element-wise per group; partial+merge path via shuffle") {
    val df = Seq(
      (1, Seq(1f, 2f)), (1, Seq(10f, 20f)), (1, Seq(100f, 200f)),
      (2, Seq(5f, 5f))
    ).toDF("g", "v").repartition(4) // force partial buffers + merge
    val got = df.groupBy("g").agg(vec_sum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(1) == Seq(111.0, 222.0))
    assert(got(2) == Seq(5.0, 5.0))
  }

  test("null rows skipped; all-null group is null") {
    val df = Seq(
      (1, Some(Seq(1f, 1f))), (1, None), (2, None)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(vec_sum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)))).toMap
    assert(got(1).contains(Seq(1.0, 1.0)))
    assert(got(2).isEmpty)
  }

  test("matches sum of real embeddings computed driver-side") {
    val emb = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .limit(100)
    val expected = emb.collect().map(_.getSeq[Float](1))
      .foldLeft(new Array[Double](64)) { (acc, v) =>
        v.zipWithIndex.foreach { case (x, i) => acc(i) += x }; acc
      }
    val got = emb.agg(vec_sum(col("embedding")).as("s")).head.getSeq[Double](0)
    expected.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9) }
  }

  test("length mismatch raises") {
    val df = Seq((1, Seq(1f)), (1, Seq(1f, 2f))).toDF("g", "v")
    intercept[Exception](df.groupBy("g").agg(vec_sum(col("v"))).collect())
  }
}
