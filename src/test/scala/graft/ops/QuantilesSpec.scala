package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.agg(percentile(col("x"), typedLit(qs))).collect()(0).getSeq[Double](0)

  private def ours(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    Quantiles.exact(df, "x", qs).orderBy("q").collect().map(_.getDouble(1)).toSeq

  test("matches the built-in percentile aggregate on pseudo-random data") {
    val df = (1 to 50000).map(i => ((i * 2654435761L) % 1000003).toDouble)
      .toDF("x")
    val (a, b) = (builtin(df), ours(df))
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
        s"quantile mismatch: $x vs $y")
    }
  }

  test("heavy duplicates (skewed value) still rank correctly") {
    // one value owns 80% of the mass — the tiebreak column must spread
    // it across range partitions without corrupting ranks
    val df = ((1 to 40000).map(_ => 7.0) ++ (1 to 10000).map(_.toDouble))
      .toDF("x").repartition(16)
    val (a, b) = (builtin(df), ours(df))
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-9, s"quantile mismatch: $x vs $y")
    }
  }

  test("partition-count invariant") {
    val data = (1 to 9999).map(i => ((i * 48271L) % 99991).toDouble)
    val r1 = ours(data.toDF("x").repartition(1))
    val r32 = ours(data.toDF("x").repartition(32))
    assert(r1 == r32)
  }

  test("single row, nulls dropped, empty input") {
    assert(ours(Seq(42.0).toDF("x")) == qs.map(_ => 42.0))
    val withNulls = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val b = ours(withNulls)
    assert(b.head == 1.0 && b.last == 3.0)
    assert(Quantiles.exact(Seq.empty[Double].toDF("x"), "x", qs).count() == 0)
  }
}
