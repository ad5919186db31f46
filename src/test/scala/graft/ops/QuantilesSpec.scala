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
    Quantiles.exact(df, "x", qs, builtinMaxRows = 0L)
      .orderBy("q").collect().map(_.getDouble(1)).toSeq

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

  test("exactByKey matches per-group percentile, across partition counts") {
    val data = (0 until 30000).map(i =>
      (s"g${i % 7}", ((i * 2654435761L) % 99991).toDouble))
    // dispatch pinned off: this test exists to exercise the rank
    // machinery against the built-in as an independent reference
    def run(parts: Int): Map[(String, Double), Double] =
      Quantiles.exactByKey(data.toDF("k", "x").repartition(parts),
          "k", "x", qs, builtinMaxGroupRows = 0L)
        .collect().map(r =>
          (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val got = run(32)
    // reference: built-in percentile per group
    val ref = data.toDF("k", "x").groupBy("k")
      .agg(percentile(col("x"), typedLit(qs)).as("arr"))
      .collect().flatMap(r => qs.zipWithIndex.map { case (q, i) =>
        (r.getString(0), q) -> r.getSeq[Double](1)(i) }).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) <= 1e-9 * math.max(1.0, math.abs(ref(k))),
        s"$k: $v vs ${ref(k)}")
    }
    assert(run(1) == got) // partition-count invariant
  }

  test("exactByKey: single-row groups, null keys dropped, group rail") {
    val df = Seq(("a", Some(5.0)), ("b", Some(1.0)), ("b", Some(3.0)),
      (null.asInstanceOf[String], Some(9.0)), ("c", None)).toDF("k", "x")
    val got = Quantiles.exactByKey(df, "k", "x", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 0.5)) == 5.0) // single-row group: all quantiles = the row
    assert(got(("b", 0.5)) == 2.0) // interpolated midpoint
    assert(!got.keys.exists(_._1 == null)) // null key dropped
    assert(!got.keys.exists(_._1 == "c"))  // all-null-x group vanishes
    // the rail fires on BOTH paths: the dispatch probe's countDistinct
    // (default) and the rank path's limit-probe (dispatch disabled)
    intercept[IllegalArgumentException] {
      Quantiles.exactByKey(
        (0 until 100).map(i => (s"k$i", 1.0)).toDF("k", "x"),
        "k", "x", Seq(0.5), maxGroups = 10)
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactByKey(
        (0 until 100).map(i => (s"k$i", 1.0)).toDF("k", "x"),
        "k", "x", Seq(0.5), maxGroups = 10, builtinMaxGroupRows = 0L)
    }
  }

  test("exactByKey dispatch: both sides of the §5u crossover agree") {
    val data = (0 until 20000).map(i =>
      (s"g${i % 5}", ((i * 48271L) % 99991).toDouble))
    val df = data.toDF("k", "x").repartition(8)
    def run(thresh: Long): Map[(String, Double), Double] =
      Quantiles.exactByKey(df, "k", "x", qs,
          builtinMaxGroupRows = thresh)
        .collect().map(r =>
          (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val viaBuiltin = run(Long.MaxValue) // max 4000 rows/key -> built-in
    val viaRank = run(0L)               // disabled -> rank machinery
    val viaRank2 = run(1L)              // enabled, max > 1 -> rank machinery
    assert(viaBuiltin.keySet == viaRank.keySet)
    viaBuiltin.foreach { case (k, v) =>
      assert(math.abs(v - viaRank(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"$k: builtin $v vs rank ${viaRank(k)}")
    }
    assert(viaRank2 == viaRank) // same machinery -> identical bits
  }

  test("exactByKey dispatch guards on the LARGEST group, not the average") {
    // 99 one-row groups + 1 five-thousand-row group: the average (~51
    // rows) sits far under the threshold but the max is what the
    // built-in's per-group value-map merge pays for — the skewed frame
    // must take the rank path (no percentile in the plan), and both
    // routings must agree on values
    val data = (0 until 99).map(i => (s"t$i", i.toDouble)) ++
      (0 until 5000).map(i => ("big", ((i * 48271L) % 99991).toDouble))
    val df = data.toDF("k", "x").repartition(8)
    val viaDispatch = Quantiles.exactByKey(df, "k", "x", Seq(0.5),
      builtinMaxGroupRows = 1000L)
    assert(!viaDispatch.queryExecution.analyzed.toString.contains("percentile"))
    val viaBuiltin = Quantiles.exactByKey(df, "k", "x", Seq(0.5),
      builtinMaxGroupRows = Long.MaxValue)
    assert(viaBuiltin.queryExecution.analyzed.toString.contains("percentile"))
    val got = viaDispatch.collect().map(r =>
      (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val ref = viaBuiltin.collect().map(r =>
      (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"$k: $v vs ${ref(k)}")
    }
  }

  test("exact dispatch: built-in and rank paths agree (single-key mirror)") {
    val df = (1 to 30000).map(i => ((i * 48271L) % 99991).toDouble)
      .toDF("x").repartition(8)
    def run(thresh: Long): Seq[(Double, Double)] =
      Quantiles.exact(df, "x", qs, builtinMaxRows = thresh)
        .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1)))
        .toSeq
    val viaBuiltin = run(Long.MaxValue) // 30k rows -> built-in
    val viaRank = run(0L)
    viaBuiltin.zip(viaRank).foreach { case ((qa, a), (qb, b)) =>
      assert(qa == qb)
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
        s"q=$qa: builtin $a vs rank $b")
    }
    assert(run(1L) == viaRank) // 30k > 1 -> rank machinery, same bits
  }

  test("exact matches an independent local type-7 model on seeded random data") {
    // reference implemented from the definition (sort + interpolate),
    // sharing nothing with the operator's rank machinery
    def model(values: Seq[Double], q: Double): Double = {
      val v = values.sorted
      val p = q * (v.length - 1)
      val lo = math.floor(p).toInt; val hi = math.ceil(p).toInt
      v(lo) + (p - lo) * (v(hi) - v(lo))
    }
    val rng = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 1 + rng.nextInt(4000)
      // mix of duplicates, negatives, and magnitude spread
      val data = Seq.fill(n)(rng.nextInt(5) match {
        case 0 => 7.0
        case 1 => -rng.nextDouble() * 1e6
        case _ => rng.nextDouble() * 1e3
      })
      val got = ours(data.toDF("x").repartition(1 + rng.nextInt(16)))
      qs.zip(got).foreach { case (q, g) =>
        val m = model(data, q)
        assert(math.abs(g - m) <= 1e-9 * math.max(1.0, math.abs(m)),
          s"trial $trial n=$n q=$q: $g vs $m")
      }
    }
  }
}
