package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KllSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def summary(values: Seq[Double], k: Int, parts: Int) = {
    val row = values.toDF("x").repartition(parts)
      .agg(graft.functions.kll_sketch(col("x"), k).as("sk"))
      .select(col("sk.n"), col("sk.items"), col("sk.weights")).head
    (row.getLong(0), row.getSeq[Double](1), row.getSeq[Long](2))
  }

  private def estimates(values: Seq[Double], k: Int, parts: Int,
      qs: Seq[Double]) = {
    val sk = values.toDF("x").repartition(parts)
      .agg(graft.functions.kll_sketch(col("x"), k).as("sk"))
      .select(col("sk.items").as("items"), col("sk.weights").as("weights"))
    qs.toDF("q").crossJoin(sk)
      .select(col("q"), graft.functions.kll_quantile(
        col("items"), col("weights"), col("q")).as("est"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
  }

  /** Exact rank of v (count <=) normalized to [0,1]. */
  private def normRank(sorted: IndexedSeq[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.size

  test("weight invariant: sum(weights) == n, items sorted ascending") {
    val rnd = new scala.util.Random(3)
    val values = Seq.fill(30000)(rnd.nextGaussian() * 100)
    val (n, items, weights) = summary(values, k = 200, parts = 8)
    assert(n == 30000L)
    assert(weights.sum == n, "compaction must preserve total weight exactly")
    assert(items == items.sorted)
    assert(items.size < 2000, s"summary kept ${items.size} of 30000 items")
  }

  test("rank error under 2% at k=200 on a skewed stream, 32 partitions") {
    val rnd = new scala.util.Random(17)
    val values = Seq.fill(50000)(math.pow(rnd.nextDouble(), 4) * 1e6)
    val sorted = values.sorted.toIndexedSeq
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = estimates(values, k = 200, parts = 32, qs)
    qs.foreach { q =>
      val err = math.abs(normRank(sorted, est(q)) - q)
      assert(err <= 0.02, s"q=$q: normalized rank error $err > 2%")
    }
  }

  test("small n (below capacity) is exact: estimate == exact quantile") {
    val values = (1 to 150).map(_.toDouble)
    val est = estimates(values, k = 200, parts = 4, Seq(0.1, 0.5, 0.9))
    // target rank ceil(q*150): 15, 75, 135
    assert(est(0.1) == 15.0 && est(0.5) == 75.0 && est(0.9) == 135.0)
  }

  test("extreme quantiles clamp to min/max when n fits the sketch") {
    val values = Seq(5.0, 1.0, 9.0, 3.0)
    val est = estimates(values, k = 200, parts = 2, Seq(0.0, 1.0))
    assert(est(0.0) == 1.0)
    assert(est(1.0) == 9.0)
  }

  test("serialization roundtrip preserves the tower exactly") {
    val agg = KllSketch(org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      k = 64)
    val buf = agg.createAggregationBuffer()
    val rnd = new scala.util.Random(5)
    (1 to 5000).foreach { _ =>
      buf.levels(0) += rnd.nextDouble()
      buf.n += 1
      KllSketch.compressIfNeeded(buf, 64)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.n == buf.n)
    assert(back.compactions == buf.compactions)
    assert(back.levels.map(_.toVector) == buf.levels.map(_.toVector))
  }

  test("merge of near-full towers compacts all the way under capacity") {
    // The capacity invariant must hold immediately after merge, however
    // many compaction passes that takes (a fixed pass cap would leave
    // the buffer over capacity until later updates).
    val k = 8 // floor capacities -> many small levels, worst pass yield
    val agg = KllSketch(org.apache.spark.sql.catalyst.expressions.Literal(1.0), k)
    def fill(seed: Int, nItems: Int) = {
      val buf = agg.createAggregationBuffer()
      val rnd = new scala.util.Random(seed)
      (1 to nItems).foreach { _ =>
        buf.levels(0) += rnd.nextDouble()
        buf.n += 1
        KllSketch.compressIfNeeded(buf, k)
      }
      buf
    }
    def overCapacity(buf: KllSketch.Buffer): Boolean = {
      val size = buf.levels.map(_.size).sum
      val cap = buf.levels.indices
        .map(l => KllSketch.capacity(l, buf.levels.size, k)).sum
      size > cap
    }
    val merged = (1 to 8).map(s => fill(s, 20000)).reduce { (a, b) =>
      val m = agg.merge(a, b)
      assert(!overCapacity(m), "tower over capacity right after merge")
      m
    }
    assert(merged.n == 8L * 20000L)
    // weight is still exact through all those compactions
    val w = merged.levels.indices.map(l => merged.levels(l).size.toLong << l).sum
    assert(w == merged.n)
  }

  test("SQL registration: kll_sketch + kll_quantile callable from spark.sql") {
    graft.functions.registerAll(spark)
    (1 to 1000).map(_.toDouble).toDF("x").createOrReplaceTempView("kll_in")
    val row = spark.sql(
      """SELECT kll_quantile(sk.items, sk.weights, 0.5d) AS med
        |FROM (SELECT kll_sketch(x, 200) AS sk FROM kll_in)""".stripMargin).head
    val med = row.getDouble(0)
    assert(math.abs(med - 500.0) <= 20.0, s"median estimate $med")
  }
}
