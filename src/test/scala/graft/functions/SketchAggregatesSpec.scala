package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchAggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int) = {
    val row = items.toDF("w").repartition(parts)
      .agg(graft.functions.mg_sketch(col("w"), k).as("sk"))
      .select(col("sk.n"), col("sk.counts")).head
    (row.getLong(0), row.getMap[String, Long](1).toMap)
  }

  private def checkBounds(items: Seq[String], k: Int, parts: Int): Unit = {
    val (n, est) = sketch(items, k, parts)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(n == items.size)
    assert(est.size <= k, s"retained ${est.size} > k=$k")
    val slack = n.toDouble / (k + 1)
    // every estimate is an underestimate within n/(k+1)
    est.foreach { case (w, e) =>
      val t = truth.getOrElse(w, 0L)
      assert(e <= t, s"overestimate for $w: $e > $t")
      assert(e >= t - slack, s"$w: est $e < true $t - n/(k+1) $slack")
    }
    // every item frequent beyond the slack is guaranteed retained
    truth.foreach { case (w, t) =>
      if (t > slack) assert(est.contains(w), s"frequent item $w (count $t) evicted")
    }
  }

  test("deterministic MG bounds hold on a zipf stream, single partition") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(20000)(s"w${(math.pow(rnd.nextDouble(), 3) * 200).toInt}")
    checkBounds(items, k = 15, parts = 1)
  }

  test("bounds survive partial-aggregate merges across 32 partitions") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(50000)(s"w${(math.pow(rnd.nextDouble(), 3) * 500).toInt}")
    checkBounds(items, k = 20, parts = 32)
    checkBounds(items, k = 5, parts = 32)
  }

  test("small-cardinality input is exact (no eviction ever triggers)") {
    val items = Seq.fill(999)("a") ++ Seq.fill(500)("b") ++ Seq.fill(1)("c")
    val (n, est) = sketch(items, k = 10, parts = 8)
    assert(n == 1500L)
    assert(est == Map("a" -> 999L, "b" -> 500L, "c" -> 1L))
  }

  test("a majority element survives k=1") {
    val items = Seq.fill(600)("maj") ++ (0 until 400).map(i => s"m$i")
    val (_, est) = sketch(items, k = 1, parts = 16)
    assert(est.keySet == Set("maj"))
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("w")
    val row = df.agg(graft.functions.mg_sketch(col("w"), 4).as("sk"))
      .select(col("sk.n"), col("sk.counts")).head
    assert(row.getLong(0) == 2L)
    assert(row.getMap[String, Long](1).toMap == Map("x" -> 2L))
  }

  test("SQL registration works") {
    graft.functions.registerAll(spark)
    Seq("a", "a", "b").toDF("w").createOrReplaceTempView("mg_in")
    val r = spark.sql("SELECT mg_sketch(w, 4) AS sk FROM mg_in")
      .select(col("sk.n")).head.getLong(0)
    assert(r == 3L)
  }

  test("items beyond writeUTF's 64KB limit survive buffer serialization") {
    val big = "x" * 100000 // > 65535 UTF-8 bytes
    val items = Seq.fill(50)(big) ++ Seq.fill(20)("small")
    // 8 partitions force serialize/deserialize between partial and merge
    val (n, est) = sketch(items, k = 4, parts = 8)
    assert(n == 70L)
    assert(est == Map(big -> 50L, "small" -> 20L))
  }

  // ------------------------------------------------------- count-min —

  private def cmsEstimates(items: Seq[String], probes: Seq[String],
      depth: Int, width: Int, parts: Int): (Long, Map[String, Long]) = {
    val sk = items.toDF("w").repartition(parts)
      .agg(graft.functions.cms_sketch(col("w"), depth, width).as("sk"))
      .select(col("sk.n").as("n"), col("sk.table").as("tbl"))
    val out = probes.toDF("p").crossJoin(broadcast(sk))
      .select(col("p"),
        graft.functions.cms_estimate(col("tbl"), col("p"), depth, width).as("est"),
        col("n"))
      .collect()
    (out.head.getLong(2), out.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("cms: est >= true always, and within eps*n on a zipf stream") {
    val rnd = new scala.util.Random(13)
    val items = Seq.fill(30000)(s"w${(math.pow(rnd.nextDouble(), 3) * 2000).toInt}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val depth = 4; val width = 1024
    val probes = truth.keys.take(200).toSeq ++ Seq("never-seen-1", "never-seen-2")
    val (n, est) = cmsEstimates(items, probes, depth, width, parts = 1)
    assert(n == items.size)
    probes.foreach { p =>
      val t = truth.getOrElse(p, 0L)
      assert(est(p) >= t, s"$p: undercount ${est(p)} < $t")
      assert(est(p) <= t + 2.0 * n / width,
        s"$p: ${est(p)} > $t + eps*n = ${t + 2.0 * n / width}")
    }
  }

  test("cms: merged sketch across 32 partitions is IDENTICAL to 1-partition") {
    val rnd = new scala.util.Random(17)
    val items = Seq.fill(20000)(s"t${rnd.nextInt(500)}")
    val probes = (0 until 500).map(i => s"t$i")
    val (n1, e1) = cmsEstimates(items, probes, 4, 512, parts = 1)
    val (n32, e32) = cmsEstimates(items, probes, 4, 512, parts = 32)
    assert(n1 == n32)
    assert(e1 == e32) // elementwise table add commutes with counting
  }

  test("cms: wide sketch is exact on small cardinality") {
    val items = Seq.fill(100)("a") ++ Seq.fill(7)("b") ++ Seq("c")
    val (_, est) = cmsEstimates(items, Seq("a", "b", "c"), 6, 65536, parts = 4)
    // 3 items in 6x65536 slots: collision across ALL 6 rows is ~impossible
    assert(est == Map("a" -> 100L, "b" -> 7L, "c" -> 1L))
  }

  test("cms: nulls are skipped") {
    val sk = Seq(Some("x"), None, Some("x")).toDF("w")
      .agg(graft.functions.cms_sketch(col("w"), 2, 64).as("sk"))
      .select(col("sk.n")).head
    assert(sk.getLong(0) == 2L)
  }

  test("cms: SQL registration works") {
    graft.functions.registerAll(spark)
    Seq("a", "a", "b").toDF("w").createOrReplaceTempView("cms_in")
    val r = spark.sql(
      """SELECT cms_estimate(sk.table, 'a', 3, 128) AS est FROM
        |  (SELECT cms_sketch(w, 3, 128) AS sk FROM cms_in)""".stripMargin)
      .head.getLong(0)
    assert(r == 2L)
  }
}
