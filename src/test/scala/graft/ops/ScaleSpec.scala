package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedAgg equals plain aggregation (correctness under salting)") {
    val df = spark.range(0, 10000)
      .select((col("id") % 7).as("k"), (col("id") % 100).cast("double").as("v"))
    val expected = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val salted = Scale.saltedAgg(df, Seq("k"), salts = 16,
      partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
      merges = Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == expected.toSeq)
  }

  test("saltedJoin equals the plain inner join, including skewed + unmatched keys") {
    // Zipf-ish skew: key 0 holds half the big side; key 99 matches nothing
    val big = spark.range(0, 20000)
      .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50).as("bk"),
        col("id").as("payload"))
    val small = spark.range(0, 49) // key 49 unmatched on the small side too
      .select(col("id").as("sk"), (col("id") * 10).as("dim"))
    val expected = big.join(small, col("bk") === col("sk"))
      .groupBy("bk").agg(count(lit(1)).as("n"), sum(col("dim")).as("s"))
      .orderBy("bk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val salted = Scale.saltedJoin(big, small, "bk", "sk", salts = 8)
      .groupBy("bk").agg(count(lit(1)).as("n"), sum(col("dim")).as("s"))
      .orderBy("bk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == expected.toSeq)
  }

  test("saltedJoin refuses overlapping column names") {
    val a = spark.range(3).select(col("id").as("k"), col("id").as("v"))
    val b = spark.range(3).select(col("id").as("k2"), col("id").as("v"))
    val e = intercept[IllegalArgumentException](Scale.saltedJoin(a, b, "k", "k2", 4))
    assert(e.getMessage.contains("overlapping"))
  }

  test("bucketed join elides both shuffles") {
    val a = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Scale.writeBucketed(a, "bkt_a", "k", 4)
    Scale.writeBucketed(b, "bkt_b", "k", 4)
    try {
      val joined = Scale.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("knnJoin: planted clusters find their own members first") {
    // two tight clusters far apart; every member's top neighbors must be
    // from its own cluster
    def jitter(base: Array[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (v, j) => v + ((i * 31 + j) % 7) * 0.001f }.toSeq
    val c1 = Array.fill(16)(1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = (0 until 10).map(i => (i.toLong, jitter(c1, i))) ++
      (10 until 20).map(i => (i.toLong, jitter(c2, i)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(emb, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3, dim = 16, bits = 12, bands = 4)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val qid = r.getLong(0); val eid = r.getLong(2)
      assert((qid < 10) == (eid < 10),
        s"neighbor $eid crossed clusters for query $qid (sim=${r.getDouble(3)})")
    }
    // each query that produced results has at most k of them, ranked
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("bloomPrunedJoin: result equals the plain join, pruning happens") {
    import spark.implicits._
    val big = (0L until 2000L).map(i => (i, i % 100)).toDF("row_id", "bk")
    val small = Seq((7L, "a"), (13L, "b"), (42L, "c")).toDF("sk", "tag")
    val pruned = graft.ops.Scale.bloomPrunedJoin(big, small, "bk", "sk")
      .select(col("row_id"), col("bk"), col("sk"), col("tag"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = big.join(small, big("bk") === small("sk"))
      .select(col("row_id"), col("bk"), col("sk"), col("tag"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.toSeq == plain.toSeq && pruned.length == 60)
    // the prefilter really drops non-matching rows before the join:
    // at fpp=0.01 over 3 keys, ~all of the other 97 key groups vanish
    val keyed = small.select(xxhash64(col("sk")).as("__h"))
    val bloom = keyed.stat.bloomFilter("__h", 3, 0.01)
    val passed = big.filter(graft.functions.bloom_might_contain(
      xxhash64(col("bk")), bloom)).count()
    assert(passed >= 60 && passed < 200,
      s"prefilter should pass ~60 of 2000 rows, passed $passed")
  }

  test("bloomPrunedJoin: empty small side yields an empty join") {
    import spark.implicits._
    val big = (0L until 50L).map(i => (i, i)).toDF("row_id", "bk")
    val small = Seq.empty[(Long, String)].toDF("sk", "tag")
    assert(graft.ops.Scale.bloomPrunedJoin(big, small, "bk", "sk")
      .count() == 0L)
  }

  test("fanOut spreads an under-parallel pinned frame without changing rows") {
    val p = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 1000).select(col("id"))
      .coalesce(1).localCheckpoint(true)
    assert(one.rdd.getNumPartitions == 1)
    val fanned = Scale.fanOut(one)
    assert(fanned.rdd.getNumPartitions == p)
    // row multiset unchanged (round-robin repartition moves, never drops)
    assert(fanned.agg(count(lit(1)), sum(col("id"))).collect().toSeq ==
      one.agg(count(lit(1)), sum(col("id"))).collect().toSeq)
    // already-parallel frames pass through untouched (the 100 TB no-op)
    val wide = spark.range(0, 1000).toDF()
      .repartition(p).localCheckpoint(true)
    assert(Scale.fanOut(wide) eq wide)
  }

  test("fanOutIfScan fans scan-shaped frames only") {
    val p = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("fanout_scan").toString
    spark.range(0, 500).select(col("id"), (col("id") % 5).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("id") >= 10)
      .select(col("id"), col("k"))
    assert(Scale.fanOutIfScan(scan).rdd.getNumPartitions == p)
    // an aggregated (non-scan) frame is returned untouched — its plan
    // already sits behind a shuffle sized by spark.sql.shuffle.partitions
    val agged = spark.read.parquet(dir).groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    assert(Scale.fanOutIfScan(agged) eq agged)
  }
}
