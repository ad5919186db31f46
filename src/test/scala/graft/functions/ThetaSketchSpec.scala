package graft.functions

import graft.SparkTestSession
import graft.functions.{theta_estimate, theta_intersect_estimate, theta_sketch, theta_union_estimate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("below capacity the sketch is exact, duplicates and nulls ignored") {
    val df = (Seq("a", "b", "c", "a", "b") ++ Seq.fill(3)(null: String))
      .toDF("s")
    val est = df.agg(theta_estimate(theta_sketch(col("s"), 64)))
      .as[Double].head()
    assert(est == 3.0)
  }

  test("at capacity the estimate lands within the published RSE bound") {
    // 100k distinct over 32 partitions, k=4096: RSE ≈ 1/sqrt(k-2) ≈ 1.6%;
    // gate at 5x RSE — a broken merge or evict is off by far more
    val n = 100000
    val est = spark.range(n).repartition(32)
      .select(concat(lit("item-"), col("id")).as("s"))
      .agg(theta_estimate(theta_sketch(col("s"), 4096)))
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.08, s"estimate $est vs $n")
  }

  test("distributed merge equals the single-partition sketch exactly") {
    def sk(parts: Int) = spark.range(50000).repartition(parts)
      .select(concat(lit("w"), pmod(col("id"), lit(20000))).as("s"))
      .agg(theta_sketch(col("s"), 1024).as("sk"))
      .select(theta_estimate(col("sk")),
        expr("size(sk.hashes)"), expr("sk.hashes[1023]"))
      .head()
    assert(sk(1) == sk(32)) // same k-min set regardless of partitioning
  }

  test("intersection estimate tracks true overlap across disjoint, partial, equal") {
    // A = [0, 60k), B = [40k, 100k): true intersection 20k, union 100k
    val a = spark.range(0, 60000)
      .select(concat(lit("t"), col("id")).as("s"))
      .agg(theta_sketch(col("s"), 4096).as("sk")).withColumn("side", lit("a"))
    val b = spark.range(40000, 100000)
      .select(concat(lit("t"), col("id")).as("s"))
      .agg(theta_sketch(col("s"), 4096).as("sk")).withColumn("side", lit("b"))
    val row = a.crossJoin(b.select(col("sk").as("skb")))
      .select(
        theta_intersect_estimate(col("sk"), col("skb")).as("inter"),
        theta_union_estimate(col("sk"), col("skb")).as("union"))
      .head()
    assert(math.abs(row.getDouble(0) - 20000) / 20000 < 0.15,
      s"intersection ${row.getDouble(0)} vs 20000")
    assert(math.abs(row.getDouble(1) - 100000) / 100000 < 0.08,
      s"union ${row.getDouble(1)} vs 100000")
    // disjoint sets: exact zero (no shared hashes to miscount)
    val c = spark.range(200000, 260000)
      .select(concat(lit("t"), col("id")).as("s"))
      .agg(theta_sketch(col("s"), 4096).as("skc"))
    val z = a.crossJoin(c)
      .select(theta_intersect_estimate(col("sk"), col("skc")))
      .as[Double].head()
    assert(z == 0.0)
    // identical sets: intersection == union == the self-estimate
    val self = a.crossJoin(a.select(col("sk").as("sk2")))
      .select(theta_intersect_estimate(col("sk"), col("sk2")).as("i"),
        theta_union_estimate(col("sk"), col("sk2")).as("u"),
        theta_estimate(col("sk")).as("e"))
      .head()
    assert(self.getDouble(0) == self.getDouble(2))
    assert(self.getDouble(1) == self.getDouble(2))
  }

  test("exact-regime set ops are exact, and mixed exact/estimating works") {
    val a = Seq("a", "b", "c", "d").toDF("s")
      .agg(theta_sketch(col("s"), 64).as("sk"))
    val b = Seq("c", "d", "e").toDF("s")
      .agg(theta_sketch(col("s"), 64).as("skb"))
    val row = a.crossJoin(b)
      .select(theta_intersect_estimate(col("sk"), col("skb")),
        theta_union_estimate(col("sk"), col("skb")))
      .head()
    assert(row.getDouble(0) == 2.0)
    assert(row.getDouble(1) == 5.0)
    // one side at capacity, one exact: both ops stay within bounds
    val big = spark.range(50000).select(concat(lit("t"), col("id")).as("s"))
      .agg(theta_sketch(col("s"), 2048).as("skbig"))
    val small = spark.range(100).select(concat(lit("t"), col("id")).as("s"))
      .agg(theta_sketch(col("s"), 2048).as("sksmall"))
    val m = big.crossJoin(small)
      .select(theta_intersect_estimate(col("skbig"), col("sksmall")),
        theta_union_estimate(col("skbig"), col("sksmall")))
      .head()
    // true intersection 100 — tiny vs θ_big, so wide tolerance; union ≈ 50000
    assert(m.getDouble(0) >= 0 && m.getDouble(0) < 400,
      s"small-overlap estimate ${m.getDouble(0)}")
    assert(math.abs(m.getDouble(1) - 50000) / 50000 < 0.12,
      s"union ${m.getDouble(1)}")
  }

  test("SQL registration exposes the full surface") {
    graft.functions.registerAll(spark)
    spark.range(1000).select(concat(lit("x"), col("id")).as("s"))
      .createOrReplaceTempView("theta_t")
    val est = spark.sql(
      """SELECT theta_estimate(theta_sketch(s, 2048)) FROM theta_t""")
      .as[Double].head()
    assert(est == 1000.0) // below capacity: exact
  }
}
