package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shape utilities for the 100 TB regime: skew-resistant
  * aggregation and bucketed (co-located) joins.
  */
object Scale {

  /** Two-phase ("salted") aggregation for heavily skewed group keys:
    * phase 1 aggregates on (key, salt) — splitting a hot key's rows across
    * `salts` reducers — phase 2 merges the partials per key. Correct for
    * any algebraic aggregate expressed as (partial, merge) column pairs.
    *
    * Spark's map-side partial aggregation already handles *moderate* skew;
    * salting is for keys so hot that even one reducer's merge load is the
    * straggler (the classic Zipf tail at cluster scale). AQE skew-join
    * handles joins; this handles aggregations.
    *
    * Usage:
    * {{{
    * saltedAgg(df, Seq("user_id"), salts = 16,
    *   partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merges   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[org.apache.spark.sql.Column],
      merges: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    // the salt MUST be a deterministic function of the row: partition-id/
    // monotonic-id salts change on task retry after a shuffle-fetch
    // failure, double-counting or losing rows (the SPARK-23207 class of
    // bug). Hashing the full row keeps retries stable and still spreads a
    // hot key's (distinct) rows across reducers.
    val rowHash = hash(df.columns.map(col).toSeq: _*)
    df.withColumn("__salt", pmod(rowHash, lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a skewed BIG side: the big side's rows are
    * spread across `salts` sub-keys by a deterministic row hash, the
    * small side is replicated `salts`× (explode of a literal range), and
    * the join runs on (key, salt) — so one Zipf-hot key's rows land on
    * `salts` reducers instead of one straggler. Inner-join semantics,
    * identical output to `big.join(small, bigKey === smallKey)`.
    *
    * AQE's skew-join split handles this adaptively for SORT-MERGE joins;
    * explicit salting is for the cases AQE can't reach — skewed shuffled
    * HASH joins, aggregate-after-join pipelines where the split point
    * sits wrong, or engines/configs with AQE off. The small side must
    * actually be small: it is replicated, costing `salts × |small|`
    * shuffle rows.
    *
    * Same retry-stability rule as [[saltedAgg]]: the salt is a hash of
    * the full row, never partition-id/monotonic-id (SPARK-23207 class —
    * a retried task must re-derive identical salts or rows are lost or
    * doubled).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val overlap = big.columns.toSet.intersect(small.columns.toSet)
    require(overlap.isEmpty,
      s"saltedJoin: overlapping column names $overlap — rename before joining")
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }

  /** Write a frame as a bucketed+sorted table so later equi-joins and
    * aggregations on the bucket key need NO shuffle (both sides arrive
    * co-partitioned). This is the persisted analogue of co-located joins:
    * at 100 TB you bucket the big fact tables once and every downstream
    * join on the key is exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — planner elides both
    * exchanges when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
