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
