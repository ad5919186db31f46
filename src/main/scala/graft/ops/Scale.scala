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

  /** Bloom-pruned equi-join: build a Bloom filter over the SMALL side's
    * join keys, probe it map-side on the big side BEFORE the shuffle,
    * then run the normal equi-join. The semi-join-pushdown pattern for
    * the 100 TB case where the small side is too big to broadcast the
    * join itself but its key SET compresses into a few MB of bloom bits:
    * rows that cannot match never enter the exchange, which is where a
    * selective dimension (think "1% of customers") cuts the shuffled
    * fact volume by ~99% at the cost of one map-side codegen probe per
    * row. Bloom false positives (and 64-bit key-hash collisions) only
    * let extra rows THROUGH to the join, which drops them — result
    * semantics are exactly the plain inner join's.
    *
    * The filter is built distributed (mergeable sketches; one pass over
    * the small side) and sized from the small side's own count — the
    * small side is by definition driver-boundable state (`fpp` trades
    * bits for pruning power).
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    val overlap = big.columns.toSet.intersect(small.columns.toSet)
    require(overlap.isEmpty,
      s"bloomPrunedJoin: overlapping column names $overlap — rename first")
    // xxhash64 is TYPE-sensitive (xxhash64(1) != xxhash64(1L)): mixed
    // key types would hash-miss every real match and the prefilter
    // would silently drop them — a false NEGATIVE, which the contract
    // forbids. The plain join would have coerced; we refuse instead.
    val bt = big.schema(bigKey).dataType
    val st = small.schema(smallKey).dataType
    require(bt == st,
      s"bloomPrunedJoin: key types differ ($bt vs $st) — the bloom probe " +
        "hashes raw values and cannot see the join's implicit coercion; " +
        "cast both keys to one type first")
    val keyed = small.select(xxhash64(col(smallKey)).as("__h"))
    val n = keyed.count()
    // Spark's stat.bloomFilter NPEs on an empty frame; an empty small
    // side has an empty join anyway — prune everything explicitly
    if (n == 0L)
      return big.filter(lit(false))
        .join(small, big(bigKey) === small(smallKey))
    val bloom = keyed.stat.bloomFilter("__h", n, fpp)
    big
      .filter(graft.functions.bloom_might_contain(
        xxhash64(col(bigKey)), bloom))
      .join(small, big(bigKey) === small(smallKey))
  }

  /** Fan a small-bytes / CPU-heavy frame out to the session's full
    * parallelism before an expensive per-row fold (hash fan-outs,
    * DECIMAL moment sums, tokenization). The optimization-guide §2.5
    * case "one huge unsplittable file — repartition immediately after
    * the read": a single-row-group parquet file scans as ONE partition
    * no matter the core count, and everything map-side of the next
    * exchange (including partial aggregation) runs single-threaded on
    * it. No-op when the frame already carries at least
    * `defaultParallelism` partitions — the 100 TB case, where the scan
    * itself provides the parallelism — so the extra narrow shuffle is
    * paid exactly where the input cannot parallelize. Deterministic
    * (round-robin repartition sorts before assigning, SPARK-23207) and
    * result-neutral: callers fold the fanned frame through key-based
    * aggregation over order-free (DECIMAL / integer) terms.
    *
    * Call ONLY on pinned (`localCheckpoint`ed) or exchange-free frames:
    * the partition probe converts the plan to an RDD, which under AQE
    * materializes any shuffle stages below it — on a pinned frame the
    * RDD already exists and the probe is free.
    */
  def fanOut(df: DataFrame): DataFrame = {
    // the doc contract above, enforced in code: a df.rdd probe on a
    // frame with un-materialized shuffles would, under AQE, run those
    // stages just to read a partition count — only leaf / scan-shaped
    // plans (the pinned LogicalRDD and file-scan cases) may be probed
    require(org.apache.spark.sql.GraftSqlShim.scanShaped(df),
      "Scale.fanOut: frame is not pinned/scan-shaped — localCheckpoint " +
        "it first, or route through fanOutIfScan")
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** [[fanOut]] for operator INPUTS with arbitrary lineage: applies only
    * when the frame is scan-shaped (projections/filters over one leaf —
    * see `GraftSqlShim.scanShaped`), where the partition probe is free
    * and an under-parallel scan (the single-row-group local file, one
    * gzip blob, a tiny table) provably serializes the caller's per-row
    * work. Frames that already carry joins/aggregates arrive behind an
    * exchange sized by `spark.sql.shuffle.partitions` and are returned
    * untouched — so is any streaming frame.
    */
  def fanOutIfScan(df: DataFrame): DataFrame =
    if (!df.isStreaming &&
        org.apache.spark.sql.GraftSqlShim.scanShaped(df)) fanOut(df)
    else df
}
