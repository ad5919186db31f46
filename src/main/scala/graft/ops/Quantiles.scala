package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles without a value-map aggregate.
  *
  * Spark's built-in `percentile` buffers every (value, count) pair per
  * partition and ships the maps to a single merger — at 100 TB that is
  * an executor-memory and single-reducer wall. This operator computes
  * the same type-7 (linear-interpolation) quantiles with the engine's
  * own machinery instead: range-partition on the value, sort within
  * partitions, turn per-partition counts into global rank offsets (the
  * q132 prefix-sum device — driver state is one row per PARTITION, not
  * per value), and pick out the two bracketing ranks per requested
  * quantile. Everything data-sized stays distributed; the only collects
  * are partition counts and the ≤ 2·|qs| bracketing values.
  */
object Quantiles {

  /** Exact quantiles of `xCol` (cast to double, nulls dropped) at each
    * `q` in `qs`, with linear interpolation between bracketing ranks —
    * bit-matching `percentile(x, qs)` / DuckDB `quantile_cont`.
    * Returns a |qs|-row frame (q, exact_q). Empty input → empty frame.
    *
    * Dispatch (the single-key mirror of [[exactByKey]]'s): at most
    * `builtinMaxRows` values answers via the built-in `percentile`
    * aggregate — its one value-count map is cheap while it fits, and
    * the rank machinery's fixed range shuffle doesn't pay. Beyond it
    * the distributed rank path avoids the built-in's single-reducer
    * map merge (§5u: 2.3× at 5M). Set 0 to force the rank path.
    */
  def exact(df: DataFrame, xCol: String, qs: Seq[Double],
      builtinMaxRows: Long = 1L << 20): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0,1]")
    val session = df.sparkSession
    import session.implicits._
    val cleaned0 = df.select(col(xCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    // with dispatch on, the input pins FIRST so the probe's count and
    // the chosen path share ONE execution of the upstream plan (an
    // unpinned probe would re-run arbitrary upstream joins/explodes
    // just to buy two scalars); with dispatch off the rank path's own
    // checkpoint below is the single execution, as before
    val pinned = if (builtinMaxRows > 0) cleaned0.localCheckpoint(true)
      else cleaned0
    if (builtinMaxRows > 0) {
      val total = pinned.count()
      if (total == 0) return qs.toDF("q").filter(lit(false))
        .withColumn("exact_q", lit(0.0).cast("double"))
      if (total <= builtinMaxRows) {
        val ps = expr(s"percentile(__x, array(${qs.mkString(", ")}))")
        return pinned.agg(ps.as("__ps"))
          .select(posexplode(col("__ps")).as(Seq("__i", "exact_q")))
          .select(element_at(typedlit(qs), col("__i") + 1).as("q"),
            col("exact_q"))
      }
    }
    // localCheckpoint pins range boundaries: the counts job and the
    // rank-pick job must agree on partition membership (same argument
    // as Sampling.trainingOrder)
    // __tb spreads duplicate runs across range-partition boundaries (a
    // single hot value would otherwise land one skewed partition); the
    // global (x, tb) order still sorts by x, which is all ranks need
    val parts = pinned
      .withColumn("__tb", monotonically_increasing_id())
      .repartitionByRange(col("__x"), col("__tb"))
      .sortWithinPartitions(col("__x"), col("__tb"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // once parts is checkpointed the probe pin is dead weight; its
    // blocks are reclaimed by the ContextCleaner when the frame falls
    // out of reference (Dataset.unpersist cannot free checkpoint
    // blocks — they are not CacheManager entries), so the x-only
    // column set is transiently resident twice on the dispatch-on
    // rank path
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().sortBy(_.getInt(0)) // bounded: one row per partition
    val n = counts.map(_.getLong(1)).sum
    if (n == 0) return qs.toDF("q").filter(lit(false))
      .withColumn("exact_q", lit(0.0).cast("double"))
    var running = 0L
    val offsets = counts.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    // global 0-indexed ranks that bracket each quantile position
    val positions = qs.map(q => q * (n - 1))
    val needed = positions.flatMap(p =>
      Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct
    // the offsets already locate every bracketing rank's partition, so
    // only those ≤ 2·|qs| partitions feed the rank window — the inner
    // broadcast join drops the rest map-side, BEFORE the window's hash
    // exchange (which otherwise re-shuffles the full dataset: the
    // checkpoint discards outputPartitioning). Whole partitions survive
    // intact, so per-partition row_number ranks are unchanged.
    val countByPid = counts.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val neededPids = offsets.collect { case (pid, off)
      if needed.exists(r => r >= off && r < off + countByPid(pid)) => pid
    }.toSet
    val offsetsDf = broadcast(offsets.toSeq.filter(t => neededPids(t._1))
      .toDF("__pid", "__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__x"), col("__tb"))
    val picked = parts.join(offsetsDf, Seq("__pid"))
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1 + col("__offset"))
      .filter(col("__rank").isInCollection(needed))
      .select(col("__rank"), col("__x"))
      .collect() // bounded: ≤ 2·|qs| rows
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = qs.zip(positions).map { case (q, p) =>
      val lo = math.floor(p).toLong; val hi = math.ceil(p).toLong
      val xlo = picked(lo); val xhi = picked(hi)
      (q, xlo + (p - lo) * (xhi - xlo))
    }
    rows.toDF("q", "exact_q")
  }

  /** PER-GROUP exact quantiles — the data-card shape ("p50/p90 doc
    * length per source"): same rank device as [[exact]], with
    * per-(partition, key) counts and per-key rank offsets. Driver state
    * is one row per (partition, key-run) plus one (key, rank) probe row
    * per bracketing rank — both bounded by `maxGroups` (the rail: at
    * most maxGroups distinct keys; this operator is for card-sized
    * group counts, not per-document keys). The bracketing-value pick
    * and the interpolation stay IN-PLAN (broadcast probe join + one
    * grouped aggregate), so nothing data-sized ever reaches the driver.
    * Returns (key, q, exact_q), matching DuckDB's grouped
    * `quantile_cont`. Groups smaller than 1 row can't occur (nulls are
    * dropped before grouping).
    *
    * Dispatch: when the LARGEST group is at most `builtinMaxGroupRows`
    * rows, the built-in `percentile` aggregate answers instead — same
    * type-7 values (§5u parity 1e-16), and its per-group value map is
    * the cheaper machine in the many-small-groups regime where this
    * operator's fixed range-shuffle machinery doesn't pay. The bound
    * is on the MAX, not the average: the built-in's value-map merge is
    * single-reducer PER GROUP, so one executor-memory-scale group in
    * an otherwise-small-keyed frame must still take the rank path —
    * an average-based probe would route it into exactly the wall this
    * operator exists to avoid. Set 0 to force the rank path (e.g. to
    * keep plans comparable across scales).
    */
  def exactByKey(df: DataFrame, keyCol: String, xCol: String,
      qs: Seq[Double], maxGroups: Int = 10000,
      builtinMaxGroupRows: Long = 1L << 20): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0,1]")
    require(maxGroups >= 1, "maxGroups must be >= 1")
    val session = df.sparkSession
    import session.implicits._
    val cleaned0 = df.select(col(keyCol).cast("string").as("__k"),
        col(xCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull && col("__k").isNotNull)
    // with dispatch on, pin the input FIRST: the probe's group stats
    // and the chosen path then share ONE execution of the upstream
    // plan (an unpinned probe would re-run arbitrary upstream work to
    // buy two scalars). §5u crossover: built-in 3× faster at 250k-row
    // groups, rank path ahead (gap widening) at 2.5M — the 1M default
    // splits it.
    val pinned = if (builtinMaxGroupRows > 0) cleaned0.localCheckpoint(true)
      else cleaned0
    var railChecked = false
    if (builtinMaxGroupRows > 0) {
      val r = pinned.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
        .agg(count(lit(1)).as("nk"), max(col("__n")).as("maxn")).head()
      val nk = r.getLong(0)
      if (nk == 0)
        return Seq.empty[(String, Double, Double)].toDF("key", "q", "exact_q")
      val maxn = r.getLong(1)
      require(nk <= maxGroups,
        s"exactByKey: more than maxGroups=$maxGroups distinct keys " +
          "(driver offset state is groups-bounded; raise the rail only " +
          "with the memory math in hand, or pre-aggregate the key)")
      railChecked = true
      if (maxn <= builtinMaxGroupRows) {
        val ps = expr(s"percentile(__x, array(${qs.mkString(", ")}))")
        return pinned.groupBy(col("__k")).agg(ps.as("__ps"))
          .select(col("__k").as("key"),
            posexplode(col("__ps")).as(Seq("__i", "exact_q")))
          .select(col("key"),
            element_at(typedlit(qs), col("__i") + 1).as("q"),
            col("exact_q"))
      }
    }
    val parts = pinned
      .withColumn("__tb", monotonically_increasing_id())
      .repartitionByRange(col("__k"), col("__x"), col("__tb"))
      .sortWithinPartitions(col("__k"), col("__x"), col("__tb"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // the probe pin is dead weight from here; ContextCleaner reclaims
    // it once unreferenced (Dataset.unpersist cannot free checkpoint
    // blocks) — the (k, x) column set is transiently resident twice
    // on the dispatch-on rank path
    // the rail must fire BEFORE anything group-sized reaches the
    // driver: a per-document key (the documented misuse) would OOM the
    // counts collect below long before a post-collect require could
    // report it. limit(maxGroups+1) bounds this probe's result whatever
    // the true cardinality is. (Skipped when the dispatch probe above
    // already counted the exact key cardinality.)
    if (!railChecked) {
      val nKeys = parts.select(col("__k")).distinct()
        .limit(maxGroups + 1).count()
      require(nKeys <= maxGroups,
        s"exactByKey: more than maxGroups=$maxGroups distinct keys " +
          "(driver offset state is groups-bounded; raise the rail only " +
          "with the memory math in hand, or pre-aggregate the key)")
    }
    // bounded: one row per (partition, key-run) — range partitioning on
    // (k, x) keeps each key on a contiguous partition band, so this is
    // ≤ keys + partitions rows once the rail has passed
    val counts = parts.groupBy(col("__pid"), col("__k"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val keys = counts.map(_._2).distinct
    if (keys.isEmpty)
      return Seq.empty[(String, Double, Double)].toDF("key", "q", "exact_q")
    // per-key totals and per-(pid, key) rank offsets, partition order
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    counts.sortBy(t => (t._2, t._1)).foreach { case (pid, k, n) =>
      val here = totals.getOrElse(k, 0L)
      offsets += ((pid, k, here))
      totals(k) = here + n
    }
    // bracketing-rank probes: (key, rank, q, frac, side) — side
    // distinguishes the lo/hi value when they differ
    val probes = for {
      k <- keys.toSeq
      q <- qs
    } yield {
      val p = q * (totals(k) - 1)
      val lo = math.floor(p).toLong
      (k, lo, q, p - lo, math.ceil(p).toLong)
    }
    val probeRows = probes.flatMap { case (k, lo, q, frac, hi) =>
      Seq((k, lo, q, frac, "lo"), (k, hi, q, frac, "hi"))
    }
    // same partition pruning as [[exact]], per key: only (partition,
    // key) runs holding a bracketing rank enter the rank window. The
    // offsets join is INNER, so restricting the broadcast frame to the
    // needed runs drops every other run map-side before the window's
    // (__pid, __k) exchange; surviving runs keep all their rows, so
    // within-run ranks are unchanged.
    val ranksByKey = probeRows.groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).toSet }
    val countByRun = counts.map(t => (t._1, t._2) -> t._3).toMap
    val neededRuns = offsets.filter { case (pid, k, off) =>
      ranksByKey(k).exists(r => r >= off && r < off + countByRun((pid, k)))
    }
    val offsetsDf = broadcast(neededRuns.toSeq.toDF("__pid", "__k", "__offset"))
    val probesDf = broadcast(
      probeRows.toDF("__k", "__rank", "q", "__frac", "__side"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("__k"))
      .orderBy(col("__x"), col("__tb"))
    parts.join(offsetsDf, Seq("__pid", "__k"))
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1 + col("__offset"))
      .join(probesDf, Seq("__k", "__rank"))
      .groupBy(col("__k"), col("q"), col("__frac"))
      .agg(max(when(col("__side") === "lo", col("__x"))).as("__xlo"),
        max(when(col("__side") === "hi", col("__x"))).as("__xhi"))
      .select(col("__k").as("key"), col("q"),
        (col("__xlo") + col("__frac") * (col("__xhi") - col("__xlo")))
          .as("exact_q"))
  }
}
