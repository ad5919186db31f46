package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Event-time streaming analytics over the engine's event stream — beyond
  * the reference's processing-time-only surface (SURVEY §2.8 notes
  * watermarks/windows are absent there), these are the Structured
  * Streaming primitives a 100 TB pipeline actually runs on:
  *
  *   - watermarked tumbling/sliding windows (state store bounded by the
  *     watermark — without it, window state grows unboundedly);
  *   - arbitrary stateful processing (session windows with explicit state
  *     and timeouts via flatMapGroupsWithState).
  */
object StreamOps {

  /** Input row contract for typed stateful ops. */
  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** A closed user session. */
  case class Session(user_id: Long, start_ts: Long, end_ts: Long,
      n_events: Long, sum_value: Double)

  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Watermarked tumbling-window aggregation: counts + exact decimal sums
    * per (window, event_type). Late events beyond the watermark are
    * dropped — bounded state, append-mode emission on watermark advance.
    */
  def windowedEventStats(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming volume-anomaly scoring: per (window, key) arrival counts
    * from the live stream scored against a BATCH-trained robust
    * baseline (key, med, mad — `Events.anomalousDays`'s median/MAD
    * per key) via the same Iglewicz-Hoaglin modified z. The
    * train-batch/score-stream split is the production shape: the
    * baseline is a tiny static frame broadcast into every micro-batch,
    * state is the windowed count aggregation only (watermark-bounded),
    * and a key with no baseline (new source) or MAD = 0 emits a null z
    * and no flag — unknown is not anomalous.
    */
  def streamingAnomalyScore(events: DataFrame, baseline: DataFrame,
      keyCol: String, tsCol: String, watermark: String = "10 minutes",
      windowLen: String = "1 day", threshold: Double = 3.5): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(baseline.select(col("key").cast("string").as("key"),
        col("med"), col("mad"))), Seq("key"), "left")
      .select(col("window.start").as("window_start"), col("key"), col("n"),
        when(col("mad") > 0.0,
          round(lit(0.6745) * (col("n") - col("med")) / col("mad"), 6))
          .as("robust_z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))

  /** One emitted chart day ([[streamingEwmaChart]]) — the exact column
    * set of [[graft.ops.Events.ewmaChart]]'s per-day rows. */
  case class EwmaReading(key: String, day_idx: Long, x: Long, ewma: Double,
      ucl: Double, lcl: Double, out_of_control: Boolean)

  /** Per-key chart state: open-day counts keyed by day index, the
    * running EWMA, and the next day index to close. */
  case class EwmaChartState(pending: Map[Long, Long], z: Double,
      nextIdx: Long)

  /** Streaming EWMA control chart — the continuous twin of
    * [[graft.ops.Events.ewmaChart]] with the train-batch/score-stream
    * split of [[streamingAnomalyScore]]: `baseline` carries the
    * process center and spread per key as (key, mu, sigma) — typically
    * the reference window's mean and population std, exactly what the
    * batch face computes — and the live stream folds
    * `z_t = λ·x_t + (1−λ)·z_{t−1}` (z₀ = μ) over UTC-day arrival
    * counts, emitting one [[EwmaReading]] per (key, closed day) with
    * the batch face's time-varying limits and 6-dp-rounded flag
    * algebra, so identical input produces identical readouts (the
    * batch-parity spec asserts it).
    *
    * Day indexes anchor at `startDay` (UTC midnight, like the batch
    * spine); days the key was silent fold as x = 0 — the zero-filled
    * spine is replicated, not skipped, INCLUDING leading zeros before
    * the key's first event. A key goes on emitting zero-days as long
    * as the GLOBAL watermark advances (the timeout re-arms every
    * firing); a key absent from `baseline` is not monitored (unknown
    * is not alarmed — the [[streamingAnomalyScore]] convention).
    *
    * State per key is (open-day counts ∪ z ∪ next index) — day-grain,
    * watermark-bounded. The baseline is a driver-side map captured in
    * the state closure: key domain must be bounded (it is a CHART —
    * one series per monitored dimension value).
    */
  def streamingEwmaChart(events: DataFrame, keyCol: String, tsCol: String,
      baseline: DataFrame, startDay: String, lambda: Double,
      limitL: Double, watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[EwmaReading] = {
    import spark.implicits._
    require(lambda > 0 && lambda < 1, "lambda must be in (0,1)")
    require(limitL > 0 && limitL <= 10, "limitL must be in (0,10]")
    val dayMs = 86400000L
    val startMs = java.time.LocalDate.parse(startDay)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val base = baseline
      .select(col("key").cast("string"), col("mu").cast("double"),
        col("sigma").cast("double"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    // close every day whose window end is at or before the watermark,
    // zero-filling skipped indexes — the batch spine's fold, resumed
    def close(key: String, st: EwmaChartState, wmMs: Long)
        : (EwmaChartState, Seq[EwmaReading]) = {
      val (mu, sigma) = base(key)
      val lastComplete = (wmMs - startMs) / dayMs - 1
      if (lastComplete < st.nextIdx) (st, Seq.empty)
      else {
        var z = st.z
        val out = (st.nextIdx to lastComplete).map { idx =>
          val x = st.pending.getOrElse(idx, 0L)
          z = lambda * x + (1.0 - lambda) * z
          val t = (idx + 1).toDouble
          val hw = limitL * sigma *
            math.sqrt(lambda / (2.0 - lambda) *
              (1.0 - math.pow(1.0 - lambda, 2.0 * t)))
          val (ew, u, l) = (r6(z), r6(mu + hw), r6(mu - hw))
          EwmaReading(key, idx, x, ew, u, l, ew > u || ew < l)
        }
        (EwmaChartState(st.pending -- (st.nextIdx to lastComplete),
          z, lastComplete + 1), out)
      }
    }
    events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("__ts"))
      .filter(col("k").isNotNull)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaChartState, EwmaReading](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[EwmaChartState]) =>
          if (!base.contains(key)) { rows.foreach(_ => ()); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val st0 = state.getOption.getOrElse(
              EwmaChartState(Map.empty, base(key)._1, 0L))
            val merged = rows.foldLeft(st0.pending) { (m, r) =>
              val idx = (r._2.getTime - startMs) / dayMs
              if (r._2.getTime < startMs) m
              else m.updated(idx, m.getOrElse(idx, 0L) + 1L)
            }
            val (stNew, out) =
              close(key, EwmaChartState(merged, st0.z, st0.nextIdx), wm)
            state.update(stNew)
            // re-arm on every firing so silent keys keep closing
            // zero-days as the global watermark moves
            state.setTimeoutTimestamp(wm + 1)
            out.iterator
          }
      }
  }

  /** One emitted CUSUM day ([[streamingCusumMonitor]]) — the exact
    * column set of [[graft.ops.Events.cusumMonitor]]'s per-day rows. */
  case class CusumReading(key: String, day_idx: Long, x: Long,
      s_pos: Double, s_neg: Double, limit: Double, alarm: Boolean)

  /** Per-key CUSUM state: open-day counts, the two running sums, and
    * the next day index to close. */
  case class CusumState(pending: Map[Long, Long], sp: Double, sn: Double,
      nextIdx: Long)

  /** Streaming tabular CUSUM monitor — the continuous twin of
    * [[graft.ops.Events.cusumMonitor]], wired exactly like
    * [[streamingEwmaChart]]: `baseline` carries (key, mu, sigma) from a
    * reference window, the live stream folds the two one-sided sums
    * over UTC-day arrival counts (interior AND leading zero-days
    * replicated), and each closed day emits one [[CusumReading]] with
    * the batch face's 6-dp alarm algebra — the batch-parity spec
    * asserts bit-equality. Keys absent from `baseline` are not
    * monitored. State per key is day-grain and watermark-bounded.
    */
  def streamingCusumMonitor(events: DataFrame, keyCol: String,
      tsCol: String, baseline: DataFrame, startDay: String, k: Double,
      h: Double, watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[CusumReading] = {
    import spark.implicits._
    require(k >= 0, "k must be >= 0")
    require(h > 0, "h must be positive")
    val dayMs = 86400000L
    val startMs = java.time.LocalDate.parse(startDay)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val base = baseline
      .select(col("key").cast("string"), col("mu").cast("double"),
        col("sigma").cast("double"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    def close(key: String, st: CusumState, wmMs: Long)
        : (CusumState, Seq[CusumReading]) = {
      val (mu, sigma) = base(key)
      val lim = r6(h * sigma)
      val lastComplete = (wmMs - startMs) / dayMs - 1
      if (lastComplete < st.nextIdx) (st, Seq.empty)
      else {
        var sp = st.sp; var sn = st.sn
        val out = (st.nextIdx to lastComplete).map { idx =>
          val x = st.pending.getOrElse(idx, 0L)
          sp = math.max(0.0, sp + (x - mu - k * sigma))
          sn = math.max(0.0, sn + (mu - x - k * sigma))
          val (spR, snR) = (r6(sp), r6(sn))
          CusumReading(key, idx, x, spR, snR, lim,
            spR > lim || snR > lim)
        }
        (CusumState(st.pending -- (st.nextIdx to lastComplete),
          sp, sn, lastComplete + 1), out)
      }
    }
    events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("__ts"))
      .filter(col("k").isNotNull)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumReading](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[CusumState]) =>
          if (!base.contains(key)) Iterator.empty
          else {
            val wm = state.getCurrentWatermarkMs()
            val st0 = state.getOption.getOrElse(
              CusumState(Map.empty, 0.0, 0.0, 0L))
            val merged = rows.foldLeft(st0.pending) { (m, r) =>
              val idx = (r._2.getTime - startMs) / dayMs
              if (r._2.getTime < startMs) m
              else m.updated(idx, m.getOrElse(idx, 0L) + 1L)
            }
            val (stNew, out) =
              close(key, CusumState(merged, st0.sp, st0.sn, st0.nextIdx),
                wm)
            state.update(stNew)
            state.setTimeoutTimestamp(wm + 1)
            out.iterator
          }
      }
  }

  /** One closed window's drift readout ([[streamingKsDrift]]). */
  case class KsDrift(window_start: java.sql.Timestamp, n: Long,
      d_stat: Double, p_value: Double, drift: Boolean)

  /** Per-window distinct-value grain + the window's end (timeout
    * anchor) for [[streamingKsDrift]]. */
  case class KsDriftState(counts: Map[Double, Long], windowEnd: Long)

  /** Streaming KS drift monitor — the continuous form of
    * [[graft.ops.Profile.ksTest]]: each event-time window's value
    * distribution is tested against a STATIC reference sample (the
    * train-batch/score-stream split of [[streamingAnomalyScore]], but
    * for the full distribution SHAPE — the single most common
    * production drift check). State per window is the DISTINCT-VALUE
    * grain (value → count), not the events — the batch face's own
    * grain argument, so a bounded value domain (scores, bucketed
    * latencies, lengths) keeps state small no matter the volume;
    * continuous unbounded domains should be quantized upstream, and
    * that is the honest trade, stated rather than hidden. The
    * reference collapses to its grain ONCE at op construction (a
    * bounded grain-sized collect) and rides the state function as a
    * sorted array. When the watermark passes a window's end the state
    * times out and ONE [[KsDrift]] row emits: the exact two-sample D
    * over the merged grain and the asymptotic Kolmogorov p, both
    * computed with [[graft.ops.Profile.ksTest]]'s exact operation
    * order (same series, same fold, same short-circuit), so the two
    * faces cannot disagree on identical input — the batch-parity spec
    * asserts equality. `drift` flags p < `pThreshold`.
    */
  def streamingKsDrift(events: DataFrame, valueCol: String, tsCol: String,
      reference: DataFrame, refValueCol: String,
      windowLen: String = "1 day", watermark: String = "10 minutes",
      pThreshold: Double = 0.05)(
      implicit spark: SparkSession): Dataset[KsDrift] = {
    import spark.implicits._
    require(pThreshold > 0 && pThreshold < 1, "pThreshold in (0,1)")
    // reference grain: sorted values with cumulative counts (bounded —
    // the distinct-value domain, same argument as the live state)
    val refGrain = reference
      .select(col(refValueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy(col("__x")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__x"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    require(refGrain.nonEmpty, "streamingKsDrift: empty reference")
    val refVals = refGrain.map(_._1)
    val refCum = refGrain.scanLeft(0L)(_ + _._2).tail
    val nRef = refCum.last
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    events
      .withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowLen).as("__w"),
        col(valueCol).cast("double").as("__x"), col(tsCol).as("__ts"))
      .filter(col("__x").isNotNull)
      // __ts rides along untouched: extracting __w.start strips the
      // watermark tag, and EventTimeTimeout needs a tagged column in
      // the state op's child (the streamingRetention pattern)
      .select(col("__w.start").as("ws"), col("__w.end").as("we"),
        col("__x"), col("__ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Double,
        java.sql.Timestamp)]
      .groupByKey(_._1.getTime)
      .flatMapGroupsWithState[KsDriftState, KsDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long,
            rows: Iterator[(java.sql.Timestamp, java.sql.Timestamp, Double,
              java.sql.Timestamp)],
            state: GroupState[KsDriftState]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val nLive = counts.valuesIterator.sum
            // exact two-sample D: sweep the merged sorted grain, both
            // CDFs inclusive at each step point — the batch kernel's
            // definition on its distinct-value frame
            val liveSorted = counts.toArray.sortBy(_._1)
            var i = 0; var j = 0
            var cumL = 0L; var cumR = 0L
            var d = 0.0
            while (i < liveSorted.length || j < refVals.length) {
              val v =
                if (j >= refVals.length) liveSorted(i)._1
                else if (i >= liveSorted.length) refVals(j)
                else math.min(liveSorted(i)._1, refVals(j))
              if (i < liveSorted.length && liveSorted(i)._1 == v) {
                cumL += liveSorted(i)._2; i += 1
              }
              if (j < refVals.length && refVals(j) == v) {
                cumR = refCum(j); j += 1
              }
              val gap = math.abs(
                cumL.toDouble / nLive - cumR.toDouble / nRef)
              if (gap > d) d = gap
            }
            // the batch face's exact p algebra: 100-term Kolmogorov
            // series, left-to-right fold, λ < 0.05 short-circuit, clamp
            val lam = d * math.sqrt(
              nLive.toDouble * nRef / (nLive.toDouble + nRef))
            val series = (1 to 100).map { k =>
              2.0 * (if (k % 2 == 1) 1.0 else -1.0) *
                math.exp(-2.0 * k * k * lam * lam)
            }.reduceLeft(_ + _)
            val p =
              if (lam < 0.05) 1.0
              else math.max(0.0, math.min(1.0, series))
            Iterator(KsDrift(new java.sql.Timestamp(wsMs), nLive,
              r6(d), r6(p), p < pThreshold))
          } else {
            val arr = rows.toSeq
            val old = state.getOption
              .map(_.counts).getOrElse(Map.empty[Double, Long])
            val merged = arr.foldLeft(old) { case (m, (_, _, x, _)) =>
              m.updated(x, m.getOrElse(x, 0L) + 1L)
            }
            val windowEnd = arr.head._2.getTime
            state.update(KsDriftState(merged, windowEnd))
            state.setTimeoutTimestamp(
              math.max(windowEnd, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** One closed window's Mann-Whitney drift readout
    * ([[streamingMwDrift]]); z/p null when every value ties. */
  case class MwDrift(window_start: java.sql.Timestamp, n: Long,
      u_live: Double, u_ref: Double, z: Option[Double],
      p_value: Option[Double], drift: Boolean)

  /** Streaming Mann-Whitney drift monitor — [[streamingKsDrift]]'s
    * location-shift sibling (KS asks "did the SHAPE move", this asks
    * "did the live window stochastically dominate the reference" —
    * the right alarm for skewed metrics like latency or revenue where
    * a mean monitor lies). Same machinery: per-window distinct-value
    * grain state merged across micro-batches, the reference grain
    * collected once; on watermark timeout one [[MwDrift]] row emits
    * with the batch kernel's EXACT algebra (mid-ranks over the merged
    * grain — half-integer-exact, so the sweep order cannot matter —
    * tie-corrected σ with the t³ fold in exact integers, the A&S
    * 7.1.26 normal tail), so [[graft.ops.Profile.mannWhitney]] on
    * identical input returns bit-identical u/z/p — asserted by the
    * parity spec. The live window plays group a (u_live = its
    * rank-sum U). `drift` flags p < `pThreshold`.
    */
  def streamingMwDrift(events: DataFrame, valueCol: String, tsCol: String,
      reference: DataFrame, refValueCol: String,
      windowLen: String = "1 day", watermark: String = "10 minutes",
      pThreshold: Double = 0.05)(
      implicit spark: SparkSession): Dataset[MwDrift] = {
    import spark.implicits._
    require(pThreshold > 0 && pThreshold < 1, "pThreshold in (0,1)")
    val refGrain = reference
      .select(col(refValueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy(col("__x")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__x"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    require(refGrain.nonEmpty, "streamingMwDrift: empty reference")
    val nRef = refGrain.map(_._2).sum
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r6n(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    events
      .withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowLen).as("__w"),
        col(valueCol).cast("double").as("__x"), col(tsCol).as("__ts"))
      .filter(col("__x").isNotNull)
      .select(col("__w.start").as("ws"), col("__w.end").as("we"),
        col("__x"), col("__ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, Double,
        java.sql.Timestamp)]
      .groupByKey(_._1.getTime)
      .flatMapGroupsWithState[KsDriftState, MwDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long,
            rows: Iterator[(java.sql.Timestamp, java.sql.Timestamp, Double,
              java.sql.Timestamp)],
            state: GroupState[KsDriftState]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val nLive = counts.valuesIterator.sum
            val liveSorted = counts.toArray.sortBy(_._1)
            // merged-grain sweep: mid-rank of a tied run of t values
            // starting after cum ranks is cum + (t+1)/2 — exactly the
            // batch kernel's grain expression; rank sums are
            // half-integers (exact doubles), the t³ fold is BigInt
            var i = 0; var j = 0
            var cum = 0L
            var ra = 0.0
            var ties = BigInt(0)
            while (i < liveSorted.length || j < refGrain.length) {
              val v =
                if (j >= refGrain.length) liveSorted(i)._1
                else if (i >= liveSorted.length) refGrain(j)._1
                else math.min(liveSorted(i)._1, refGrain(j)._1)
              var ca = 0L; var cb = 0L
              if (i < liveSorted.length && liveSorted(i)._1 == v) {
                ca = liveSorted(i)._2; i += 1
              }
              if (j < refGrain.length && refGrain(j)._1 == v) {
                cb = refGrain(j)._2; j += 1
              }
              val t = ca + cb
              ra += ca * (cum + (t + 1) / 2.0)
              val tb = BigInt(t)
              ties += tb * tb * tb - tb
              cum += t
            }
            val (na, nb) = (nLive, nRef)
            val bign = (na + nb).toDouble
            val ua = ra - na.toDouble * (na + 1) / 2.0
            val ub = na.toDouble * nb - ua
            val mu = na.toDouble * nb / 2.0
            val tiesD = BigDecimal(ties).doubleValue
            val sigma2 = na.toDouble * nb / 12.0 *
              (bign + 1.0 - tiesD / (bign * (bign - 1.0)))
            val (z, p) =
              if (sigma2 > 0) {
                val zv = (ua - mu) / math.sqrt(sigma2)
                val ax = math.abs(zv)
                val tt = 1.0 / (1.0 + 0.2316419 * ax)
                val poly = tt * (0.319381530 + tt * (-0.356563782 +
                  tt * (1.781477937 + tt * (-1.821255978 +
                    tt * 1.330274429))))
                val tail = math.exp(-ax * ax / 2.0) /
                  math.sqrt(2.0 * math.Pi) * poly
                (Some(r6n(zv)), Some(r6(math.min(1.0, 2.0 * tail))))
              } else (None, None)
            Iterator(MwDrift(new java.sql.Timestamp(wsMs), nLive,
              r6(ua), r6(ub), z, p,
              p.exists(_ < pThreshold)))
          } else {
            val arr = rows.toSeq
            val old = state.getOption
              .map(_.counts).getOrElse(Map.empty[Double, Long])
            val merged = arr.foldLeft(old) { case (m, (_, _, x, _)) =>
              m.updated(x, m.getOrElse(x, 0L) + 1L)
            }
            val windowEnd = arr.head._2.getTime
            state.update(KsDriftState(merged, windowEnd))
            state.setTimeoutTimestamp(
              math.max(windowEnd, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** One closed window's PSI/JSD drift readout
    * ([[streamingPsiDrift]]). */
  case class PsiDrift(window_start: java.sql.Timestamp, n: Long,
      psi: Double, jsd: Double, drift: Boolean)

  /** Per-window category counts + window end for
    * [[streamingPsiDrift]]. */
  case class PsiDriftState(counts: Map[String, Long], windowEnd: Long)

  /** Streaming PSI drift monitor — the continuous form of
    * [[graft.ops.Profile.distributionDrift]]: each event-time window's
    * CATEGORY mix (language, event type, model-score bucket) scored
    * against a static reference with PSI and Jensen-Shannon divergence
    * — [[streamingKsDrift]] watches a numeric distribution's shape,
    * this watches a categorical mix, the other half of the standard
    * model-monitoring pair. State per window is the category→count map
    * (domain-bounded, tiny); the reference mix collects once at op
    * construction. On watermark timeout one [[PsiDrift]] row emits
    * with the batch face's EXACT term algebra (1e-6-clamped PSI terms,
    * clamp-free JSD terms, each quantized to 12 dp HALF_UP before an
    * order-free exact-decimal sum — the same quantization
    * `cast(decimal(38,12))` performs), so
    * [[graft.ops.Profile.distributionDrift]] on identical input
    * returns the identical psi/jsd — asserted by the parity spec.
    * `drift` flags psi ≥ `psiThreshold` (0.25 = the conventional
    * "major shift" line).
    */
  def streamingPsiDrift(events: DataFrame, keyCol: String, tsCol: String,
      reference: DataFrame, refKeyCol: String,
      windowLen: String = "1 day", watermark: String = "10 minutes",
      psiThreshold: Double = 0.25)(
      implicit spark: SparkSession): Dataset[PsiDrift] = {
    import spark.implicits._
    require(psiThreshold > 0, "psiThreshold must be > 0")
    val refCounts = reference
      .select(col(refKeyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    require(refCounts.nonEmpty, "streamingPsiDrift: empty reference")
    val totRef = refCounts.valuesIterator.sum
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    // the batch face's decimal(38,12) quantization, replayed exactly
    def q12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    events
      .withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowLen).as("__w"),
        col(keyCol).cast("string").as("__k"), col(tsCol).as("__ts"))
      .filter(col("__k").isNotNull)
      .select(col("__w.start").as("ws"), col("__w.end").as("we"),
        col("__k"), col("__ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, String,
        java.sql.Timestamp)]
      .groupByKey(_._1.getTime)
      .flatMapGroupsWithState[PsiDriftState, PsiDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long,
            rows: Iterator[(java.sql.Timestamp, java.sql.Timestamp,
              String, java.sql.Timestamp)],
            state: GroupState[PsiDriftState]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            val nLive = counts.valuesIterator.sum
            val keys = (refCounts.keySet ++ counts.keySet).toArray.sorted
            var psiAcc = java.math.BigDecimal.ZERO
            var jsdAcc = java.math.BigDecimal.ZERO
            keys.foreach { k =>
              val p = refCounts.getOrElse(k, 0L).toDouble / totRef.toDouble
              val q = counts.getOrElse(k, 0L).toDouble / nLive.toDouble
              val pc = math.max(p, 1e-6)
              val qc = math.max(q, 1e-6)
              val m = (p + q) / 2.0
              psiAcc = psiAcc.add(q12((pc - qc) * math.log(pc / qc)))
              jsdAcc = jsdAcc.add(q12(
                ((if (p > 0) p * math.log(p / m) else 0.0) +
                  (if (q > 0) q * math.log(q / m) else 0.0)) / 2.0))
            }
            val psi = psiAcc.doubleValue
            Iterator(PsiDrift(new java.sql.Timestamp(wsMs), nLive,
              r6(psi), r6(jsdAcc.doubleValue), psi >= psiThreshold))
          } else {
            val arr = rows.toSeq
            val old = state.getOption
              .map(_.counts).getOrElse(Map.empty[String, Long])
            val merged = arr.foldLeft(old) { case (m2, (_, _, k, _)) =>
              m2.updated(k, m2.getOrElse(k, 0L) + 1L)
            }
            val windowEnd = arr.head._2.getTime
            state.update(PsiDriftState(merged, windowEnd))
            state.setTimeoutTimestamp(
              math.max(windowEnd, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming conformal coverage monitor — the production follow-up
    * to [[graft.ops.Eval.splitConformal]]: the calibration set fixed
    * q̂ offline; this watches each event-time window's EMPIRICAL
    * coverage (share of |y − ŷ| ≤ q̂) and flags a breach when it
    * falls below 1−α — the distribution-free "your model's error
    * distribution moved" alarm (conformal validity rests on
    * exchangeability, so a coverage breach IS a drift detection).
    * A plain watermarked windowed aggregation — one row per closed
    * window (window_start, n, covered, coverage, breach), coverage
    * 6 dp, breach decided on the unrounded ratio.
    */
  def streamingConformalCoverage(events: DataFrame, predCol: String,
      actualCol: String, tsCol: String, qHat: Double, alpha: Double,
      windowLen: String = "1 day",
      watermark: String = "10 minutes"): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(qHat >= 0, "qHat must be nonnegative")
    val resid = abs(col(actualCol).cast("double") -
      col(predCol).cast("double"))
    events
      .withWatermark(tsCol, watermark)
      .filter(col(predCol).isNotNull && col(actualCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"),
        count(when(resid <= qHat, 1)).as("covered"))
      .select(col("window.start").as("window_start"), col("n"),
        col("covered"),
        round(col("covered").cast("double") / col("n").cast("double"), 6)
          .as("coverage"),
        (col("covered").cast("double") / col("n").cast("double") <
          lit(1.0 - alpha)).as("breach"))
  }

  /** WINDOWED streaming heavy hitters — the Misra-Gries sketch
    * aggregate ([[graft.functions.mg_sketch]], the SAME mergeable
    * aggregate the batch face q102 runs) inside a watermarked tumbling
    * window: the event-time, emit-once-per-closed-window complement of
    * the cumulative Update-mode [[streamingHeavyHitters]] below. State
    * per window is the k-entry sketch buffer, NOT the item counts, so
    * a window over any volume holds ≤ k map entries in the state
    * store. When the watermark closes a window one row per surviving
    * item emits with the published guarantee `est ≤ true ≤ est +
    * n/(k+1)` (max_err reported beside the estimate — the caller sees
    * the bound, not just a number). Returns (window_start, n, item,
    * est, max_err).
    */
  def streamingWindowedHeavyHitters(events: DataFrame, itemCol: String,
      tsCol: String, k: Int, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.mg_sketch(col(itemCol).cast("string"), k)
        .as("__sk"))
      .select(col("window.start").as("window_start"),
        col("__sk.n").as("n"), explode(col("__sk.counts")))
      .select(col("window_start"), col("n"), col("key").as("item"),
        col("value").as("est"),
        round(col("n").cast("double") / (k + 1), 6).as("max_err"))

  /** One experiment's running always-valid readout
    * ([[streamingMsprt]]); emitted once per micro-batch that touches
    * the key. */
  case class MsprtReading(key: String, n_a: Long, n_b: Long,
      diff: Option[Double], v: Option[Double], lambda: Option[Double],
      p_always: Option[Double], p_min: Double, significant: Boolean)

  /** Cumulative per-arm moments + the running min of the always-valid
    * p ([[streamingMsprt]]). Sums are exact decimals quantized to
    * 12 dp — order-free, so arrival order cannot move the readout. */
  case class MsprtState(na: Long, sya: java.math.BigDecimal,
      syya: java.math.BigDecimal, nb: Long, syb: java.math.BigDecimal,
      syyb: java.math.BigDecimal, pmin: Double)

  /** Streaming always-valid A/B monitor (mSPRT) — the peeking-safe
    * experiment dashboard: per experiment key the state holds ONLY the
    * cumulative per-arm moments (n, Σy, Σy² as exact 12-dp decimals),
    * and each micro-batch that touches the key emits one
    * [[MsprtReading]] with the mixture likelihood ratio and always-
    * valid p from [[graft.ops.Profile.msprtTest]]'s OWN algebra kernel
    * (one shared code path — the faces cannot drift; the parity spec
    * asserts equality against the batch test on the cumulative data).
    * `p_min` tracks the running minimum — the always-valid guarantee
    * is that flagging when p_min < α at ANY look holds the
    * false-positive rate at α, which repeated fixed-horizon tests do
    * not. Arms are the EXPLICIT `controlLabel`/`treatmentLabel`
    * (stable across batches — inferring labels per batch could swap
    * arms mid-experiment); other labels drop. State never expires (an
    * experiment's moments are its whole history — 7 small numbers per
    * key, stated).
    */
  def streamingMsprt(events: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, controlLabel: String, treatmentLabel: String,
      tau: Double, pThreshold: Double = 0.05)(
      implicit spark: SparkSession): Dataset[MsprtReading] = {
    import spark.implicits._
    require(tau > 0, "streamingMsprt: tau must be positive")
    require(pThreshold > 0 && pThreshold < 1, "pThreshold in (0,1)")
    require(controlLabel != treatmentLabel,
      "control and treatment labels must differ")
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val zero = java.math.BigDecimal.ZERO
    def q12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    events
      .select(col(keyCol).cast("string").as("k"),
        col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("y"))
      .filter(col("k").isNotNull && col("y").isNotNull &&
        col("g").isin(controlLabel, treatmentLabel))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MsprtState, MsprtReading](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String, Double)],
            state: GroupState[MsprtState]) =>
          val s0 = state.getOption
            .getOrElse(MsprtState(0L, zero, zero, 0L, zero, zero, 1.0))
          // exact decimal accumulation: each y quantizes to 12 dp (the
          // batch face's DECIMAL(38,12) cast) and adds exactly, so the
          // fold is commutative — partitioning cannot move the moments
          val s1 = rows.foldLeft(s0) { case (s, (_, g, y)) =>
            val yq = q12(y)
            val yyq = q12(y * y)
            if (g == controlLabel)
              s.copy(na = s.na + 1, sya = s.sya.add(yq),
                syya = s.syya.add(yyq))
            else
              s.copy(nb = s.nb + 1, syb = s.syb.add(yq),
                syyb = s.syyb.add(yyq))
          }
          if (s1.na >= 2 && s1.nb >= 2) {
            val (diff, v, lam, p) = graft.ops.Profile.msprtAlgebra(
              s1.na, s1.sya.doubleValue, s1.syya.doubleValue,
              s1.nb, s1.syb.doubleValue, s1.syyb.doubleValue, tau)
            val pR = p.map(r6)
            val pmin = pR.fold(s1.pmin)(x => math.min(s1.pmin, x))
            state.update(s1.copy(pmin = pmin))
            Iterator(MsprtReading(key, s1.na, s1.nb, Some(r6(diff)),
              v.map(r6), lam.map(r6), pR, pmin, pmin < pThreshold))
          } else {
            state.update(s1)
            Iterator(MsprtReading(key, s1.na, s1.nb, None, None, None,
              None, s1.pmin, false))
          }
      }
  }

  /** One experiment's running Bayesian readout
    * ([[streamingProbBest]]); emitted once per micro-batch that
    * touches the key. */
  case class ProbBestReading(key: String, n_a: Long, conv_a: Long,
      n_b: Long, conv_b: Long, prob_b_beats_a: Option[Double],
      exp_loss_a: Option[Double], exp_loss_b: Option[Double])

  /** Per-key cumulative arm counts ([[streamingProbBest]]) — four
    * longs, O(1) state regardless of stream length. */
  case class ProbBestState(na: Long, ca: Long, nb: Long, cb: Long)

  /** Streaming Bayesian A/B monitor — the continuous face of
    * [[graft.ops.Profile.probBest]]: per experiment key the state
    * holds ONLY the four cumulative arm counts, and each micro-batch
    * that touches the key emits one [[ProbBestReading]] with
    * P(p_b > p_a) and both expected losses from
    * [[graft.ops.Profile.probBestAlgebra]] — the batch operator's
    * exact grid arithmetic (the parity spec asserts bit-equality at
    * 6 dp against the batch face on the cumulative data). Expected
    * loss is the standard Bayesian stopping rule for CONTINUOUS
    * monitoring: ship when the chosen arm's loss drops below the
    * care-about threshold (it converges even for truly-equal arms,
    * where P(best) never resolves). Arms are the EXPLICIT
    * `labelA`/`labelB` (stable across batches); other labels drop,
    * as do rows with a null success (the batch face filters them
    * identically — the stated null contract of the pair); a key that
    * has seen only one arm reads null, and so does a key whose
    * posterior has outgrown the grid (the batch face's ≥ 3-cell
    * resolution rail — batch fails loudly there, but a continuous
    * monitor must not crash mid-run, so the stream reads null and the
    * caller switches to [[streamingMsprt]]). State never expires
    * (four longs per key, stated).
    */
  def streamingProbBest(events: DataFrame, keyCol: String,
      groupCol: String, successCol: String, labelA: String,
      labelB: String, gridN: Int = 4000)(
      implicit spark: SparkSession): Dataset[ProbBestReading] = {
    import spark.implicits._
    require(labelA != labelB,
      "streamingProbBest: arm labels must differ")
    events
      .select(col(keyCol).cast("string").as("k"),
        col(groupCol).cast("string").as("g"),
        col(successCol).cast("boolean").as("s"))
      .filter(col("k").isNotNull && col("s").isNotNull &&
        col("g").isin(labelA, labelB))
      .as[(String, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ProbBestState, ProbBestReading](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String, Boolean)],
            state: GroupState[ProbBestState]) =>
          val s0 = state.getOption
            .getOrElse(ProbBestState(0L, 0L, 0L, 0L))
          val s1 = rows.foldLeft(s0) { case (s, (_, g, ok)) =>
            val inc = if (ok) 1L else 0L
            if (g == labelA) s.copy(na = s.na + 1, ca = s.ca + inc)
            else s.copy(nb = s.nb + 1, cb = s.cb + inc)
          }
          state.update(s1)
          // the batch face's grid-resolution rail: once a posterior
          // outgrows the grid the stream reads null (a monitor must
          // not crash mid-run) — switch to streamingMsprt there
          val resolved = graft.ops.Profile.betaSd(s1.na, s1.ca) >=
            3.0 / gridN &&
            graft.ops.Profile.betaSd(s1.nb, s1.cb) >= 3.0 / gridN
          if (s1.na >= 1 && s1.nb >= 1 && resolved) {
            val (p, ela, elb) = graft.ops.Profile.probBestAlgebra(
              s1.na, s1.ca, s1.nb, s1.cb, gridN)
            Iterator(ProbBestReading(key, s1.na, s1.ca, s1.nb, s1.cb,
              Some(p), Some(ela), Some(elb)))
          } else {
            Iterator(ProbBestReading(key, s1.na, s1.ca, s1.nb, s1.cb,
              None, None, None))
          }
      }
  }

  /** One arm's running readout in a K-arm experiment
    * ([[streamingProbBestK]]); K rows emitted per micro-batch that
    * touches the key. */
  case class ProbBestKReading(key: String, arm: String, n: Long,
      conv: Long, prob_best: Option[Double], exp_loss: Option[Double])

  /** Per-key cumulative K-arm counts ([[streamingProbBestK]]) — 2K
    * longs, O(K) state regardless of stream length. */
  case class ProbBestKState(ns: Seq[Long], cs: Seq[Long])

  /** Streaming K-arm (A/B/n) Bayesian monitor — the continuous face
    * of [[graft.ops.Profile.probBestK]]: per experiment key the state
    * holds ONLY the 2K cumulative arm counts, and each micro-batch
    * that touches the key emits one [[ProbBestKReading]] PER ARM with
    * P(arm best) and its expected loss from
    * [[graft.ops.Profile.probBestKAlgebra]] — the batch operator's
    * exact grid arithmetic (the parity spec asserts bit-equality at
    * 6 dp against the batch face on the cumulative data). Arms are
    * the EXPLICIT `labels` (2..8, stable across batches); other
    * labels and null successes drop (the batch face's contract); a
    * key missing any arm reads null, as does a key whose posterior
    * has outgrown the grid (the batch face's ≥ 3-cell resolution
    * rail — a continuous monitor must not crash mid-run). State never
    * expires (2K longs per key, stated).
    */
  def streamingProbBestK(events: DataFrame, keyCol: String,
      groupCol: String, successCol: String, labels: Seq[String],
      gridN: Int = 4000)(
      implicit spark: SparkSession): Dataset[ProbBestKReading] = {
    import spark.implicits._
    require(labels.size >= 2 && labels.size <= 8,
      "streamingProbBestK: need 2..8 arm labels")
    require(labels.distinct.size == labels.size,
      "streamingProbBestK: arm labels must be distinct")
    val kk = labels.size
    val idx = labels.zipWithIndex.toMap
    events
      .select(col(keyCol).cast("string").as("k"),
        col(groupCol).cast("string").as("g"),
        col(successCol).cast("boolean").as("s"))
      .filter(col("k").isNotNull && col("s").isNotNull &&
        col("g").isin(labels.map(x => x: Any): _*))
      .as[(String, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ProbBestKState, ProbBestKReading](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String, Boolean)],
            state: GroupState[ProbBestKState]) =>
          val s0 = state.getOption.getOrElse(ProbBestKState(
            Seq.fill(kk)(0L), Seq.fill(kk)(0L)))
          val ns = s0.ns.toArray
          val cs = s0.cs.toArray
          rows.foreach { case (_, g, ok) =>
            val i = idx(g)
            ns(i) += 1L
            if (ok) cs(i) += 1L
          }
          val s1 = ProbBestKState(ns.toSeq, cs.toSeq)
          state.update(s1)
          val resolved = (0 until kk).forall(i => ns(i) >= 1L &&
            graft.ops.Profile.betaSd(ns(i), cs(i)) >= 3.0 / gridN)
          if (resolved) {
            val out = graft.ops.Profile.probBestKAlgebra(
              (0 until kk).map(i => (ns(i), cs(i))), gridN)
            (0 until kk).iterator.map(i =>
              ProbBestKReading(key, labels(i), ns(i), cs(i),
                Some(out(i)._1), Some(out(i)._2)))
          } else {
            (0 until kk).iterator.map(i =>
              ProbBestKReading(key, labels(i), ns(i), cs(i), None, None))
          }
      }
  }

  /** Streaming exact dedup with watermark-bounded state: each key's
    * fingerprint lives in the state store only until the watermark passes
    * it (`dropDuplicatesWithinWatermark`), so state stays proportional to
    * the watermark window, not the stream's lifetime — the streaming form
    * of `Dedup.exactKeepFirst` for continuous ingest pipelines.
    */
  def streamingDedup(rows: DataFrame, keys: Seq[String], tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming Kneser-Ney quality scoring: per-arriving-doc interpolated
    * order-n KN NLL against a STATIC reference-trained model — the
    * continuous form of [[graft.ops.Retrieval.knNgramNllAgainst]]
    * (CCNet's filter applied on ingest instead of in batch). Model
    * construction, gram extraction, and the recursive-backoff
    * probability are THE batch face's own
    * [[graft.ops.Retrieval.knModel]]/`knScoreJoin` (one shared kernel —
    * the smoothing cannot drift between faces, at any order); the
    * model frames pin once at op construction (the stream-static rule:
    * an unpinned static side re-derives the whole reference per
    * micro-batch) and scoring aggregates per (doc, event-time) with
    * watermark-bounded state in append mode. Docs with < order tokens
    * carry no gram and emit no row (the batch face's contract).
    * Output columns: (doc_id, tsCol, n_ngrams, n_unseen, nll) —
    * renamed from round 11's bigram-only `n_bigrams`.
    */
  def streamingKnScore(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, ref: DataFrame, refTextCol: String,
      discount: Double = 0.75, watermark: String = "10 minutes",
      order: Int = 2): DataFrame =
    streamingKnScoreWith(docs, idCol, textCol, tsCol,
      graft.ops.Retrieval.knModel(ref, refTextCol, order),
      discount, watermark)

  /** Score the stream against an ALREADY-BUILT [[graft.ops.Retrieval.KnModel]]
    * — pair with `Retrieval.loadKnModel` so a stream (re)start never
    * repays the reference pass (the persisted train-once model serving
    * continuous ingest; parquet-backed frames need no re-pin and the
    * stream-static joins read them as any static side).
    */
  /** `modified = true` scores with the Chen-Goodman count-class
    * discounts ([[graft.ops.Retrieval.knNgramNllModAgainstModel]]'s
    * streaming twin — same shared kernel, so batch and streaming
    * modified scoring cannot drift either). */
  def streamingKnScoreWith(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, m: graft.ops.Retrieval.KnModel,
      discount: Double = 0.75, watermark: String = "10 minutes",
      modified: Boolean = false): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    val grams = graft.ops.Retrieval.ngramPairs(
      docs.withWatermark(tsCol, watermark)
        .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
          col(textCol)),
      Seq("doc_id", "__ts"), textCol, m.order)
    graft.ops.Retrieval.knScoreJoin(grams, m, discount, modified)
      .groupBy(col("doc_id"), col("__ts"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_unseen"),
        round(-sum(log(col("__p"))) / count(lit(1)), 6).as("nll"))
      .select(col("doc_id"), col("__ts").as(tsCol), col("n_ngrams"),
        col("n_unseen"), col("nll"))
  }

  /** Streaming decontamination flags: documents arriving on the stream
    * that share at least one word n-gram with a STATIC benchmark table —
    * the continuous-ingest form of [[graft.ops.Decontamination]];
    * `dropDuplicatesWithinWatermark` collapses a doc's multiple matching
    * grams to one flagged row with watermark-bounded state.
    *
    * Same two-path design as [[streamingDedupAgainstReference]] (the
    * static side of a stream-static join re-executes EVERY micro-batch):
    * a benchmark gram set that fits the driver is collected once,
    * sorted, broadcast, and probed with the codegen'd binary search
    * above the gram explode — map-only batches, no static side at all;
    * an over-size benchmark falls back to the left-semi join against the
    * gram set pinned ONCE at op construction (the old shape re-ran the
    * distinct + broadcast build per batch).
    *
    * `benchGrams` must carry a `g` column of 64-bit gram hashes
    * ([[graft.functions.word_shingle_hashes]] over the benchmark text).
    */
  def streamingContaminated(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, benchGrams: DataFrame, n: Int = 8,
      watermark: String = "10 minutes",
      maxDriverBenchGrams: Long = 8L << 20): DataFrame = {
    val toks = graft.ops.TextAnalysis.tokens(col(textCol))
    val bench = benchGrams.select(col("g")).distinct().localCheckpoint(true)
    val benchRows = bench.count()
    val banded = docs.withWatermark(tsCol, watermark)
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) >= n)
      .withColumn("g", explode(
        graft.functions.word_shingle_hashes(col("__toks"), n)))
    val flagged =
      if (benchRows <= maxDriverBenchGrams) {
        val set = bench.collect().map(_.getLong(0))
        bench.unpersist()
        java.util.Arrays.sort(set)
        val bc = docs.sparkSession.sparkContext.broadcast(set)
        banded.filter(graft.functions.in_sorted_longs(col("g"), bc))
      } else {
        // size-conditional broadcast (never forced — the round-6 bloom
        // lesson): ~16 B/row of long + hash overhead vs the session
        // threshold; past it the join degrades to a shuffled semi-join
        val threshold = try {
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            docs.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
        } catch { case _: NumberFormatException => -1L }
        val benchJoin =
          if (threshold > 0 && benchRows * 16L <= threshold) broadcast(bench) else bench
        banded.join(benchJoin, Seq("g"), "left_semi")
      }
    flagged
      .drop("__toks", "g")
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** Streaming incremental dedup against a PERSISTED reference index:
    * each arriving doc is minhashed/banded with the batch kernels and
    * semi-joined against the reference corpus's (band, bkey) frame
    * ([[graft.ops.Dedup.lshBands]], computed once and stored) — emitted
    * rows are CANDIDATE near-dups of the reference, deduplicated per doc
    * with watermark-bounded state; downstream exact verification (the
    * batch jaccard join over candidate ids) stays idempotent. The
    * streaming face of [[graft.ops.Dedup.minhashPairsAgainst]]: the
    * stream never joins itself, the reference never recomputes.
    */
  def streamingDedupAgainstReference(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, refBands: DataFrame,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      watermark: String = "10 minutes",
      maxDriverRefBuckets: Long = 8L << 20): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val toks = graft.ops.TextAnalysis.tokens(col(textCol))
    val sig = graft.functions.minhash_sig(
      graft.functions.word_shingle_hashes(toks, shingle), numPerm)
    // pinned at op construction: stream-static joins re-execute the
    // static plan per micro-batch, so an un-checkpointed refBands would
    // re-tokenize/minhash the whole reference corpus on every batch —
    // the checkpoint makes the "computed once" contract real
    val ref = refBands.select(col("band"), col("bkey")).distinct()
      .localCheckpoint(true)
    val refRows = ref.count()
    if (refRows <= maxDriverRefBuckets) {
      // Reference bucket set fits the driver (8 B/key — 64 MB at the 8M
      // default): collect it ONCE as a sorted packed-long array, ship it
      // via a real broadcast, and probe each exploded band key with a
      // codegen'd binary search. The micro-batch plan is then MAP-ONLY —
      // no static side at all, no per-batch shuffle/sort of the
      // reference (the checkpointed ref carries no size stats and AQE
      // does not apply to stateful streaming queries, so past the
      // broadcast threshold the planner re-sorted the full reference
      // EVERY batch). Exactly equivalent to the semi-join: distinct
      // keys, no false positives; the dedup-within-watermark collapses
      // multi-band matches identically. The probe sits ABOVE the same
      // posexplode as the join path — see
      // [[graft.functions.InSortedLongs]] for why the explode barrier
      // and the broadcast are both load-bearing for throughput.
      val packedSet = ref.select(
          shiftleft(col("band").cast("long"), 32)
            .bitwiseOR(col("bkey").cast("long").bitwiseAND(lit(0xFFFFFFFFL)))
            .as("p"))
        .collect().map(_.getLong(0))
      ref.unpersist()
      java.util.Arrays.sort(packedSet)
      val packedBc = docs.sparkSession.sparkContext.broadcast(packedSet)
      docs.withWatermark(tsCol, watermark)
        .withColumn("__sig", sig)
        .select(col("*"), posexplode(array((0 until bands).map(b =>
          hash(slice(col("__sig"), b * rows + 1, rows), lit(b))): _*))
          .as(Seq("band", "bkey")))
        .filter(graft.functions.in_sorted_longs(
          shiftleft(col("band").cast("long"), 32)
            .bitwiseOR(col("bkey").cast("long").bitwiseAND(lit(0xFFFFFFFFL))),
          packedBc))
        .drop("__sig", "band", "bkey")
        .dropDuplicatesWithinWatermark(idCol)
    } else {
      // Reference too large for the driver: stream-static left-semi join
      // on the band keys, with a SIZE-CONDITIONAL broadcast decided once
      // at op construction (~32 B/row of (int, long) + hash-map overhead
      // vs the session threshold, parsed through JavaUtils so byte-string
      // values like "100m" work; "-1" = disabled fails the parse and
      // lands on -1, correctly suppressing the hint). Past the broadcast
      // limit the join degrades to a shuffled semi-join instead of
      // failing — the 100 TB-reference fallback.
      val threshold = try {
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          docs.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
      } catch { case _: NumberFormatException => -1L }
      val refJoin = if (threshold > 0 && refRows * 32L <= threshold) broadcast(ref) else ref
      docs.withWatermark(tsCol, watermark)
        .withColumn("__sig", sig)
        .select(col("*"), posexplode(array((0 until bands).map(b =>
          hash(slice(col("__sig"), b * rows + 1, rows), lit(b))): _*))
          .as(Seq("band", "bkey")))
        .join(refJoin, Seq("band", "bkey"), "left_semi")
        .drop("__sig", "band", "bkey")
        .dropDuplicatesWithinWatermark(idCol)
    }
  }

  /** Stream-stream interval join: each left event matched to right events
    * on the same key with `rightTs` in [leftTs - lowerMs, leftTs +
    * upperMs]. Both sides are watermarked, so the state store retains
    * only the interval's worth of rows per side — the bounded-state form
    * of the as-of/range join for live pipelines (Spark drops a side's
    * buffered rows once the other side's watermark passes the interval
    * bound).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerMs: Long, upperMs: Long,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperMs MILLISECONDS"))
  }

  /** One (doc, LSH band) bucket assignment on the stream. */
  case class BandedDoc(id: Long, ts: java.sql.Timestamp, band: Int, bkey: Int)

  /** A near-dup candidate pair surfaced by the streaming bucket store. */
  case class NearDupCandidate(id_a: Long, id_b: Long, band: Int)

  case class BucketState(rep: Long)

  /** Streaming MinHash-LSH dedup-on-arrival: the continuous form of
    * [[graft.ops.Dedup.minhashPairs]]. Each arriving document is
    * minhashed and banded with the SAME codegen'd kernels as the batch
    * path; each (band, bucket-key) group keeps one small state record —
    * the first document id that landed in the bucket (its
    * representative). Every later arrival in that bucket emits a
    * candidate pair against the representative, which links transitive
    * chains exactly like the batch path's CC stage (newcomers all pair
    * with the same rep).
    *
    * Scale shape: state is ONE long per occupied bucket regardless of
    * how many docs hashed into it, and buckets expire once the WATERMARK
    * passes their last arrival by `ttlMs` (event-time timeout — the same
    * bounded-state device as [[streamingDedup]]'s watermark window; a
    * processing-time timeout would force the engine to spin empty
    * micro-batches just to expire state). Candidates are emitted
    * at-least-once (a doc colliding in several bands emits per band;
    * re-deliveries after recovery possible) — downstream exact
    * verification (the batch jaccard check over candidate ids) is
    * idempotent, so at-least-once is the right contract.
    */
  def streamingNearDupCandidates(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String, shingle: Int = 3, numPerm: Int = 128,
      bands: Int = 32, watermark: String = "10 minutes",
      ttlMs: Long = 3600000L)(
      implicit spark: SparkSession): Dataset[NearDupCandidate] = {
    import spark.implicits._
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val toks = graft.ops.TextAnalysis.tokens(col(textCol))
    val sig = graft.functions.minhash_sig(
      graft.functions.word_shingle_hashes(toks, shingle), numPerm)
    val banded = docs
      .withWatermark(tsCol, watermark)
      // NB: no cast on the ts column — a cast strips the watermark tag
      // the EventTimeTimeout check looks for (alias alone preserves it)
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"), sig.as("sig"))
      .select(col("id"), col("ts"), posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * rows + 1, rows), lit(b))): _*))
        .as(Seq("band", "bkey")))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band, d.bkey))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), arrivals, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within a batch: the smallest id seeds a
            // fresh bucket and the rest pair against it
            val rows = arrivals.toSeq
            val ids = rows.map(_.id).distinct.sorted
            val rep = state.getOption.map(_.rep).getOrElse(ids.head)
            if (!state.exists) state.update(BucketState(rep))
            val lastTs = rows.map(_.ts.getTime).max
            // a timeout at or before the current watermark throws; late
            // arrivals inside the allowed lateness clamp to watermark+1
            state.setTimeoutTimestamp(
              math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            ids.filterNot(_ == rep).map(o =>
              NearDupCandidate(math.min(rep, o), math.max(rep, o), band))
              .iterator
          }
      }
  }

  /** A heavy-hitter snapshot row: MG estimate for `item` within
    * `group` after `n` observed items.
    */
  case class HeavyHitterRow(group: String, item: String, est: Long, n: Long)
  case class MgState(n: Long, counts: Map[String, Long])

  /** Streaming heavy hitters per group: a Misra-Gries summary lives in
    * the state store per group key and each micro-batch emits the
    * group's refreshed top-`emitTop` estimates (Update mode). State is
    * BOUNDED BY CONSTRUCTION — k counters per group regardless of item
    * cardinality or stream length, vs an exact streaming count whose
    * state grows with the vocabulary. Same deterministic
    * `true - n/(k+1) <= est <= true` guarantee as the batch
    * `mg_sketch` (the state op folds arrivals through the identical
    * `MisraGriesSketch.offer` step), so batch and streaming answers
    * are mutually consistent.
    */
  def streamingHeavyHitters(rows: DataFrame, groupCol: String,
      itemCol: String, k: Int, emitTop: Int = 10)(
      implicit spark: SparkSession): Dataset[HeavyHitterRow] = {
    import spark.implicits._
    rows
      .select(col(groupCol).cast("string").as("_1"),
        col(itemCol).cast("string").as("_2"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, HeavyHitterRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, arrivals: Iterator[(String, String)],
            state: GroupState[MgState]) =>
          val buf = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.counts.foreach { case (w, c) =>
            buf.update(w, c) })
          var n = state.getOption.map(_.n).getOrElse(0L)
          arrivals.foreach { case (_, w) =>
            graft.functions.MisraGriesSketch.offer(buf, k, w); n += 1
          }
          state.update(MgState(n, buf.toMap))
          buf.toSeq.sortBy { case (w, c) => (-c, w) }.take(emitTop)
            .map { case (w, c) => HeavyHitterRow(g, w, c, n) }.iterator
      }
  }

  case class QuantileRow(group: String, q: Double, est: Double, n: Long)
  case class KllState(n: Long, compactions: Long, levels: Seq[Seq[Double]])

  /** Streaming per-group quantiles: a [[graft.functions.KllSketch]]
    * tower lives in the state store per group and each micro-batch emits
    * refreshed estimates at the requested quantiles — the streaming
    * face of the q112 aggregate ("rolling p99 latency per event type"),
    * same kernel, same O(n/k) rank bound. State per group is the
    * summary (O(k log n) doubles), never the values — bounded for
    * unbounded streams, exactly like the MG heavy-hitters state above.
    */
  def streamingQuantiles(rows: DataFrame, groupCol: String,
      valueCol: String, k: Int, qs: Seq[Double])(
      implicit spark: SparkSession): Dataset[QuantileRow] = {
    import spark.implicits._
    require(qs.nonEmpty, "streamingQuantiles: need at least one quantile")
    rows
      .select(col(groupCol).cast("string").as("_1"),
        col(valueCol).cast("double").as("_2"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KllState, QuantileRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, arrivals: Iterator[(String, Double)],
            state: GroupState[KllState]) =>
          val buf = state.getOption match {
            case Some(s) => new graft.functions.KllSketch.Buffer(
              s.n, s.compactions,
              scala.collection.mutable.ArrayBuffer(
                s.levels.map(l =>
                  scala.collection.mutable.ArrayBuffer(l: _*)): _*))
            case None => graft.functions.KllSketch.Buffer.empty()
          }
          arrivals.foreach { case (_, v) =>
            buf.levels(0) += v
            buf.n += 1
            graft.functions.KllSketch.compressIfNeeded(buf, k)
          }
          state.update(KllState(buf.n, buf.compactions,
            buf.levels.map(_.toSeq).toSeq))
          // summary -> sorted (item, weight) walk, same as the kernel
          val pairs = buf.levels.zipWithIndex.flatMap { case (l, lev) =>
            l.map(v => (v, 1L << lev)) }.sortBy(_._1)
          val total = buf.n
          qs.map { q =>
            val target = math.max(1L, math.ceil(q * total).toLong)
            var cum = 0L
            var i = 0
            var est = if (pairs.nonEmpty) pairs.last._1 else Double.NaN
            var found = false
            while (i < pairs.size && !found) {
              cum += pairs(i)._2
              if (cum >= target) { est = pairs(i)._1; found = true }
              i += 1
            }
            QuantileRow(g, q, est, total)
          }.iterator
      }
  }

  case class DistinctRow(group: String, estimate: Double, exact: Boolean,
      n: Long)
  case class ThetaStreamState(n: Long, hashes: Seq[Long])

  /** Streaming per-group distinct counts: a [[graft.functions.ThetaSketch]]
    * KMV sample lives in the state store per group; each micro-batch
    * emits the refreshed estimate ("distinct users per event type, live")
    * with an `exact` flag while the group is still below capacity. Same
    * hash chain as the batch aggregate, so batch and streaming agree on
    * identical input. State per group is at most k longs — bounded for
    * unbounded streams, like the MG and KLL faces above.
    */
  def streamingDistinct(rows: DataFrame, groupCol: String,
      itemCol: String, k: Int)(
      implicit spark: SparkSession): Dataset[DistinctRow] = {
    import spark.implicits._
    rows
      .select(col(groupCol).cast("string").as("_1"),
        col(itemCol).cast("string").as("_2"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ThetaStreamState, DistinctRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, arrivals: Iterator[(String, String)],
            state: GroupState[ThetaStreamState]) =>
          val buf = new graft.functions.ThetaSketch.Buffer(
            new java.util.TreeSet[java.lang.Long]())
          state.getOption.foreach(_.hashes.foreach(h => buf.set.add(h)))
          var n = state.getOption.map(_.n).getOrElse(0L)
          arrivals.foreach { case (_, w) =>
            val h = graft.functions.ThetaKernel.toSpace(
              graft.functions.Hash64.mix(graft.functions.Hash64.fnv64(
                org.apache.spark.unsafe.types.UTF8String.fromString(w))))
            buf.offer(h, k)
            n += 1
          }
          val hashes = {
            val arr = new Array[Long](buf.set.size)
            val it = buf.set.iterator()
            var i = 0
            while (it.hasNext) { arr(i) = it.next(); i += 1 }
            arr
          }
          state.update(ThetaStreamState(n, hashes.toSeq))
          Iterator(DistinctRow(g,
            graft.functions.ThetaKernel.estimate(hashes, k),
            hashes.length < k, n))
      }
  }

  /** Stream-static range join: tag each streaming point row with the
    * static intervals containing it — [[graft.ops.RangeJoin]]'s binned
    * decomposition on a stream (enrichment against maintenance windows,
    * campaign periods, rate-limit windows...). The static side explodes
    * to its bin cover ONCE per micro-batch plan and rides a broadcast
    * when it fits (stream-static equi-joins never shuffle the stream
    * side's state); the stream side is map-only (one bin column), so
    * this adds NO streaming state at all — unmatched points drop (inner)
    * as in the batch operator, and each qualifying (interval, point)
    * pair emits exactly once for the same reason (a point owns one bin).
    */
  def streamingPointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame =
    // the batch operator IS the streaming plan: the explode touches only
    // the static interval side, the stream side gains one map-only bin
    // column, and an inner stream-static equi-join is stateless
    graft.ops.RangeJoin.pointInInterval(points, pointCol,
      intervals, startCol, endCol, binWidth)

  /** Stream-static interval-OVERLAP join — the overlap face of the
    * binned range-join decomposition (the streaming counterpart of
    * [[graft.ops.RangeJoin.intervalOverlap]], q109): each streaming
    * interval row (an in-flight session, an active maintenance window)
    * joins to every static interval it overlaps. Same stateless shape
    * as [[streamingPointInInterval]]: the stream side's bin-cover
    * explode is a per-row generator (no state), the static side's
    * cover is computed once per micro-batch plan, and the inner
    * stream-static equi-join keeps NO streaming state. The
    * emit-at-`max(starts)`-bin guard from the batch operator carries
    * over unchanged, so each overlapping pair appears exactly once per
    * micro-batch — the whole correctness argument is the batch one.
    */
  def streamingIntervalOverlap(stream: DataFrame, sStart: String, sEnd: String,
      staticIv: DataFrame, tStart: String, tEnd: String,
      binWidth: Long): DataFrame =
    graft.ops.RangeJoin.intervalOverlap(stream, sStart, sEnd,
      staticIv, tStart, tEnd, binWidth)

  /** Streaming daily active users — the continuous form of
    * [[graft.ops.Events.rollingActiveUsers]]'s `dau` column. EXACT
    * distinct without a distinct aggregate (unsupported on streams):
    * the first aggregation collapses the log to one row per
    * (day-window, user) — the same per-user collapse the batch face's
    * `distinct()` does — and the second counts rows per window. Chained
    * windowed aggregations are the canonical multiple-stateful-operator
    * shape (append mode, both watermark-evicted); the inner re-window
    * over `window_time` (window end − 1µs) maps each day window to
    * itself, which is how the second agg inherits event time. A day
    * emits once its watermark passes — late events beyond the watermark
    * drop, the bounded-state trade every face here makes. Returns
    * (day, dau).
    */
  def streamingDau(events: DataFrame, userCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day"), col(userCol).as("__u"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(window(window_time(col("window")), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(to_date(col("window.start")).as("day"), col("dau"))

  /** Streaming rolling active users (DAU's windowed sibling — WAU/MAU at
    * `windowDays` = 7/30): exact distinct users over the trailing
    * `windowDays` window, one row per day. Same chained-aggregation
    * device as [[streamingDau]] with a SLIDING first window: each
    * (user, activity) lands in the `windowDays` sliding windows that
    * cover it (the streaming form of the batch face's
    * `explode(sequence(day, day+w−1))`), the first agg collapses to one
    * row per (window, user), the second counts users per window. The
    * reported `day` is the window's last covered day (window.end − 1),
    * matching [[graft.ops.Events.rollingActiveUsers]]'s trailing
    * convention row for row; the stream also emits the windows that
    * extend past the batch spine's last day (they close later, as their
    * watermark passes — the batch face truncates its spine instead).
    * Returns (day, rolling_active).
    */
  def streamingRollingActive(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int,
      watermark: String = "10 minutes"): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$windowDays days", "1 day"),
        col(userCol).as("__u"))
      .agg(count(lit(1)).as("__n"))
      // window_time = end − 1µs; the 1-day re-window containing it is
      // [end−1day, end), distinct per sliding window (1-day slide), so
      // this is a bijective re-key that carries the event-time tag
      .groupBy(window(window_time(col("window")), "1 day"))
      .agg(count(lit(1)).as("rolling_active"))
      .select(to_date(col("window.start")).as("day"), col("rolling_active"))
  }

  /** One user's finalized contribution to the retention matrix
    * ([[streamingRetention]]): the user belongs to `cohort_week` (their
    * first active week) and was active `week_offset` weeks later. */
  case class RetentionMark(user_id: Long, cohort_week: java.sql.Timestamp,
      week_offset: Int)

  case class RetentionState(weeks: Seq[Long], lastTs: Long)

  /** Streaming cohort retention — the continuous form of
    * [[graft.ops.Events.cohortRetention]]: per-user state accumulates
    * the DISTINCT active weeks (the week column is computed in-plan
    * with the batch face's own `date_trunc("week", ts)`, so the two
    * faces cannot disagree on week boundaries); when the user goes
    * quiet for `ttlMs` of event time, one [[RetentionMark]] emits per
    * active week against the user's earliest week as cohort — emitted
    * AT EXPIRY because retention is anchored on the cohort week and a
    * late-but-in-watermark earlier event may still move it (the same
    * out-of-order argument as [[streamingFunnel]]). The retention
    * matrix (n_users, cohort_size, retention) is then one batch
    * groupBy over the emitted marks — cohort-relative percentages need
    * every user's mark, so the matrix is the sink-side readout, the
    * marks are the stream's exactly-once-per-user increments.
    *
    * State per user is its distinct-week set (weeks inside one TTL
    * window — dozens, not event-sized) and expiry removes it.
    */
  def streamingRetention(events: DataFrame, userCol: String, tsCol: String,
      ttlMs: Long, watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[RetentionMark] = {
    import spark.implicits._
    require(ttlMs > 0, "streamingRetention: ttlMs must be positive")
    val weekMs = 7L * 24 * 3600 * 1000
    events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("user"), col(tsCol).as("ts"),
        date_trunc("week", col(tsCol)).cast("timestamp").as("wk"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionMark](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long,
            rows: Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp)],
            state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) {
            val weeks = state.get.weeks.sorted
            state.remove()
            val cohort = weeks.head
            weeks.iterator.map(w => RetentionMark(uid,
              new java.sql.Timestamp(cohort),
              ((w - cohort) / weekMs).toInt))
          } else {
            val arr = rows.toSeq
            val merged = (state.getOption.map(_.weeks).getOrElse(Seq.empty)
              ++ arr.map(_._3.getTime)).distinct
            // the quiet-period clock runs from the LATEST event seen so
            // far, not this batch's max — a late-but-in-watermark event
            // must never shorten an already-set timeout (double-emit)
            val lastTs = math.max(arr.map(_._2.getTime).max,
              state.getOption.map(_.lastTs).getOrElse(Long.MinValue))
            state.update(RetentionState(merged, lastTs))
            state.setTimeoutTimestamp(
              math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** A user's finalized funnel progress ([[streamingFunnel]]):
    * `reached` = number of consecutive steps completed under the greedy
    * earliest-completion rule, `step_ts` = their epoch-millis times. */
  case class FunnelUser(user_id: Long, reached: Int, step_ts: Seq[Long])

  case class FunnelProgressState(times: Seq[Seq[Long]], lastTs: Long)

  /** Streaming funnel — the continuous form of
    * [[graft.ops.Events.funnelTimes]] (q166's per-user stage), the
    * sessionization pattern: per-user state accumulates each funnel
    * step's event times; when the user goes quiet for `ttlMs` of EVENT
    * time (event-time timeout — the watermark must pass last event +
    * ttl), the greedy earliest-completion chain is computed from state
    * (t₀ = min step-0 time, t_k = min step-k time STRICTLY after
    * t_{k−1} — the batch kernel's exact rule) and the user's funnel row
    * emits once. Aggregate step counts are then one batch groupBy over
    * the emitted frame — counting `reached >= k` reproduces the batch
    * readout's n_users per step.
    *
    * Chain recomputation needs each step's full time list (a
    * late-arriving earlier step-(k−1) event moves step k's threshold,
    * so no single-value summary is sufficient); state is therefore all
    * in-TTL funnel-step events of ACTIVE users — events off the step
    * list are filtered before the state op and same-(step, ts)
    * duplicates collapse, so per-user state is bounded by the user's
    * distinct funnel activity inside one TTL window, and expiry removes
    * it. Emission is exactly-once per (user, quiet period); a user
    * returning after expiry starts a fresh funnel (the sessionize
    * convention).
    */
  def streamingFunnel(events: Dataset[EventRow], steps: Seq[String],
      ttlMs: Long, watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[FunnelUser] = {
    import spark.implicits._
    require(steps.size >= 2, "funnel: need at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    require(ttlMs > 0, "funnel: ttlMs must be positive")
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    events
      .toDF()
      .withWatermark("ts", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgressState, FunnelUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
            state: GroupState[FunnelProgressState]) =>
          if (state.hasTimedOut) {
            val times = state.get.times
            state.remove()
            // greedy earliest-completion chain, the batch rule: t_k =
            // min time of step k strictly after t_{k-1}
            val chain = scala.collection.mutable.ArrayBuffer.empty[Long]
            var prev = Long.MinValue
            var k = 0
            var stop = false
            while (k < nSteps && !stop) {
              val nxt = times(k).filter(t =>
                if (k == 0) true else t > prev)
              if (nxt.isEmpty) stop = true
              else { prev = nxt.min; chain += prev; k += 1 }
            }
            Iterator(FunnelUser(userId, chain.size, chain.toSeq))
          } else {
            val arrivals = rows.toSeq
            val old = state.getOption
              .map(_.times).getOrElse(Seq.fill(nSteps)(Seq.empty[Long]))
            val merged = old.zipWithIndex.map { case (ts0, k) =>
              (ts0 ++ arrivals.collect {
                case (_, t, e) if stepIdx(e) == k => t.getTime
              }).distinct
            }
            // quiet-period clock from the LATEST event overall (state ∨
            // batch), never this batch alone — see streamingRetention
            val lastTs = math.max(arrivals.map(_._2.getTime).max,
              state.getOption.map(_.lastTs).getOrElse(Long.MinValue))
            state.update(FunnelProgressState(merged, lastTs))
            state.setTimeoutTimestamp(
              math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Session windows via flatMapGroupsWithState: a session closes after
    * `gapMs` of inactivity (event-time timeout). State per user is one
    * small struct; the timeout bounds its lifetime — the pattern scales to
    * any number of keys because state lives in the state store, not the
    * heap.
    */
  def sessionize(events: Dataset[EventRow], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // never set a timeout at/behind the watermark — allowed-late
              // events (within the watermark delay) would otherwise crash
              // the query with "timeout cannot be earlier than watermark"
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
