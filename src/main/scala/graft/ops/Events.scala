package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an append-only (user, type, ts) log — the
  * product-analytics faces (ordered funnels, cohort retention) every
  * warehouse bolts onto its event table. Both are single-key-shuffle
  * plans: the event log is hashed by user once and everything else is
  * window/aggregate algebra on top of that one exchange.
  */
object Events {

  /** Ordered-funnel analysis: for each user, step k counts as completed
    * only if an event of the step's type occurred STRICTLY AFTER the
    * user's earliest completion time of step k-1 (earliest-completion
    * semantics — the standard product-analytics funnel, not mere set
    * membership). Returns one row per step:
    * (step, event_type, n_users, pct_of_first, pct_of_prev).
    *
    * Shape for the 100 TB event log: one hash exchange on the user key;
    * the per-step earliest-completion times are a chain of
    * unbounded-frame window MINs over that same partitioning (length =
    * |steps|, a plan-time constant — no re-shuffle between them), the
    * per-user collapse reuses the partitioning again, and the final
    * count is a single all-up aggregate of user-rows. Nothing wider
    * than (user, |steps| timestamps) ever shuffles.
    *
    * pct_of_first / pct_of_prev are rounded to 6 dp; a zero denominator
    * (empty funnel head / broken chain) yields 0.0, never null, so
    * downstream dashboards and the DuckDB oracle agree on every row.
    */
  /** Per-user earliest-completion times for each funnel step: one row
    * per user with columns `__t0 .. __t(k-1)` (null from the first
    * uncompleted step on). The shared first half of [[funnel]] and
    * [[funnelLatencies]] — one user-key exchange, a chain of
    * unbounded-frame window MINs over it, one per-user collapse.
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      withinMillis: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "funnel: need at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    withinMillis.foreach(ms =>
      require(ms > 0, "funnel: withinMillis must be positive"))
    val w = Window.partitionBy(col(userCol))
    // chain of earliest-completion times: t1 = min ts of step 1,
    // t_k = min ts of step k with ts > t_{k-1} (and, with a window
    // constraint, ts <= t_{k-1} + within — the standard greedy
    // earliest-completion-with-window funnel, not an NFA-complete
    // match: a user whose only in-window step-k event follows a LATER
    // step-(k-1) completion does not count, by the same convention
    // product-analytics funnels use)
    def gate(i: Int): Column = withinMillis match {
      case None => lit(true)
      case Some(ms) => unix_millis(col(tsCol).cast("timestamp")) <=
        unix_millis(col(s"__t${i - 1}").cast("timestamp")) + ms
    }
    val withTimes = steps.zipWithIndex.foldLeft(
        events.select(col(userCol), col(typeCol), col(tsCol))) {
      case (df, (step, 0)) =>
        df.withColumn("__t0",
          min(when(col(typeCol) === step, col(tsCol))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"__t$i",
          min(when(col(typeCol) === step &&
            col(tsCol) > col(s"__t${i - 1}") && gate(i),
            col(tsCol))).over(w))
    }
    // per-user collapse (constant per partition key → min is exact)
    withTimes
      .groupBy(col(userCol))
      .agg(min(col("__t0")).as("__t0"),
        steps.indices.tail.map(i => min(col(s"__t$i")).as(s"__t$i")): _*)
  }

  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame =
    funnelReadout(funnelTimes(events, userCol, typeCol, tsCol, steps), steps)

  /** [[funnel]] with a per-transition completion window: step k counts
    * only if it happens within `withinMillis` of the user's earliest
    * step-(k−1) completion ("purchased within 24 h of clicking") —
    * the greedy earliest-completion-with-window convention (see
    * [[funnelTimes]]). Same readout columns as [[funnel]].
    */
  def funnelWithin(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], withinMillis: Long): DataFrame =
    funnelReadout(
      funnelTimes(events, userCol, typeCol, tsCol, steps, Some(withinMillis)),
      steps)

  private def funnelReadout(perUser: DataFrame,
      steps: Seq[String]): DataFrame = {
    val spark = perUser.sparkSession
    import spark.implicits._
    val counts = perUser.agg(
      count(col("__t0")).as("__n0"),
      steps.indices.tail.map(i => count(col(s"__t$i")).as(s"__n$i")): _*)

    // unpivot the single counts row into one row per step
    val stepNames = steps.zipWithIndex.map { case (s, i) => (i + 1, s) }
      .toDF("step", "event_type")
    val unpivoted = counts.select(posexplode(
      array(steps.indices.map(i => col(s"__n$i")): _*)).as(Seq("__i", "n_users")))
    val wAll = Window.orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    unpivoted
      .withColumn("__n_first", max(when(col("__i") === 0, col("n_users"))).over(wAll))
      .withColumn("__n_prev", lag(col("n_users"), 1).over(Window.orderBy(col("__i"))))
      .withColumn("step", col("__i") + 1)
      .join(broadcast(stepNames), Seq("step"))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__n_first") > 0,
          round(col("n_users") / col("__n_first").cast("double"), 6))
          .otherwise(0.0).as("pct_of_first"),
        when(col("__i") === 0, when(col("n_users") > 0, 1.0).otherwise(0.0))
          .when(col("__n_prev") > 0,
            round(col("n_users") / col("__n_prev").cast("double"), 6))
          .otherwise(0.0).as("pct_of_prev"))
      .orderBy(col("step"))
  }

  /** Funnel step-latency quantiles: for each transition step k→k+1, the
    * exact quantiles of (earliest completion of step k+1 − earliest
    * completion of step k) in seconds, over the users who completed step
    * k+1. The "WHERE is the funnel slow" companion to [[funnel]]'s
    * "where does it leak". Returns (step, from_type, to_type, q,
    * latency_sec) with latency_sec rounded to 4 dp.
    *
    * Composition: [[funnelTimes]] (one user-key exchange) → per-user
    * latency unpivot (|steps|−1 rows per user) →
    * [[Quantiles.exactByKey]] (range-partition + prefix-sum ranks — the
    * distributed exact-quantile machine, q139's), keyed by step index.
    */
  def funnelLatencies(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], qs: Seq[Double]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = funnelTimes(events, userCol, typeCol, tsCol, steps)
    val lat = perUser.select(posexplode(array(
      steps.indices.tail.map(i =>
        (col(s"__t$i").cast("double") - col(s"__t${i - 1}").cast("double"))
          .as(s"__l$i")): _*)).as(Seq("__i", "__lat")))
      .where(col("__lat").isNotNull)
      .select((col("__i") + 1).as("__step"), col("__lat"))
    val stepNames = steps.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => (i + 1, a, b) }.toSeq
      .toDF("step", "from_type", "to_type")
    Quantiles.exactByKey(lat, "__step", "__lat", qs, builtinMaxGroupRows = 0L)
      .select(col("key").cast("int").as("step"), col("q"),
        round(col("exact_q"), 4).as("latency_sec"))
      .join(broadcast(stepNames), Seq("step"))
      .select(col("step"), col("from_type"), col("to_type"), col("q"),
        col("latency_sec"))
      .orderBy(col("step"), col("q"))
  }

  /** First-order Markov transition matrix of the event stream: for each
    * user the events are ordered by (ts, tie-break column) and every
    * consecutive pair contributes one (from_type, to_type) transition;
    * the terminal event of each user contributes (from_type, null) — kept
    * as an explicit "__end" state so rows of the matrix sum to 1 and the
    * terminal mass is visible (dropping it would silently renormalize).
    * Returns (from_type, to_type, n, p) with p = n / sum(n) over
    * from_type, rounded to 6 dp.
    *
    * Shape: one user-key exchange for the lead window; the transition
    * aggregation is |types|²-sized (tiny), and the row-sum for p rides a
    * window over the matrix, not a re-scan of the log.
    */
  def markovTransitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val wSeq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__to", lead(col(typeCol), 1).over(wSeq))
      .select(col(typeCol).as("from_type"),
        coalesce(col("__to"), lit("__end")).as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    trans
      .withColumn("p", round(col("n") / sum(col("n")).over(wFrom), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Exponentially time-decayed engagement score per user:
    * `score(u) = sum over u's events of value · 0.5^(age/half-life)`,
    * with age measured in seconds from the stream's max timestamp (the
    * deterministic "now" — wall clock would make the result
    * unreproducible). The standard recency-weighted activity ranking.
    *
    * Order-independence: the per-event decayed terms are doubles, so a
    * naive double sum would vary with partition merge order; each term is
    * quantized to DECIMAL(38,12) before summing (the q149 device), making
    * the aggregate exact and partition-invariant, then the final score is
    * rounded to 6 dp. Shape: one scalar max(ts) broadcast (crossJoin of a
    * 1-row frame), one user-key aggregation — nothing else.
    */
  def decayedScore(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val ref = events.agg(max(unix_timestamp(col(tsCol))).as("__now"))
    events
      .select(col(userCol), col(tsCol), col(valueCol))
      .crossJoin(broadcast(ref))
      .withColumn("__term",
        (col(valueCol) * pow(lit(0.5),
          (col("__now") - unix_timestamp(col(tsCol))) /
            lit(halfLifeDays * 86400.0)))
          .cast("decimal(38,12)"))
      .groupBy(col(userCol))
      .agg(round(sum(col("__term")).cast("double"), 6).as("decayed_score"),
        count(lit(1)).as("n_events"))
      .orderBy(col(userCol))
  }

  /** Two-variant A/B conversion readout with a two-proportion z
    * statistic: users are deterministically assigned by md5(user) (first
    * hex digit < '8' → variant A — engine-replayable, stable across
    * retries and engines, the q56 split device), a user converts if they
    * have ≥1 event satisfying the `converted` predicate, and the single
    * output row carries per-variant user/converter counts, conversion
    * rates, and the pooled two-proportion z-score
    * `(pA-pB) / sqrt(p̂(1-p̂)(1/nA+1/nB))`, all rounded to 6 dp. The
    * z-score is the experiment dashboard's significance readout (compare
    * |z| to 1.96 for 95%); the p-value itself needs an erf the SQL
    * surface doesn't have, so the contract stops at z. A degenerate
    * experiment (pooled p̂ of 0 or 1, or an empty variant) yields a NULL
    * z, not an error — the caller's conversion predicate is wrong, and
    * the counts say so.
    *
    * Shape: one user-key aggregation collapses the log to (user, variant,
    * converted), then a 2-row variant rollup and a 1-row pivot — nothing
    * event-sized past the first exchange.
    */
  def abTest(events: DataFrame, userCol: String,
      converted: Column): DataFrame = {
    val perUser = events
      .select(col(userCol), converted.cast("boolean").as("__evConv"))
      .groupBy(col(userCol))
      .agg(max(when(col("__evConv"), 1).otherwise(0)).as("__conv"))
      .withColumn("__variant",
        when(substring(md5(col(userCol).cast("string")), 1, 1) < "8", "A")
          .otherwise("B"))
    val byVariant = perUser.groupBy(col("__variant"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__c"))
    byVariant.agg(
        max(when(col("__variant") === "A", col("__n"))).as("n_a"),
        max(when(col("__variant") === "A", col("__c"))).as("conv_a"),
        max(when(col("__variant") === "B", col("__n"))).as("n_b"),
        max(when(col("__variant") === "B", col("__c"))).as("conv_b"))
      .withColumn("rate_a", round(col("conv_a") / col("n_a").cast("double"), 6))
      .withColumn("rate_b", round(col("conv_b") / col("n_b").cast("double"), 6))
      .withColumn("__p",
        (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("__den",
        sqrt(col("__p") * (lit(1.0) - col("__p")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      // ANSI-safe: p̂ ∈ {0,1} → denominator 0 → NULL z (degenerate
      // experiment reported, not thrown)
      .withColumn("z", when(col("__den") > 0, round(
        (col("conv_a") / col("n_a").cast("double") -
          col("conv_b") / col("n_b").cast("double")) / col("__den"), 6)))
      .select(col("n_a"), col("conv_a"), col("rate_a"),
        col("n_b"), col("conv_b"), col("rate_b"), col("z"))
  }

  /** CUPED variance reduction for an A/B readout (Deng, Xu, Kohavi &
    * Walker 2013, "Improving the sensitivity of online controlled
    * experiments"): adjust each user's outcome `y` by a PRE-experiment
    * covariate `x` (y′ = y − θ(x − x̄), θ = cov(x,y)/var(x) pooled),
    * which removes the covariate-explained share of the variance and
    * shrinks the confidence interval by 1/(1−r²) — the standard trick
    * for detecting small lifts without doubling the traffic. Input is
    * a USER-GRAIN frame (one row per experiment unit) with exactly two
    * variant labels; the smaller label (lexicographic) reports as A.
    * Returns one row (n_a, n_b, mean_a, mean_b, adj_mean_a, adj_mean_b,
    * theta, var_reduction), 6 dp; var(x) = 0 yields null theta /
    * var_reduction and the adjusted means fall back to the raw means
    * (no covariate signal — CUPED degrades to the plain readout, never
    * to null).
    *
    * 100 TB shape: ONE variant-keyed aggregation computes every moment
    * (n, Σx, Σy, Σxy, Σx², Σy² — DECIMAL(38,12)-quantized, the
    * correlation machine's partition-invariance device); the θ and
    * adjusted-mean algebra runs on the 2-row frame. The adjustment is
    * the MEAN identity (mean of adjusted outcomes = adjusted mean), so
    * no second pass over users is needed.
    */
  def cupedAdjust(users: DataFrame, variantCol: String, yCol: String,
      xCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val m = users
      .select(col(variantCol).cast("string").as("__v"),
        col(yCol).cast("double").as("__y"),
        col(xCol).cast("double").as("__x"))
      .filter(col("__v").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"),
        sum(d12(col("__x"))).as("__sx"),
        sum(d12(col("__y"))).as("__sy"),
        sum(d12(col("__x") * col("__y"))).as("__sxy"),
        sum(d12(col("__x") * col("__x"))).as("__sxx"),
        sum(d12(col("__y") * col("__y"))).as("__syy"))
      .localCheckpoint(true) // 2 rows; consumers: label probe + pivot
    val labels = m.select(col("__v")).collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"cupedAdjust: need exactly 2 variants, got ${labels.mkString(",")}")
    val (la, lb) = (labels(0), labels(1))
    def pick(l: String, c: String) = max(when(col("__v") === l, col(c)))
    val row = m.agg(
      pick(la, "__n").as("__na"), pick(lb, "__n").as("__nb"),
      (pick(la, "__sx") + pick(lb, "__sx")).cast("double").as("__sx"),
      (pick(la, "__sy") + pick(lb, "__sy")).cast("double").as("__sy"),
      (pick(la, "__sxy") + pick(lb, "__sxy")).cast("double").as("__sxy"),
      (pick(la, "__sxx") + pick(lb, "__sxx")).cast("double").as("__sxx"),
      (pick(la, "__syy") + pick(lb, "__syy")).cast("double").as("__syy"),
      pick(la, "__sx").cast("double").as("__sxa"),
      pick(lb, "__sx").cast("double").as("__sxb"),
      pick(la, "__sy").cast("double").as("__sya"),
      pick(lb, "__sy").cast("double").as("__syb"))
    val n = (col("__na") + col("__nb")).cast("double")
    val thetaNum = n * col("__sxy") - col("__sx") * col("__sy")
    val thetaDen = n * col("__sxx") - col("__sx") * col("__sx")
    val yDen = n * col("__syy") - col("__sy") * col("__sy")
    val xbar = col("__sx") / n
    val meanA = col("__sya") / col("__na").cast("double")
    val meanB = col("__syb") / col("__nb").cast("double")
    val meanXa = col("__sxa") / col("__na").cast("double")
    val meanXb = col("__sxb") / col("__nb").cast("double")
    val theta = when(thetaDen > 0, thetaNum / thetaDen)
    row.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
      round(when(theta.isNotNull, meanA - theta * (meanXa - xbar))
        .otherwise(meanA), 6).as("adj_mean_a"),
      round(when(theta.isNotNull, meanB - theta * (meanXb - xbar))
        .otherwise(meanB), 6).as("adj_mean_b"),
      round(theta, 6).as("theta"),
      round(when(thetaDen > 0 && yDen > 0,
        thetaNum * thetaNum / (thetaDen * yDen)), 6).as("var_reduction"))
  }

  /** Difference-in-differences estimator: the quasi-experiment readout
    * when assignment wasn't randomized (a rollout hit group B while A
    * stayed on the old path) — effect = (ȳ_B,post − ȳ_B,pre) −
    * (ȳ_A,post − ȳ_A,pre), which differences away both the group gap
    * and the common time trend (valid under parallel trends — the
    * caller's assumption to defend, not the operator's). Input is a
    * UNIT-GRAIN frame (one row per unit × period); exactly two group
    * labels (smaller = control A) and two period labels (smaller =
    * pre). Returns one row (n per cell, baseline_diff, treated_diff,
    * effect, se, t), 6 dp — SE from the four cells' sample variances
    * (independent-means algebra), null t when se = 0. Every cell needs
    * n ≥ 2 (a variance exists), enforced loudly.
    *
    * 100 TB shape: ONE (group, period)-keyed aggregation computes
    * every moment (n, Σy, Σy² — DECIMAL(38,12)-quantized); the
    * estimator algebra runs on the 4-row frame driver-side (bounded),
    * exactly replayable.
    */
  def diffInDiff(units: DataFrame, groupCol: String, periodCol: String,
      yCol: String): DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val cells = units
      .select(col(groupCol).cast("string").as("__g"),
        col(periodCol).cast("string").as("__p"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col("__g"), col("__p"))
      .agg(count(lit(1)).as("__n"), sum(d12(col("__y"))).as("__sy"),
        sum(d12(col("__y") * col("__y"))).as("__syy"))
      .collect()
    val gs = cells.map(_.getString(0)).distinct.sorted
    val ps = cells.map(_.getString(1)).distinct.sorted
    require(gs.length == 2 && ps.length == 2,
      s"diffInDiff: need exactly 2 groups x 2 periods, got " +
        s"groups=${gs.mkString(",")} periods=${ps.mkString(",")}")
    case class Cell(n: Long, mean: Double, varS: Double)
    def cell(g: String, p: String): Cell = {
      val r = cells.find(r => r.getString(0) == g && r.getString(1) == p)
        .getOrElse(sys.error(s"diffInDiff: empty cell ($g, $p)"))
      val n = r.getLong(2)
      require(n >= 2, s"diffInDiff: cell ($g, $p) needs n >= 2, got $n")
      val sy = r.getDecimal(3).doubleValue()
      val syy = r.getDecimal(4).doubleValue()
      val nd = n.toDouble
      Cell(n, sy / nd, (nd * syy - sy * sy) / (nd * (nd - 1.0)))
    }
    val (aPre, aPost) = (cell(gs(0), ps(0)), cell(gs(0), ps(1)))
    val (bPre, bPost) = (cell(gs(1), ps(0)), cell(gs(1), ps(1)))
    val baseDiff = aPost.mean - aPre.mean
    val treatDiff = bPost.mean - bPre.mean
    val effect = treatDiff - baseDiff
    val se = math.sqrt(aPre.varS / aPre.n + aPost.varS / aPost.n +
      bPre.varS / bPre.n + bPost.varS / bPost.n)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val t = if (se > 0) Some(r6(effect / se)) else None
    Seq((aPre.n, aPost.n, bPre.n, bPost.n, r6(baseDiff), r6(treatDiff),
      r6(effect), r6(se), t))
      .toDF("n_a_pre", "n_a_post", "n_b_pre", "n_b_post",
        "baseline_diff", "treated_diff", "effect", "se", "t")
  }

  /** Covariate balance table: per covariate, group means and the
    * standardized mean difference `SMD = (x̄_A − x̄_B)/√((s²_A+s²_B)/2)`
    * — the assignment-quality diagnostic that decides whether a
    * [[cupedAdjust]]/[[diffInDiff]] readout can be believed (|SMD| >
    * 0.1 is the conventional imbalance flag: the "treatment effect"
    * may be the covariate). Exactly two group labels (smaller = A).
    * Returns one row per covariate (covariate, n_a, n_b, mean_a,
    * mean_b, smd, imbalanced), 6 dp; zero pooled variance yields null
    * SMD (and no flag — constant covariates are trivially balanced).
    * Null covariate values are dropped per covariate (pairwise
    * deletion, the correlation-matrix convention).
    *
    * 100 TB shape: ONE group-keyed aggregation computes every
    * covariate's moments side by side (n, Σx, Σx² per covariate —
    * DECIMAL-quantized); the SMD algebra runs on the 2-row pivot.
    */
  def covariateBalance(units: DataFrame, groupCol: String,
      covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "covariateBalance: need >= 1 covariate")
    val spark = units.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val aggs = covariates.flatMap { cv =>
      val x = col(cv).cast("double")
      Seq(count(x).as(s"__n_$cv"),
        sum(d12(x)).as(s"__sx_$cv"),
        sum(d12(x * x)).as(s"__sxx_$cv"))
    }
    val m = units
      .select(col(groupCol).cast("string").as("__g") +:
        covariates.map(c => col(c)): _*)
      .filter(col("__g").isNotNull)
      .groupBy(col("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val labels = m.map(_.getString(0)).sorted
    require(labels.length == 2,
      s"covariateBalance: need exactly 2 groups, got ${labels.mkString(",")}")
    val rowA = m.find(_.getString(0) == labels(0)).get
    val rowB = m.find(_.getString(0) == labels(1)).get
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = covariates.map { cv =>
      def stats(r: org.apache.spark.sql.Row) = {
        val n = r.getLong(r.fieldIndex(s"__n_$cv"))
        require(n >= 2,
          s"covariateBalance: covariate '$cv' needs n >= 2 per group")
        val sx = r.getDecimal(r.fieldIndex(s"__sx_$cv")).doubleValue()
        val sxx = r.getDecimal(r.fieldIndex(s"__sxx_$cv")).doubleValue()
        val nd = n.toDouble
        (n, sx / nd, (nd * sxx - sx * sx) / (nd * (nd - 1.0)))
      }
      val (na, meanA, varA) = stats(rowA)
      val (nb, meanB, varB) = stats(rowB)
      val pooled = math.sqrt((varA + varB) / 2.0)
      val smd = if (pooled > 0) Some(r6((meanA - meanB) / pooled)) else None
      (cv, na, nb, r6(meanA), r6(meanB), smd,
        smd.map(s => math.abs(s) > 0.1))
    }
    out.toDF("covariate", "n_a", "n_b", "mean_a", "mean_b", "smd",
      "imbalanced")
  }

  /** OLS multiple regression of the outcome on a treatment indicator
    * plus `k` covariates — the regression-adjusted treatment effect
    * (ANCOVA) that [[cupedAdjust]] is the k = 1 special case of (they
    * coincide exactly when the covariate is balanced across arms, and
    * asymptotically under randomization). Model: `y = β₀ + τ·T + Σ βⱼ
    * xⱼ`; exactly two variant labels (larger = treated, T = 1). Rows
    * with a null label, outcome, or any null covariate drop (listwise
    * deletion, the regression convention). Returns one row per term —
    * (term_idx, term, n, coef, se, t_stat, r2) with term ∈ intercept,
    * treatment, covariates in caller order — 6 dp; the `treatment` row
    * IS the adjusted effect with its standard error. A zero-residual
    * (exact) fit yields se = 0 and null t_stat; r2 is null when the
    * outcome is constant (no variance to explain).
    *
    * 100 TB shape: ONE variant-keyed aggregation computes every normal-
    * equation moment (n, Σy, Σy², Σxᵢ, Σxᵢy, Σxᵢxⱼ — DECIMAL(38,12)-
    * quantized, partition-invariant); the (k+2)×(k+2) solve runs on the
    * 2-row collect. The Gauss-Jordan runs WITHOUT pivoting in a fixed
    * functional-update order (each step rebuilt from the previous
    * state), so an engine replaying the same op sequence on the same
    * decimal-exact moments — the DuckDB oracle does — reproduces every
    * double bit for bit. XᵀX with an intercept leads with n > 0 and
    * stays positive-definite for any full-rank design, so pivotless
    * elimination is safe; a rank-deficient (collinear) design fails
    * loudly. k is capped at 20 — the Gram is a plan-time constant.
    */
  /** Pivotless Gauss-Jordan on an augmented p×(2p+1) matrix in the
    * fixed functional-update order (every new entry from the PREVIOUS
    * state only, row c's pivot division re-evaluated inside each row r
    * — the exact expression shape the oracles' unrolled CTEs replay).
    * Returns (β, diag of the inverse). Shared by [[olsAdjust]],
    * [[olsFit]] and [[didAdjusted]]. */
  private def gaussJordan(init: Array[Array[Double]],
      p: Int): (Array[Double], Array[Double]) = {
    val w = 2 * p + 1
    var a = init
    for (c <- 0 until p) {
      val prev = a
      val piv = prev(c)(c)
      require(math.abs(piv) > 1e-12,
        s"ols: singular normal equations at pivot $c " +
          "(collinear covariates?)")
      a = Array.tabulate(p, w) { (r, j) =>
        if (r == c) prev(c)(j) / piv
        else prev(r)(j) - prev(r)(c) * (prev(c)(j) / piv)
      }
    }
    (Array.tabulate(p)(i => a(i)(p)),
      Array.tabulate(p)(i => a(i)(p + 1 + i)))
  }

  def olsAdjust(users: DataFrame, variantCol: String, yCol: String,
      covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty && covariates.size <= 20,
      "olsAdjust: need 1..20 covariates")
    require(covariates.distinct.size == covariates.size,
      "olsAdjust: covariates must be distinct")
    val spark = users.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = covariates.size
    val p = k + 2 // intercept, treatment, covariates
    val base = users
      .select(col(variantCol).cast("string").as("__v") +:
        col(yCol).cast("double").as("__y") +:
        covariates.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__v").isNotNull && col("__y").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__y"))).as("sy"),
      sum(d12(col("__y") * col("__y"))).as("syy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val m = base.groupBy(col("__v")).agg(aggs.head, aggs.tail: _*)
      .collect() // 2 rows × O(k²) moments — bounded, k ≤ 20
    val labels = m.map(_.getString(0)).sorted
    require(labels.length == 2,
      s"olsAdjust: need exactly 2 variants, got ${labels.mkString(",")}")
    val ra = m.find(_.getString(0) == labels(0)).get
    val rb = m.find(_.getString(0) == labels(1)).get
    def dec(r: org.apache.spark.sql.Row, f: String) =
      r.getDecimal(r.fieldIndex(f))
    // combined sums add in DECIMAL (exact) and cast ONCE — the q218
    // device; the oracle's (sA + sB)::DOUBLE lands on the same double
    def both(f: String) = dec(ra, f).add(dec(rb, f)).doubleValue()
    def bOnly(f: String) = dec(rb, f).doubleValue()
    val na = ra.getLong(ra.fieldIndex("n"))
    val nb = rb.getLong(rb.fieldIndex("n"))
    val nL = na + nb
    require(nL > p, s"olsAdjust: need n > ${p} rows, got $nL")
    val nD = nL.toDouble
    val nbD = nb.toDouble
    def gx(i: Int, j: Int) = both(s"sx${math.min(i, j)}x${math.max(i, j)}")
    // augmented [XᵀX | Xᵀy | I], design order (1, T, x₀..x_{k-1})
    val w = 2 * p + 1
    val init = Array.tabulate(p, w) { (r, j) =>
      def gram(rr: Int, cc: Int): Double = (rr, cc) match {
        case (0, 0) => nD
        case (0, c) if c == 1 => nbD
        case (1, 1) => nbD
        case (0, c) => both(s"sx${c - 2}")
        case (1, c) => bOnly(s"sx${c - 2}")
        case (r2, c2) => gx(r2 - 2, c2 - 2)
      }
      if (j < p) { if (j >= r) gram(r, j) else gram(j, r) }
      else if (j == p) r match {
        case 0 => both("sy")
        case 1 => bOnly("sy")
        case i => both(s"sx${i - 2}y")
      }
      else if (j == p + 1 + r) 1.0 else 0.0
    }
    val (beta, invDiag) = gaussJordan(init, p)
    val rhs = Array.tabulate(p)(r => init(r)(p))
    val syy = both("syy")
    var rss = syy
    for (i <- 0 until p) rss -= beta(i) * rhs(i)
    val dof = (nL - p).toDouble
    val sigma2 = rss / dof
    val sst = syy - (rhs(0) * rhs(0)) / nD
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: "treatment" +: covariates
    val out = (0 until p).map { i =>
      val se = math.sqrt(math.max(sigma2, 0.0) * invDiag(i))
      // t gated on the ROUNDED se: an exact fit leaves rss a few ulps
      // from zero, and a reported se of 0.000000 with a (gigantic) t
      // beside it would contradict itself
      (i, terms(i), nL, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None,
        if (sst > 0) Some(r6(1.0 - rss / sst)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "t_stat", "r2")
      .orderBy(col("term_idx"))
  }

  /** General OLS multiple regression `y = β₀ + Σ βⱼ xⱼ` — the design-
    * agnostic face of [[olsAdjust]] (no treatment convention; the
    * caller provides every regressor as a column, indicators included).
    * Listwise null deletion; same pivotless-Gauss-Jordan solve, same
    * per-term output (term_idx, term, n, coef, se, t_stat, r2), 6 dp.
    *
    * 100 TB shape: ONE ungrouped aggregation computes every normal-
    * equation moment (DECIMAL(38,12)-quantized); the (k+1)×(k+1) solve
    * runs on the 1-row collect. k ≤ 20.
    */
  def olsFit(df: DataFrame, yCol: String,
      xCols: Seq[String]): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 20,
      "olsFit: need 1..20 regressors")
    require(xCols.distinct.size == xCols.size,
      "olsFit: regressors must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val p = k + 1
    val base = df
      .select(col(yCol).cast("double").as("__y") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__y").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__y"))).as("sy"),
      sum(d12(col("__y") * col("__y"))).as("syy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val r = base.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    def dv(f: String) = {
      val d = r.getDecimal(r.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val nL = r.getLong(r.fieldIndex("n"))
    require(nL > p, s"olsFit: need n > $p rows, got $nL")
    val nD = nL.toDouble
    def gx(i: Int, j: Int) = dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
    val w = 2 * p + 1
    val init = Array.tabulate(p, w) { (rr, j) =>
      def gram(a: Int, b: Int): Double =
        if (a == 0 && b == 0) nD
        else if (a == 0) dv(s"sx${b - 1}")
        else gx(a - 1, b - 1)
      if (j < p) { if (j >= rr) gram(rr, j) else gram(j, rr) }
      else if (j == p) { if (rr == 0) dv("sy") else dv(s"sx${rr - 1}y") }
      else if (j == p + 1 + rr) 1.0 else 0.0
    }
    val (beta, invDiag) = gaussJordan(init, p)
    val rhs = Array.tabulate(p)(i => init(i)(p))
    val syy = dv("syy")
    var rss = syy
    for (i <- 0 until p) rss -= beta(i) * rhs(i)
    val dof = (nL - p).toDouble
    val sigma2 = rss / dof
    val sst = syy - (rhs(0) * rhs(0)) / nD
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    val out = (0 until p).map { i =>
      val se = math.sqrt(math.max(sigma2, 0.0) * invDiag(i))
      (i, terms(i), nL, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None,
        if (sst > 0) Some(r6(1.0 - rss / sst)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "t_stat", "r2")
      .orderBy(col("term_idx"))
  }

  /** Ridge regression (Hoerl & Kennard 1970): [[olsFit]] with an L2
    * penalty `λ` on every NON-intercept coefficient — the workhorse
    * when regressors are collinear (one-hot groups, correlated
    * engagement metrics) and the OLS solve goes unstable or the
    * coefficients explode in opposite directions. Solves
    * `(XᵀX + λ·diag(0,1,…,1)) β = Xᵀy` — the same Gram moments, the
    * same pivotless solve, λ added to the non-intercept diagonal.
    * λ = 0 IS [[olsFit]]'s coefficient vector. Returns one row per
    * term (term_idx, term, n, lambda, coef), 6 dp — no SE column:
    * ridge SEs require the sandwich (XᵀX+λI)⁻¹XᵀX(XᵀX+λI)⁻¹ and are
    * rarely what a ridge user wants (use [[olsFit]] for inference).
    * Caller contract: the penalty is applied on the RAW regressor
    * scale — standardize upstream if the regressors' units differ.
    *
    * 100 TB shape: identical to [[olsFit]] — ONE decimal-quantized
    * moments aggregation, a driver-side (k+1)×(k+1) solve.
    */
  def ridgeFit(df: DataFrame, yCol: String, xCols: Seq[String],
      lambda: Double): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 20,
      "ridgeFit: need 1..20 regressors")
    require(xCols.distinct.size == xCols.size,
      "ridgeFit: regressors must be distinct")
    require(lambda >= 0, "ridgeFit: lambda must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val p = k + 1
    val base = df
      .select(col(yCol).cast("double").as("__y") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__y").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__y"))).as("sy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val r = base.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    def dv(f: String) = {
      val d = r.getDecimal(r.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val nL = r.getLong(r.fieldIndex("n"))
    require(nL > p, s"ridgeFit: need n > $p rows, got $nL")
    val nD = nL.toDouble
    def gx(i: Int, j: Int) = dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
    val w = 2 * p + 1
    val init = Array.tabulate(p, w) { (rr, j) =>
      def gram(a: Int, b: Int): Double =
        if (a == 0 && b == 0) nD
        else if (a == 0) dv(s"sx${b - 1}")
        else gx(a - 1, b - 1)
      val ridge = if (j == rr && rr >= 1) lambda else 0.0
      if (j < p) { (if (j >= rr) gram(rr, j) else gram(j, rr)) + ridge }
      else if (j == p) { if (rr == 0) dv("sy") else dv(s"sx${rr - 1}y") }
      else if (j == p + 1 + rr) 1.0 else 0.0
    }
    val (beta, _) = gaussJordan(init, p)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    terms.indices.map(i => (i, terms(i), nL, lambda, r6(beta(i))))
      .toDF("term_idx", "term", "n", "lambda", "coef")
      .orderBy(col("term_idx"))
  }

  /** Difference-in-differences WITH covariates — the regression form
    * of [[diffInDiff]]: `y = β₀ + τ_g·T + τ_p·P + δ·T·P + Σ βⱼ xⱼ`
    * where T = treated group (larger label), P = post period (larger
    * label); the `did_effect` row's coefficient δ IS the DiD estimate,
    * now adjusted for unit-level covariates (what the plain 4-cell
    * estimator cannot do), with a regression SE. All indicator columns
    * are exact 0/1 doubles; estimation is [[olsFit]] on the augmented
    * design. Returns its per-term frame with terms (intercept,
    * treated, post, did_effect, covariates...).
    */
  def didAdjusted(units: DataFrame, groupCol: String, periodCol: String,
      yCol: String, covariates: Seq[String]): DataFrame = {
    val pre = units
      .filter(col(groupCol).isNotNull && col(periodCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g") +:
        col(periodCol).cast("string").as("__p") +:
        col(yCol).as(yCol) +: covariates.map(c => col(c)): _*)
      .localCheckpoint(true) // consumers: label probes + the fit
    val gs = pre.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    val ps = pre.select(col("__p")).distinct()
      .collect().map(_.getString(0)).sorted
    require(gs.length == 2 && ps.length == 2,
      s"didAdjusted: need exactly 2 groups x 2 periods, got " +
        s"groups=${gs.mkString(",")} periods=${ps.mkString(",")}")
    val design = pre.select(
      col(yCol).as(yCol) +:
      when(col("__g") === gs(1), 1.0).otherwise(0.0).as("treated") +:
      when(col("__p") === ps(1), 1.0).otherwise(0.0).as("post") +:
      when(col("__g") === gs(1) && col("__p") === ps(1), 1.0)
        .otherwise(0.0).as("did_effect") +:
      covariates.map(c => col(c)): _*)
    olsFit(design, yCol, Seq("treated", "post", "did_effect") ++
      covariates)
  }

  /** Shared IRLS core for [[logisticFit]]/[[ipwAte]]: `iters` Newton
    * steps from β = 0 on a pinned frame with columns (__y, __x0..),
    * each step ONE ungrouped aggregation of the Hessian XᵀWX and
    * gradient Xᵀ(y−μ) moments (w = μ(1−μ); every term
    * DECIMAL(38,12)-quantized — order-free) + the shared pivotless
    * [[gaussJordan]] solve on the (k+1)×(k+1) system. Term expression
    * SHAPES are pinned (no ×1.0 for the intercept slot) so the
    * oracle's unrolled replay lands every double bit-identically.
    * Returns (β, diag of the final iteration's inverse Hessian, n).
    * Fixed iteration count, not a convergence test: replayable, and
    * Newton on a logistic likelihood is quadratically convergent —
    * six steps reach machine precision for any non-separated design.
    */
  private def irlsBeta(base: DataFrame, k: Int,
      iters: Int): (Array[Double], Array[Double], Long) =
    glmBeta(base, k, iters,
      eta => lit(1.0) / (lit(1.0) + exp(-eta)),
      mu => mu * (lit(1.0) - mu))

  /** The family-generic IRLS core: `muOf` maps the linear predictor to
    * the mean (inverse link), `wOf` maps the mean to the Fisher weight
    * W = (dμ/dη)²/V(μ) (μ(1−μ) for logistic, μ for Poisson, 1 for
    * log-link gamma, μ/(1+αμ) for NB2), and `residOf` maps (y, μ) to
    * the gradient residual (y−μ)·(dμ/dη)/V(μ) — (y−μ) for canonical
    * links, (y−μ)/μ for log-link gamma, (y−μ)/(1+αμ) for NB2 — so one
    * loop serves every one-parameter family. `start` seeds the
    * intercept (ln ȳ for the log-link families, whose β = 0 start can
    * overshoot into exp overflow; 0 for the canonical ones). */
  private def glmBeta(base: DataFrame, k: Int, iters: Int,
      muOf: Column => Column,
      wOf: Column => Column,
      residOf: (Column, Column) => Column = (y, mu) => y - mu,
      start: Double = 0.0): (Array[Double], Array[Double], Long) = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val p = k + 1
    var beta = Array.fill(p)(0.0)
    beta(0) = start
    var invDiag = Array.fill(p)(0.0)
    var n = 0L
    for (_ <- 1 to iters) {
      val eta = (0 until k).foldLeft(lit(beta(0)): Column)((acc, i) =>
        acc + lit(beta(i + 1)) * col(s"__x$i"))
      val mu = muOf(eta)
      val w = wOf(mu)
      def hTerm(r: Int, c: Int): Column =
        if (r == 0 && c == 0) w
        else if (r == 0) w * col(s"__x${c - 1}")
        else w * col(s"__x${r - 1}") * col(s"__x${c - 1}")
      def gTerm(r: Int): Column =
        if (r == 0) residOf(col("__y"), mu)
        else residOf(col("__y"), mu) * col(s"__x${r - 1}")
      val aggs = Seq(count(lit(1)).as("n")) ++
        (for { r <- 0 until p; c <- r until p }
          yield sum(d12(hTerm(r, c))).as(s"h_${r}_$c")) ++
        (0 until p).map(r => sum(d12(gTerm(r))).as(s"g_$r"))
      val m = base.agg(aggs.head, aggs.tail: _*).head()
      n = m.getLong(0)
      require(n > p, s"logistic: need n > $p rows, got $n")
      def dv(f: String) = m.getDecimal(m.fieldIndex(f)).doubleValue()
      val w2 = 2 * p + 1
      val init = Array.tabulate(p, w2) { (r, j) =>
        if (j < p) dv(s"h_${math.min(r, j)}_${math.max(r, j)}")
        else if (j == p) dv(s"g_$r")
        else if (j == p + 1 + r) 1.0 else 0.0
      }
      val (delta, inv) = gaussJordan(init, p)
      beta = Array.tabulate(p)(i => beta(i) + delta(i))
      invDiag = inv
    }
    (beta, invDiag, n)
  }

  private def logitBase(df: DataFrame, yCol: String,
      xCols: Seq[String], op: String = "logistic"): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 20,
      s"$op: need 1..20 regressors")
    require(xCols.distinct.size == xCols.size,
      s"$op: regressors must be distinct")
    val k = xCols.size
    df.select(col(yCol).cast("double").as("__y") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__y").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(true) // consumed once per Newton step
  }

  /** Logistic regression `P(y=1|x) = σ(β₀ + Σ βⱼ xⱼ)` by
    * Newton-Raphson / IRLS — the binary-outcome face of [[olsFit]]
    * (conversion, churn, any 0/1 label) and the propensity model
    * under [[ipwAte]]. Caller contract: y ∈ {0, 1} (listwise null
    * deletion; a non-binary y silently fits a "fractional logit").
    * Returns one row per term (term_idx, term, n, coef, se, z_stat),
    * 6 dp — se from the final Newton step's inverse Hessian (the
    * asymptotic covariance at convergence), z gated on the rounded se.
    *
    * 100 TB shape: `iters` × ONE ungrouped moments aggregation
    * (map-side combined, decimal-quantized) + a driver-side
    * (k+1)-dimensional solve per step — the classic distributed IRLS;
    * nothing data-sized ever leaves the executors. k ≤ 20, fixed
    * iteration count (replayable; see [[irlsBeta]]).
    */
  def logisticFit(df: DataFrame, yCol: String, xCols: Seq[String],
      iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 12, "logisticFit: iters must be 1..12")
    val spark = df.sparkSession
    import spark.implicits._
    val base = logitBase(df, yCol, xCols, "logisticFit")
    val (beta, invDiag, n) = irlsBeta(base, xCols.size, iters)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    val out = terms.indices.map { i =>
      val se = math.sqrt(invDiag(i))
      (i, terms(i), n, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "z_stat")
      .orderBy(col("term_idx"))
  }

  /** One ungrouped OLS solve over an already-projected (__y, __x*)
    * frame — [[olsFit]]'s moments + elimination returning the RAW
    * betas (shared by [[huberFit]]'s starting point). */
  private def olsBetaFromBase(base: DataFrame, k: Int): Array[Double] = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val p = k + 1
    val aggs = Seq(count(lit(1)).as("n"), sum(d12(col("__y"))).as("sy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val r = base.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    require(n > p, s"huberFit: need n > $p rows, got $n")
    def dv(f: String) = r.getDecimal(r.fieldIndex(f)).doubleValue()
    def gx(i: Int, j: Int) = dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
    val w2 = 2 * p + 1
    val init = Array.tabulate(p, w2) { (rr, j) =>
      def gram(a: Int, b: Int): Double =
        if (a == 0 && b == 0) n.toDouble
        else if (a == 0) dv(s"sx${b - 1}")
        else gx(a - 1, b - 1)
      if (j < p) { if (j >= rr) gram(rr, j) else gram(j, rr) }
      else if (j == p) { if (rr == 0) dv("sy") else dv(s"sx${rr - 1}y") }
      else if (j == p + 1 + rr) 1.0 else 0.0
    }
    gaussJordan(init, p)._1
  }

  /** Huber robust regression (Huber 1964) by IRLS with a preliminary
    * MAD scale: the outlier-resistant [[olsFit]] — one wild row can
    * drag least squares arbitrarily far, while the Huber loss caps
    * each row's influence at δ·s. Procedure (each step engine-
    * replayable): (1) OLS start; (2) scale s = 1.4826·MAD of the OLS
    * residuals (median via the exact type-7 quantile machine), rounded
    * to 6 dp and then FIXED (the preliminary-scale variant — a
    * re-estimated scale would be marginally more efficient but adds
    * two quantile passes per step); (3) `iters` reweighted
    * least-squares solves with w = min(1, δ·s/|r|). Returns one row
    * per term (term_idx, term, n, coef, scale, n_downweighted) — the
    * last two repeat; coef 6 dp. A zero MAD (≥ half the residuals
    * identical) fixes every weight at 1 and the fit IS the OLS fit,
    * reported with scale 0.
    *
    * 100 TB shape: one Gram aggregation for the start, two exact-
    * quantile passes (range-partition rank device — no global sort),
    * then iters × one weighted Gram aggregation; every sum
    * DECIMAL(38,12)-quantized, every solve driver-side (k ≤ 20).
    */
  def huberFit(df: DataFrame, yCol: String, xCols: Seq[String],
      iters: Int = 4, delta: Double = 1.345): DataFrame = {
    require(iters >= 1 && iters <= 12, "huberFit: iters must be 1..12")
    require(delta > 0, "huberFit: delta must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val p = k + 1
    val base = logitBase(df, yCol, xCols, "huberFit")
    def lin(b: Array[Double]) =
      (0 until k).foldLeft(lit(b(0)): Column)((acc, i) =>
        acc + lit(b(i + 1)) * col(s"__x$i"))
    var beta = olsBetaFromBase(base, k)
    val resDf = base.select((col("__y") - lin(beta)).as("__r"))
      .localCheckpoint(true) // two quantile consumers
    val med = Quantiles.exact(resDf, "__r", Seq(0.5))
      .head().getDouble(1)
    val madDf = resDf.select(abs(col("__r") - lit(med)).as("__a"))
    val mad = Quantiles.exact(madDf, "__a", Seq(0.5))
      .head().getDouble(1)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val s = r6(1.4826 * mad)
    var n = 0L
    if (s > 0) {
      val ds = delta * s
      for (_ <- 1 to iters) {
        val rCol = col("__y") - lin(beta)
        val w = when(abs(rCol) <= lit(ds), lit(1.0))
          .otherwise(lit(ds) / abs(rCol))
        def hTerm(r: Int, c: Int): Column =
          if (r == 0 && c == 0) w
          else if (r == 0) w * col(s"__x${c - 1}")
          else w * col(s"__x${r - 1}") * col(s"__x${c - 1}")
        def gTerm(r: Int): Column =
          if (r == 0) w * col("__y")
          else w * col(s"__x${r - 1}") * col("__y")
        val aggs = Seq(count(lit(1)).as("n")) ++
          (for { r <- 0 until p; c <- r until p }
            yield sum(d12(hTerm(r, c))).as(s"h_${r}_$c")) ++
          (0 until p).map(r => sum(d12(gTerm(r))).as(s"g_$r"))
        val m = base.agg(aggs.head, aggs.tail: _*).head()
        n = m.getLong(0)
        def dv(f: String) = m.getDecimal(m.fieldIndex(f)).doubleValue()
        val w2 = 2 * p + 1
        val init = Array.tabulate(p, w2) { (r, j) =>
          if (j < p) dv(s"h_${math.min(r, j)}_${math.max(r, j)}")
          else if (j == p) dv(s"g_$r")
          else if (j == p + 1 + r) 1.0 else 0.0
        }
        beta = gaussJordan(init, p)._1
      }
    } else {
      n = base.count()
    }
    val nDown =
      if (s > 0)
        base.agg(count(when(
          abs(col("__y") - lin(beta)) > lit(delta * s), 1)))
          .head().getLong(0)
      else 0L
    val terms = "intercept" +: xCols
    terms.indices.map(i => (i, terms(i), n, r6(beta(i)), s, nDown))
      .toDF("term_idx", "term", "n", "coef", "scale", "n_downweighted")
      .orderBy(col("term_idx"))
  }

  /** Poisson regression `E[y|x] = e^(β₀ + Σ βⱼ xⱼ)` by Newton-Raphson
    * — the COUNT-outcome GLM ([[logisticFit]]'s sibling through the
    * shared canonical-link IRLS core: μ = e^η, Newton weight = μ):
    * events per user, purchases per session, defects per batch —
    * anywhere "how MANY" is the outcome and OLS would predict
    * negative counts. Same per-term readout (term_idx, term, n, coef,
    * se, z_stat), se from the final inverse Hessian; coefficients
    * read as log-rate-ratios (e^β = multiplicative effect per unit).
    * Caller contract: y ≥ 0 (counts or non-negative rates).
    *
    * 100 TB shape: identical to [[logisticFit]] — iters × ONE
    * decimal-quantized Gram aggregation + a driver-side solve. The
    * exp link can overflow on unscaled covariates mid-iteration
    * (e^η = Inf poisons the Hessian); scale covariates to O(1-100)
    * like any GLM user would.
    */
  def poissonFit(df: DataFrame, yCol: String, xCols: Seq[String],
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, "poissonFit: iters must be 1..16")
    val spark = df.sparkSession
    import spark.implicits._
    val base = logitBase(df, yCol, xCols, "poissonFit")
    val (beta, invDiag, n) =
      glmBeta(base, xCols.size, iters, eta => exp(eta), mu => mu)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    val out = terms.indices.map { i =>
      val se = math.sqrt(invDiag(i))
      (i, terms(i), n, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "z_stat")
      .orderBy(col("term_idx"))
  }

  /** ln(ȳ) over a pinned (__y, __x*) frame — the log-link families'
    * intercept seed (ȳ from one decimal-quantized mean, replayable). */
  private def logMeanY(base: DataFrame): Double = {
    val r = base.agg(count(lit(1)).as("n"),
      sum(col("__y").cast("decimal(38,12)")).as("sy")).head()
    val n = r.getLong(0)
    require(n > 0, "glm: empty input after null filtering")
    val mean = r.getDecimal(1).doubleValue() / n.toDouble
    require(mean > 0, s"glm: log link needs mean(y) > 0, got $mean")
    math.log(mean)
  }

  /** Gamma regression with log link `E[y|x] = e^(β₀ + Σ βⱼ xⱼ)`,
    * V(μ) = μ² (McCullagh & Nelder 1989 ch. 8) — the GLM for POSITIVE
    * continuous outcomes whose spread grows with the mean (spend per
    * user, session duration, claim size): OLS on such data lets the
    * large-mean rows dominate the fit, and OLS-on-log(y) estimates the
    * median, not the mean. Fisher scoring through [[poissonFit]]'s
    * shared core with W = 1 and gradient residual (y−μ)/μ (log link is
    * non-canonical for gamma — expected information, the standard
    * choice), intercept seeded at ln ȳ so the first step cannot
    * overshoot into exp overflow. Same per-term readout (term_idx,
    * term, n, coef, se, z_stat); se from the final inverse Fisher
    * information, UP TO the gamma dispersion φ (se·√φ̂ if the caller
    * estimates one — the z ordering is φ-free). Caller contract:
    * y > 0 (zeros belong to a hurdle/Tweedie model, not gamma).
    *
    * 100 TB shape: identical to [[poissonFit]] — one seed aggregation
    * + iters × ONE decimal-quantized Gram aggregation, driver-side
    * (k+1)×(k+1) solves; nothing data-sized leaves the executors.
    */
  def gammaFit(df: DataFrame, yCol: String, xCols: Seq[String],
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, "gammaFit: iters must be 1..16")
    val spark = df.sparkSession
    import spark.implicits._
    val base = logitBase(df.filter(col(yCol).cast("double") > 0),
      yCol, xCols, "gammaFit")
    val (beta, invDiag, n) = glmBeta(base, xCols.size, iters,
      eta => exp(eta), _ => lit(1.0),
      (y, mu) => (y - mu) / mu, start = logMeanY(base))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    val out = terms.indices.map { i =>
      val se = math.sqrt(invDiag(i))
      (i, terms(i), n, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "z_stat")
      .orderBy(col("term_idx"))
  }

  /** Negative-binomial (NB2) regression with log link, V(μ) = μ + αμ²
    * (Cameron & Trivedi 1998) — [[poissonFit]] for OVERDISPERSED
    * counts: real event counts (errors per user, visits per day)
    * almost always have variance ≫ mean, which makes Poisson SEs
    * anti-conservative; NB2 widens them by the dispersion α the caller
    * supplies (α → 0 recovers Poisson; α from a pilot Poisson fit's
    * Pearson statistic is the usual choice). Fisher scoring with
    * W = μ/(1+αμ), gradient residual (y−μ)/(1+αμ), intercept seeded at
    * ln ȳ. Same per-term readout (term_idx, term, n, coef, se,
    * z_stat). Caller contract: y ≥ 0, α ≥ 0 fixed (a profiled α is a
    * different, non-replayable estimator).
    *
    * 100 TB shape: identical to [[poissonFit]].
    */
  def negBinFit(df: DataFrame, yCol: String, xCols: Seq[String],
      alpha: Double, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, "negBinFit: iters must be 1..16")
    require(alpha >= 0, "negBinFit: alpha must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val base = logitBase(df, yCol, xCols, "negBinFit")
    val (beta, invDiag, n) = glmBeta(base, xCols.size, iters,
      eta => exp(eta),
      mu => mu / (lit(1.0) + lit(alpha) * mu),
      (y, mu) => (y - mu) / (lit(1.0) + lit(alpha) * mu),
      start = logMeanY(base))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    val out = terms.indices.map { i =>
      val se = math.sqrt(invDiag(i))
      (i, terms(i), n, r6(beta(i)), r6(se),
        if (r6(se) > 0) Some(r6(beta(i) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "coef", "se", "z_stat")
      .orderBy(col("term_idx"))
  }

  /** Inverse-propensity-weighted average treatment effect (Horvitz &
    * Thompson 1952; Hájek ratio form; Rosenbaum & Rubin 1983): the
    * OBSERVATIONAL causal readout when assignment was not randomized —
    * [[olsAdjust]] models the OUTCOME given x; this models the
    * ASSIGNMENT given x (a [[logisticFit]] propensity e(x) = P(T=1|x))
    * and reweights each arm to the covariate mix of the whole
    * population:
    *
    *   μ₁ = Σ(T·y/ê)/Σ(T/ê),  μ₀ = Σ((1−T)·y/(1−ê))/Σ((1−T)/(1−ê)),
    *   ATE = μ₁ − μ₀,  ê clipped to [clip, 1−clip]
    *
    * (the Hájek estimator — self-normalizing, so weights need no
    * 1/n scaling; clipping is the standard overlap trim that keeps a
    * near-deterministic assignment from handing one subject a huge
    * weight). Treatment column must be 0/1. Returns one row
    * (n, n_treated, mu_treated, mu_control, ate), 6 dp.
    *
    * 100 TB shape: [[irlsBeta]]'s iters × one aggregation, then ONE
    * more weighted-moments aggregation with β riding the plan as
    * literals (no join, no second scan beyond the pass) — every sum
    * DECIMAL(38,12)-quantized.
    */
  def ipwAte(df: DataFrame, treatCol: String, yCol: String,
      xCols: Seq[String], iters: Int = 6,
      clip: Double = 0.01): DataFrame = {
    require(iters >= 1 && iters <= 12, "ipwAte: iters must be 1..12")
    require(clip > 0 && clip < 0.5, "ipwAte: clip must be in (0, 0.5)")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val base0 = df.select(col(treatCol).cast("double").as("__t") +:
        col(yCol).cast("double").as("__yy") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__t").isNotNull && col("__yy").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(true) // consumed per Newton step + final pass
    val base = base0.withColumn("__y", col("__t"))
    val (beta, _, _) = irlsBeta(base, k, iters)
    val eta = (0 until k).foldLeft(lit(beta(0)): Column)((acc, i) =>
      acc + lit(beta(i + 1)) * col(s"__x$i"))
    val mu = lit(1.0) / (lit(1.0) + exp(-eta))
    val e = least(greatest(mu, lit(clip)), lit(1.0 - clip))
    val m = base0
      .withColumn("__e", e)
      .agg(count(lit(1)).as("n"),
        sum(col("__t").cast("long")).as("nt"),
        sum(d12(col("__t") / col("__e"))).as("s1"),
        sum(d12(col("__t") * col("__yy") / col("__e"))).as("sy1"),
        sum(d12((lit(1.0) - col("__t")) / (lit(1.0) - col("__e"))))
          .as("s0"),
        sum(d12((lit(1.0) - col("__t")) * col("__yy") /
          (lit(1.0) - col("__e")))).as("sy0"))
      .head()
    val n = m.getLong(0)
    val nt = m.getLong(1)
    require(nt > 0 && nt < n, "ipwAte: need both treated and control rows")
    def dv(i: Int) = m.getDecimal(i).doubleValue()
    val mu1 = dv(3) / dv(2)
    val mu0 = dv(5) / dv(4)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n, nt, r6(mu1), r6(mu0), r6(mu1 - mu0)))
      .toDF("n", "n_treated", "mu_treated", "mu_control", "ate")
  }

  /** Propensity-score matching ATT (Rosenbaum & Rubin 1983, the
    * with-replacement nearest-neighbor form): each treated subject is
    * matched to its nearest CONTROL on the propensity score (within
    * `caliper`), and the effect on the treated is the mean matched
    * outcome difference — the causal readout people can SEE (pairs of
    * comparable users), completing the family beside [[ipwAte]]'s
    * weighting and [[aipwAte]]'s double robustness. With-replacement
    * matching is chosen deliberately: it is order-free (greedy 1:1
    * without replacement depends on a processing order — not
    * replayable, not parallel). Nearest = min |e_t − e_c|, ties to the
    * BACKWARD (≤) neighbor; treated with no control inside the caliper
    * are reported unmatched, never silently dropped into the mean.
    * Returns one row (n_treated, n_control, n_matched, att), 6 dp.
    *
    * 100 TB shape: the scored union range-partitions by (e, id) ONCE;
    * nearest-control-before/after ride in-partition struct-max/min
    * windows, with the cross-partition boundary carried by a 32-row
    * per-partition first/last-control collect (the prefix-sum device
    * generalized from sums to carried VALUES). No global sort, no
    * pair explosion.
    */
  def matchedAte(df: DataFrame, idCol: String, treatCol: String,
      yCol: String, xCols: Seq[String], iters: Int = 6,
      caliper: Double = 0.05): DataFrame = {
    require(iters >= 1 && iters <= 12, "matchedAte: iters must be 1..12")
    require(caliper > 0, "matchedAte: caliper must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    // the caller's id breaks exact propensity ties (identical
    // covariates -> identical e) deterministically — a generated id
    // would make the matched outcome partition-dependent
    val base0 = df.select(col(idCol).cast("long").as("__id") +:
        col(treatCol).cast("double").as("__t") +:
        col(yCol).cast("double").as("__yy") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__id").isNotNull && col("__t").isNotNull &&
        col("__yy").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(true) // Newton steps + the match pass
    val (pb, _, _) = irlsBeta(base0.withColumn("__y", col("__t")), k,
      iters)
    val eta = (0 until k).foldLeft(lit(pb(0)): Column)((acc, i) =>
      acc + lit(pb(i + 1)) * col(s"__x$i"))
    val scored = base0
      .select(col("__id"), col("__t"), col("__yy"),
        (lit(1.0) / (lit(1.0) + exp(-eta))).as("__e"))
      .repartitionByRange(col("__e"), col("__id"))
      .sortWithinPartitions(col("__e"), col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    // per-partition first/last CONTROL, carried across partitions
    val ctrlStruct = when(col("__t") === 0.0,
      struct(col("__e"), col("__id"), col("__yy")))
    val bounds = scored
      .groupBy(col("__pid"))
      .agg(max(ctrlStruct).as("__last"), min(ctrlStruct).as("__first"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), Option(r.getStruct(1)),
        Option(r.getStruct(2))))
    val nPids = bounds.map(_._1).max + 1
    // carryBack(p) = last control in any partition < p;
    // carryFwd(p) = first control in any partition > p
    val lastByPid = Array.fill[Option[(Double, Long, Double)]](nPids)(None)
    val firstByPid = Array.fill[Option[(Double, Long, Double)]](nPids)(None)
    bounds.foreach { case (p, l, f) =>
      lastByPid(p) = l.map(s => (s.getDouble(0), s.getLong(1),
        s.getDouble(2)))
      firstByPid(p) = f.map(s => (s.getDouble(0), s.getLong(1),
        s.getDouble(2)))
    }
    val carryBack = Array.fill[Option[(Double, Long, Double)]](nPids)(None)
    var run: Option[(Double, Long, Double)] = None
    for (p <- 0 until nPids) {
      carryBack(p) = run
      if (lastByPid(p).isDefined) run = lastByPid(p)
    }
    val carryFwd = Array.fill[Option[(Double, Long, Double)]](nPids)(None)
    run = None
    for (p <- (nPids - 1) to 0 by -1) {
      carryFwd(p) = run
      if (firstByPid(p).isDefined) run = firstByPid(p)
    }
    val carryDf = broadcast((0 until nPids).map { p =>
      (p, carryBack(p).map(_._1), carryBack(p).map(_._3),
        carryFwd(p).map(_._1), carryFwd(p).map(_._3))
    }.toDF("__pid", "__cbe", "__cby", "__cfe", "__cfy"))
    val wPrev = Window.partitionBy(col("__pid"))
      .orderBy(col("__e"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("__pid"))
      .orderBy(col("__e"), col("__id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val withNbr = scored
      .withColumn("__bwd", max(ctrlStruct).over(wPrev))
      .withColumn("__fwd", min(ctrlStruct).over(wNext))
      .join(carryDf, Seq("__pid"))
      .withColumn("__be",
        coalesce(col("__bwd.__e"), col("__cbe")))
      .withColumn("__by",
        when(col("__bwd.__e").isNotNull, col("__bwd.__yy"))
          .otherwise(col("__cby")))
      .withColumn("__fe",
        coalesce(col("__fwd.__e"), col("__cfe")))
      .withColumn("__fy",
        when(col("__fwd.__e").isNotNull, col("__fwd.__yy"))
          .otherwise(col("__cfy")))
    val distB = col("__e") - col("__be")
    val distF = col("__fe") - col("__e")
    val pickB = col("__be").isNotNull &&
      (col("__fe").isNull || distB <= distF)
    val matchDist = when(pickB, distB).otherwise(distF)
    val matchY = when(pickB, col("__by")).otherwise(col("__fy"))
    val agg = withNbr.filter(col("__t") === 1.0)
      .withColumn("__ok",
        (col("__be").isNotNull || col("__fe").isNotNull) &&
          matchDist <= lit(caliper))
      .agg(count(lit(1)).as("nt"),
        count(when(col("__ok"), 1)).as("nm"),
        sum(when(col("__ok"),
          d12(col("__yy") - matchY))).as("sdiff"))
      .head()
    val nc = scored.filter(col("__t") === 0.0).count()
    val nt = agg.getLong(0)
    val nm = agg.getLong(1)
    require(nt > 0 && nc > 0, "matchedAte: need both arms")
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val att =
      if (nm > 0) Some(r6(agg.getDecimal(2).doubleValue() / nm.toDouble))
      else None
    Seq((nt, nc, nm, att))
      .toDF("n_treated", "n_control", "n_matched", "att")
  }

  /** Augmented inverse-propensity-weighted (doubly-robust) ATE
    * (Robins, Rotnitzky & Zhao 1994): [[ipwAte]]'s weighting PLUS
    * per-arm OLS outcome models m₁(x)/m₀(x), combined so the estimate
    * stays consistent if EITHER the propensity model OR the outcome
    * model is right — the production-grade observational readout:
    *
    *   μ₁ = (1/n)·Σ[ m₁(x) + T·(y − m₁(x))/ê ]
    *   μ₀ = (1/n)·Σ[ m₀(x) + (1−T)·(y − m₀(x))/(1−ê) ]
    *   ATE = μ₁ − μ₀,  ê clipped to [clip, 1−clip]
    *
    * Returns one row (n, n_treated, mu_treated, mu_control, ate), 6 dp.
    *
    * 100 TB shape: [[irlsBeta]]'s iters × one aggregation for ê, ONE
    * t-grouped Gram aggregation for both arms' normal equations (two
    * driver-side [[gaussJordan]] solves), ONE final decimal-quantized
    * score aggregation with every β riding as plan literals. Nothing
    * data-sized leaves the executors.
    */
  def aipwAte(df: DataFrame, treatCol: String, yCol: String,
      xCols: Seq[String], iters: Int = 6,
      clip: Double = 0.01): DataFrame = {
    require(iters >= 1 && iters <= 12, "aipwAte: iters must be 1..12")
    require(clip > 0 && clip < 0.5, "aipwAte: clip must be in (0, 0.5)")
    require(xCols.nonEmpty && xCols.size <= 20,
      "aipwAte: need 1..20 covariates")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val p = k + 1
    val base0 = df.select(col(treatCol).cast("double").as("__t") +:
        col(yCol).cast("double").as("__yy") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__t").isNotNull && col("__yy").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(true) // Newton steps + Gram pass + score pass
    val (pb, _, _) = irlsBeta(base0.withColumn("__y", col("__t")), k,
      iters)
    // both arms' normal-equation moments in ONE t-grouped aggregation
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__yy"))).as("sy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__yy"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val arms = base0.groupBy(col("__t")).agg(aggs.head, aggs.tail: _*)
      .collect()
    require(arms.length == 2,
      "aipwAte: need both treated and control rows")
    def solve(r: org.apache.spark.sql.Row): Array[Double] = {
      def dv(f: String) = r.getDecimal(r.fieldIndex(f)).doubleValue()
      val nA = r.getLong(r.fieldIndex("n"))
      require(nA > p, s"aipwAte: arm needs n > $p rows, got $nA")
      def gx(i: Int, j: Int) =
        dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
      val w2 = 2 * p + 1
      val init = Array.tabulate(p, w2) { (rr, j) =>
        def gram(a: Int, b: Int): Double =
          if (a == 0 && b == 0) nA.toDouble
          else if (a == 0) dv(s"sx${b - 1}")
          else gx(a - 1, b - 1)
        if (j < p) { if (j >= rr) gram(rr, j) else gram(j, rr) }
        else if (j == p) { if (rr == 0) dv("sy") else dv(s"sx${rr - 1}y") }
        else if (j == p + 1 + rr) 1.0 else 0.0
      }
      gaussJordan(init, p)._1
    }
    val bT = solve(arms.find(_.getDouble(0) == 1.0).getOrElse(
      throw new IllegalArgumentException("aipwAte: treatment must be 0/1")))
    val bC = solve(arms.find(_.getDouble(0) == 0.0).getOrElse(
      throw new IllegalArgumentException("aipwAte: treatment must be 0/1")))
    def lin(b: Array[Double]) =
      (0 until k).foldLeft(lit(b(0)): Column)((acc, i) =>
        acc + lit(b(i + 1)) * col(s"__x$i"))
    val eta = (0 until k).foldLeft(lit(pb(0)): Column)((acc, i) =>
      acc + lit(pb(i + 1)) * col(s"__x$i"))
    val mu = lit(1.0) / (lit(1.0) + exp(-eta))
    val e = least(greatest(mu, lit(clip)), lit(1.0 - clip))
    val m1 = lin(bT)
    val m0 = lin(bC)
    val m = base0
      .withColumn("__e", e).withColumn("__m1", m1).withColumn("__m0", m0)
      .agg(count(lit(1)).as("n"),
        sum(col("__t").cast("long")).as("nt"),
        sum(d12(col("__m1") +
          col("__t") * (col("__yy") - col("__m1")) / col("__e")))
          .as("s1"),
        sum(d12(col("__m0") +
          (lit(1.0) - col("__t")) * (col("__yy") - col("__m0")) /
            (lit(1.0) - col("__e")))).as("s0"))
      .head()
    val n = m.getLong(0)
    val nt = m.getLong(1)
    val mu1 = m.getDecimal(2).doubleValue() / n.toDouble
    val mu0 = m.getDecimal(3).doubleValue() / n.toDouble
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n, nt, r6(mu1), r6(mu0), r6(mu1 - mu0)))
      .toDF("n", "n_treated", "mu_treated", "mu_control", "ate")
  }

  /** Rolling active users: for every calendar day in the stream's
    * [min, max] day range, the exact count of distinct users active that
    * day (DAU) and in the trailing `windowDays`-day window ending that
    * day (WAU for 7, MAU for 30) — the engagement dashboard's headline
    * pair. Days with no events still appear (dau 0), because a silent
    * day is the signal, not a gap in the chart.
    *
    * Shape: the log collapses to distinct (user, day) grain in the first
    * exchange (everything after is user-day-sized); the trailing-window
    * count EXPLODES each user-day into the `windowDays` target days it
    * contributes to and re-distincts — windowDays × user-days rows, one
    * more exchange, no range join and no per-day re-scan. The day spine
    * is a sequence() between two broadcast scalars. Exact counts, not
    * sketches — the HLL face (q65) is the approximate alternative when
    * user-day grain itself is too big.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    // pinned: three consumers (bounds, daily, rolling) — unpinned, each
    // would re-scan the event log and re-pay the distinct exchange
    val userDays = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
      .localCheckpoint(true)
    val bounds = userDays.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
    val spine = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val dau = userDays.groupBy(col("__d").as("day"))
      .agg(countDistinct(col("__u")).as("dau"))
    val rolling = userDays
      .select(col("__u"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("rolling_active"))
    spine
      .join(dau, Seq("day"), "left")
      .join(rolling, Seq("day"), "left") // rolling never null on spine days, but keep the shape uniform
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("rolling_active"), lit(0L)).as("rolling_active"))
      .orderBy(col("day"))
  }

  /** Churn training labels: at cutoff = max(ts) − horizon, each user
    * active in the observation window (ts ≤ cutoff) gets
    * (n_events_obs, days_since_last, churned) where churned = the user
    * has NO event in (cutoff, cutoff+horizon] — the label window is
    * fully observed by construction, so the labels are honest (a cutoff
    * at max(ts) would label everyone churned). Users first seen after
    * the cutoff are excluded: they have no observation features.
    *
    * Shape: one scalar max(ts) broadcast, then ONE user-key aggregation
    * computing both windows with conditional aggregates — the log never
    * shuffles twice.
    */
  def churnLabels(events: DataFrame, userCol: String, tsCol: String,
      horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be >= 1")
    val ref = events.agg(max(col(tsCol)).as("__maxTs"))
    events
      .select(col(userCol), col(tsCol))
      .crossJoin(broadcast(ref))
      .withColumn("__cutoff", col("__maxTs") - expr(s"INTERVAL $horizonDays DAYS"))
      .groupBy(col(userCol))
      .agg(
        sum(when(col(tsCol) <= col("__cutoff"), 1).otherwise(0)).as("n_events_obs"),
        max(when(col(tsCol) <= col("__cutoff"), col(tsCol))).as("__lastObs"),
        max(col("__cutoff")).as("__cut"),
        max(when(col(tsCol) > col("__cutoff"), 1).otherwise(0)).as("__post"))
      .where(col("n_events_obs") > 0)
      .select(col(userCol),
        col("n_events_obs"),
        datediff(to_date(col("__cut")), to_date(col("__lastObs")))
          .as("days_since_last"),
        (col("__post") === 0).as("churned"))
      .orderBy(col(userCol))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; retention at offset o = users of that cohort
    * active (≥1 event) in cohort_week + o weeks, as a fraction of the
    * cohort. Returns (cohort_week, week_offset, n_users, cohort_size,
    * retention) — the offset-0 row is the cohort itself (retention 1.0
    * by construction, a useful self-check row).
    *
    * Shape: distinct (user, active-week) collapses the event log first
    * (the big win — everything after is user-week-sized, not
    * event-sized); the per-user first week is an unbounded window MIN
    * over the user key — no join, no second scan of the log; the cohort
    * matrix is weeks² rows. cohort_size rides a window over the matrix,
    * not a re-scan.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val userWeeks = events
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).as("__wk"))
      .distinct() // one exchange; log collapses to user-week grain
    val wUser = Window.partitionBy(col("__u"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val matrix = userWeeks
      .withColumn("cohort_week", min(col("__wk")).over(wUser))
      .select(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val wCohort = Window.partitionBy(col("cohort_week"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    matrix
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(wCohort))
      .withColumn("retention",
        round(col("n_users") / col("cohort_size").cast("double"), 6))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Burstiness (Fano factor) per key: variance-to-mean ratio of daily
    * counts over the log's global [min, max] day span — Poisson
    * arrivals read ≈ 1, bursty traffic ≫ 1, metronomes < 1. The
    * zero-days enter the variance WITHOUT a spine:
    * `Σ(n_d − m)² over observed days + (span − observed)·m²` — the
    * missing days' deviations are all exactly m². Returns
    * (key, n_days, days_active, mean, variance, fano, overdispersed),
    * 6 dp; fano null for a zero-mean key; the flag is fano > 1 on the
    * 6-dp readout.
    *
    * 100 TB shape: one (key, day) collapse, one key fold, a 1-row span
    * frame broadcast — nothing key-unbounded.
    */
  def burstiness(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val daily = events
      .select(col(keyCol).cast("string").as("key"),
        to_date(col(tsCol)).as("__day"))
      .filter(col("key").isNotNull && col("__day").isNotNull)
      .groupBy(col("key"), col("__day"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(eager = true) // span + per-key fold
    val span = daily.agg(
      (datediff(max(col("__day")), min(col("__day"))) + 1)
        .cast("long").as("__span"))
    val perKey = daily.groupBy(col("key"))
      .agg(count(lit(1)).as("days_active"),
        sum(col("__n")).as("__tot"),
        sum(d12(col("__n") * col("__n"))).as("__ss"))
    perKey.crossJoin(broadcast(span))
      .withColumn("__m",
        col("__tot").cast("double") / col("__span").cast("double"))
      // Σ(n−m)² over ALL span days = Σn² − 2mΣn + span·m² (zero-days
      // included analytically — same double algebra on both faces)
      .withColumn("__var",
        (col("__ss").cast("double") -
          lit(2.0) * col("__m") * col("__tot").cast("double") +
          col("__span").cast("double") * col("__m") * col("__m")) /
          col("__span").cast("double"))
      .select(col("key"), col("__span").as("n_days"),
        col("days_active"),
        round(col("__m"), 6).as("mean"),
        round(col("__var"), 6).as("variance"),
        when(col("__m") > 0, round(col("__var") / col("__m"), 6))
          .as("fano"))
      .withColumn("overdispersed",
        when(col("fano").isNotNull, col("fano") > 1.0))
      .orderBy(col("key"))
  }

  /** Event study around an intervention date: per key, the mean daily
    * event rate over the `windowDays` BEFORE `interventionDay` vs the
    * window from it — the "did the launch move the metric" readout
    * (pre/post means over fixed-length windows; missing days count as
    * zero, which a conditional SUM gives for free — no spine needed).
    * Returns (key, base_mean, post_mean, abs_lift, pct_lift), 6 dp;
    * pct_lift null when the baseline is zero. Keys with no event in
    * either window don't appear (no row ≠ a zero row — stated).
    *
    * 100 TB shape: ONE key-grouped aggregation with two conditional
    * sums; nothing else.
    */
  def eventStudy(events: DataFrame, keyCol: String, tsCol: String,
      interventionDay: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 365,
      "eventStudy: windowDays in 1..365")
    val d = datediff(to_date(col(tsCol)), to_date(lit(interventionDay)))
    val wD = lit(windowDays.toDouble)
    events
      .select(col(keyCol).cast("string").as("key"), d.as("__d"))
      .filter(col("key").isNotNull &&
        col("__d") >= -windowDays && col("__d") < windowDays)
      .groupBy(col("key"))
      .agg(
        sum(when(col("__d") < 0, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("__d") >= 0, 1L).otherwise(0L)).as("__np"))
      .select(col("key"),
        round(col("__nb").cast("double") / wD, 6).as("base_mean"),
        round(col("__np").cast("double") / wD, 6).as("post_mean"))
      .withColumn("abs_lift",
        round(col("post_mean") - col("base_mean"), 6))
      .withColumn("pct_lift",
        when(col("base_mean") > 0,
          round((col("post_mean") - col("base_mean")) /
            col("base_mean"), 6)))
      .orderBy(col("key"))
  }

  /** Pooled retention-decay fit: ln(retention) regressed on the week
    * offset over every (cohort, offset ≥ 1) cell of
    * [[cohortRetention]]'s matrix — the exponential-churn summary
    * (constant weekly churn ⇔ geometric retention ⇔ linear log), with
    * `half_life_weeks = ln 2 / (−slope)`. Fitting on the matrix's own
    * 6-dp readouts keeps both faces on one grain. Returns one row
    * (n_cells, slope, intercept, r2, half_life_weeks), 6 dp;
    * half-life null when the slope isn't negative (no decay).
    *
    * Shape: cohortRetention's one user-week collapse + [[olsFit]]'s
    * single Gram aggregation over the cohort×offset-sized matrix.
    */
  def retentionHalfLife(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cells = cohortRetention(events, userCol, tsCol)
      .filter(col("week_offset") >= 1 && col("retention") > 0)
      .select(col("week_offset").cast("double").as("__w"),
        log(col("retention")).as("__lr"))
    val fit = olsFit(cells, "__lr", Seq("__w")).collect()
    val slope = fit.find(_.getString(1) == "__w").get
    val icept = fit.find(_.getString(1) == "intercept").get
    val n = slope.getLong(2)
    val (b, a) = (slope.getDouble(3), icept.getDouble(3))
    val r2 = if (slope.isNullAt(6)) None else Some(slope.getDouble(6))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val hl = if (b < 0) Some(r6(math.log(2.0) / -b)) else None
    Seq((n, b, a, r2, hl))
      .toDF("n_cells", "slope", "intercept", "r2", "half_life_weeks")
  }

  /** Batch gap-based sessionization — the batch face of
    * [[graft.streaming.StreamOps.sessionize]]: a user's events split
    * into sessions wherever the gap to the previous event exceeds
    * `gapMillis`; ties at the same timestamp order by `idCol`
    * (deterministic). Returns one row per session:
    * (user, session_idx, n_events, start_ms, end_ms, duration_ms),
    * session_idx 1-based in time order.
    *
    * 100 TB shape: ONE user-keyed exchange carries the lag window, the
    * session-boundary running count (same partitioning — no second
    * shuffle), and the per-session collapse. Per-user partitions are
    * bounded by user activity (the funnel/topPaths bound).
    */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMillis: Long): DataFrame = {
    require(gapMillis > 0, "gapMillis must be positive")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ms"), col("__id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(userCol).as("__u"),
        unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
        col(idCol).as("__id"))
      .filter(col("__u").isNotNull && col("__ms").isNotNull)
      .withColumn("__gap",
        when(lag(col("__ms"), 1).over(w).isNull ||
          col("__ms") - lag(col("__ms"), 1).over(w) > gapMillis, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__gap")).over(wCum))
      .groupBy(col("__u").as("user"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ms")).as("start_ms"),
        max(col("__ms")).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .orderBy(col("user"), col("session_idx"))
  }

  /** Cohort lifetime-value curve — [[cohortRetention]]'s revenue
    * sibling: users cohort by the week of their FIRST event, qualifying
    * spend (rows matching `isSpend`, summed over `valueCol`) lands in
    * its week offset, and each cohort's curve accumulates to cumulative
    * LTV per user. The readout every growth team tapes to the wall:
    * "how much is a week-N-old cohort worth so far". Returns one row
    * per (cohort_week, week_offset ≤ maxWeeks):
    * (cohort_week, week_offset, cohort_size, n_buyers, revenue,
    * cum_ltv_per_user), revenue exact-DECIMAL-summed, readouts 6 dp.
    * Offsets with no spend still appear up to each cohort's OBSERVED
    * horizon — the log's last week (a flat observed week is data; an
    * unobserved future week is not, and emitting it as zero would
    * understate young cohorts).
    *
    * 100 TB shape: one user-keyed window finds cohorts, one
    * (cohort, offset) aggregate collapses spend, the spine is
    * cohort×maxWeeks (calendar-bounded), and the cumulative sum rides
    * a per-cohort window over ≤ maxWeeks rows.
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, isSpend: Column, maxWeeks: Int): DataFrame = {
    require(maxWeeks >= 1 && maxWeeks <= 520,
      "cohortLtv: maxWeeks in 1..520")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val ev = events
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).as("__wk"),
        col(valueCol).cast("double").as("__v"),
        isSpend.as("__sp"))
      .filter(col("__u").isNotNull && col("__wk").isNotNull)
    val wUser = Window.partitionBy(col("__u"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val marked = ev
      .withColumn("cohort_week", min(col("__wk")).over(wUser))
      .withColumn("week_offset",
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("int"))
      .filter(col("week_offset") <= maxWeeks)
      .localCheckpoint(eager = true) // sizes + spend read it
    val sizes = marked.groupBy(col("cohort_week"))
      .agg(countDistinct(col("__u")).as("cohort_size"))
    val spend = marked
      .filter(col("__sp") && col("__v").isNotNull)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("n_buyers"),
        sum(d12(col("__v"))).as("__rev"))
    val horizon = marked.agg(max(col("__wk")).as("__maxwk"))
    val spine = sizes
      .crossJoin(broadcast(horizon))
      .select(col("cohort_week"), col("cohort_size"),
        explode(sequence(lit(0),
          least(lit(maxWeeks),
            (datediff(col("__maxwk"), col("cohort_week")) / 7)
              .cast("int")))).as("week_offset"))
    val wCum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(spend, Seq("cohort_week", "week_offset"), "left")
      .select(col("cohort_week"), col("week_offset"),
        col("cohort_size"),
        coalesce(col("n_buyers"), lit(0L)).as("n_buyers"),
        coalesce(col("__rev"), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,12)")).as("__rev2"))
      .withColumn("revenue", round(col("__rev2").cast("double"), 6))
      .withColumn("cum_ltv_per_user",
        round(sum(col("__rev2")).over(wCum).cast("double") /
          col("cohort_size").cast("double"), 6))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_buyers"), col("revenue"), col("cum_ltv_per_user"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Top user journeys: each user's first `pathLen` events (by
    * (ts, id) — deterministic under simultaneous events) joined into a
    * path string, counted across users, topK by (count desc, path).
    * The "how do users actually start" readout next to [[markovTransitions]]'
    * one-step view. Returns (path, n_users).
    *
    * Shape: one user-key exchange carries the row_number window AND the
    * per-user collapse (same partitioning); the path table is
    * |distinct paths|-sized; topK is a TakeOrdered. The in-group sort
    * is array_sort over ≤ pathLen elements — collect_list's
    * arrival-order nondeterminism never reaches the output.
    */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, pathLen: Int,
      topK: Int = 50): DataFrame = {
    require(pathLen >= 1, "pathLen must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val wk = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__rn", row_number().over(wk))
      .where(col("__rn") <= pathLen)
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col("__rn"), col(typeCol)
        .as("__t")))).as("__steps"))
      .select(concat_ws(">", transform(col("__steps"),
        s => s.getField("__t"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topK)
  }

  /** Kaplan-Meier time-to-event survival curve (Kaplan & Meier 1958):
    * for each user with an ANCHOR event (first `anchorType`), the
    * "event" is their first `targetType` at-or-after the anchor;
    * users with none are right-CENSORED at the observation end
    * (the log's max timestamp) — the estimator's whole point is that
    * censored users still contribute to the at-risk denominator until
    * they drop out, so "hasn't converted YET" is not "never converts".
    * The product-analytics time-to-conversion curve; with churn as the
    * target it's the retention survival curve.
    *
    * Time is `floor((t_event - t_anchor) / unitMillis)` (default 1 h
    * buckets). Returns one row per distinct time
    * (t, n_at_risk, n_events, n_censored, survival) where
    * `survival = prod over u <= t of (1 - d_u / n_u)` — the KM
    * estimator, computed as exp of an ordered window sum of
    * DECIMAL(38,12)-quantized log factors (deterministic order, no FP
    * association drift), rounded to 6 dp. A time where every at-risk
    * user dies (d = n, necessarily the last row) pins survival to 0
    * exactly instead of feeding ln(0) into the sum.
    *
    * 100 TB shape: anchors and targets are two pushed-down scans of
    * the log collapsing to user grain (one user-key exchange each, the
    * target min rides the anchor join's partitioning); the observation
    * end is a 1-row broadcast. The CURVE frame is duration-grain —
    * bounded by the observation span over the bucket unit, thousands
    * of rows at any corpus size — so its unpartitioned ordered windows
    * are a deliberate single-reducer pass over a calendar-sized frame,
    * not a data-sized one.
    */
  def timeToEventSurvival(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, anchorType: String,
      targetType: String, unitMillis: Long = 3600000L): DataFrame = {
    require(unitMillis > 0, "unitMillis must be positive")
    val ev = events.select(col(userCol).as("__u"),
      unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
      col(typeCol).as("__t"))
    val anchors = ev.filter(col("__t") === anchorType)
      .groupBy(col("__u")).agg(min(col("__ms")).as("__anchor"))
    val firstEvt = ev.filter(col("__t") === targetType)
      .join(anchors, Seq("__u"))
      .where(col("__ms") >= col("__anchor"))
      .groupBy(col("__u")).agg(min(col("__ms")).as("__evt"))
    val end = ev.agg(max(col("__ms")).as("__end"))
    val perUser = anchors
      .join(firstEvt, Seq("__u"), "left")
      .crossJoin(broadcast(end))
      .select(
        when(col("__evt").isNotNull, 1L).otherwise(0L).as("__e"),
        floor((coalesce(col("__evt"), col("__end")) - col("__anchor")) /
          lit(unitMillis.toDouble)).cast("long").as("t"))
    val km = perUser.groupBy(col("t"))
      .agg(sum(col("__e")).as("n_events"),
        sum(lit(1L) - col("__e")).as("n_censored"))
    // curve-sized frame: unpartitioned ordered windows are intentional
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leaving = col("n_events") + col("n_censored")
    km.withColumn("n_at_risk",
        sum(leaving).over(wAll) - coalesce(sum(leaving).over(wPrev), lit(0L)))
      .withColumn("__lnq",
        when(col("n_events") < col("n_at_risk"),
          log(lit(1.0) - col("n_events").cast("double") / col("n_at_risk")))
          .cast("decimal(38,12)"))
      .withColumn("survival",
        when(col("n_events") === col("n_at_risk"), 0.0)
          .otherwise(round(exp(sum(col("__lnq")).over(wCum).cast("double")), 6)))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("survival"))
      .orderBy(col("t"))
  }

  /** Per-group Kaplan-Meier curves + Nelson-Aalen cumulative hazard
    * over a per-subject (group, duration, event-flag) frame — the
    * CURVE face of [[graft.ops.Profile.logRankTest]] (same input
    * contract; the test says WHETHER two arms differ, this shows
    * WHERE the curves separate) and the by-arm generalization of
    * [[timeToEventSurvival]]'s single curve. Per (group, t):
    * n_at_risk, n_events, n_censored, `survival` (the KM product via
    * the exp-of-quantized-log-sum device) and `cum_hazard` (the
    * Nelson-Aalen Σ d/n — DECIMAL-quantized terms, the estimator
    * whose slope reads the hazard RATE directly). 6 dp. A time where
    * every at-risk subject dies pins survival to 0 exactly
    * (necessarily the group's last row).
    *
    * 100 TB shape: one (group, duration) grain aggregation; every
    * window after it is PARTITIONED by group over the duration grain
    * (calendar-bounded for bucketed durations — the same documented
    * contract as [[timeToEventSurvival]]).
    */
  /** Cox proportional hazards (Cox 1972, Breslow ties) — the survival
    * workhorse beside [[kmCurves]]/[[graft.ops.Profile.logRankTest]]:
    * log hazard ratios for k covariates by Newton-Raphson on the
    * partial likelihood. Per iteration (β as plan literals), every
    * risk-set quantity collapses to the DISTINCT-TIME grain — per time
    * t the deaths `d_t`, the dying subjects' covariate sums, and the
    * exp(xβ)-weighted moments of subjects AT t — then `S0/S1/S2`
    * (risk-set sums over T ≥ t) are SUFFIX sums over that grain (the
    * logRankTest device; the unpartitioned window is time-grain-
    * bounded, never subject-bounded), and the gradient/Hessian are one
    * grain-sized decimal-quantized fold + a k×k driver solve. Returns
    * one row per covariate: (term_idx, term, n, n_events, coef,
    * hazard_ratio, se, z), 6 dp — coef > 0 means the covariate raises
    * the hazard (shortens survival).
    *
    * 100 TB shape: `iters` × (one subject-sized projection + one
    * time-grain aggregation + grain windows + one 1-row moments
    * collect); k ≤ 10, so the Hessian is a plan-time constant.
    */
  /** The shared Cox projected base: (__t, __e, __x*) listwise-null-
    * deleted and pinned (consumed once per Newton step, plus the
    * diagnostic's residual pass). */
  private def coxBase(df: DataFrame, timeCol: String,
      eventCol: String, xCols: Seq[String]): DataFrame = {
    val k = xCols.size
    df.select(col(timeCol).cast("double").as("__t") +:
        col(eventCol).cast("long").as("__e") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__t").isNotNull && col("__e").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(eager = true) // iters consumers
  }

  /** One pass of the Cox partial-likelihood grain at a fixed β: per
    * distinct time the death count `d`, the dying subjects' covariate
    * sums `sx_j`, and the exp(xβ)-weighted risk-set suffix sums
    * `__S0/__S1_j/__S2_j_l` (rows are DISTINCT event times — the
    * unpartitioned suffix window is time-grain-bounded, the logRank
    * argument). Shared verbatim by [[coxPh]]'s Newton steps and
    * [[coxPhTest]]'s Schoenfeld residual pass so the two cannot
    * drift. */
  private def coxGrain(base: DataFrame, k: Int,
      beta: Array[Double], strat: Boolean = false): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    // stratified face: risk sets live PER STRATUM — the grain gains the
    // stratum key and the suffix window partitions on it (rows stay
    // time-grain-bounded per stratum); the unstratified path is the
    // identical plan it always was
    val wSuffix = (if (strat) Window.partitionBy(col("__s")).orderBy(col("__t"))
      else Window.orderBy(col("__t")))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val eta = (0 until k).foldLeft(lit(0.0): Column)((acc, j) =>
      acc + lit(beta(j)) * col(s"__x$j"))
    val wgt = exp(eta)
    val grainAggs =
      Seq(sum(col("__e")).as("d")) ++
        (0 until k).map(j => sum(d12(when(col("__e") === 1L,
          col(s"__x$j")).otherwise(lit(0.0)))).as(s"sx$j")) ++
        Seq(sum(d12(wgt)).as("rw")) ++
        (0 until k).map(j =>
          sum(d12(wgt * col(s"__x$j"))).as(s"rwx$j")) ++
        (for { j <- 0 until k; l <- j until k } yield
          sum(d12(wgt * col(s"__x$j") * col(s"__x$l")))
            .as(s"rwxx${j}_$l"))
    val grain = (if (strat) base.groupBy(col("__s"), col("__t"))
      else base.groupBy(col("__t")))
      .agg(grainAggs.head, grainAggs.tail: _*)
    val withS = grain
      .withColumn("__S0", sum(col("rw")).over(wSuffix).cast("double"))
    val withS1 = (0 until k).foldLeft(withS)((acc, j) =>
      acc.withColumn(s"__S1_$j",
        sum(col(s"rwx$j")).over(wSuffix).cast("double")))
    (for { j <- 0 until k; l <- j until k }
      yield (j, l)).foldLeft(withS1) { case (acc, (j, l)) =>
      acc.withColumn(s"__S2_${j}_$l",
        sum(col(s"rwxx${j}_$l")).over(wSuffix).cast("double"))
    }
  }

  /** [[coxPh]]'s fixed-count Newton-Raphson on the Breslow partial
    * likelihood over an already-projected base — returns (β, the
    * inverse-Hessian diagonal at the last step). */
  private def coxNewton(base: DataFrame, k: Int,
      iters: Int, strat: Boolean = false): (Array[Double], Array[Double]) = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    var beta = Array.fill(k)(0.0)
    var invDiag = Array.fill(k)(0.0)
    (1 to iters).foreach { _ =>
      val withS2 = coxGrain(base, k, beta, strat)
      val dD = col("d").cast("double")
      val momAggs =
        (0 until k).map(j =>
          sum(d12(col(s"sx$j").cast("double") -
            dD * (col(s"__S1_$j") / col("__S0")))).as(s"g$j")) ++
          (for { j <- 0 until k; l <- j until k } yield
            sum(d12(dD * (col(s"__S2_${j}_$l") / col("__S0") -
              (col(s"__S1_$j") / col("__S0")) *
                (col(s"__S1_$l") / col("__S0"))))).as(s"h${j}_$l"))
      val m = withS2.filter(col("d") > 0)
        .agg(momAggs.head, momAggs.tail: _*).head()
      def dv(f: String) = {
        val d = m.getDecimal(m.fieldIndex(f))
        if (d == null) 0.0 else d.doubleValue()
      }
      // Newton step: solve H·δ = g with the shared pivotless scheme
      val p = k
      val wdt = 2 * p + 1
      val init = Array.tabulate(p, wdt) { (r, j) =>
        if (j < p) {
          val (lo, hi) = (math.min(r, j), math.max(r, j))
          dv(s"h${lo}_$hi")
        }
        else if (j == p) dv(s"g$r")
        else if (j == p + 1 + r) 1.0 else 0.0
      }
      val (delta, inv) = gaussJordan(init, p)
      beta = Array.tabulate(k)(j => beta(j) + delta(j))
      invDiag = inv
    }
    (beta, invDiag)
  }

  def coxPh(df: DataFrame, timeCol: String, eventCol: String,
      xCols: Seq[String], iters: Int = 6): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 10,
      "coxPh: need 1..10 covariates")
    require(xCols.distinct.size == xCols.size,
      "coxPh: covariates must be distinct")
    require(iters >= 1 && iters <= 12, "coxPh: iters must be in 1..12")
    val spark = df.sparkSession
    import spark.implicits._
    val k = xCols.size
    val base = coxBase(df, timeCol, eventCol, xCols)
    val counts = base.agg(count(lit(1)).as("n"),
      sum(col("__e")).as("d")).head()
    val n = counts.getLong(0)
    val nEvents = counts.getLong(1)
    require(nEvents > k,
      s"coxPh: need more events than covariates, got $nEvents")
    val (beta, invDiag) = coxNewton(base, k, iters)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = (0 until k).map { j =>
      val se = math.sqrt(invDiag(j))
      (j, xCols(j), n, nEvents, r6(beta(j)), r6(math.exp(beta(j))),
        r6(se), if (r6(se) > 0) Some(r6(beta(j) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "n_events", "coef",
      "hazard_ratio", "se", "z")
      .orderBy(col("term_idx"))
  }

  /** Stratified Cox proportional hazards — the standard REMEDY once
    * [[coxPhTest]] flags a covariate as PH-violating: move it (or any
    * nuisance grouping — site, cohort, device) into the STRATA, where
    * each stratum keeps its own unconstrained baseline hazard, and fit
    * ONE shared β for the remaining covariates across all strata. The
    * stratified Breslow partial likelihood is the plain one summed per
    * stratum: risk sets never cross strata (each stratum's own
    * [[coxGrain]] suffix sums — the grain gains the stratum key and
    * the window partitions on it), while the gradient/Hessian fold
    * pools every stratum's grain rows into the same Newton step. With
    * one stratum the trajectory is BIT-IDENTICAL to [[coxPh]] (the
    * suffix sums and moment folds are decimal-quantized — partitioning
    * a constant key moves nothing), spec-pinned.
    *
    * Returns one row per covariate: (term_idx, term, n, n_events,
    * n_strata, coef, hazard_ratio, se, z), 6 dp — [[coxPh]]'s readout
    * plus the stratum count.
    *
    * 100 TB shape: [[coxPh]]'s exactly — `iters` × (one subject-sized
    * projection + ONE (stratum, time)-grain aggregation + stratum-
    * partitioned grain windows + one 1-row moments collect); strata
    * ride the SAME shuffles as the time grain, so stratifying adds no
    * pass and no new exchange.
    */
  def coxPhStratified(df: DataFrame, timeCol: String, eventCol: String,
      xCols: Seq[String], strataCol: String,
      iters: Int = 6): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 10,
      "coxPhStratified: need 1..10 covariates")
    require(xCols.distinct.size == xCols.size,
      "coxPhStratified: covariates must be distinct")
    require(!xCols.contains(strataCol),
      "coxPhStratified: strataCol cannot also be a covariate")
    require(iters >= 1 && iters <= 12,
      "coxPhStratified: iters must be in 1..12")
    val spark = df.sparkSession
    import spark.implicits._
    val k = xCols.size
    val base = df.select(col(timeCol).cast("double").as("__t") +:
        col(eventCol).cast("long").as("__e") +:
        col(strataCol).cast("string").as("__s") +:
        xCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__t").isNotNull && col("__e").isNotNull &&
        col("__s").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
      .localCheckpoint(eager = true) // iters consumers
    val counts = base.agg(count(lit(1)).as("n"),
      sum(col("__e")).as("d"),
      countDistinct(col("__s")).as("ns")).head()
    val n = counts.getLong(0)
    val nEvents = counts.getLong(1)
    val nStrata = counts.getLong(2)
    require(nEvents > k,
      s"coxPhStratified: need more events than covariates, got $nEvents")
    val (beta, invDiag) = coxNewton(base, k, iters, strat = true)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = (0 until k).map { j =>
      val se = math.sqrt(invDiag(j))
      (j, xCols(j), n, nEvents, nStrata, r6(beta(j)),
        r6(math.exp(beta(j))), r6(se),
        if (r6(se) > 0) Some(r6(beta(j) / se)) else None)
    }
    out.toDF("term_idx", "term", "n", "n_events", "n_strata", "coef",
      "hazard_ratio", "se", "z")
      .orderBy(col("term_idx"))
  }

  /** Proportional-hazards diagnostic for [[coxPh]] — the check the
    * fit is otherwise trusted without (Grambsch & Therneau 1994's
    * idea, the pragmatic identity-transform form): at the FITTED β,
    * per event time the Schoenfeld residual
    * `r_j(t) = Σ_{deaths at t} x_j − d_t·(S1_j/S0)(t)` (the same
    * risk-set grain the Newton pass already computes), regressed on
    * the EVENT RANK of t. Under proportional hazards the residuals
    * are trendless; a covariate whose effect grows or fades over time
    * shows a signed slope. Returns one row per covariate:
    * (term_idx, term, n_times, coef, slope, corr, z) — `slope` the
    * residual-vs-rank OLS slope, `corr` the Pearson correlation, `z`
    * the t-form trend statistic `corr·√(m−2)/√(1−corr²)` (null when
    * m ≤ 2, a moment degenerates, or |corr| rounds to 1); |z| ≳ 2
    * flags a PH violation. 6 dp.
    *
    * The fit is [[coxNewton]] (identical trajectory to [[coxPh]] —
    * same base, same steps); the residual pass is ONE more
    * [[coxGrain]] at the final β plus a time-grain rank window and a
    * DECIMAL(38,12)-quantized 6-moment fold; the trend algebra runs
    * on the driver in fixed double shapes (engine-replayable).
    *
    * 100 TB shape: [[coxPh]]'s per-iteration passes + one extra
    * grain pass; the moments collect is one row of 6k doubles.
    */
  def coxPhTest(df: DataFrame, timeCol: String, eventCol: String,
      xCols: Seq[String], iters: Int = 6): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 10,
      "coxPhTest: need 1..10 covariates")
    require(xCols.distinct.size == xCols.size,
      "coxPhTest: covariates must be distinct")
    require(iters >= 1 && iters <= 12,
      "coxPhTest: iters must be in 1..12")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val base = coxBase(df, timeCol, eventCol, xCols)
    val nEvents = base.agg(sum(col("__e"))).head().getLong(0)
    require(nEvents > k,
      s"coxPhTest: need more events than covariates, got $nEvents")
    val (beta, _) = coxNewton(base, k, iters)
    // event-time rank over the (already time-grain) death rows — the
    // unpartitioned window is grain-bounded, the coxGrain argument
    val wRank = Window.orderBy(col("__t"))
    val res = coxGrain(base, k, beta)
      .filter(col("d") > 0)
      .withColumn("__g", row_number().over(wRank).cast("double"))
    val dD = col("d").cast("double")
    def rj(j: Int) = col(s"sx$j").cast("double") -
      dD * (col(s"__S1_$j") / col("__S0"))
    val momAggs = Seq(count(lit(1)).as("m"),
      sum(d12(col("__g"))).as("sg"),
      sum(d12(col("__g") * col("__g"))).as("sg2")) ++
      (0 until k).flatMap(j => Seq(
        sum(d12(rj(j))).as(s"sr$j"),
        sum(d12(rj(j) * rj(j))).as(s"sr2_$j"),
        sum(d12(col("__g") * rj(j))).as(s"sgr$j")))
    val mRow = res.agg(momAggs.head, momAggs.tail: _*).head()
    def dv(f: String) = {
      val d = mRow.getDecimal(mRow.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val m = mRow.getLong(0)
    val mD = m.toDouble
    val (sg, sg2) = (dv("sg"), dv("sg2"))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = (0 until k).map { j =>
      val (sr, sr2, sgr) = (dv(s"sr$j"), dv(s"sr2_$j"), dv(s"sgr$j"))
      val num = mD * sgr - sg * sr
      val vg = mD * sg2 - sg * sg
      val vr = mD * sr2 - sr * sr
      val slope = if (vg > 0) Some(r6(num / vg)) else None
      val corr = if (vg > 0 && vr > 0)
        Some(num / (math.sqrt(vg) * math.sqrt(vr))) else None
      val z = corr.filter(c => m > 2 && c * c < 1.0)
        .map(c => r6(c * math.sqrt(mD - 2.0) /
          math.sqrt(1.0 - c * c)))
      (j, xCols(j), m, r6(beta(j)), slope, corr.map(r6), z)
    }
    out.toDF("term_idx", "term", "n_times", "coef", "slope", "corr",
      "z")
      .orderBy(col("term_idx"))
  }

  def kmCurves(df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val vals = df
      .filter(col(groupCol).isNotNull && col(timeCol).isNotNull &&
        col(eventCol).isNotNull)
      .select(col(groupCol).cast("string").as(groupCol),
        col(timeCol).cast("double").as("t"),
        col(eventCol).cast("long").as("__e"))
    val km = vals.groupBy(col(groupCol), col("t"))
      .agg(sum(col("__e")).as("n_events"),
        sum(lit(1L) - col("__e")).as("n_censored"))
    val wAll = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leaving = col("n_events") + col("n_censored")
    km.withColumn("n_at_risk",
        sum(leaving).over(wAll) -
          coalesce(sum(leaving).over(wPrev), lit(0L)))
      .withColumn("__lnq",
        when(col("n_events") < col("n_at_risk"),
          log(lit(1.0) -
            col("n_events").cast("double") / col("n_at_risk")))
          .cast("decimal(38,12)"))
      .withColumn("survival",
        when(col("n_events") === col("n_at_risk"), 0.0)
          .otherwise(round(
            exp(sum(col("__lnq")).over(wCum).cast("double")), 6)))
      .withColumn("cum_hazard",
        round(sum((col("n_events").cast("double") /
            col("n_at_risk").cast("double")).cast("decimal(38,12)"))
          .over(wCum).cast("double"), 6))
      .select(col(groupCol), col("t"), col("n_at_risk"),
        col("n_events"), col("n_censored"), col("survival"),
        col("cum_hazard"))
      .orderBy(col(groupCol), col("t"))
  }

  /** Aalen-Johansen cumulative incidence under COMPETING RISKS
    * (Aalen & Johansen 1978) — the correct per-cause probability
    * curve when subjects can fail from more than one cause
    * (churn vs upgrade, purchase vs error): per (group, t, cause),
    * `CIF_c(t) = Σ_{s ≤ t} Ŝ(s−) · d_c(s) / n(s)` where Ŝ(s−) is the
    * ALL-CAUSE Kaplan-Meier survival just before s. Treating each
    * cause alone and censoring the others (1 − KM per cause)
    * overstates every incidence because it redistributes competing
    * failures; Aalen-Johansen's incidences add up — Σ_c CIF_c(t) =
    * 1 − Ŝ(t) exactly (the telescoping identity the single-cause
    * spec pins). Input contract: one row per subject with a NULL
    * cause meaning right-censored and any non-null cause string an
    * observed failure. Returns one row per (group, t, cause) with an
    * event of that cause: (group, t, cause, n_at_risk, n_events,
    * survival, cif) — `survival` is the all-cause KM AT t (0 exactly
    * when every at-risk subject fails, necessarily the group's last
    * row), `cif` the running 6-dp incidence. Per-term products are
    * DECIMAL(38,12)-quantized before the one running sum
    * (order-invariant, engine-replayable).
    *
    * 100 TB shape: [[kmCurves]]' passes — one (group, time) and one
    * (group, time, cause) grain aggregation off the subject frame,
    * group-partitioned windows on the time grain, a time-grain join,
    * then (group, cause)-partitioned running sums. Nothing
    * subject-sized moves after the grain collapse.
    */
  def ajIncidence(df: DataFrame, groupCol: String, timeCol: String,
      causeCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val vals = df
      .filter(col(groupCol).isNotNull && col(timeCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(timeCol).cast("double").as("t"),
        col(causeCol).cast("string").as("__c"))
      .localCheckpoint(true) // consumers: all-cause grain + cause grain
    val km = vals.groupBy(col("__g"), col("t"))
      .agg(count(col("__c")).as("n_events"), // count() skips nulls
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("n_censored"))
    val wAll = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("__g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leaving = col("n_events") + col("n_censored")
    // a row with n_events = n_at_risk is necessarily its group's
    // last (nobody remains), so the null __lnq it leaves can never
    // poison a LATER row's prefix sums
    val base = km
      .withColumn("n_at_risk",
        sum(leaving).over(wAll) -
          coalesce(sum(leaving).over(wPrev), lit(0L)))
      .withColumn("__lnq",
        when(col("n_events") < col("n_at_risk"),
          log(lit(1.0) -
            col("n_events").cast("double") / col("n_at_risk")))
          .cast("decimal(38,12)"))
      .withColumn("survival",
        when(col("n_events") === col("n_at_risk"), 0.0)
          .otherwise(round(
            exp(sum(col("__lnq")).over(wCum).cast("double")), 6)))
      .withColumn("__sprev",
        coalesce(exp(sum(col("__lnq")).over(wPrev).cast("double")),
          lit(1.0)))
      .select(col("__g"), col("t"), col("n_at_risk"),
        col("survival"), col("__sprev"))
    val perCause = vals.filter(col("__c").isNotNull)
      .groupBy(col("__g"), col("t"), col("__c").as("cause"))
      .agg(count(lit(1)).as("n_events"))
    val wCif = Window.partitionBy(col("__g"), col("cause"))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCause.join(base, Seq("__g", "t"))
      .withColumn("__term", d12(col("__sprev") *
        (col("n_events").cast("double") /
          col("n_at_risk").cast("double"))))
      .withColumn("cif",
        round(sum(col("__term")).over(wCif).cast("double"), 6))
      .select(col("__g").as(groupCol), col("t"), col("cause"),
        col("n_at_risk"), col("n_events"), col("survival"), col("cif"))
      .orderBy(col(groupCol), col("cause"), col("t"))
  }

  /** Shared (key, day) count collapse for the per-key daily-series
    * operators (anomaly/seasonality/CUSUM/Theil-Sen/SES): nulls
    * dropped, key canonicalized to its string form, ONE event-sized
    * exchange. `pin` when the caller fans out into multiple consumers.
    */
  private def dailyCounts(events: DataFrame, keyCol: String,
      tsCol: String, dayName: String, nName: String,
      pin: Boolean): DataFrame = {
    val d = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"),
        to_date(col(tsCol)).as(dayName))
      .agg(count(lit(1)).as(nName))
    if (pin) d.localCheckpoint(true) else d
  }

  /** Robust per-key daily-volume anomaly detection: for every
    * (key, day) count, the modified z-score
    * `0.6745 · (n - median) / MAD` (Iglewicz & Hoaglin 1993 — the
    * robust outlier test that a single bad day cannot recruit into its
    * own baseline, unlike mean/stddev). Returns every (key, day) row
    * with (n, med, mad, robust_z, is_anomaly) — the data-quality
    * dashboard over an ingest log: a pipeline source that doubles or
    * goes dark flags immediately against its own history.
    *
    * A key whose counts barely vary (MAD = 0) has no robust scale:
    * robust_z is null and is_anomaly false — the caller reads the
    * constant series directly. robust_z rounds to 6 dp.
    *
    * 100 TB shape: ONE event-sized exchange collapses the log to
    * (key, day) grain; both the median and the MAD-of-deviations ride
    * [[Quantiles.exactByKey]] on that key-day frame (exact type-7,
    * distributed rank path above the built-in's single-reducer
    * crossover, key-sized result broadcast back). Nothing event-sized
    * moves after the first collapse. `maxGroups` is exactByKey's
    * distinct-key rail (its driver offset state is groups-bounded) —
    * raise it for many-source ingest logs with the memory math in hand.
    */
  def anomalousDays(events: DataFrame, keyCol: String, tsCol: String,
      threshold: Double = 3.5, maxGroups: Int = 10000): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    // consumers: median, deviations, the readout
    val daily = dailyCounts(events, keyCol, tsCol, "day", "n", pin = true)
    val med = Quantiles.exactByKey(daily, "key", "n", Seq(0.5),
        maxGroups = maxGroups)
      .select(col("key"), col("exact_q").as("med"))
    val dev = daily.join(broadcast(med), Seq("key"))
      .withColumn("__ad", abs(col("n") - col("med")))
      .localCheckpoint(true) // consumers: MAD quantile, the readout
    val mad = Quantiles.exactByKey(dev, "key", "__ad", Seq(0.5),
        maxGroups = maxGroups)
      .select(col("key"), col("exact_q").as("mad"))
    dev.join(broadcast(mad), Seq("key"))
      .withColumn("robust_z",
        when(col("mad") > 0.0,
          round(lit(0.6745) * (col("n") - col("med")) / col("mad"), 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .select(col("key"), col("day"), col("n"), col("med"), col("mad"),
        col("robust_z"), col("is_anomaly"))
      .orderBy(col("key"), col("day"))
  }

  /** Day-of-week seasonality profile: for each key, the mean daily
    * count per weekday and its ratio to the key's overall daily mean —
    * the multiplicative seasonal index ("Mondays run 1.4× baseline")
    * that demand forecasting and anomaly baselining both start from
    * (a Monday spike is only a spike relative to Mondays). Returns
    * (key, dow 1=Sun..7=Sat, n_days, mean_n, seasonal_index), ratios
    * rounded to 6 dp.
    *
    * Shape: one event-sized collapse to (key, day) grain; weekday and
    * overall means are two key-grain re-aggs (the overall mean joins
    * back key-sized). Integer-count ratios — exact IEEE, engine-
    * portable.
    */
  def seasonalityProfile(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    // consumers: weekday means + overall mean
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true)
    val overall = daily.groupBy(col("key"))
      .agg(sum(col("__n")).as("__tot"), count(lit(1)).as("__days"))
    daily
      .groupBy(col("key"), dayofweek(col("__day")).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__n")).as("__dsum"))
      .join(overall, Seq("key"))
      .select(col("key"), col("dow"), col("n_days"),
        round(col("__dsum") / col("n_days").cast("double"), 6).as("mean_n"),
        round((col("__dsum") / col("n_days").cast("double")) /
          (col("__tot") / col("__days").cast("double")), 6)
          .as("seasonal_index"))
      .orderBy(col("key"), col("dow"))
  }

  /** Classical additive seasonal decomposition per key's daily-count
    * series: `n = trend + seasonal + remainder` — the
    * moving-average decomposition (the pre-STL textbook method, chosen
    * over loess-based STL because every step is an exact windowed
    * algebra both engines replay): trend = centered 7-day moving
    * average (null at each series' 3-row edges), seasonal = the
    * CENTERED day-of-week mean of the detrended series (indices sum
    * to ~0, so the trend keeps the level), remainder = what neither
    * explains — the anomaly-hunting residual [[anomalousDays]] scores
    * with a robust z instead. [[seasonalityProfile]] reports the
    * weekly SHAPE; this splits every observed day into its three
    * parts. Returns (key, day, n, trend, seasonal, remainder), 6 dp;
    * trend/remainder null at edges, seasonal null for a dow with no
    * interior days.
    *
    * 100 TB shape: ONE event-sized exchange to (key, day) grain; the
    * MA rides a key-partitioned calendar-bounded window; the seasonal
    * means quantize detrended terms to DECIMAL(38,12) (order-free)
    * over the ≤7-row-per-key dow frame. Rows-not-days MA: the
    * documented contract is a gap-free daily series (dailyCounts of a
    * live event log — silent days simply don't occur at volume).
    */
  def seasonalDecompose(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val daily = dailyCounts(events, keyCol, tsCol, "day", "n",
      pin = false)
    val wMa = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val based = daily
      .withColumn("__trend", when(count(lit(1)).over(wMa) === 7,
        sum(col("n")).over(wMa).cast("double") / lit(7.0)))
      .withColumn("__detr", col("n").cast("double") - col("__trend"))
      .withColumn("__dow", dayofweek(col("day")))
      .localCheckpoint(true) // consumers: seasonal agg + readout join
    val seas = based.filter(col("__detr").isNotNull)
      .groupBy(col("key"), col("__dow"))
      .agg((sum(d12(col("__detr"))).cast("double") /
        count(lit(1)).cast("double")).as("__raw"))
    // <= 7 rows per key: the unordered key window is dow-frame-sized
    val wKey = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val seasAdj = seas
      .withColumn("__adj", col("__raw") -
        sum(d12(col("__raw"))).over(wKey).cast("double") /
          count(lit(1)).over(wKey).cast("double"))
      .select(col("key"), col("__dow"), col("__adj"))
    based.join(seasAdj, Seq("key", "__dow"), "left")
      .select(col("key"), col("day"), col("n"),
        round(col("__trend"), 6).as("trend"),
        round(col("__adj"), 6).as("seasonal"),
        round(col("n").cast("double") - col("__trend") - col("__adj"), 6)
          .as("remainder"))
      .orderBy(col("key"), col("day"))
  }

  /** CUSUM changepoint scan (Page 1954): per key, the cumulative sum of
    * deviations from the key's own mean over its ordered daily counts;
    * the day where |CUSUM| peaks is the single most likely level-shift
    * point, and the before/after means quantify the shift. The classic
    * "when did this source's volume actually change" scan — argmax
    * |CUSUM| is the exact MLE changepoint for a one-shift Gaussian
    * model. Returns one row per key:
    * (key, change_day, max_abs_cusum, mean_before, mean_after),
    * rounded to 6 dp; ties on |CUSUM| break to the earliest day.
    * mean_after is null only for a single-day series (the CUSUM ends
    * at exactly 0 by construction, so an interior peak always leaves
    * days after it; a constant series peaks at day 1 by the tie rule).
    *
    * Shape: one event-sized collapse; the CUSUM window is partitioned
    * BY KEY over the key's calendar-sized series (never a global
    * sort); the argmax is a row_number pick; before/after means are
    * conditional aggs on the same frame. Deviations quantize to
    * DECIMAL(38,12) so the ordered cumulative sum is exact.
    */
  def cusumChangepoint(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true)
    val wAllK = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.partitionBy(col("key")).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(col("key"))
      .orderBy(abs(col("__cusum")).desc, col("__day"))
    val cusum = daily
      .withColumn("__mean", sum(col("__n")).over(wAllK) /
        count(lit(1)).over(wAllK).cast("double"))
      .withColumn("__dev",
        (col("__n") - col("__mean")).cast("decimal(38,12)"))
      .withColumn("__cusum", sum(col("__dev")).over(wCum).cast("double"))
      .localCheckpoint(true) // consumers: the pick and both side means
    val pick = cusum
      .withColumn("__rn", row_number().over(wPick))
      .where(col("__rn") === 1)
      .select(col("key"), col("__day").as("change_day"),
        round(abs(col("__cusum")), 6).as("max_abs_cusum"))
    cusum.join(pick.withColumnRenamed("change_day", "__cd"), Seq("key"))
      .groupBy(col("key"), col("__cd"), col("max_abs_cusum"))
      .agg(
        round(avg(when(col("__day") <= col("__cd"), col("__n"))), 6)
          .as("mean_before"),
        round(avg(when(col("__day") > col("__cd"), col("__n"))), 6)
          .as("mean_after"))
      .select(col("key"), col("__cd").as("change_day"),
        col("max_abs_cusum"), col("mean_before"), col("mean_after"))
      .orderBy(col("key"))
  }

  /** Theil-Sen robust trend (Theil 1950, Sen 1968): per key, the MEDIAN
    * of all pairwise slopes over the ordered daily-count series, plus
    * the median-residual intercept — the trend estimate a few wild days
    * cannot drag (OLS breaks down at one outlier; Theil-Sen tolerates
    * ~29%). The "is this source actually growing" readout next to
    * [[cusumChangepoint]]'s "did it jump". Returns
    * (key, n_days, slope, intercept), slope per day, rounded to 6 dp.
    * A key observed on a single day has no pairwise slope and is
    * omitted — one point determines no trend.
    *
    * Shape: one event-sized collapse to (key, day); the pairwise-slope
    * self-join is KEY-partitioned and day²-bounded (a year of days is
    * ~66k pairs per key — calendar-sized, never event-sized); both
    * medians ride [[Quantiles.exactByKey]] (exact type-7, distributed);
    * `maxGroups` is its distinct-key rail, raisable for many-key logs.
    */
  def theilSenTrend(events: DataFrame, keyCol: String,
      tsCol: String, maxGroups: Int = 10000): DataFrame = {
    // consumers: pair join (x2), x0, residuals
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true)
    val x0 = daily.groupBy(col("key")).agg(min(col("__day")).as("__d0"),
      count(lit(1)).as("n_days"))
    val pts = daily.join(x0, Seq("key"))
      .select(col("key"),
        datediff(col("__day"), col("__d0")).cast("double").as("__x"),
        col("__n").cast("double").as("__y"))
      .localCheckpoint(true)
    val pairs = pts.select(col("key"), col("__x").as("__x1"),
        col("__y").as("__y1"))
      .join(pts.select(col("key"), col("__x").as("__x2"),
        col("__y").as("__y2")), Seq("key"))
      .where(col("__x1") < col("__x2"))
      .select(col("key"),
        ((col("__y2") - col("__y1")) / (col("__x2") - col("__x1")))
          .as("__slope"))
    val slope = Quantiles.exactByKey(pairs, "key", "__slope", Seq(0.5),
        maxGroups = maxGroups)
      .select(col("key"), col("exact_q").as("__m"))
    val resid = pts.join(broadcast(slope), Seq("key"))
      .select(col("key"), col("__m"),
        (col("__y") - col("__m") * col("__x")).as("__r"))
    val icept = Quantiles.exactByKey(resid, "key", "__r", Seq(0.5),
        maxGroups = maxGroups)
      .select(col("key"), col("exact_q").as("__b"))
    x0.join(broadcast(slope), Seq("key"))
      .join(broadcast(icept), Seq("key"))
      .select(col("key"), col("n_days"),
        round(col("__m"), 6).as("slope"),
        round(col("__b"), 6).as("intercept"))
      .orderBy(col("key"))
  }

  /** First- and last-touch conversion attribution: for every event
    * satisfying `isConversion`, the earliest and latest NON-conversion
    * event ("touch") of the same user in the lookback window
    * `(t_conv - lookbackMillis, t_conv]` gets the credit; a conversion
    * with no touch in the window attributes to `(direct)`. Returns one
    * row per channel (the touch's `typeCol` value):
    * (channel, n_first_touch, n_last_touch), the two classic marketing
    * attribution models side by side.
    *
    * Ties in touch time break on `idCol` — attribution is deterministic
    * and engine-replayable, never "whichever row the scan saw first".
    *
    * 100 TB shape: one user-keyed range join pairs conversions with
    * their windowed touches (output bounded by touches-per-lookback,
    * not |touches|·|conversions|); the argmin/argmax per conversion is
    * a single `min_by`/`max_by` aggregate on the conversion key (no
    * window sort), and the final frame is channel-sized.
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, isConversion: Column,
      lookbackMillis: Long): DataFrame = {
    require(lookbackMillis > 0, "lookbackMillis must be positive")
    val ev = events.select(col(userCol).as("__u"),
      unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
      col(idCol).as("__id"), col(typeCol).as("__ch"),
      isConversion.as("__conv"))
    val conv = ev.filter(col("__conv"))
      .select(col("__u"), col("__ms").as("__cms"), col("__id").as("__cid"))
    val tch = ev.filter(!col("__conv"))
      .select(col("__u"), col("__ms").as("__tms"), col("__id").as("__tid"),
        col("__ch"))
    val paired = conv.join(tch,
      conv("__u") === tch("__u") &&
        col("__tms") <= col("__cms") &&
        col("__tms") > col("__cms") - lit(lookbackMillis), "left")
    val perConv = paired.groupBy(col("__cid"))
      .agg(
        min_by(col("__ch"), struct(col("__tms"), col("__tid")))
          .as("__first"),
        max_by(col("__ch"), struct(col("__tms"), col("__tid")))
          .as("__last"))
      .select(coalesce(col("__first"), lit("(direct)")).as("__first"),
        coalesce(col("__last"), lit("(direct)")).as("__last"))
      .localCheckpoint(true) // conversion-sized; both model counts read it
    val firstC = perConv.groupBy(col("__first").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val lastC = perConv.groupBy(col("__last").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    firstC.join(lastC, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"))
      .orderBy(col("channel"))
  }

  /** Linear multi-touch attribution: every touch in a conversion's
    * lookback window gets an equal 1/k share of that conversion's
    * credit (k = touches in the window) — the fairness-spread
    * complement to [[attribution]]'s winner-take-all models, from the
    * SAME user-keyed range join. A conversion with no windowed touch
    * credits `(direct)` in full. Returns
    * (channel, n_touches, credit) — shares quantize to DECIMAL(38,12)
    * (partition-invariant, engine-replayable), so each conversion's
    * k·round(1/k) contributes 1 minus at most 5e-13; the summed credit
    * equals the conversion count to that quantization (exact at the
    * 6-dp readout until a channel holds ~10⁶ non-dyadic-k conversions).
    * Credit rounds to 6 dp.
    *
    * Shape: the range join + one conversion-key aggregation for k +
    * one channel-key fold — nothing conversion-unbounded.
    */
  def attributionLinear(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      isConversion: Column, lookbackMillis: Long): DataFrame = {
    require(lookbackMillis > 0, "lookbackMillis must be positive")
    val ev = events.select(col(userCol).as("__u"),
      unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
      col(idCol).as("__id"), col(typeCol).as("__ch"),
      isConversion.as("__conv"))
    val conv = ev.filter(col("__conv"))
      .select(col("__u"), col("__ms").as("__cms"), col("__id").as("__cid"))
    val tch = ev.filter(!col("__conv"))
      .select(col("__u"), col("__ms").as("__tms"), col("__ch"))
    val paired = conv.join(tch,
      conv("__u") === tch("__u") &&
        col("__tms") <= col("__cms") &&
        col("__tms") > col("__cms") - lit(lookbackMillis), "left")
      .select(col("__cid"),
        coalesce(col("__ch"), lit("(direct)")).as("channel"))
    val wConv = Window.partitionBy(col("__cid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    paired
      .withColumn("__share",
        (lit(1.0) / count(lit(1)).over(wConv)).cast("decimal(38,12)"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("__share")).cast("double"), 6).as("credit"))
      .orderBy(col("channel"))
  }

  /** Time-decay multi-touch attribution: every touch in a conversion's
    * lookback window gets a share proportional to `0.5^age`, where
    * `age = floor((t_conv − t_touch) / halfLifeMillis)` — a touch one
    * half-life before the conversion earns half the weight of one at
    * conversion time. The recency-weighted member of the
    * [[attribution]] / [[attributionLinear]] family; a conversion with
    * no windowed touch credits `(direct)` in full.
    *
    * The decay exponent is an INTEGER (whole half-lives), so the
    * weight is an exact power of two in IEEE754 — bit-identical across
    * engines, unlike a fractional-exponent `pow` whose last ulp is
    * libm-dependent. Shares quantize to DECIMAL(38,12) (partition-
    * invariant); credit rounds to 6 dp and sums to the conversion
    * count to that quantization, exactly as [[attributionLinear]].
    *
    * 100 TB shape: the same user-keyed range join (output bounded by
    * touches-per-lookback), one conversion-key aggregate for the
    * weight total, one channel-key fold — nothing conversion-unbounded.
    */
  def attributionTimeDecay(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      isConversion: Column, lookbackMillis: Long,
      halfLifeMillis: Long): DataFrame = {
    require(lookbackMillis > 0, "lookbackMillis must be positive")
    require(halfLifeMillis > 0, "halfLifeMillis must be positive")
    // 12-dp weight quantization underflows past 0.5^39; cap the whole-
    // half-life span inside the window so no conversion's weight total
    // can quantize to zero
    require(lookbackMillis / halfLifeMillis <= 30,
      "attributionTimeDecay: lookback must span <= 30 half-lives")
    val ev = events.select(col(userCol).as("__u"),
      unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
      col(idCol).as("__id"), col(typeCol).as("__ch"),
      isConversion.as("__conv"))
    val conv = ev.filter(col("__conv"))
      .select(col("__u"), col("__ms").as("__cms"), col("__id").as("__cid"))
    val tch = ev.filter(!col("__conv"))
      .select(col("__u"), col("__ms").as("__tms"), col("__ch"))
    val paired = conv.join(tch,
      conv("__u") === tch("__u") &&
        col("__tms") <= col("__cms") &&
        col("__tms") > col("__cms") - lit(lookbackMillis), "left")
      .select(col("__cid"),
        coalesce(col("__ch"), lit("(direct)")).as("channel"),
        // age in whole half-lives: 0 for (direct) so its lone weight
        // is 1.0 and the full credit lands, matching the linear op
        when(col("__ch").isNull, lit(0L))
          .otherwise(floor((col("__cms") - col("__tms")) /
            lit(halfLifeMillis).cast("double")).cast("long"))
          .as("__age"))
      // exact power of two, quantized to DECIMAL(38,12) BEFORE the
      // window sum so the per-conversion total is addition-order-
      // invariant (raw double window sums are partition-order-sensitive)
      .withColumn("__w",
        pow(lit(0.5), col("__age").cast("double")).cast("decimal(38,12)"))
    val wConv = Window.partitionBy(col("__cid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    paired
      .withColumn("__share",
        (col("__w").cast("double") /
          sum(col("__w")).over(wConv).cast("double"))
          .cast("decimal(38,12)"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("__share")).cast("double"), 6).as("credit"))
      .orderBy(col("channel"))
  }

  /** Markov removal-effect attribution (the absorbing-chain model,
    * Anderl et al. 2016): per-user journeys — every touch before the
    * user's FIRST conversion, in (ts, id) order — become a first-order
    * Markov chain over states {(start), channels, (conv), (null)}; a
    * channel's credit is its REMOVAL EFFECT, `1 − P_c(conv)/P(conv)`,
    * the share of conversion probability that disappears when every
    * path through the channel is cut. The counterfactual member of the
    * attribution family ([[attribution]] first/last,
    * [[attributionLinear]], [[attributionTimeDecay]]).
    *
    * P(conv) is the '(conv)' mass after exactly 40 chain steps from
    * unit mass on '(start)' (absorbing self-loops on conv/null); each
    * step's incoming terms quantize to DECIMAL(38,12) before summing,
    * so the whole iteration is partition- and engine-invariant. Removal
    * drops all transitions touching the channel (the lost mass never
    * absorbs — exactly the redirect-to-null convention). Credits
    * distribute the converted-user count by normalized removal effect.
    * Returns (channel, p_conv_removed, removal_effect, credit), 6 dp;
    * share/credit are null if every removal effect quantizes to 0.
    *
    * 100 TB shape: journeys ride user-keyed windows (per-user event
    * counts, the funnel bound); transitions collapse to a
    * (channels+2)²-sized frame — the ONLY collect — and the 40-step
    * vector iteration runs on that driver-side matrix. Channel
    * cardinality is capped at 50 (it is a marketing-channel model).
    */
  def markovAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      isConversion: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val steps = 40
    val ev = events.select(col(userCol).as("__u"),
      unix_millis(col(tsCol).cast("timestamp")).as("__ms"),
      col(idCol).cast("long").as("__id"),
      col(typeCol).cast("string").as("__ch"),
      isConversion.as("__conv"))
      .filter(col("__u").isNotNull && col("__ch").isNotNull)
      .localCheckpoint(eager = true) // touches + first-conv + users
    val wConvRank = Window.partitionBy(col("__u"))
      .orderBy(col("__ms"), col("__id"))
    val fc = ev.filter(col("__conv"))
      .withColumn("__rn", row_number().over(wConvRank))
      .filter(col("__rn") === 1)
      .select(col("__u"), col("__ms").as("__cms"), col("__id").as("__cid"))
    val touches = ev.filter(!col("__conv"))
      .join(fc, Seq("__u"), "left")
      .filter(col("__cms").isNull ||
        col("__ms") < col("__cms") ||
        (col("__ms") === col("__cms") && col("__id") < col("__cid")))
      .select(col("__u"), col("__ms"), col("__id"), col("__ch"))
      .localCheckpoint(eager = true) // inner transitions + last touch
    val wUser = Window.partitionBy(col("__u"))
      .orderBy(col("__ms"), col("__id"))
    val inner = touches
      .select(coalesce(lag(col("__ch"), 1).over(wUser), lit("(start)"))
        .as("src"), col("__ch").as("dst"))
    val lastT = touches
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__u"))
          .orderBy(col("__ms").desc, col("__id").desc)))
      .filter(col("__rn") === 1)
      .select(col("__u"), col("__ch").as("__last"))
    val term = ev.select(col("__u")).distinct()
      .join(lastT, Seq("__u"), "left")
      .join(fc.select(col("__u"), lit(true).as("__cv")), Seq("__u"),
        "left")
      .select(coalesce(col("__last"), lit("(start)")).as("src"),
        when(col("__cv").isNotNull, lit("(conv)")).otherwise(lit("(null)"))
          .as("dst"))
    val trRows = inner.unionByName(term)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .collect() // (channels+2)² — channel-bounded, never event-bounded
    val nConv = fc.count()
    require(nConv > 0, "markovAttribution: no conversions")
    val channels = trRows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.filterNot(Set("(start)", "(conv)", "(null)")).sorted
    require(channels.nonEmpty, "markovAttribution: no touch channels")
    require(channels.length <= 50,
      s"markovAttribution: ${channels.length} channels (max 50) — " +
        "bucket the channel dimension upstream")
    val outTot = trRows.groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(2)).sum }
    val baseTr = trRows.map { r =>
      (r.getString(0), r.getString(1),
        r.getLong(2).toDouble / outTot(r.getString(0)).toDouble)
    } ++ Seq(("(conv)", "(conv)", 1.0), ("(null)", "(null)", 1.0))
    def q12(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    // 40 quantized chain steps; returns the absorbed (conv) mass
    def pConv(tr: Seq[(String, String, Double)]): Double = {
      val bySrc = tr.groupBy(_._1)
      var mass = Map[String, java.math.BigDecimal](
        "(start)" -> java.math.BigDecimal.ONE.setScale(12))
      (1 to steps).foreach { _ =>
        val next = scala.collection.mutable.Map[String,
          java.math.BigDecimal]()
        mass.foreach { case (s, m) =>
          bySrc.getOrElse(s, Seq.empty).foreach { case (_, d, p) =>
            val termV = q12(m.doubleValue * p)
            next(d) = next.getOrElse(d,
              java.math.BigDecimal.ZERO).add(termV)
          }
        }
        mass = next.toMap
      }
      mass.get("(conv)").map(_.doubleValue).getOrElse(0.0)
    }
    val pb = pConv(baseTr)
    require(pb > 0, "markovAttribution: base conversion mass is zero")
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val pcs = channels.map { c =>
      c -> pConv(baseTr.filter(t => t._1 != c && t._2 != c))
    }
    val res = pcs.map { case (c, pc) => (c, pc, 1.0 - pc / pb) }
    val se = res.map { case (_, _, re) => q12(re) }
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
    val out = res.map { case (c, pc, re) =>
      val share = if (se > 0) Some(re / se) else None
      (c, r6(pc), r6(re), share.map(s => r6(s * nConv.toDouble)))
    }
    out.toSeq
      .toDF("channel", "p_conv_removed", "removal_effect", "credit")
      .orderBy(col("channel"))
  }

  /** Simple exponential smoothing (SES) one-step forecast per key over
    * its OBSERVED daily-count series: the closed form of
    * `s_t = α·x_t + (1-α)·s_{t-1}`, `s_1 = x_1` —
    * `s_T = Σ_{j≥2} α(1-α)^(T-j)·x_j + (1-α)^(T-1)·x_1` — so the whole
    * recursion collapses to ONE weighted aggregate per key instead of
    * a sequential scan (the recurrence is linear; its unrolling is a
    * dot product, and dot products distribute). The forecast for the
    * next observation is s_T. Missing calendar days simply don't
    * appear in the series (SES over observations, not over a zero-
    * filled spine — document-count feeds usually want exactly that;
    * zero-fill upstream if not).
    *
    * Returns (key, n_days, last_n, level) with level rounded to 6 dp;
    * weighted terms quantize to DECIMAL(38,12) so the per-key sum is
    * partition-invariant.
    *
    * Shape: one (key, day) count collapse, one key-window pass for
    * (rank, length), one key aggregate. Weights are computed per row
    * from pow — no iteration, no driver loop, any number of keys.
    */
  def sesForecast(events: DataFrame, keyCol: String, tsCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "n",
      pin = false) // single consumer: no pin
    val wk = Window.partitionBy(col("key")).orderBy(col("__day"))
    val wkAll = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("__j", row_number().over(wk).cast("double"))
      .withColumn("__T", count(lit(1)).over(wkAll).cast("double"))
      .withColumn("__w",
        when(col("__j") === 1.0, pow(lit(1.0 - alpha), col("__T") - 1))
          .otherwise(lit(alpha) * pow(lit(1.0 - alpha),
            col("__T") - col("__j"))))
      .withColumn("__term",
        (col("__w") * col("n")).cast("decimal(38,12)"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        max_by(col("n"), col("__day")).as("last_n"),
        round(sum(col("__term")).cast("double"), 6).as("level"))
      .orderBy(col("key"))
  }

  /** Additive Holt-Winters (triple exponential smoothing) one-step
    * forecast per key over a FIXED zero-filled daily spine —
    * [[sesForecast]]'s seasonal sibling, the forecasting face users
    * reach for once a series has a weekly shape:
    *
    *   ℓ_t = α(x_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
    *   b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(x_t − ℓ_{t−1} − b_{t−1}) + (1−γ)s_{t−m}
    *
    * with the standard first-two-seasons init (ℓ = first-season mean,
    * b = season-over-season mean shift / m, s_i = x_i − ℓ), so
    * `numDays ≥ 2·seasonLen` is required. The spine is [startDay,
    * startDay + numDays) with missing (key, day) cells as 0 — the
    * seasonal index is a POSITION, so the series must be regular
    * (zero-fill is the contract, stated; keys with no event in the
    * span don't appear). Returns (key, n_days, level, trend,
    * season_next, forecast) where forecast = ℓ + b + s (the next
    * day's season), 6 dp.
    *
    * 100 TB shape: one (key, day) count collapse, one per-key collapse
    * to a numDays-array (map lookup against the plan-time spine), then
    * the WHOLE recursion runs as a single `aggregate()` fold over that
    * array — sequential in t (the recurrence is inherently so; numDays
    * is a plan-time constant ≤ 120) but embarrassingly parallel across
    * keys, which is where the 100 TB lives. Every step is fixed double
    * algebra in a fixed order, so the DuckDB oracle replays it as a
    * recursive CTE with the identical expression shapes.
    */
  def holtWinters(events: DataFrame, keyCol: String, tsCol: String,
      startDay: String, numDays: Int, seasonLen: Int,
      alpha: Double, beta: Double, gamma: Double): DataFrame = {
    val (xs, fin) = hwFold(events, keyCol, tsCol, startDay, numDays,
      seasonLen, alpha, beta, gamma)
    xs.select(col("key"), lit(numDays).as("n_days"),
        fin.getField("l").as("__l"), fin.getField("b").as("__b"),
        element_at(fin.getField("s"), 1).as("__s"))
      .select(col("key"), col("n_days"),
        round(col("__l"), 6).as("level"),
        round(col("__b"), 6).as("trend"),
        round(col("__s"), 6).as("season_next"),
        round(col("__l") + col("__b") + col("__s"), 6).as("forecast"))
      .orderBy(col("key"))
  }

  /** One-step-ahead backtest of [[holtWinters]] — the accuracy readout
    * that decides whether the forecast is usable: at every step t ≥
    * 2·seasonLen the model's pre-update forecast `ℓ + b + s_head` is
    * scored against the arriving x_t, and MAE / RMSE / MAPE accumulate
    * INSIDE the same fold (error terms ride the recursion state, so
    * the backtest costs nothing beyond the fit). MAPE averages
    * |e|/|x| over nonzero actuals only (n_nonzero reported; all-zero
    * series yield null MAPE). Returns (key, n_eval, mae, rmse, mape),
    * 6 dp.
    */
  def holtWintersBacktest(events: DataFrame, keyCol: String,
      tsCol: String, startDay: String, numDays: Int, seasonLen: Int,
      alpha: Double, beta: Double, gamma: Double): DataFrame = {
    val (xs, fin) = hwFold(events, keyCol, tsCol, startDay, numDays,
      seasonLen, alpha, beta, gamma)
    val nEval = lit((numDays - seasonLen).toDouble)
    xs.select(col("key"),
        fin.getField("sae").as("__sae"), fin.getField("sse").as("__sse"),
        fin.getField("sape").as("__sape"), fin.getField("nz").as("__nz"))
      .select(col("key"), lit(numDays - seasonLen).as("n_eval"),
        round(col("__sae") / nEval, 6).as("mae"),
        round(sqrt(col("__sse") / nEval), 6).as("rmse"),
        round(when(col("__nz") > 0.0, col("__sape") / col("__nz")), 6)
          .as("mape"))
      .orderBy(col("key"))
  }

  /** One-step prediction interval for [[holtWinters]] — the band that
    * makes the point forecast decision-grade: the fold's one-step
    * errors (the [[holtWintersBacktest]] residuals, kept per step) are
    * quantiled per key at (α/2, 1−α/2) via the distributed exact-
    * quantile machine, and the next-day interval is
    * `forecast + [q_lo, q_hi]` — empirical, distribution-free bands
    * (a Gaussian ±z·σ̂ would assert a symmetry count data rarely has).
    * Returns (key, n_eval, forecast, lo, hi), 6 dp.
    *
    * 100 TB shape: [[holtWinters]]'s fold + one explode of the
    * (numDays − seasonLen)-bounded residual arrays +
    * [[graft.ops.Quantiles.exactByKey]] (bit-matching
    * `quantile_cont`) + one key-grain join. Nothing beyond the fold
    * touches event-sized data.
    */
  def holtWintersInterval(events: DataFrame, keyCol: String,
      tsCol: String, startDay: String, numDays: Int, seasonLen: Int,
      alpha: Double, beta: Double, gamma: Double,
      ciAlpha: Double = 0.05): DataFrame = {
    require(ciAlpha > 0 && ciAlpha < 1, "ciAlpha must be in (0,1)")
    val (xs, fin) = hwFold(events, keyCol, tsCol, startDay, numDays,
      seasonLen, alpha, beta, gamma)
    val pinned = xs.select(col("key"),
        fin.getField("l").as("__l"), fin.getField("b").as("__b"),
        element_at(fin.getField("s"), 1).as("__s"),
        fin.getField("errs").as("__errs"))
      .localCheckpoint(true) // consumers: residual explode + readout
    val resid = pinned.select(col("key"),
      explode(col("__errs")).as("__r"))
    val qs = Quantiles.exactByKey(resid, "key", "__r",
      Seq(ciAlpha / 2, 1 - ciAlpha / 2))
    val piv = qs.groupBy(col("key"))
      .agg(max(when(col("q") === ciAlpha / 2, col("exact_q")))
        .as("__qlo"),
        max(when(col("q") === 1 - ciAlpha / 2, col("exact_q")))
          .as("__qhi"))
    pinned
      .join(piv, Seq("key"))
      .select(col("key"), lit(numDays - seasonLen).as("n_eval"),
        round(col("__l") + col("__b") + col("__s"), 6).as("forecast"),
        round(col("__l") + col("__b") + col("__s") + col("__qlo"), 6)
          .as("lo"),
        round(col("__l") + col("__b") + col("__s") + col("__qhi"), 6)
          .as("hi"))
      .orderBy(col("key"))
  }

  /** EWMA control chart (Roberts 1959): per key over a zero-filled
    * daily spine, `z_t = λ·x_t + (1−λ)·z_{t−1}` with `z_0 = μ` (the
    * series mean) and time-varying control limits
    * `μ ± L·σ·sqrt(λ/(2−λ)·(1 − (1−λ)^{2t}))` (σ the population std
    * of the spine). The standard small-shift process monitor — more
    * sensitive than a Shewhart chart to sustained drifts, the batch
    * face of a streaming drift alarm. Returns one row per (key, day):
    * (key, day_idx, x, ewma, ucl, lcl, out_of_control), 6 dp; the
    * out-of-control flag compares the ROUNDED readouts so the boolean
    * is engine-replayable.
    *
    * 100 TB shape: one event-sized collapse to (key, day), then the
    * whole recursion runs as a single `aggregate()` fold over the
    * per-key numDays-array ([[holtWinters]]'s device) — sequential in
    * t (inherent; numDays is a plan-time constant ≤ 366) and
    * embarrassingly parallel across keys. μ is exact (integer-valued
    * counts); σ's squared deviations quantize to DECIMAL(38,12), so
    * every input to the fold is engine-identical.
    */
  def ewmaChart(events: DataFrame, keyCol: String, tsCol: String,
      startDay: String, numDays: Int, lambda: Double,
      limitL: Double): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0,1)")
    require(limitL > 0 && limitL <= 10, "limitL must be in (0,10]")
    require(numDays >= 2 && numDays <= 366,
      "numDays in [2,366] — the spine is a plan-time constant")
    val t0 = numDays
    val counts = events
      .select(col(keyCol).cast("string").as("key"),
        datediff(to_date(col(tsCol)), to_date(lit(startDay))).as("__i"))
      .filter(col("key").isNotNull &&
        col("__i") >= 0 && col("__i") < t0)
      .groupBy(col("key"), col("__i"))
      .agg(count(lit(1)).as("__n"))
    val xs = counts
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("__i"), col("__n"))))
        .as("__m"))
      .select(col("key"),
        transform(sequence(lit(0), lit(t0 - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("__xs"))
    val nD = lit(t0.toDouble)
    val zeroDec = lit(java.math.BigDecimal.ZERO).cast("decimal(38,12)")
    val base = xs
      .withColumn("__mu",
        aggregate(col("__xs"), lit(0.0), (a, x) => a + x) / nD)
      .withColumn("__sg", sqrt(
        aggregate(
          transform(col("__xs"), x =>
            ((x - col("__mu")) * (x - col("__mu")))
              .cast("decimal(38,12)")),
          zeroDec,
          (a, x) => (a + x).cast("decimal(38,12)")).cast("double") / nD))
    // the fold: state (z, per-step z's); array append is O(t) per step
    // but t ≤ 366 — the cost lives in the bounded spine, not the data
    val zArr = aggregate(col("__xs"),
      struct(col("__mu").as("z"),
        array().cast("array<double>").as("arr")),
      (st, xv) => {
        val zNew = lit(lambda) * xv + lit(1.0 - lambda) * st.getField("z")
        struct(zNew.as("z"),
          concat(st.getField("arr"), array(zNew)).as("arr"))
      },
      st => st.getField("arr"))
    val perDay = base
      .select(col("key"), col("__xs"), col("__mu"), col("__sg"),
        posexplode(zArr).as(Seq("__pos", "__z")))
      .withColumn("__t", (col("__pos") + 1).cast("double"))
      .withColumn("__hw",
        lit(limitL) * col("__sg") *
          sqrt(lit(lambda / (2.0 - lambda)) *
            (lit(1.0) - pow(lit(1.0 - lambda), lit(2.0) * col("__t")))))
    perDay
      .select(col("key"), col("__pos").as("day_idx"),
        element_at(col("__xs"), col("__pos") + 1).cast("long").as("x"),
        round(col("__z"), 6).as("ewma"),
        round(col("__mu") + col("__hw"), 6).as("ucl"),
        round(col("__mu") - col("__hw"), 6).as("lcl"))
      .withColumn("out_of_control",
        col("ewma") > col("ucl") || col("ewma") < col("lcl"))
      .orderBy(col("key"), col("day_idx"))
  }

  /** Tabular (decision-interval) CUSUM monitor (Page 1954): per key
    * over the zero-filled daily spine,
    * `S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k·σ))` and
    * `S⁻_t = max(0, S⁻_{t−1} + (μ − x_t − k·σ))` with S±₀ = 0, alarm
    * when either exceeds `h·σ`. The sustained-small-shift alarm beside
    * [[ewmaChart]] (CUSUM accumulates evidence; EWMA discounts it) and
    * the MONITOR face of [[cusumChangepoint]]'s retrospective scan.
    * μ/σ are the spine's own mean / population std ([[ewmaChart]]'s
    * convention; the streaming twin takes them as a trained baseline).
    * Returns one row per (key, day):
    * (key, day_idx, x, s_pos, s_neg, limit, alarm), 6 dp; the alarm
    * compares the rounded readouts (engine-replayable).
    *
    * 100 TB shape: identical to [[ewmaChart]] — one event-sized
    * collapse, one `aggregate()` fold per key over the plan-time
    * spine, parallel across keys.
    */
  def cusumMonitor(events: DataFrame, keyCol: String, tsCol: String,
      startDay: String, numDays: Int, k: Double,
      h: Double): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(h > 0, "h must be positive")
    require(numDays >= 2 && numDays <= 366,
      "numDays in [2,366] — the spine is a plan-time constant")
    val t0 = numDays
    val counts = events
      .select(col(keyCol).cast("string").as("key"),
        datediff(to_date(col(tsCol)), to_date(lit(startDay))).as("__i"))
      .filter(col("key").isNotNull &&
        col("__i") >= 0 && col("__i") < t0)
      .groupBy(col("key"), col("__i"))
      .agg(count(lit(1)).as("__n"))
    val xs = counts
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("__i"), col("__n"))))
        .as("__m"))
      .select(col("key"),
        transform(sequence(lit(0), lit(t0 - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("__xs"))
    val nD = lit(t0.toDouble)
    val zeroDec = lit(java.math.BigDecimal.ZERO).cast("decimal(38,12)")
    val base = xs
      .withColumn("__mu",
        aggregate(col("__xs"), lit(0.0), (a, x) => a + x) / nD)
      .withColumn("__sg", sqrt(
        aggregate(
          transform(col("__xs"), x =>
            ((x - col("__mu")) * (x - col("__mu")))
              .cast("decimal(38,12)")),
          zeroDec,
          (a, x) => (a + x).cast("decimal(38,12)")).cast("double") / nD))
    val slack = lit(k) * col("__sg")
    val sArr = aggregate(col("__xs"),
      struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
        array().cast("array<struct<sp:double,sn:double>>").as("arr")),
      (st, xv) => {
        val spNew = greatest(lit(0.0),
          st.getField("sp") + (xv - col("__mu") - slack))
        val snNew = greatest(lit(0.0),
          st.getField("sn") + (col("__mu") - xv - slack))
        struct(spNew.as("sp"), snNew.as("sn"),
          concat(st.getField("arr"),
            array(struct(spNew.as("sp"), snNew.as("sn")))).as("arr"))
      },
      st => st.getField("arr"))
    base
      .select(col("key"), col("__xs"), col("__sg"),
        posexplode(sArr).as(Seq("__pos", "__s")))
      .select(col("key"), col("__pos").as("day_idx"),
        element_at(col("__xs"), col("__pos") + 1).cast("long").as("x"),
        round(col("__s.sp"), 6).as("s_pos"),
        round(col("__s.sn"), 6).as("s_neg"),
        round(lit(h) * col("__sg"), 6).as("limit"))
      .withColumn("alarm",
        col("s_pos") > col("limit") || col("s_neg") > col("limit"))
      .orderBy(col("key"), col("day_idx"))
  }

  /** The shared Holt-Winters kernel: per-key zero-filled spine →
    * numDays-array → ONE `aggregate()` fold whose state carries
    * (ℓ, b, seasonal queue, backtest error accumulators). Returns the
    * keyed array frame and the final fold struct column. */
  private def hwFold(events: DataFrame, keyCol: String, tsCol: String,
      startDay: String, numDays: Int, seasonLen: Int, alpha: Double,
      beta: Double, gamma: Double): (DataFrame, Column) = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(beta > 0 && beta < 1, "beta must be in (0,1)")
    require(gamma > 0 && gamma < 1, "gamma must be in (0,1)")
    require(seasonLen >= 2 && seasonLen <= 31,
      "seasonLen in [2,31] (a plan-time constant)")
    require(numDays >= 2 * seasonLen && numDays <= 120,
      "numDays in [2*seasonLen, 120] — the init needs two full seasons " +
        "and the spine is a plan-time constant")
    val m = seasonLen
    val t0 = numDays
    val counts = events
      .select(col(keyCol).cast("string").as("key"),
        datediff(to_date(col(tsCol)), to_date(lit(startDay))).as("__i"))
      .filter(col("key").isNotNull &&
        col("__i") >= 0 && col("__i") < t0)
      .groupBy(col("key"), col("__i"))
      .agg(count(lit(1)).as("__n"))
    val xs = counts
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("__i"), col("__n"))))
        .as("__m"))
      .select(col("key"),
        transform(sequence(lit(0), lit(t0 - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("__xs"))
    def x(i: Int) = element_at(col("__xs"), i + 1)
    // first-two-seasons init, every sum folded left-to-right (the
    // oracle emits the same association)
    val l0 = (0 until m).map(x).reduceLeft(_ + _) / lit(m.toDouble)
    val avg2 = (m until 2 * m).map(x).reduceLeft(_ + _) / lit(m.toDouble)
    val b0 = (avg2 - l0) / lit(m.toDouble)
    val s0 = transform(slice(col("__xs"), 1, m), v => v - l0)
    val init = struct(l0.as("l"), b0.as("b"), s0.as("s"),
      lit(0.0).as("sae"), lit(0.0).as("sse"), lit(0.0).as("sape"),
      lit(0.0).as("nz"),
      array().cast("array<double>").as("errs"))
    val step = (acc: Column, xv: Column) => {
      val l = acc.getField("l"); val b = acc.getField("b")
      val s = acc.getField("s")
      val sUsed = element_at(s, 1)
      // the PRE-update one-step forecast and its error — scored before
      // the state absorbs x_t, which is what "one step ahead" means
      val e = xv - (l + b + sUsed)
      val lNew = lit(alpha) * (xv - sUsed) + lit(1 - alpha) * (l + b)
      val bNew = lit(beta) * (lNew - l) + lit(1 - beta) * b
      val sNew = lit(gamma) * (xv - l - b) + lit(1 - gamma) * sUsed
      struct(lNew.as("l"), bNew.as("b"),
        concat(slice(s, 2, m - 1), array(sNew)).as("s"),
        (acc.getField("sae") + abs(e)).as("sae"),
        (acc.getField("sse") + e * e).as("sse"),
        (acc.getField("sape") +
          when(xv =!= 0.0, abs(e) / abs(xv)).otherwise(0.0)).as("sape"),
        (acc.getField("nz") +
          when(xv =!= 0.0, 1.0).otherwise(0.0)).as("nz"),
        // the raw one-step errors, kept per step for the interval
        // face's residual quantiles (array append is O(t) per step —
        // the cost lives in the bounded spine, the ewma argument)
        concat(acc.getField("errs"), array(e)).as("errs"))
    }
    (xs, aggregate(slice(col("__xs"), m + 1, t0 - m), init, step))
  }

  /** Autocorrelation function + Ljung-Box white-noise statistic per
    * key's daily-count series (Box & Jenkins; Ljung & Box 1978) — the
    * diagnostic BEFORE the [[sesForecast]]/[[holtWinters]] family:
    * does this series carry structure worth modeling at all, and at
    * which lags (a weekly cycle shows as a spike at lag 7)?
    *
    *   r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
    *   Q_K = n(n+2)·Σ_{k≤K} r_k²/(n−k)   (compare to χ²_K)
    *
    * (the biased-denominator estimator — the standard one; it keeps
    * |r_k| ≤ 1 and is what Ljung-Box assumes). Returns one row per
    * (key, lag ≤ maxLag) with (key, lag, n, acf, lb_q), 6 dp — lb_q
    * is CUMULATIVE over lags ≤ lag, so each row reads directly
    * against the χ²_lag table. A constant series (zero variance) has
    * no autocorrelation: null acf/lb_q. Lags ≥ the series length
    * produce no row (no overlapping pairs).
    *
    * 100 TB shape: ONE event-sized exchange collapses the log to
    * (key, day) grain; every window after that is keyed by the series
    * key over calendar-bounded partitions (a year is 365 rows however
    * big the log); numerator/denominator terms quantize to
    * DECIMAL(38,12) (order-free), and the Ljung-Box cumulative sum
    * rides a deterministic lag-ordered K-row window.
    */
  def acf(events: DataFrame, keyCol: String, tsCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, "acf: maxLag must be in 1..60")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val d = dailyCounts(events, keyCol, tsCol, "day", "n", pin = false)
    val wk = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wo = Window.partitionBy(col("key")).orderBy(col("day"))
    val base = d
      .withColumn("__cnt", count(lit(1)).over(wk))
      .withColumn("__mean",
        sum(d12(col("n"))).over(wk).cast("double") /
          col("__cnt").cast("double"))
      .withColumn("__dev", col("n").cast("double") - col("__mean"))
      .withColumn("__den", sum(d12(col("__dev") * col("__dev"))).over(wk))
    // materialize each lag first — window expressions can't live
    // inside a generator (explode) expression
    val lagged = (1 to maxLag).foldLeft(base) { (acc, k) =>
      acc.withColumn(s"__l$k", lag(col("__dev"), k).over(wo))
    }
    val lagTerms = (1 to maxLag).map { k =>
      struct(lit(k).as("lag"), (col("__dev") * col(s"__l$k")).as("term"))
    }
    val rk = lagged
      .select(col("key"), col("__cnt"), col("__den"),
        explode(array(lagTerms: _*)).as("__lt"))
      .select(col("key"), col("__cnt"), col("__den"),
        col("__lt.lag").as("lag"), col("__lt.term").as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("key"), col("lag"))
      .agg(max(col("__cnt")).as("n"), max(col("__den")).as("den"),
        sum(d12(col("term"))).as("num"))
      .withColumn("acf_raw",
        when(col("den").cast("double") > 0,
          col("num").cast("double") / col("den").cast("double")))
    // K-row per-key window: cumulative Ljung-Box terms in lag order
    val wlb = Window.partitionBy(col("key")).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk.withColumn("lb_q",
        when(col("acf_raw").isNotNull,
          round(col("n").cast("double") * (col("n") + 2).cast("double") *
            sum(d12(col("acf_raw") * col("acf_raw") /
              (col("n") - col("lag")).cast("double"))).over(wlb)
              .cast("double"), 6)))
      .select(col("key"), col("lag"), col("n"),
        round(col("acf_raw"), 6).as("acf"), col("lb_q"))
      .orderBy(col("key"), col("lag"))
  }

  /** AR(p) autoregression fit per key by Yule-Walker: solve the
    * Toeplitz system `R·φ = r` over the series' autocorrelations with
    * the Levinson-Durbin recursion (Durbin 1960). Input
    * autocorrelations are [[acf]]'s 6-dp readouts — quantized BEFORE
    * the solve on both faces, so the recursion's every double is
    * engine-replayable. Returns one row per (key, lag ≤ p):
    * (key, lag, phi, var_ratio) where `phi` is the order-p
    * coefficient φ_{p,lag} and `var_ratio = E_p = Π(1−k_m²)` the
    * innovation-variance share left after conditioning on p lags (1 =
    * the AR terms explain nothing, → 0 = near-deterministic). 6 dp.
    *
    * Keys whose series is too short for lag p (a missing/null ACF) or
    * hits a degenerate step (E_m = 0, |ACF| = 1) are omitted — stated,
    * not silently emitted as NaN.
    *
    * 100 TB shape: the heavy work is [[acf]]'s one event-sized
    * collapse + calendar-bounded windows; the solve runs on the
    * collected (key × p) ACF frame — bounded by the number of
    * monitored SERIES (the [[graft.streaming.StreamOps.streamingEwmaChart]]
    * baseline argument), never by events.
    */
  def arFit(events: DataFrame, keyCol: String, tsCol: String,
      p: Int): DataFrame = {
    require(p >= 1 && p <= 5, "arFit: p must be in 1..5")
    val spark = events.sparkSession
    import spark.implicits._
    val rows = acf(events, keyCol, tsCol, maxLag = p)
      .select(col("key"), col("lag"), col("acf"))
      .collect() // (keys × p) — series-count-bounded, not event-bounded
    val byKey = rows.groupBy(_.getString(0))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = byKey.toSeq.sortBy(_._1).flatMap { case (key, rs) =>
      val r = new Array[Double](p + 1)
      var complete = true
      (1 to p).foreach { l =>
        rs.find(_.getInt(1) == l) match {
          case Some(row) if !row.isNullAt(2) => r(l) = row.getDouble(2)
          case _ => complete = false
        }
      }
      if (!complete) Seq.empty
      else {
        val phi = Array.ofDim[Double](p + 1, p + 1)
        val e = new Array[Double](p + 1)
        e(0) = 1.0
        var degenerate = false
        (1 to p).foreach { m =>
          if (!degenerate) {
            if (e(m - 1) == 0.0) degenerate = true
            else {
              val acc = (1 until m).foldLeft(0.0)((a, j) =>
                a + phi(m - 1)(j) * r(m - j))
              val k = (r(m) - acc) / e(m - 1)
              phi(m)(m) = k
              (1 until m).foreach(j =>
                phi(m)(j) = phi(m - 1)(j) - k * phi(m - 1)(m - j))
              e(m) = e(m - 1) * (1.0 - k * k)
            }
          }
        }
        if (degenerate) Seq.empty
        else (1 to p).map(l => (key, l, r6(phi(p)(l)), r6(e(p))))
      }
    }
    out.toDF("key", "lag", "phi", "var_ratio")
      .orderBy(col("key"), col("lag"))
  }

  /** AR(p) h-step forecast — the [[arFit]] loop closed: per key, the
    * fitted φ's recurse forward in DEVIATION space from the last p
    * observed daily counts, `x̂_{T+h} = μ + Σ_j φ_j·(x̃_{T+h−j} − μ)`
    * (forecast deviations feed back for h > 1, converging to the mean
    * as an AR must). Uses arFit's 6-dp φ grain and the same series
    * mean; keys arFit omits (short/degenerate) are omitted here too.
    * Returns (key, h, forecast), 6 dp, h = 1..horizon.
    *
    * 100 TB shape: arFit's one event-sized collapse; the last-p frame
    * rides a key-partitioned window; the recursion runs on the
    * series-count-bounded collect.
    */
  def arForecast(events: DataFrame, keyCol: String, tsCol: String,
      p: Int, horizon: Int): DataFrame = {
    require(horizon >= 1 && horizon <= 14,
      "arForecast: horizon must be in 1..14")
    val spark = events.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val phi = arFit(events, keyCol, tsCol, p).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true) // two consumers: moments + last-p
    val moments = daily.groupBy(col("key"))
      .agg(count(lit(1)).as("__cnt"), sum(d12(col("__n"))).as("__sn"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDecimal(2).doubleValue() / r.getLong(1).toDouble))
      .toMap
    val wDesc = Window.partitionBy(col("key"))
      .orderBy(col("__day").desc)
    val lastP = daily
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= p)
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        // __rn = 1 is the most recent observation
        k -> rs.sortBy(_.getInt(rs.head.fieldIndex("__rn")))
          .map(_.getLong(rs.head.fieldIndex("__n")).toDouble)
      }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = phi.keys.toSeq.sorted.flatMap { k =>
      val ph = phi(k)
      val mu = moments(k)
      val obs = lastP.getOrElse(k, Array.empty[Double])
      if (obs.length < p) Seq.empty
      else {
        var devs = obs.take(p).map(_ - mu).toVector // most recent first
        (1 to horizon).map { h =>
          val nd = (1 to p).foldLeft(0.0)((acc, j) =>
            acc + ph(j - 1) * devs(j - 1))
          devs = nd +: devs.dropRight(1)
          (k, h, r6(mu + nd))
        }
      }
    }
    out.toDF("key", "h", "forecast").orderBy(col("key"), col("h"))
  }

  /** Prediction intervals for [[arForecast]] — empirical bands from
    * the model's own IN-SAMPLE one-step residuals: at every observed
    * step with p predecessors, `r_t = dev_t − Σ_j φ_j·dev_{t−j}` (the
    * same 6-dp φ grain and series mean the forecast uses), the per-key
    * (α/2, 1−α/2) residual quantiles come from the distributed
    * exact-quantile machine, and horizon h widens by √h
    * (uncorrelated-step forecast-error growth — the standard AR
    * scaling; empirical quantiles, not Gaussian ±z·σ̂, so skewed count
    * noise keeps its skew):
    * `[lo, hi] = forecast_h + [q_lo, q_hi]·√h`. Keys [[arFit]] omits
    * are omitted here too. Returns (key, h, forecast, lo, hi), 6 dp.
    *
    * 100 TB shape: [[arForecast]]'s passes + ONE key-windowed lag
    * projection over the daily grain (series-bounded) feeding
    * [[graft.ops.Quantiles.exactByKey]]; the interval algebra rides
    * the series-count-bounded collect.
    */
  def arForecastInterval(events: DataFrame, keyCol: String,
      tsCol: String, p: Int, horizon: Int,
      ciAlpha: Double = 0.05): DataFrame = {
    require(horizon >= 1 && horizon <= 14,
      "arForecastInterval: horizon must be in 1..14")
    require(ciAlpha > 0 && ciAlpha < 1,
      "arForecastInterval: ciAlpha must be in (0,1)")
    val spark = events.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val phi = arFit(events, keyCol, tsCol, p).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true) // consumers: moments + last-p + the residual lags
    val moments = daily.groupBy(col("key"))
      .agg(count(lit(1)).as("__cnt"), sum(d12(col("__n"))).as("__sn"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDecimal(2).doubleValue() / r.getLong(1).toDouble))
      .toMap
    val phiDf = broadcast(phi.toSeq.sortBy(_._1)
      .map { case (k, a) => (k, a.toSeq) }.toDF("key", "__phi"))
    val muDf = broadcast(moments.toSeq.sortBy(_._1)
      .toDF("key", "__mu"))
    val wKey = Window.partitionBy(col("key")).orderBy(col("__day"))
    val lagged = (1 to p).foldLeft(
      daily.join(phiDf, Seq("key")).join(muDf, Seq("key")))(
      (acc, j) => acc.withColumn(s"__l$j",
        lag(col("__n"), j).over(wKey)))
      .filter((1 to p).map(j => col(s"__l$j").isNotNull)
        .reduce(_ && _))
    // r_t = dev_t − (((0 + φ1·dev_{t−1}) + φ2·dev_{t−2}) + …) — the
    // forecast recursion's exact left-assoc shape at in-sample steps
    val pred = (1 to p).foldLeft(lit(0.0): Column)((acc, j) =>
      acc + element_at(col("__phi"), j) *
        (col(s"__l$j").cast("double") - col("__mu")))
    val resid = lagged.select(col("key"),
      ((col("__n").cast("double") - col("__mu")) - pred).as("__r"))
    val qrows = Quantiles.exactByKey(resid, "key", "__r",
        Seq(ciAlpha / 2, 1 - ciAlpha / 2))
      .collect() // keys × 2 — series-count-bounded
    val qlo = qrows.filter(_.getDouble(1) == ciAlpha / 2)
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val qhi = qrows.filter(_.getDouble(1) == 1 - ciAlpha / 2)
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val wDesc = Window.partitionBy(col("key"))
      .orderBy(col("__day").desc)
    val lastP = daily
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= p)
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(rs.head.fieldIndex("__rn")))
          .map(_.getLong(rs.head.fieldIndex("__n")).toDouble)
      }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out = phi.keys.toSeq.sorted.flatMap { k =>
      val ph = phi(k)
      val mu = moments(k)
      val obs = lastP.getOrElse(k, Array.empty[Double])
      if (obs.length < p || !qlo.contains(k)) Seq.empty
      else {
        var devs = obs.take(p).map(_ - mu).toVector // most recent first
        (1 to horizon).map { h =>
          val nd = (1 to p).foldLeft(0.0)((acc, j) =>
            acc + ph(j - 1) * devs(j - 1))
          devs = nd +: devs.dropRight(1)
          (k, h, r6(mu + nd),
            r6(mu + nd + qlo(k) * math.sqrt(h.toDouble)),
            r6(mu + nd + qhi(k) * math.sqrt(h.toDouble)))
        }
      }
    }
    out.toDF("key", "h", "forecast", "lo", "hi")
      .orderBy(col("key"), col("h"))
  }

  /** Augmented Dickey-Fuller unit-root test (constant-only model) of a
    * single ordered series: the OLS regression
    * `Δy_t = α + β·y_{t−1} + Σ_{i≤lags} γ_i·Δy_{t−i} + ε` via
    * [[olsFit]]'s one-aggregation Gram device; the ADF statistic is
    * β's t-ratio. `stationary` flags adf_stat < −2.86 (the asymptotic
    * 5% critical value for the constant-only case, MacKinnon 1991),
    * compared on the 6-dp readout. Returns one row
    * (n, lags, beta, adf_stat, stationary); adf_stat/stationary null
    * when β's se rounds to 0.
    *
    * The lag frame rides ONE unpartitioned window — bounded by the
    * SERIES length (a calendar-bounded daily spine, the [[acf]]
    * argument), not by events: aggregate upstream to series grain
    * first.
    */
  def adfTest(series: DataFrame, orderCol: String, valueCol: String,
      lags: Int): DataFrame = {
    require(lags >= 0 && lags <= 10, "adfTest: lags must be in 0..10")
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val base0 = series
      .select(col(orderCol).as("__o"),
        col(valueCol).cast("double").as("__y"))
      .filter(col("__y").isNotNull && col("__o").isNotNull)
      .withColumn("__ylag", lag(col("__y"), 1).over(w))
      .withColumn("__dy", col("__y") - col("__ylag"))
    val withLags = (1 to lags).foldLeft(base0)((acc, i) =>
      acc.withColumn(s"__dl$i", lag(col("__dy"), i).over(w)))
    val fit = olsFit(withLags, "__dy",
      "__ylag" +: (1 to lags).map(i => s"__dl$i"))
    val beta = fit.filter(col("term") === "__ylag")
    beta.select(col("n"), lit(lags).as("lags"),
        col("coef").as("beta"), col("t_stat").as("adf_stat"))
      .withColumn("stationary",
        when(col("adf_stat").isNotNull, col("adf_stat") < -2.86))
  }

  /** KPSS level-stationarity test (Kwiatkowski-Phillips-Schmidt-Shin
    * 1992) — [[adfTest]]'s complement with the hypotheses flipped (ADF:
    * unit-root null; KPSS: stationary null — agreeing tests settle the
    * question). η = (Σ_t S_t² / n²) / σ̂²_lr over the demeaned series'
    * partial sums, with the Newey-West long-run variance under Bartlett
    * weights `w_l = 1 − l/(L+1)`. `stationary` flags η < 0.463 (the
    * 5% critical value, level case), compared on the 6-dp readout.
    * Returns one row (n, lags, eta, stationary); eta is null when the
    * long-run variance is ≤ 0 (constant series).
    *
    * Same shape contract as [[adfTest]]: the series is calendar-
    * bounded, the windows unpartitioned-but-bounded, every sum
    * DECIMAL(38,12)-quantized.
    */
  def kpssTest(series: DataFrame, orderCol: String, valueCol: String,
      lags: Int): DataFrame = {
    require(lags >= 0 && lags <= 10, "kpssTest: lags must be in 0..10")
    val spark = series.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base = series
      .select(col(orderCol).as("__o"),
        col(valueCol).cast("double").as("__y"))
      .filter(col("__o").isNotNull && col("__y").isNotNull)
      .localCheckpoint(eager = true) // series-sized; mean + residual
    val m = base.agg(count(lit(1)).as("n"), sum(d12(col("__y"))).as("sy"))
      .head()
    val n = m.getLong(0)
    require(n > lags + 1, s"kpssTest: need n > ${lags + 1}, got $n")
    val mean = m.getDecimal(1).doubleValue() / n.toDouble
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val wCum = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val resid0 = base
      .withColumn("__e", col("__y") - lit(mean))
      .withColumn("__S", sum(d12(col("__e"))).over(wCum).cast("double"))
    val withLags = (1 to lags).foldLeft(resid0)((acc, l) =>
      acc.withColumn(s"__el$l", lag(col("__e"), l).over(w)))
    val aggs = Seq(sum(d12(col("__S") * col("__S"))).as("ss2"),
      sum(d12(col("__e") * col("__e"))).as("g0")) ++
      (1 to lags).map(l =>
        sum(d12(col("__e") * col(s"__el$l"))).as(s"g$l"))
    val r = withLags.agg(aggs.head, aggs.tail: _*).head()
    def dv(f: String) = {
      val d = r.getDecimal(r.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val nD = n.toDouble
    var lr = dv("g0") / nD
    (1 to lags).foreach { l =>
      lr += 2.0 * (1.0 - l.toDouble / (lags + 1).toDouble) *
        (dv(s"g$l") / nD)
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val eta =
      if (lr > 0) Some(r6((dv("ss2") / (nD * nD)) / lr)) else None
    Seq((n, lags, eta, eta.map(_ < 0.463)))
      .toDF("n", "lags", "eta", "stationary")
  }

  /** Diebold-Mariano forecast comparison (Diebold & Mariano 1995):
    * given two competing forecasts' errors on the SAME series, is one
    * significantly more accurate? The loss differential
    * `d_t = e1_t² − e2_t²` (squared-error loss) is tested for zero
    * mean with a Bartlett/Newey-West long-run variance (the [[kpssTest]]
    * machinery — forecast errors autocorrelate by construction):
    * `DM = d̄ / sqrt(LRV/n)`, two-sided A&S normal p. DM < 0 favors
    * model 1. Returns one row (n, lags, d_bar, dm_stat, p_value);
    * stat/p null when the LRV is ≤ 0 (identical forecasts).
    *
    * Same bounded-series contract as [[adfTest]]/[[kpssTest]].
    */
  def dmTest(series: DataFrame, orderCol: String, e1Col: String,
      e2Col: String, lags: Int): DataFrame = {
    require(lags >= 0 && lags <= 10, "dmTest: lags must be in 0..10")
    val spark = series.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base = series
      .select(col(orderCol).as("__o"),
        (col(e1Col).cast("double") * col(e1Col).cast("double") -
          col(e2Col).cast("double") * col(e2Col).cast("double"))
          .as("__d"))
      .filter(col("__o").isNotNull && col("__d").isNotNull)
      .localCheckpoint(eager = true) // mean pass + residual pass
    val m = base.agg(count(lit(1)).as("n"), sum(d12(col("__d"))).as("sd"))
      .head()
    val n = m.getLong(0)
    require(n > lags + 1, s"dmTest: need n > ${lags + 1}, got $n")
    val dbar = m.getDecimal(1).doubleValue() / n.toDouble
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val resid0 = base.withColumn("__e", col("__d") - lit(dbar))
    val withLags = (1 to lags).foldLeft(resid0)((acc, l) =>
      acc.withColumn(s"__el$l", lag(col("__e"), l).over(w)))
    val aggs = Seq(sum(d12(col("__e") * col("__e"))).as("g0")) ++
      (1 to lags).map(l =>
        sum(d12(col("__e") * col(s"__el$l"))).as(s"g$l"))
    val r = withLags.agg(aggs.head, aggs.tail: _*).head()
    def dv(f: String) = {
      val d = r.getDecimal(r.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val nD = n.toDouble
    var lrv = dv("g0") / nD
    (1 to lags).foreach { l =>
      lrv += 2.0 * (1.0 - l.toDouble / (lags + 1).toDouble) *
        (dv(s"g$l") / nD)
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (dm, p) =
      if (lrv > 0) {
        val stat = dbar / math.sqrt(lrv / nD)
        val ax = math.abs(stat)
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) *
          poly
        (Some(r6(stat)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    Seq((n, lags, r6(dbar), dm, p))
      .toDF("n", "lags", "d_bar", "dm_stat", "p_value")
  }

  /** Cross-correlation function between two aligned series — [[acf]]'s
    * two-variable sibling and the lead-lag scout before [[grangerTest]]:
    * `r_xy(k) = Σ (x_t − x̄)(y_{t+k} − ȳ) / sqrt(Σdx² · Σdy²)` for
    * k ∈ [−maxLag, maxLag]; a peak at POSITIVE k means x leads y by k
    * steps. Returns (lag, n_pairs, ccf), 6 dp, ordered by lag;
    * degenerate axes yield null ccf.
    *
    * Same shape as [[acf]]: bounded series, one unpartitioned-but-
    * bounded window for the shifted pairing, DECIMAL-quantized sums.
    */
  def ccf(series: DataFrame, orderCol: String, xCol: String,
      yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, "ccf: maxLag must be in 1..30")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base0 = series
      .select(col(orderCol).as("__o"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .filter(col("__o").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .localCheckpoint(eager = true) // moments + the lag frame
    val m = base0.agg(count(lit(1)).as("n"),
      sum(d12(col("__x"))).as("sx"), sum(d12(col("__y"))).as("sy"))
      .head()
    val n = m.getLong(0)
    require(n > maxLag, s"ccf: need n > $maxLag points, got $n")
    val xbar = m.getDecimal(1).doubleValue() / n.toDouble
    val ybar = m.getDecimal(2).doubleValue() / n.toDouble
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val dev = base0
      .withColumn("__dx", col("__x") - lit(xbar))
      .withColumn("__dy", col("__y") - lit(ybar))
    // lag k > 0: x_t pairs y_{t+k} -> dy led by k; negative k mirrors
    val withLeads = (1 to maxLag).foldLeft(dev)((acc, k) =>
      acc.withColumn(s"__yl$k", lead(col("__dy"), k).over(w))
        .withColumn(s"__xl$k", lead(col("__dx"), k).over(w)))
    val lagTerms =
      struct(lit(0).as("lag"), (col("__dx") * col("__dy")).as("term")) +:
        ((1 to maxLag).map(k => struct(lit(k).as("lag"),
          (col("__dx") * col(s"__yl$k")).as("term"))) ++
          (1 to maxLag).map(k => struct(lit(-k).as("lag"),
            (col("__dy") * col(s"__xl$k")).as("term"))))
    val sums = withLeads
      .select(explode(array(lagTerms: _*)).as("__lt"))
      .select(col("__lt.lag").as("lag"), col("__lt.term").as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(d12(col("term"))).as("num"))
    val denoms = dev.agg(
      sum(d12(col("__dx") * col("__dx"))).as("__vx"),
      sum(d12(col("__dy") * col("__dy"))).as("__vy"))
    sums.crossJoin(broadcast(denoms))
      .select(col("lag"), col("n_pairs"),
        when(col("__vx").cast("double") > 0 &&
          col("__vy").cast("double") > 0,
          round(col("num").cast("double") /
            sqrt(col("__vx").cast("double")) /
            sqrt(col("__vy").cast("double")), 6)).as("ccf"))
      .orderBy(col("lag"))
  }

  /** Fixed-period periodogram: spectral power of a series at CANDIDATE
    * periods — `P(p) = (a_p² + b_p²)/n` with `a_p = Σ dev_t·cos(2πt/p)`,
    * `b_p = Σ dev_t·sin(2πt/p)` over the 0-based time index. The
    * "which cycle length is real" scout before committing a
    * [[holtWinters]] seasonLen; each candidate is two weighted sums in
    * ONE aggregation pass (no FFT needed for a handful of business-
    * plausible periods). Returns (period, power, is_peak), 6 dp —
    * is_peak marks the max-power row (ties to the smallest period).
    *
    * Bounded-series contract; trig factors are per-row expressions on
    * identical doubles (the house ln/exp 6-dp discipline).
    */
  def periodogram(series: DataFrame, orderCol: String, valueCol: String,
      periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.size <= 20,
      "periodogram: need 1..20 candidate periods")
    require(periods.forall(p => p >= 2 && p <= 1000),
      "periodogram: periods must be in 2..1000")
    require(periods.distinct.size == periods.size,
      "periodogram: periods must be distinct")
    val spark = series.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base0 = series
      .select(col(orderCol).as("__o"),
        col(valueCol).cast("double").as("__y"))
      .filter(col("__o").isNotNull && col("__y").isNotNull)
      .localCheckpoint(eager = true) // mean + the indexed pass
    val m = base0.agg(count(lit(1)).as("n"), sum(d12(col("__y"))).as("sy"))
      .head()
    val n = m.getLong(0)
    require(n >= 4, s"periodogram: need >= 4 points, got $n")
    val ybar = m.getDecimal(1).doubleValue() / n.toDouble
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val indexed = base0
      .withColumn("__t", (row_number().over(w) - 1).cast("double"))
      .withColumn("__dev", col("__y") - lit(ybar))
    val aggs = periods.flatMap { p =>
      val ang = col("__t") * lit(2.0 * math.Pi / p.toDouble)
      Seq(sum(d12(col("__dev") * cos(ang))).as(s"a$p"),
        sum(d12(col("__dev") * sin(ang))).as(s"b$p"))
    }
    val r = indexed.agg(aggs.head, aggs.tail: _*).head()
    def dv(f: String) = r.getDecimal(r.fieldIndex(f)).doubleValue()
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val powers = periods.sorted.map { p =>
      val (a, b) = (dv(s"a$p"), dv(s"b$p"))
      (p, r6((a * a + b * b) / n.toDouble))
    }
    val best = powers.maxBy { case (p, pw) => (pw, -p) }._1
    powers.map { case (p, pw) => (p, pw, p == best) }
      .toDF("period", "power", "is_peak")
      .orderBy(col("period"))
  }

  /** Granger causality test (Granger 1969): does x's history improve
    * the prediction of y beyond y's own? Fits the unrestricted model
    * `y_t ~ 1 + y_{t−1..L} + x_{t−1..L}` and the restricted
    * `y_t ~ 1 + y_{t−1..L}` on the SAME listwise-complete sample and
    * reports `F = ((RSS_r − RSS_u)/L) / (RSS_u/(n − 2L − 1))` with
    * (df1 = L, df2 = n − 2L − 1). Both solves come from ONE Gram
    * aggregation — the restricted normal equations are a subset of the
    * unrestricted moments. Returns one row
    * (n, lags, rss_restricted, rss_unrestricted, f_stat, df1, df2),
    * 6 dp; f_stat is null when RSS_u rounds non-positive (exact fit).
    *
    * The lag frame rides one series-length-bounded unpartitioned
    * window (the [[adfTest]] argument: aggregate to series grain
    * upstream). 100 TB shape: one aggregation, two driver-side
    * (≤17×35) eliminations.
    */
  def grangerTest(series: DataFrame, orderCol: String, yCol: String,
      xCol: String, lags: Int): DataFrame = {
    require(lags >= 1 && lags <= 8, "grangerTest: lags must be in 1..8")
    val spark = series.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val w = Window.orderBy(col("__o")) // series-length-bounded
    val base0 = series
      .select(col(orderCol).as("__o"),
        col(yCol).cast("double").as("__y0"),
        col(xCol).cast("double").as("__x0"))
      .filter(col("__o").isNotNull && col("__y0").isNotNull &&
        col("__x0").isNotNull)
    val withLags = (1 to lags).foldLeft(base0)((acc, i) =>
      acc.withColumn(s"__yl$i", lag(col("__y0"), i).over(w))
        .withColumn(s"__xl$i", lag(col("__x0"), i).over(w)))
    val k = 2 * lags
    // design columns x0..x{L-1} = y lags, xL..x{2L-1} = x lags
    val regs = (1 to lags).map(i => s"__yl$i") ++
      (1 to lags).map(i => s"__xl$i")
    val base = withLags
      .select(col("__y0").as("__y") +:
        regs.zipWithIndex.map { case (c, i) => col(c).as(s"__x$i") }: _*)
      .filter(col("__y").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull).reduce(_ && _))
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__y"))).as("sy"),
      sum(d12(col("__y") * col("__y"))).as("syy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val r = base.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    def dv(f: String) = {
      val d = r.getDecimal(r.fieldIndex(f))
      if (d == null) 0.0 else d.doubleValue()
    }
    val nL = r.getLong(r.fieldIndex("n"))
    val pU = k + 1
    require(nL > pU, s"grangerTest: need n > $pU rows, got $nL")
    val nD = nL.toDouble
    def gx(i: Int, j: Int) = dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
    // solve a sub-design over regressor indexes `idx` (plus intercept)
    def rssFor(idx: Seq[Int]): Double = {
      val p = idx.size + 1
      val wdt = 2 * p + 1
      val init = Array.tabulate(p, wdt) { (rr, j) =>
        def gram(a: Int, b: Int): Double =
          if (a == 0 && b == 0) nD
          else if (a == 0) dv(s"sx${idx(b - 1)}")
          else gx(idx(a - 1), idx(b - 1))
        if (j < p) { if (j >= rr) gram(rr, j) else gram(j, rr) }
        else if (j == p) {
          if (rr == 0) dv("sy") else dv(s"sx${idx(rr - 1)}y")
        }
        else if (j == p + 1 + rr) 1.0 else 0.0
      }
      val (beta, _) = gaussJordan(init, p)
      val rhs = Array.tabulate(p)(i => init(i)(p))
      var rss = dv("syy")
      for (i <- 0 until p) rss -= beta(i) * rhs(i)
      rss
    }
    val rssU = rssFor(0 until k)
    val rssR = rssFor(0 until lags)
    val dof2 = nL - pU
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val f =
      if (rssU > 0)
        Some(r6(((rssR - rssU) / lags.toDouble) /
          (rssU / dof2.toDouble)))
      else None
    Seq((nL, lags, r6(rssR), r6(rssU), f, lags, dof2))
      .toDF("n", "lags", "rss_restricted", "rss_unrestricted",
        "f_stat", "df1", "df2")
  }

  /** Variance inflation factors: for each regressor, how much its
    * coefficient variance is inflated by collinearity with the others
    * — `VIF_j = (R⁻¹)_{jj}` over the correlation matrix R of the
    * regressor set (Belsley-Kuh-Welsch 1980). The pre-flight check
    * before trusting [[olsFit]]/[[olsAdjust]] coefficients; VIF > 10
    * is the classic alarm. R comes from
    * [[graft.ops.Profile.correlationMatrix]]'s 6-dp readouts —
    * quantized BEFORE the inversion on both faces (the [[arFit]]
    * device), so the elimination is engine-replayable. Returns one row
    * per regressor: (term_idx, column, vif), 6 dp. A degenerate column
    * (zero variance → null correlation) or an exactly-singular R
    * fails loudly rather than emitting NaN.
    *
    * 100 TB shape: correlationMatrix's single moments aggregation;
    * the k×k inversion runs on C(k,2) collected readouts, k ≤ 12.
    */
  def vif(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 12,
      "vif: need 2..12 columns")
    require(cols.distinct.size == cols.size,
      "vif: columns must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = graft.ops.Profile.correlationMatrix(df, cols).collect()
    val k = cols.size
    val rM = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    pairs.foreach { row =>
      val a = cols.indexOf(row.getString(0))
      val b = cols.indexOf(row.getString(1))
      require(!row.isNullAt(3),
        s"vif: degenerate correlation for (${row.getString(0)}, " +
          s"${row.getString(1)}) — zero-variance column?")
      rM(a)(b) = row.getDouble(3)
      rM(b)(a) = row.getDouble(3)
    }
    val wdt = 2 * k + 1
    val init = Array.tabulate(k, wdt) { (i, j) =>
      if (j < k) rM(i)(j)
      else if (j == k + 1 + i) 1.0 else 0.0
    }
    val (_, invDiag) = gaussJordan(init, k)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    cols.zipWithIndex.map { case (c, i) => (i, c, r6(invDiag(i))) }
      .toDF("term_idx", "column", "vif")
      .orderBy(col("term_idx"))
  }

  /** Seasonal/trend strength (Hyndman & Athanasopoulos, FPP3 §4.5,
    * Wang-Smith-Hyndman 2006): per key, the two forecastability
    * scalars over [[seasonalDecompose]]'s additive components —
    * `F_trend = max(0, 1 − Var(R)/Var(T+R))` (how much the
    * seasonally-adjusted series is explained by trend) and
    * `F_seasonal = max(0, 1 − Var(R)/Var(S+R))` (how much the
    * detrended series is explained by season). The triage number a
    * planner reads before trusting an [[arForecast]]/[[holtWinters]]
    * projection: strengths near 0 say the series is noise. Returns one
    * row per key (key, n_days, trend_strength, seasonal_strength),
    * 6 dp, over the days where the centered trend exists (edge days
    * have no 7-MA and are excluded on both faces). A flat component
    * (T+R or S+R constant at the 6-dp grain) has no defined strength →
    * null. Flatness is decided by min = max on the quantized
    * components, NOT by the variance's FP sign: the moment-formula
    * variance of a constant ~1e3-magnitude series cancels to ±1e-8,
    * and a positive residue would silently turn "undefined" into a
    * fake 1.0 (caught by SCALECHECK §5ai's volume poles).
    *
    * Variances are population (÷n) with every sum quantized to
    * DECIMAL(38,12) first — the strengths are partition-invariant and
    * engine-replayable over the decomposition's 6-dp components.
    *
    * 100 TB shape: [[seasonalDecompose]]'s passes plus ONE key-grain
    * aggregation over its calendar-sized output — nothing event-sized
    * moves after the decomposition's first collapse.
    */
  def seasonalStrength(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val comp = seasonalDecompose(events, keyCol, tsCol)
      .filter(col("trend").isNotNull)
      .select(col("key"), col("remainder").as("__r"),
        (col("trend") + col("remainder")).as("__tr"),
        (col("seasonal") + col("remainder")).as("__sr"))
    val m = comp.groupBy(col("key")).agg(
      count(lit(1)).as("n_days"),
      sum(d12(col("__r"))).cast("double").as("__sr1"),
      sum(d12(col("__r") * col("__r"))).cast("double").as("__sr2"),
      sum(d12(col("__tr"))).cast("double").as("__st1"),
      sum(d12(col("__tr") * col("__tr"))).cast("double").as("__st2"),
      sum(d12(col("__sr"))).cast("double").as("__ss1"),
      sum(d12(col("__sr") * col("__sr"))).cast("double").as("__ss2"),
      min(col("__tr")).as("__tmin"), max(col("__tr")).as("__tmax"),
      min(col("__sr")).as("__smin"), max(col("__sr")).as("__smax"))
    val nD = col("n_days").cast("double")
    def popVar(s1: Column, s2: Column) = (s2 - (s1 * s1) / nD) / nD
    val varR = popVar(col("__sr1"), col("__sr2"))
    val varTR = popVar(col("__st1"), col("__st2"))
    val varSR = popVar(col("__ss1"), col("__ss2"))
    m.select(col("key"), col("n_days"),
        when(col("__tmin") =!= col("__tmax") && varTR > 0.0,
          round(greatest(lit(0.0),
            lit(1.0) - varR / varTR), 6)).as("trend_strength"),
        when(col("__smin") =!= col("__smax") && varSR > 0.0,
          round(greatest(lit(0.0),
            lit(1.0) - varR / varSR), 6)).as("seasonal_strength"))
      .orderBy(col("key"))
  }

  /** Binary-segmentation changepoint scan (Scott & Knott 1974; the
    * offline companion to [[cusumChangepoint]]'s single split and the
    * streaming CUSUM monitor): per key, the argmax-|CUSUM| split of
    * the full daily series (level 1), then the same scan re-run inside
    * each resulting half (level 2, depth-capped) — the standard "this
    * source changed twice" readout. Returns one row per scanned
    * segment: (key, level, segment ∈ all|pre|post, seg_start, seg_end,
    * n_days, change_day, max_abs_cusum, mean_before, mean_after),
    * 6 dp, ties on |CUSUM| to the earliest day. A level-2 side with a
    * single day has no interior structure and emits no row;
    * mean_after is null only when the pick is the segment's last day.
    *
    * Every scan is one grain aggregate over the (key, day) frame: the
    * CUSUM windows partition BY KEY (level 2: key+side) over
    * calendar-bounded series, deviations quantize to DECIMAL(38,12)
    * (exact ordered cumulative sums), the pick is a row_number, the
    * side means conditional aggs — [[cusumChangepoint]]'s exact
    * shapes, so the two levels are engine-replayable.
    *
    * 100 TB shape: ONE event-sized collapse to (key, day); both levels
    * ride that calendar-sized frame — the recursion never re-touches
    * the event log.
    */
  def binarySegmentation(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = dailyCounts(events, keyCol, tsCol, "__day", "__n",
      pin = true) // consumers: level-1 scan + side tagging
    def scan(d: DataFrame, grp: Seq[String]): DataFrame = {
      val gcols = grp.map(col)
      val wAll = Window.partitionBy(gcols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.partitionBy(gcols: _*).orderBy(col("__day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPick = Window.partitionBy(gcols: _*)
        .orderBy(abs(col("__cusum")).desc, col("__day"))
      val cus = d
        .withColumn("__mean", sum(col("__n")).over(wAll) /
          count(lit(1)).over(wAll).cast("double"))
        .withColumn("__dev",
          (col("__n") - col("__mean")).cast("decimal(38,12)"))
        .withColumn("__cusum",
          sum(col("__dev")).over(wCum).cast("double"))
        .localCheckpoint(true) // consumers: the pick + both side means
      val pick = cus
        .withColumn("__rn", row_number().over(wPick))
        .where(col("__rn") === 1)
        .select(gcols :+ col("__day").as("__cd") :+
          round(abs(col("__cusum")), 6).as("max_abs_cusum"): _*)
      cus.join(pick, grp)
        .groupBy(gcols :+ col("__cd") :+ col("max_abs_cusum"): _*)
        .agg(min(col("__day")).as("seg_start"),
          max(col("__day")).as("seg_end"),
          count(lit(1)).as("n_days"),
          round(avg(when(col("__day") <= col("__cd"), col("__n"))), 6)
            .as("mean_before"),
          round(avg(when(col("__day") > col("__cd"), col("__n"))), 6)
            .as("mean_after"))
    }
    val l1 = scan(daily, Seq("key"))
      .localCheckpoint(true) // consumers: readout + side tagging
    val sides = daily
      .join(l1.select(col("key"), col("__cd").as("__l1cd")), Seq("key"))
      .withColumn("__side",
        when(col("__day") <= col("__l1cd"), "pre").otherwise("post"))
      .select(col("key"), col("__side"), col("__day"), col("__n"))
    val l2 = scan(sides, Seq("key", "__side"))
      .where(col("n_days") >= 2)
    def readout(d: DataFrame, level: Int, seg: Column) =
      d.select(col("key"), lit(level).as("level"), seg.as("segment"),
        col("seg_start"), col("seg_end"), col("n_days"),
        col("__cd").as("change_day"), col("max_abs_cusum"),
        col("mean_before"), col("mean_after"))
    readout(l1, 1, lit("all"))
      .unionByName(readout(l2, 2, col("__side")))
      .orderBy(col("key"), col("level"), col("segment"))
  }

  /** Frequent event subsequences — PrefixSpan-lite (Pei et al. 2001,
    * support-threshold growth without the projected-database
    * machinery): a pattern ⟨a₁>…>a_ℓ⟩ is supported by a user when the
    * user's (ts, id)-ordered event types contain it as a (gap-allowed)
    * subsequence; patterns with support ≥ `minSupport` users are kept,
    * grown one item per round up to `maxLen`. The "what do users do
    * before churning" tool beside [[topPaths]]' whole-prefix view and
    * [[markovTransitions]]' one-step view. Returns
    * (pattern, length, support), ordered (length, support desc,
    * pattern).
    *
    * Containment is decided by greedy leftmost matching: per
    * (user, pattern) only the MINIMAL end position is carried, and a
    * pattern extends iff some later event matches — exact for
    * subsequence containment, state linear in patterns, not
    * occurrences. Growth is anti-monotone (support(p·x) ≤ support(p)),
    * so pruning each round at `minSupport` loses nothing.
    *
    * GAP CONSTRAINTS (`maxGapEvents` / `maxGapMs`, both optional):
    * "within a session / within an hour" mining — consecutive matched
    * items must sit ≤ maxGapEvents positions and/or ≤ maxGapMs
    * milliseconds apart. Under a gap constraint greedy min-end is NOT
    * exact (the earliest match of a prefix can be too far from every
    * extension that a later match reaches), so the constrained path
    * carries ALL feasible match ends per (user, pattern) — state is
    * (pattern × matching occurrence)-grain, still event-bounded and
    * deduplicated per round, and the gap predicate bounds each state
    * row's probe fan-out (≤ maxGapEvents successors when given).
    * Support counts DISTINCT users. With neither gap set the min-end
    * path runs unchanged.
    *
    * 100 TB shape: positions ride ONE user-key window; each of the
    * ≤ maxLen−1 growth rounds is a user-keyed join of the pruned
    * (user, pattern, end) state against the typed log — the probe is
    * first semi-joined to the round's SURVIVING users (shrinks every
    * round; AQE broadcasts it when small) — plus a pattern-grain
    * support count. Min-end state is |users| × |frequent patterns|,
    * never occurrence-sized, and the frequent-pattern prune is a
    * broadcast semi-join. maxLen is capped at 4: candidate space is
    * |alphabet|^ℓ and a real mining run raises `minSupport`, not the
    * cap.
    */
  def frequentSequences(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, minSupport: Long,
      maxLen: Int = 3, maxGapEvents: Option[Long] = None,
      maxGapMs: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, "frequentSequences: minSupport must be >= 1")
    require(maxLen >= 1 && maxLen <= 4,
      "frequentSequences: maxLen must be in 1..4")
    maxGapEvents.foreach(g => require(g >= 1,
      "frequentSequences: maxGapEvents must be >= 1"))
    maxGapMs.foreach(g => require(g >= 0,
      "frequentSequences: maxGapMs must be >= 0"))
    val gapped = maxGapEvents.nonEmpty || maxGapMs.nonEmpty
    val wk = Window.partitionBy(col("__u"))
      .orderBy(col("__ts"), col("__id"))
    val evW = events
      .select(col(userCol).as("__u"),
        col(typeCol).cast("string").as("__it"),
        col(tsCol).as("__ts"), col(idCol).as("__id"))
      .filter(col("__u").isNotNull && col("__it").isNotNull &&
        col("__ts").isNotNull)
      .withColumn("__pos", row_number().over(wk))
    val ev = (if (gapped)
        evW.withColumn("__ms",
            unix_millis(col("__ts").cast("timestamp")))
          .select(col("__u"), col("__it"), col("__pos"), col("__ms"))
      else evW.select(col("__u"), col("__it"), col("__pos")))
      .localCheckpoint(true) // re-probed once per growth round
    // '>' is the pattern delimiter: an item containing it would make
    // ⟨"a>b"⟩ ambiguous with ⟨a>b⟩, silently merging state and support
    // across genuinely different patterns — fail loudly instead (the
    // dbscan id-guard convention); one early-terminating probe of the
    // pinned typed log
    val badItem = ev.where(col("__it").contains(">"))
      .select(col("__it")).head(1)
    require(badItem.isEmpty,
      s"frequentSequences: item type '${badItem.headOption.map(_.getString(0)).getOrElse("")}' " +
        "contains the pattern delimiter '>' — rename or pre-escape it")
    // under maxGapMs every row's gap predicate reads __ms; a tsCol value
    // that fails the timestamp cast yields null __ms, the predicate
    // evaluates null, and that extension would silently drop — shrinking
    // support counts with no signal. Fail loudly instead (the delimiter
    // guard's convention; sessionize filters such rows explicitly and
    // SAYS so — here a dropped row also breaks __pos adjacency, so
    // filtering quietly is not an option). One early-terminating probe.
    if (maxGapMs.nonEmpty) {
      val badTs = ev.where(col("__ms").isNull).select(col("__u")).head(1)
      require(badTs.isEmpty,
        "frequentSequences: a non-null tsCol value failed the timestamp " +
          "cast (null __ms) under maxGapMs — cast or clean tsCol upstream")
    }
    // the probe prune shared by both paths: the round's event frame
    // restricted to users still carrying state (shrinks every round;
    // AQE broadcasts the survivor list when it is small)
    def prune(occF: DataFrame): DataFrame =
      ev.join(occF.select(col("__u")).distinct(), Seq("__u"),
        "left_semi")
    if (!gapped) {
      def support(occ: DataFrame): DataFrame = occ
        .groupBy(col("pattern")).agg(count(lit(1)).as("support"))
        .where(col("support") >= minSupport)
      val occ1 = ev.groupBy(col("__u"), col("__it"))
        .agg(min(col("__pos")).as("__end"))
        .withColumnRenamed("__it", "pattern")
        .localCheckpoint(true) // consumers: support + prune
      var freq = support(occ1)
        .localCheckpoint(true) // consumers: readout union + prune
      var out = freq.withColumn("length", lit(1))
      var occF = occ1.join(broadcast(freq.select(col("pattern"))),
        Seq("pattern"), "left_semi")
      for (len <- 2 to maxLen) {
        val ext = occF.join(prune(occF), Seq("__u"))
          .where(col("__pos") > col("__end"))
          .select(col("__u"),
            concat(col("pattern"), lit(">"), col("__it")).as("pattern"),
            col("__pos"))
          .groupBy(col("__u"), col("pattern"))
          .agg(min(col("__pos")).as("__end"))
          .localCheckpoint(true) // consumers: support + prune
        val f = support(ext)
          .localCheckpoint(true) // consumers: readout union + prune
        out = out.unionByName(f.withColumn("length", lit(len)))
        if (len < maxLen)
          occF = ext.join(broadcast(f.select(col("pattern"))),
            Seq("pattern"), "left_semi")
      }
      out.select(col("pattern"), col("length"), col("support"))
        .orderBy(col("length"), col("support").desc, col("pattern"))
    } else {
      // all-feasible-ends state: exact under gap constraints where
      // min-end is not (see the scaladoc); support = distinct users
      def support(occ: DataFrame): DataFrame = occ
        .groupBy(col("pattern"))
        .agg(countDistinct(col("__u")).as("support"))
        .where(col("support") >= minSupport)
      val gapCond = Seq(
        maxGapEvents.map(g => col("__pos") - col("__end") <= g),
        maxGapMs.map(g => col("__ms") - col("__ets") <= g))
        .flatten.reduceLeft(_ && _)
      val occ1 = ev.select(col("__u"), col("__it").as("pattern"),
          col("__pos").as("__end"), col("__ms").as("__ets"))
        .localCheckpoint(true) // consumers: support + prune
      var freq = support(occ1)
        .localCheckpoint(true) // consumers: readout union + prune
      var out = freq.withColumn("length", lit(1))
      var occF = occ1.join(broadcast(freq.select(col("pattern"))),
        Seq("pattern"), "left_semi")
      for (len <- 2 to maxLen) {
        val ext = occF.join(prune(occF), Seq("__u"))
          .where(col("__pos") > col("__end") && gapCond)
          .select(col("__u"),
            concat(col("pattern"), lit(">"), col("__it")).as("pattern"),
            col("__pos").as("__end"), col("__ms").as("__ets"))
          .distinct() // several prior ends can reach one new end
          .localCheckpoint(true) // consumers: support + prune
        val f = support(ext)
          .localCheckpoint(true) // consumers: readout union + prune
        out = out.unionByName(f.withColumn("length", lit(len)))
        if (len < maxLen)
          occF = ext.join(broadcast(f.select(col("pattern"))),
            Seq("pattern"), "left_semi")
      }
      out.select(col("pattern"), col("length"), col("support"))
        .orderBy(col("length"), col("support").desc, col("pattern"))
    }
  }

  /** Sequence association rules — the ACTIONABLE face of
    * [[frequentSequences]]: every frequent pattern of length ≥ 2 read
    * as the rule "users who did ⟨antecedent⟩ go on to do
    * ⟨consequent⟩", with `confidence = support(pattern) /
    * support(antecedent)` — "after promo, 80% buy" instead of a bare
    * support count. Same mining contract (min-end growth, or all-ends
    * under the optional gap constraints — anti-monotonicity
    * guarantees every rule's antecedent was itself mined, so the
    * confidence join never misses). Returns (antecedent, consequent,
    * length, support, prefix_support, confidence ≥ `minConfidence`),
    * ordered (length, confidence desc, antecedent, consequent), 6 dp.
    *
    * 100 TB shape: [[frequentSequences]]' passes, then ONE pinned
    * pattern-grain frame self-joined on the antecedent (both sides
    * frequent-pattern-sized — broadcastable by construction).
    */
  def sequenceRules(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, minSupport: Long,
      maxLen: Int = 3, minConfidence: Double = 0.0,
      maxGapEvents: Option[Long] = None,
      maxGapMs: Option[Long] = None): DataFrame = {
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      "sequenceRules: minConfidence must be in [0, 1]")
    val fs = frequentSequences(events, userCol, typeCol, tsCol, idCol,
        minSupport, maxLen, maxGapEvents, maxGapMs)
      .localCheckpoint(true) // consumers: rule base + antecedent lookup
    val rules = fs.where(col("length") >= 2)
      .select(
        expr("array_join(slice(split(pattern, '>'), 1, length - 1), " +
          "'>')").as("antecedent"),
        expr("element_at(split(pattern, '>'), length)").as("consequent"),
        col("length"), col("support"))
    rules
      .join(fs.select(col("pattern").as("antecedent"),
        col("support").as("prefix_support")), Seq("antecedent"))
      .withColumn("confidence",
        round(col("support").cast("double") /
          col("prefix_support").cast("double"), 6))
      .where(col("confidence") >= minConfidence)
      .select(col("antecedent"), col("consequent"), col("length"),
        col("support"), col("prefix_support"), col("confidence"))
      .orderBy(col("length"), col("confidence").desc,
        col("antecedent"), col("consequent"))
  }

  /** Uplift T-learner (Künzel et al. 2019's two-model meta-learner):
    * fit [[olsFit]]'s Gram-solve outcome model SEPARATELY on the
    * treated and control strata, then read the per-segment uplift
    * `τ̂(seg) = μ̂₁(x̄_seg) − μ̂₀(x̄_seg)` — the tool that turns an
    * average-effect readout ([[olsAdjust]]/`ipwAte`) into a targeting
    * policy ("ship WHERE the effect is positive"). Because both models
    * are linear, the segment-mean plug-in equals the mean of per-row
    * predictions over the segment — no per-row scoring pass is needed.
    * Returns one row per segment:
    * (segment, n, mu0_hat, mu1_hat, uplift), 6 dp.
    *
    * `treatCol` must carry exactly the two arms 0 and 1 (numeric);
    * rows with a null treatment, outcome, covariate or segment are
    * listwise-deleted (they fit in no stratum). With zero covariates
    * the two models are the arm means and every segment's uplift is
    * the raw mean difference — the spec's degenerate cross-check.
    *
    * 100 TB shape: ONE grouped aggregation computes both arms'
    * DECIMAL(38,12)-quantized Gram moments (2 rows × O(k²) collected,
    * k ≤ 20); the two (k+1)×(k+1) solves run on the driver; the
    * readout is ONE segment-grain aggregation with the βs as plan
    * literals. Nothing user-sized is ever collected.
    */
  def upliftTLearner(users: DataFrame, treatCol: String, yCol: String,
      covariates: Seq[String], segmentCol: String): DataFrame = {
    require(covariates.size <= 20,
      "upliftTLearner: need 0..20 covariates")
    require(covariates.distinct.size == covariates.size,
      "upliftTLearner: covariates must be distinct")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = covariates.size
    val p = k + 1
    val base = users
      .select(col(treatCol).cast("double").as("__t") +:
        col(yCol).cast("double").as("__y") +:
        col(segmentCol).cast("string").as("__seg") +:
        covariates.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"__x$i") }: _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull &&
        col("__seg").isNotNull &&
        (0 until k).map(i => col(s"__x$i").isNotNull)
          .foldLeft(lit(true))(_ && _))
      .localCheckpoint(true) // consumers: per-arm Gram + segment means
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d12(col("__y"))).as("sy")) ++
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"sx$i")) ++
      (0 until k).map(i =>
        sum(d12(col(s"__x$i") * col("__y"))).as(s"sx${i}y")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum(d12(col(s"__x$i") * col(s"__x$j"))).as(s"sx${i}x$j"))
    val m = base.groupBy(col("__t")).agg(aggs.head, aggs.tail: _*)
      .collect() // 2 rows × O(k²) moments — bounded, k ≤ 20
    val labels = m.map(_.getDouble(0)).sorted.toSeq
    require(labels == Seq(0.0, 1.0),
      s"upliftTLearner: treatment must be exactly {0, 1}, got " +
        labels.mkString(","))
    def solve(r: org.apache.spark.sql.Row): Array[Double] = {
      def dv(f: String) = {
        val d = r.getDecimal(r.fieldIndex(f))
        if (d == null) 0.0 else d.doubleValue()
      }
      val nL = r.getLong(r.fieldIndex("n"))
      require(nL > p,
        s"upliftTLearner: arm ${r.getDouble(0)} needs n > $p rows, " +
          s"got $nL")
      val nD = nL.toDouble
      def gx(i: Int, j: Int) =
        dv(s"sx${math.min(i, j)}x${math.max(i, j)}")
      val w = 2 * p + 1
      val init = Array.tabulate(p, w) { (rr, j) =>
        def gram(a: Int, b: Int): Double =
          if (a == 0 && b == 0) nD
          else if (a == 0) dv(s"sx${b - 1}")
          else gx(a - 1, b - 1)
        if (j < p) { if (j >= rr) gram(rr, j) else gram(j, rr) }
        else if (j == p) { if (rr == 0) dv("sy") else dv(s"sx${rr - 1}y") }
        else if (j == p + 1 + rr) 1.0 else 0.0
      }
      gaussJordan(init, p)._1
    }
    val b0 = solve(m.find(_.getDouble(0) == 0.0).get)
    val b1 = solve(m.find(_.getDouble(0) == 1.0).get)
    val segAggs = count(lit(1)).as("n") +:
      (0 until k).map(i => sum(d12(col(s"__x$i"))).as(s"__sx$i"))
    val seg = base.groupBy(col("__seg").as("segment"))
      .agg(segAggs.head, segAggs.tail: _*)
    def mu(b: Array[Double]): Column =
      (0 until k).foldLeft(lit(b(0)): Column) { (acc, i) =>
        acc + lit(b(i + 1)) *
          (col(s"__sx$i").cast("double") / col("n").cast("double"))
      }
    val mu0 = mu(b0)
    val mu1 = mu(b1)
    seg.select(col("segment"), col("n"),
        round(mu0, 6).as("mu0_hat"), round(mu1, 6).as("mu1_hat"),
        round(mu1 - mu0, 6).as("uplift"))
      .orderBy(col("segment"))
  }

  /** Quantile regression `Q_τ(y|x) = β₀ + Σ βⱼ xⱼ` (Koenker & Bassett
    * 1978) by IRLS on the pinball loss — [[huberFit]]'s sibling for
    * CONDITIONAL QUANTILES: median regression (τ = 0.5) when one wild
    * row must not drag the fit, tail regression (τ = 0.9) when the
    * question is "what does the p90 latency/spend look like as a
    * function of x", the asymmetric complement to [[olsFit]]'s mean.
    * Procedure (every step engine-replayable): OLS start, then `iters`
    * full weighted-least-squares re-solves with the standard pinball
    * IRLS weight `w = (τ if r > 0 else 1−τ) / max(|r|, eps)` — each
    * step one decimal-quantized weighted Gram aggregation + a
    * driver-side (k+1)×(k+1) solve. Fixed `iters` and a fixed `eps`
    * smoothing floor keep the trajectory deterministic (the exact LP
    * solution needs a simplex pass no engine replays; the IRLS
    * iterate converges to it as eps → 0 and residuals ≫ eps). Returns
    * one row per term (term_idx, term, n, tau, coef, loss) — `loss`
    * is the mean pinball loss at the final fit (repeated per row),
    * 6 dp.
    *
    * 100 TB shape: identical to [[huberFit]] — one pinned projected
    * base, (1 + iters) × ONE ungrouped moments aggregation (map-side
    * combined), solves on the driver. k ≤ 20.
    */
  def quantileFit(df: DataFrame, yCol: String, xCols: Seq[String],
      tau: Double, iters: Int = 6, eps: Double = 1e-6): DataFrame = {
    require(tau > 0.0 && tau < 1.0, "quantileFit: tau must be in (0,1)")
    require(iters >= 1 && iters <= 12,
      "quantileFit: iters must be 1..12")
    require(eps > 0, "quantileFit: eps must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val k = xCols.size
    val p = k + 1
    val base = logitBase(df, yCol, xCols, "quantileFit")
    def lin(b: Array[Double]) =
      (0 until k).foldLeft(lit(b(0)): Column)((acc, i) =>
        acc + lit(b(i + 1)) * col(s"__x$i"))
    var beta = olsBetaFromBase(base, k)
    var n = 0L
    for (_ <- 1 to iters) {
      val rCol = col("__y") - lin(beta)
      val w = when(rCol > 0.0, lit(tau)).otherwise(lit(1.0 - tau)) /
        greatest(abs(rCol), lit(eps))
      def hTerm(r: Int, c: Int): Column =
        if (r == 0 && c == 0) w
        else if (r == 0) w * col(s"__x${c - 1}")
        else w * col(s"__x${r - 1}") * col(s"__x${c - 1}")
      def gTerm(r: Int): Column =
        if (r == 0) w * col("__y")
        else w * col(s"__x${r - 1}") * col("__y")
      val aggs = Seq(count(lit(1)).as("n")) ++
        (for { r <- 0 until p; c <- r until p }
          yield sum(d12(hTerm(r, c))).as(s"h_${r}_$c")) ++
        (0 until p).map(r => sum(d12(gTerm(r))).as(s"g_$r"))
      val m = base.agg(aggs.head, aggs.tail: _*).head()
      n = m.getLong(0)
      require(n > p, s"quantileFit: need n > $p rows, got $n")
      def dv(f: String) = m.getDecimal(m.fieldIndex(f)).doubleValue()
      val w2 = 2 * p + 1
      val init = Array.tabulate(p, w2) { (r, j) =>
        if (j < p) dv(s"h_${math.min(r, j)}_${math.max(r, j)}")
        else if (j == p) dv(s"g_$r")
        else if (j == p + 1 + r) 1.0 else 0.0
      }
      beta = gaussJordan(init, p)._1
    }
    val rFin = col("__y") - lin(beta)
    val pin = when(rFin > 0.0, lit(tau) * rFin)
      .otherwise(lit(tau - 1.0) * rFin)
    val lossRow = base.agg(sum(d12(pin)).as("__sl")).head()
    val loss = lossRow.getDecimal(0).doubleValue() / n.toDouble
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val terms = "intercept" +: xCols
    terms.indices
      .map(i => (i, terms(i), n, tau, r6(beta(i)), r6(loss)))
      .toDF("term_idx", "term", "n", "tau", "coef", "loss")
      .orderBy(col("term_idx"))
  }

  /** Restricted mean survival time (Royston & Parmar 2013's
    * recommended KM readout): per group, the area under the
    * Kaplan-Meier curve up to the horizon `tauTime` —
    * `RMST(τ) = ∫₀^τ Ŝ(t)dt`, "expected time-to-event within the
    * first τ units". The single-number comparison the km CURVES
    * family lacks: hazard ratios need proportional hazards, median
    * survival needs the curve to cross 0.5 — RMST needs neither, and
    * `RMST_B − RMST_A` reads directly as time gained. Returns one row
    * per group (group, tau, rmst, survival_at_tau), 6 dp.
    *
    * The KM estimator is a right-continuous step function, so the
    * integral is exact step algebra, not numeric quadrature: each
    * curve row at time t ≤ τ contributes S(prev)·(t − prev), the last
    * row adds S(t_last)·(τ − t_last), and a group whose first event
    * time already exceeds τ has Ŝ ≡ 1 on [0, τ] → RMST = τ. Segment
    * contributions are per-row fixed-order doubles quantized to
    * DECIMAL(38,12) before the ONE group sum (order-invariant), over
    * [[kmCurves]]' 6-dp survival grain — engine-replayable.
    *
    * 100 TB shape: [[kmCurves]]' passes (subject-sized collapse,
    * time-grain windows), then one lag window + one aggregate on the
    * time-grain curve frame. Nothing subject-sized moves after the
    * curve collapse.
    */
  def rmst(df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String, tauTime: Double): DataFrame = {
    require(tauTime > 0, "rmst: tauTime must be positive")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val curve = kmCurves(df, groupCol, timeCol, eventCol)
      .select(col(groupCol), col("t"), col("survival"))
      .localCheckpoint(true) // consumers: group spine + truncated sum
    val groups = curve.select(col(groupCol)).distinct()
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("t"))
    val seg = curve.filter(col("t") <= lit(tauTime))
      .withColumn("__pt", coalesce(lag(col("t"), 1).over(wOrd),
        lit(0.0)))
      .withColumn("__ps", coalesce(lag(col("survival"), 1).over(wOrd),
        lit(1.0)))
      .withColumn("__lastRow", lead(col("t"), 1).over(wOrd).isNull)
      .select(col(groupCol),
        d12(col("__ps") * (col("t") - col("__pt")) +
          when(col("__lastRow"),
            col("survival") * (lit(tauTime) - col("t")))
            .otherwise(lit(0.0))).as("__a"),
        when(col("__lastRow"), col("survival")).as("__sTau"))
    val agg = seg.groupBy(col(groupCol)).agg(
      sum(col("__a")).cast("double").as("__r"),
      max(col("__sTau")).as("__s"))
    groups.join(agg, Seq(groupCol), "left")
      .select(col(groupCol), lit(tauTime).as("tau"),
        round(coalesce(col("__r"), lit(tauTime)), 6).as("rmst"),
        round(coalesce(col("__s"), lit(1.0)), 6).as("survival_at_tau"))
      .orderBy(col(groupCol))
  }

  /** Restricted mean time LOST per competing cause (Andersen 2013's
    * "years lost" decomposition) — [[rmst]]'s counterpart under
    * competing risks: per (group, cause),
    * `RMTL_c(τ) = ∫₀^τ CIF_c(t) dt`, the expected time lost to cause
    * c within the first τ units. Because S(t) + Σ_c CIF_c(t) = 1 at
    * every t, `RMST(τ) + Σ_c RMTL_c(τ) = τ` exactly — the identity
    * the spec pins against [[rmst]] on the all-cause collapse of the
    * same frame. Input contract is [[ajIncidence]]'s (null cause =
    * censored); the integral is exact step algebra over its
    * right-continuous 6-dp curve (each curve row contributes
    * CIF(t)·(min(next_t, τ) − t), quantized to DECIMAL(38,12) before
    * the one group sum; the area before a cause's first event is 0
    * by construction, and a cause with no event by τ is absent —
    * read RMTL 0). Returns (group, cause, tau, rmtl, cif_at_tau),
    * 6 dp, ordered (group, cause).
    *
    * 100 TB shape: [[ajIncidence]]' passes, then one lead window +
    * one aggregate on the (group, cause, time)-grain curve frame.
    */
  def rmtl(df: DataFrame, groupCol: String, timeCol: String,
      causeCol: String, tauTime: Double): DataFrame = {
    require(tauTime > 0, "rmtl: tauTime must be positive")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val curve = ajIncidence(df, groupCol, timeCol, causeCol)
      .select(col(groupCol), col("cause"), col("t"), col("cif"))
      .localCheckpoint(true) // consumers: the truncated area fold
    val wOrd = Window.partitionBy(col(groupCol), col("cause"))
      .orderBy(col("t"))
    curve.filter(col("t") <= lit(tauTime))
      .withColumn("__nt",
        coalesce(lead(col("t"), 1).over(wOrd), lit(tauTime)))
      .withColumn("__lastRow", lead(col("t"), 1).over(wOrd).isNull)
      .groupBy(col(groupCol), col("cause"))
      .agg(
        sum(d12(col("cif") * (col("__nt") - col("t"))))
          .cast("double").as("__area"),
        max(when(col("__lastRow"), col("cif"))).as("__cTau"))
      .select(col(groupCol), col("cause"),
        lit(tauTime).as("tau"), round(col("__area"), 6).as("rmtl"),
        round(col("__cTau"), 6).as("cif_at_tau"))
      .orderBy(col(groupCol), col("cause"))
  }
}
