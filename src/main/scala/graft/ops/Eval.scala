package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Offline retrieval-evaluation metrics — the measurement side of the
  * retrieval/ANN operators (q50/q53/q91/q103/q111 produce rankings;
  * this scores them). Standard IR metrics per query, macro-ready:
  * recall@k, MRR@k, nDCG@k (binary relevance), from a scored
  * (query, candidate, score, rel) pair frame.
  *
  * Everything is windows + one grouped aggregate over the pair frame —
  * rows never leave the executors and the only shuffle is the per-query
  * hash partition, so scoring 10^6 queries x k candidates is one pass.
  * The ideal-DCG denominator is a k-row broadcast lookup (closed form
  * over the position index), not a per-row HOF, keeping the whole plan
  * inside whole-stage codegen.
  */
object Eval {

  /** Per-query metrics from scored pairs.
    *
    * @param pairs one row per (query, candidate) with a numeric score
    *              (higher = better) and a 0/1 relevance column
    * @param k     cutoff for recall@k / MRR@k / nDCG@k
    * @return one row per query: (qid, n_rel, recall_at_k, mrr_at_k,
    *         ndcg_at_k); queries with zero relevant candidates score 0
    *         on all three (not null), so macro averages are stable
    */
  def rankingMetrics(pairs: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "rankingMetrics: k must be >= 1")
    val spark = pairs.sparkSession
    import spark.implicits._

    val qid = col(qidCol)
    val w = Window.partitionBy(qid).orderBy(col(scoreCol).desc, col(idCol))
    val rel = col(relCol).cast("double")

    val perQuery = pairs
      .withColumn("rnk", row_number().over(w))
      .groupBy(qid)
      .agg(
        sum(rel).cast("long").as("n_rel"),
        sum(when(col("rnk") <= k, rel).otherwise(0.0)).as("rel_at_k"),
        min(when(col("rnk") <= k && rel > 0, col("rnk"))).as("first_rel"),
        sum(when(col("rnk") <= k, rel / log2(col("rnk") + 1))
          .otherwise(0.0)).as("dcg"))

    // ideal DCG for m = min(k, n_rel) relevant items in the top positions;
    // k rows, broadcast — the closed form no SQL engine disagrees on
    val idcg = (1 to k).map { m =>
      (m.toLong, (1 to m).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum)
    }.toDF("m", "idcg")

    perQuery
      .withColumn("m", least(lit(k.toLong), col("n_rel")))
      .join(broadcast(idcg), Seq("m"), "left")
      .select(
        qid,
        col("n_rel"),
        when(col("n_rel") > 0, col("rel_at_k") / col("n_rel"))
          .otherwise(0.0).as("recall_at_k"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("mrr_at_k"),
        when(col("n_rel") > 0, col("dcg") / col("idcg"))
          .otherwise(0.0).as("ndcg_at_k"))
  }

  /** Macro average of [[rankingMetrics]] output: one row
    * (n_queries, recall_at_k, mrr_at_k, ndcg_at_k).
    */
  def macroAverage(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall_at_k")).as("recall_at_k"),
      avg(col("mrr_at_k")).as("mrr_at_k"),
      avg(col("ndcg_at_k")).as("ndcg_at_k"))

  /** ROC AUC of a binary scorer over a scored corpus — the acceptance
    * metric for the learned quality/langid classifiers (is the filter's
    * score actually separating the classes it gates on?). Computed by
    * the rank-sum (Mann-Whitney) identity with AVERAGE ranks for tied
    * scores:
    *
    *   AUC = (Σ_{positives} avgrank − P(P+1)/2) / (P·N)
    *
    * Returns one row (n_pos, n_neg, auc). Ties get the textbook
    * mid-rank, so the result equals the probability a random positive
    * outranks a random negative with ties counted half — exactly
    * sklearn's roc_auc_score.
    *
    * 100 TB shape: one groupBy collapses the corpus to DISTINCT SCORE
    * rows (the classifier's quantization grain, not the corpus); the
    * rank prefix over score groups is the distributed range-partition
    * prefix sum (the q132/packSequential device — per-partition
    * subtotals collected, offsets rebroadcast; never a global
    * single-partition window). Every sum is integer or half-integer
    * (dyadic — FP-exact in any engine); the single division happens
    * once at the end.
    */
  def binaryAuc(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // distinct-score groups: n rows, np positives at this score.
    // Null scores/labels are unrankable — dropped up front (matching
    // confusionReport), never silently counted as negatives
    val groups = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("np"))
      .repartitionByRange(col("__s"))
      .sortWithinPartitions(col("__s"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin the range boundaries (offsets job
                             // and scoring job must agree)
    val offsets = groups.groupBy(col("__pid"))
      .agg(sum(col("n")).as("__c")).collect()
      .sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    groups
      .join(offsetsDf, Seq("__pid"))
      .withColumn("__cum",
        coalesce(sum(col("n")).over(w), lit(0L)) + col("__off"))
      // avg rank of a tied group = ranks (cum+1 .. cum+n) averaged
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np") * (col("__cum") + (col("n") + 1) / lit(2.0)))
          .as("__ranksum"))
      .select(col("n_pos"), col("n_neg"),
        // single-class input has no ranking to measure: auc = null
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__ranksum") -
            col("n_pos") * (col("n_pos") + 1) / lit(2.0)) /
            (col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Precision–recall curve + average precision — [[binaryAuc]]'s
    * companion for the imbalanced regimes quality gates live in (ROC
    * flatters a classifier when negatives dominate; PR does not). One
    * row per DISTINCT SCORE treated as a descending threshold:
    * (threshold, tp, fp, prec, recall), ties collapsed at their
    * threshold (the sklearn convention), plus AP = Σ ΔR·P over the
    * descending sweep carried on every row (the calibration-report
    * device).
    *
    * 100 TB shape: the same distinct-score collapse + range-partition
    * prefix sum as [[binaryAuc]], range-ordered DESCENDING so the
    * cumulative tp/fp read straight off the prefix; AP folds integer
    * positives against 6-dp-DECIMAL precisions (order-independent) and
    * divides once.
    */
  def prCurve(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val groups = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("np"))
      .repartitionByRange(col("__s").desc)
      .sortWithinPartitions(col("__s").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin the range boundaries
    val offsets = groups.groupBy(col("__pid"))
      .agg(sum(col("n")).as("__cn"), sum(col("np")).as("__cp")).collect()
      .sortBy(_.getInt(0))
    var runN = 0L; var runP = 0L
    val offsetRows = offsets.map { r =>
      val here = (r.getInt(0), runN, runP)
      runN += r.getLong(1); runP += r.getLong(2); here
    }
    val totalP = runP
    require(totalP > 0, "prCurve: no positive labels")
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__offn", "__offp"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, 0) // inclusive
    val curve = groups
      .join(offsetsDf, Seq("__pid"))
      .withColumn("tp", sum(col("np")).over(w) + col("__offp"))
      .withColumn("__cum", sum(col("n")).over(w) + col("__offn"))
      .withColumn("fp", col("__cum") - col("tp"))
      .withColumn("prec",
        round(col("tp").cast("double") / col("__cum"), 6))
      .withColumn("recall",
        round(col("tp").cast("double") / totalP, 6))
      .localCheckpoint(true) // distinct-score-sized; rows + AP fold
    // AP = Σ (np_i / P) · P_i over descending thresholds: integer
    // positives × 6-dp DECIMAL precision, one division at the end
    val ap = curve.agg(
      round(sum(col("np") * col("prec").cast("decimal(8,6)"))
        .cast("double") / totalP, 6).as("ap"))
    curve
      .select(col("__s").as("threshold"), col("tp"), col("fp"),
        col("prec"), col("recall"))
      .crossJoin(broadcast(ap))
  }

  /** Classification report at a decision threshold: the confusion
    * counts and every statistic the threshold-picker reads off them —
    * precision, recall, F1, accuracy, and Matthews correlation (the
    * one that stays honest under imbalance). `score >= threshold`
    * predicts positive. Returns one row
    * (n, tp, fp, tn, fn, precision, recall, f1, accuracy, mcc),
    * ratios rounded to 6 dp, null where the denominator is 0 (no
    * predicted positives → precision null, not a fake 0). ONE
    * aggregate pass; MCC's product folds in double from exact long
    * counts (counts to 2^26 stay exact through the product).
    */
  def confusionReport(scored: DataFrame, scoreCol: String,
      labelCol: String, threshold: Double): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val pos = col(labelCol) === 1
    val counts = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        count(when(pred && pos, 1)).as("tp"),
        count(when(pred && !pos, 1)).as("fp"),
        count(when(!pred && !pos, 1)).as("tn"),
        count(when(!pred && pos, 1)).as("fn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    val precision = when(col("tp") + col("fp") > 0, tp / (tp + fp))
    val recall = when(col("tp") + col("fn") > 0, tp / (tp + fn))
    val denom = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    counts.select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
      round(precision, 6).as("precision"),
      round(recall, 6).as("recall"),
      round(when(precision + recall > 0,
        lit(2.0) * precision * recall / (precision + recall)), 6)
        .as("f1"),
      round((tp + tn) / col("n"), 6).as("accuracy"),
      round(when(denom > 0, (tp * tn - fp * fn) / denom), 6).as("mcc"))
  }

  /** Cohen's kappa (Cohen 1960): agreement between two categorical
    * raters CORRECTED for chance — `(p_o − p_e)/(1 − p_e)` where p_o
    * is observed agreement and p_e the agreement two independent
    * raters with these marginals would reach anyway. The
    * labeling-pipeline QA number: raw agreement flatters raters who
    * both say "en" 90% of the time; kappa doesn't. Works for any
    * number of categories. Returns one row (n, po, pe, kappa), 6 dp;
    * perfectly-degenerate marginals (p_e = 1) yield null kappa.
    *
    * Shape: one contingency aggregate; marginal products fold as
    * DECIMAL(38,0) (counts to 1e12 would overflow a long product).
    */
  def cohenKappa(df: DataFrame, raterA: String,
      raterB: String): DataFrame = {
    val cells = df
      .filter(col(raterA).isNotNull && col(raterB).isNotNull)
      .groupBy(col(raterA).cast("string").as("__a"),
        col(raterB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true) // consumers: N, diag, both marginals
    val ma = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__o")).as("__ra"))
    val mb = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__o")).as("__rb"))
    val nRow = cells.agg(sum(col("__o"))).head()
    require(!nRow.isNullAt(0),
      "cohenKappa: no rows where both raters are non-null")
    val n = nRow.getLong(0)
    val agree = cells.filter(col("__a") === col("__b"))
      .agg(coalesce(sum(col("__o")), lit(0L)).as("__ag"))
    val peNum = ma.join(mb, Seq("__k"))
      .agg(coalesce(sum((col("__ra") * col("__rb"))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__pn"))
    agree.crossJoin(broadcast(peNum))
      .select(lit(n).as("n"),
        (col("__ag") / lit(n.toDouble)).as("__po"),
        (col("__pn").cast("double") /
          (lit(n.toDouble) * lit(n.toDouble))).as("__pe"))
      .select(col("n"), round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        round(when(col("__pe") < 1.0,
          (col("__po") - col("__pe")) / (lit(1.0) - col("__pe"))), 6)
          .as("kappa"))
  }

  /** Calibration report of a probabilistic scorer: equal-width bins
    * over [0,1], per bin (n, mean_score, frac_pos), plus the expected
    * calibration error ECE = Σ n_b/N · |frac_pos − mean_score| carried
    * on every row (constant column — the report is bins+summary in one
    * frame). A well-calibrated quality classifier has frac_pos ≈
    * mean_score per bin; a miscalibrated one gates on thresholds that
    * don't mean what they say. Scores exactly 1.0 land in the top bin.
    *
    * One aggregation shuffle over (corpus → bins rows); the ECE fold is
    * a broadcast of the bins-sized frame back onto itself. Determinism:
    * scores quantize to 12 dp and sum as DECIMAL (order-independent —
    * no float-accumulation drift between engines or partitionings, the
    * tuneJmLambda device), labels sum as integers; the 6-dp outputs are
    * therefore bit-reproducible anywhere.
    */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val s = col(scoreCol).cast("double")
    val perBin = scored
      .select(least(floor(s * bins).cast("int"), lit(bins - 1)).as("bin"),
        s.cast("decimal(26,12)").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s")).cast("double") / count(lit(1)), 6)
          .as("mean_score"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
    // rounded 6-dp doubles recover their decimal digits exactly under
    // the cast, so the weighted fold is integer/decimal arithmetic
    val ece = perBin.agg(
      round(sum(col("n") * abs(col("frac_pos").cast("decimal(12,6)") -
          col("mean_score").cast("decimal(12,6)"))).cast("double") /
        sum(col("n")), 6).as("ece"))
    perBin.crossJoin(broadcast(ece))
  }

  /** Murphy (1973) decomposition of the Brier score over forecast
    * bins — [[calibration]]'s summary face: `REL = Σ n_k(s̄_k−ȳ_k)²/N`
    * (how far the forecasts sit from their buckets' outcome rates —
    * smaller is better), `RES = Σ n_k(ȳ_k−ȳ)²/N` (how much the
    * buckets separate outcomes — larger is better), `UNC = ȳ(1−ȳ)`
    * (the base rate's irreducible noise). For bucket-constant
    * forecasts `brier = REL − RES + UNC` exactly; with raw scores the
    * identity picks up a within-bucket remainder (forecast variance
    * minus twice the within-bucket score-outcome covariance — either
    * sign), reported as `within_resid` rather than silently absorbed.
    * Returns one row (n, n_bins, brier, reliability, resolution,
    * uncertainty, within_resid), 6 dp.
    *
    * 100 TB shape: ONE corpus aggregation to the bins frame (score,
    * label, squared-error sums DECIMAL-quantized), then bins-sized
    * algebra with every per-bin term re-quantized before the final
    * fold (order-free — engine- and partitioning-invariant).
    */
  def brierDecomposition(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1 && bins <= 1000, s"bins in [1,1000], got $bins")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("long")
    val base = scored
      .select(least(floor(s * bins).cast("int"), lit(bins - 1)).as("bin"),
        s.cast("decimal(26,12)").as("__s"), y.as("__y"),
        ((s - y.cast("double")) * (s - y.cast("double")))
          .cast("decimal(38,12)").as("__se"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val perBin = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("ss"),
        sum(col("__y")).as("sy"), sum(col("__se")).as("sse"))
      .localCheckpoint(true) // consumers: totals broadcast + the terms
    val tot = perBin.agg(sum(col("n")).as("__nn"),
      sum(col("sy")).as("__tsy"), sum(col("sse")).as("__tsse"))
    val nD = col("n").cast("double")
    val sbar = col("ss").cast("double") / col("n")
    val ybin = col("sy").cast("double") / col("n")
    val ybar = col("__tsy").cast("double") / col("__nn")
    val folded = perBin.crossJoin(broadcast(tot))
      .select(col("__nn"), col("__tsy"), col("__tsse"),
        (nD * ((sbar - ybin) * (sbar - ybin)))
          .cast("decimal(38,12)").as("__rel"),
        (nD * ((ybin - ybar) * (ybin - ybar)))
          .cast("decimal(38,12)").as("__res"))
      .groupBy(col("__nn"), col("__tsy"), col("__tsse"))
      .agg(sum(col("__rel")).as("__srel"), sum(col("__res")).as("__sres"))
    val brier = col("__tsse").cast("double") / col("__nn")
    val rel = col("__srel").cast("double") / col("__nn")
    val res = col("__sres").cast("double") / col("__nn")
    val unc = ybar * (lit(1.0) - ybar)
    folded.select(col("__nn").as("n"), lit(bins).as("n_bins"),
      round(brier, 6).as("brier"),
      round(rel, 6).as("reliability"),
      round(res, 6).as("resolution"),
      round(unc, 6).as("uncertainty"),
      round(brier - rel + res - unc, 6).as("within_resid"))
  }

  /** Isotonic calibration over score bins — the FIX for what
    * [[calibration]] diagnoses and [[brierDecomposition]] prices: the
    * monotone mapping score-bin → calibrated probability that
    * minimizes squared error (Zadrozny & Elkan 2002's binned isotonic
    * recipe). Computed via the MINIMAX closed form
    * `cal_i = max_{j≤i} min_{k≥i} mean(y over bins j..k)` — the same
    * function pool-adjacent-violators produces (the spec asserts
    * equality against a naive PAV), chosen because it is an exact
    * algebra over integer prefix sums, REPLAYABLE cross-engine, where
    * PAV's data-dependent merge sequence is not. Only bins that
    * received rows appear (apply downstream with a range lookup).
    * Returns (bin, n, mean_score, frac_pos, calibrated), 6 dp,
    * calibrated monotone non-decreasing by construction.
    *
    * 100 TB shape: ONE corpus aggregation to the ≤`bins` frame; the
    * O(bins³) minimax runs on the bounded collect (bins ≤ 1000).
    */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1 && bins <= 1000, s"bins in [1,1000], got $bins")
    val spark = scored.sparkSession
    import spark.implicits._
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("long")
    val perBin = scored
      .select(least(floor(s * bins).cast("int"), lit(bins - 1)).as("bin"),
        s.cast("decimal(26,12)").as("__s"), y.as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("ss"),
        sum(col("__y")).as("sy"))
      .collect().sortBy(_.getInt(0)) // ≤ bins rows — bounded
    require(perBin.nonEmpty, "isotonicCalibration: no rows")
    val binIds = perBin.map(_.getInt(0))
    val ns = perBin.map(_.getLong(1))
    val sys = perBin.map(_.getLong(3))
    val m = perBin.length
    // exact integer prefix sums; interval means are Δ-long ratios, so
    // both engines divide the identical integers
    val cn = ns.scanLeft(0L)(_ + _).tail
    val cy = sys.scanLeft(0L)(_ + _).tail
    def mean(j: Int, k: Int): Double =
      (cy(k) - (if (j == 0) 0L else cy(j - 1))).toDouble /
        (cn(k) - (if (j == 0) 0L else cn(j - 1))).toDouble
    val cal = Array.tabulate(m) { i =>
      (0 to i).map(j => (i until m).map(k => mean(j, k)).min).max
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val out = (0 until m).map { i =>
      (binIds(i), ns(i),
        r6(perBin(i).getDecimal(2).doubleValue() / ns(i)),
        r6(sys(i).toDouble / ns(i)), r6(cal(i)))
    }
    out.toDF("bin", "n", "mean_score", "frac_pos", "calibrated")
      .orderBy(col("bin"))
  }

  /** Label-relevance evaluation harness: rank a bounded candidate set
    * for each query vector by exact cosine and score the ranking with
    * "same label" as the relevance oracle — the standard
    * embedding-quality probe (do nearest neighbors share the class?).
    * Score is rounded to 6 dp BEFORE ranking so independent engines
    * produce the identical rank order under the deterministic
    * (score desc, id) tie-break.
    */
  def labelRankingEval(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Column, candidateIds: Column,
      k: Int): DataFrame = {
    val queries = emb.filter(queryIds)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col(labelCol).as("qlabel"))
    val cands = emb.filter(candidateIds)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        col(labelCol).as("clabel"))
    val pairs = cands.crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(graft.functions.vec_cosine(col("cvec"), col("qvec")), 6)
          .as("score"),
        (col("clabel") === col("qlabel")).cast("int").as("rel"))
    rankingMetrics(pairs, "qid", "cid", "score", "rel", k)
  }

  /** Split conformal prediction calibration (Vovk et al.; Lei et al.
    * 2018): from a calibration set of (prediction, actual) pairs, the
    * half-width q̂ = the ⌈(n+1)(1−α)⌉-th smallest absolute residual —
    * the DISTRIBUTION-FREE interval radius with the finite-sample
    * guarantee P(|y − ŷ| ≤ q̂) ≥ 1−α on exchangeable data, no model
    * assumptions at all (the honest way to put error bars on any
    * regressor). Returns one row (n, alpha, q_hat, coverage) — 6 dp;
    * coverage is the in-sample share within ±q̂ (≥ 1−α by
    * construction — an in-plan proof the rank selection is right);
    * both null when n < ⌈(n+1)(1−α)⌉ (not enough calibration data
    * to certify the level).
    *
    * 100 TB shape: residuals collapse to their distinct-value grain;
    * the order statistic rides the range-partition prefix-sum device
    * (no global sort); coverage is one more counting pass with q̂ as
    * a plan literal.
    */
  def splitConformal(scored: DataFrame, predCol: String,
      actualCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "splitConformal: alpha in (0,1)")
    val spark = scored.sparkSession
    import spark.implicits._
    val res = scored
      .filter(col(predCol).isNotNull && col(actualCol).isNotNull)
      .select(abs(col(actualCol).cast("double") -
        col(predCol).cast("double")).as("__r"))
      .localCheckpoint(true) // consumers: count + grain + coverage
    val n = res.count()
    require(n > 0, "splitConformal: no rows")
    val k = math.ceil((n + 1).toDouble * (1.0 - alpha)).toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    if (k > n)
      return Seq((n, alpha, None: Option[Double], None: Option[Double]))
        .toDF("n", "alpha", "q_hat", "coverage")
    val grain = res.groupBy(col("__r")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col("__r"))
      .sortWithinPartitions(col("__r"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(col("__c")).as("__s"))
      .collect().sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = grain.join(offsetsDf, Seq("__pid"))
      .withColumn("__cum", sum(col("__c")).over(w) + col("__off"))
      .filter(col("__cum") >= k)
      .agg(min(col("__r"))).head().getDouble(0)
    val cov = res.agg(count(when(col("__r") <= qhat, 1)))
      .head().getLong(0)
    Seq((n, alpha, Some(r6(qhat)), Some(r6(cov.toDouble / n.toDouble))))
      .toDF("n", "alpha", "q_hat", "coverage")
  }

  /** Cumulative gains / lift chart: rank rows by model score
    * descending into `buckets` equal-population buckets (deciles by
    * default) and report, per bucket, the positive-response rate, its
    * LIFT over the base rate, the cumulative share of all positives
    * captured down to that bucket, and the cumulative lift — the
    * campaign-targeting readout ("mailing the top 2 deciles captures
    * 45% of responders at 2.3× random") that [[binaryAuc]] compresses
    * into one number. Ties in score break on `idCol` ascending
    * (deterministic bucket composition — a score-only order would be
    * engine-dependent). Returns one row per bucket (bucket, n, n_pos,
    * response_rate, lift, cum_capture, cum_lift), 6 dp; lift columns
    * null when the corpus has no positives.
    *
    * 100 TB shape: [[graft.ops.Profile.giniLorenz]]'s rank device —
    * ONE range repartition by (score desc, id) sorts the data once,
    * global ranks ride a 32-row offset collect + in-partition
    * row_number; the bucket frame (and its ordered windows) is
    * buckets-sized.
    */
  def liftChart(scored: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1 && buckets <= 1000,
      s"liftChart: buckets in [1,1000], got $buckets")
    val spark = scored.sparkSession
    import spark.implicits._
    val parts = scored
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("long").as("__y"), col(idCol).as("__id"))
      .filter(col("__s").isNotNull && col("__y").isNotNull &&
        col("__id").isNotNull)
      .repartitionByRange(col("__s").desc, col("__id"))
      .sortWithinPartitions(col("__s").desc, col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().sortBy(_.getInt(0))
    val n = counts.map(_.getLong(1)).sum
    require(n > 0, "liftChart: no rows")
    var running = 0L
    val offsets = counts.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__s").desc, col("__id"))
    val perBucket = parts.join(offsetsDf, Seq("__pid"))
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1 + col("__off"))
      .groupBy((col("__rank") * buckets / n).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    // buckets-sized frame: unpartitioned ordered windows intentional
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("__tpos", sum(col("n_pos")).over(wAll))
      .withColumn("__base",
        col("__tpos").cast("double") / lit(n.toDouble))
      .withColumn("__rr",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("__cpos", sum(col("n_pos")).over(wCum))
      .withColumn("__cn", sum(col("n")).over(wCum))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("__rr"), 6).as("response_rate"),
        when(col("__tpos") > 0, round(col("__rr") / col("__base"), 6))
          .as("lift"),
        when(col("__tpos") > 0,
          round(col("__cpos").cast("double") /
            col("__tpos").cast("double"), 6)).as("cum_capture"),
        when(col("__tpos") > 0,
          round((col("__cpos").cast("double") /
            col("__cn").cast("double")) / col("__base"), 6))
          .as("cum_lift"))
      .orderBy(col("bucket"))
  }
}
