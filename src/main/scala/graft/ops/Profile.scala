package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling ("data card" statistics): per-group document counts,
  * token volume, and length distribution — the summary table every
  * dataset release publishes (datasheets / data cards) and the first
  * thing a mixture designer asks for.
  *
  * Scale note: `exact = false` (the 100 TB default) uses
  * `approx_percentile` (mergeable GK sketch — constant memory per
  * group); `exact = true` materializes per-group value buffers and is
  * for oracle parity / modest group cardinalities. Both are one
  * aggregate pass with map-side combine; groups are independent, so skew
  * in group sizes is the only hazard (interleave a salted pre-aggregate
  * for a pathological group if needed — counts/sums compose; percentile
  * sketches merge).
  */
object Profile {

  /** Generic per-column PROFILE — the schema-level audit next to the
    * corpus-level [[dataCard]]: one row per requested column with
    * (column, n_rows, n_nulls, n_distinct, min_str, max_str). The
    * classic archive-intake report ("is this column populated, how
    * wide is its domain, what are its bounds") a snapshot catalog
    * stores beside the row count.
    *
    * n_distinct is EXACT (`count(distinct)`) — cross-engine
    * replayable; at 100 TB swap the q65 HLL face in if an estimate
    * suffices. min/max compare in the column's own type and render as
    * strings (profiles of differently-typed columns stack into one
    * frame). One aggregation pass: Spark expands the multi-distinct
    * aggregate into grouping sets internally, still a single shuffle.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dis_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val n = count(lit(1)).as("__n")
    val one = df.agg(n, aggs: _*)
    val stacked = explode(array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
      col(s"__dis_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"),
      col(s"__max_$c").as("max_str"))): _*))
    one.select(stacked.as("p")).select(col("p.*"))
  }

  /** Per-`groupCol` data card over `lenCol` (a numeric length/size
    * column) and `textCol` (tokenized for volume): n_docs, n_tokens,
    * mean/p50/p90 of the length. Percentiles interpolate (the
    * quantile_cont / percentile_cont convention).
    */
  def dataCard(docs: DataFrame, groupCol: String, textCol: String,
      lenCol: String, exact: Boolean = false): DataFrame = {
    val pct: (Double => org.apache.spark.sql.Column) =
      if (exact) p => expr(s"percentile($lenCol, $p)")
      else p => expr(s"approx_percentile($lenCol, $p, 10000)").cast("double")
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        // exact integer sum / count, divided once in double — identical
        // arithmetic on any engine (oracle-parity rule)
        round(sum(col(lenCol)).cast("double") / count(lit(1)), 6)
          .as("mean_len"),
        round(pct(0.5), 6).as("p50_len"),
        round(pct(0.9), 6).as("p90_len"))
  }

  /** Per-group KL divergence of the group's unigram token distribution
    * from the whole-corpus distribution, in nats:
    *
    *   KL(s) = sum_w p_s(w) * ln(p_s(w) / p(w))
    *
    * — the mixture-drift number next to every data card: which sources
    * look like the corpus (KL ~ 0) and which are outliers. No smoothing
    * is needed: the sum ranges over the group's own support, where
    * p_s(w) > 0, and the corpus contains the group, so p(w) > 0 there
    * too.
    *
    * Scale shape: one shuffle into (group, token) counts; the corpus
    * model is a token-keyed re-agg of those counts (never a second text
    * scan) joined back on the token; group totals ride a broadcast. The
    * token join is broadcast here (vocabulary-sized); at web scale flip
    * it to a plain shuffle join — both sides are already token-keyed.
    */
  def sourceKl(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gw = docs.select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val corpus = gw.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val totals = gw.groupBy(col("grp")).agg(sum(col("c")).as("tot_g"))
    val grand = corpus.agg(sum(col("cw")).as("tot"))
    gw.join(broadcast(corpus), Seq("w"))
      .join(broadcast(totals), Seq("grp"))
      .crossJoin(broadcast(grand))
      .withColumn("__ps", col("c").cast("double") / col("tot_g"))
      .withColumn("__p", col("cw").cast("double") / col("tot"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum(col("__ps") * log(col("__ps") / col("__p"))), 6).as("kl"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Distribution drift between a REFERENCE and a LIVE table over a
    * shared categorical column: PSI (population stability index — the
    * industry-standard model-monitoring drift score, with its
    * conventional <0.1 stable / 0.1–0.25 moderate / >0.25 major
    * reading) and Jensen-Shannon divergence (the symmetric, bounded
    * [0, ln 2] cousin that needs no zero-clamp) — the categorical
    * companion to [[ksTest]]'s continuous drift readout. Rows with a
    * null key drop on both sides.
    *
    * Per category with ref share p and live share q:
    *   psi_term = (p̂ − q̂)·ln(p̂/q̂), p̂ = max(p, 1e-6) (the standard
    *     zero-clamp — PSI diverges on empty cells; clamp documented),
    *   jsd_term = ½·[p·ln(p/m) + q·ln(q/m)], m = (p+q)/2 (0·ln 0 = 0).
    *
    * Returns one row per category (key, n_ref, n_live, p_ref, p_live,
    * psi_term, jsd_term, psi, jsd) ordered by key — the psi/jsd
    * scalars (DECIMAL(38,12)-quantized term sums, order-free) repeat
    * per row, [[giniLorenz]]-style. 6 dp.
    *
    * 100 TB shape: each side is ONE map-side-combined category
    * aggregation; the full-outer join and everything after runs on the
    * category grain (bounded by the domain, not the data); totals are
    * a 1-row collect. No data-sized anything past the two scans.
    */
  def distributionDrift(ref: DataFrame, live: DataFrame,
      keyCol: String): DataFrame = {
    def grain(df: DataFrame, n: String) = df
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as(n))
    val j = grain(ref, "n_ref")
      .join(grain(live, "n_live"), Seq("__k"), "full_outer")
      .select(col("__k"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_live"), lit(0L)).as("n_live"))
      .localCheckpoint(true) // grain-sized; consumed by totals + output
    val t = j.agg(sum(col("n_ref")), sum(col("n_live"))).head()
    val (tr, tl) = (t.getLong(0), t.getLong(1))
    require(tr > 0 && tl > 0,
      "distributionDrift: both sides must be non-empty")
    val p = col("n_ref").cast("double") / lit(tr.toDouble)
    val q = col("n_live").cast("double") / lit(tl.toDouble)
    val pc = greatest(col("__p"), lit(1e-6))
    val qc = greatest(col("__q"), lit(1e-6))
    val m = (col("__p") + col("__q")) / lit(2.0)
    val terms = j
      .withColumn("__p", p).withColumn("__q", q)
      .withColumn("__psi_t", (pc - qc) * log(pc / qc))
      .withColumn("__jsd_t",
        (when(col("__p") > 0, col("__p") * log(col("__p") / m))
          .otherwise(lit(0.0)) +
          when(col("__q") > 0, col("__q") * log(col("__q") / m))
            .otherwise(lit(0.0))) / lit(2.0))
      .localCheckpoint(true) // pin before the 1-row broadcast crossJoin
    val d12 = (c: Column) => c.cast("decimal(38,12)")
    val scal = terms.agg(sum(d12(col("__psi_t"))).as("__psi"),
      sum(d12(col("__jsd_t"))).as("__jsd"))
    terms.crossJoin(broadcast(scal))
      .select(col("__k").as(keyCol), col("n_ref"), col("n_live"),
        round(col("__p"), 6).as("p_ref"), round(col("__q"), 6).as("p_live"),
        round(col("__psi_t"), 6).as("psi_term"),
        round(col("__jsd_t"), 6).as("jsd_term"),
        round(col("__psi").cast("double"), 6).as("psi"),
        round(col("__jsd").cast("double"), 6).as("jsd"))
      .orderBy(col(keyCol))
  }

  /** Key-skew profile — the shuffle-planning diagnostic: the top-N keys
    * of a prospective join/aggregation key with their row counts, share
    * of the table, and cumulative share (the concentration-curve head).
    * This is the measurement behind the salting decision
    * ([[graft.ops.Scale.saltedJoin]]/`saltedAgg`): a top key holding
    * >1/parallelism of the rows IS the straggler; read its share off
    * this profile and size `salts` accordingly.
    *
    * Shape: one key aggregation (map-side combined) + a broadcast scalar
    * total; ordering and the cumulative window touch only the top-N rows
    * (N is a parameter, not data-sized). Ties break on the key's string
    * form so the profile is deterministic across engines and retries.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val top = counts
      .orderBy(col("n").desc, col(keyCol).cast("string").asc)
      .limit(topN)
    val w = Window.orderBy(col("n").desc, col(keyCol).cast("string").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("share", round(col("n") / col("__total").cast("double"), 6))
      .withColumn("cum_share",
        round(sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          col("__total").cast("double"), 6))
      .select(col("rank"), col(keyCol), col("n"), col("share"), col("cum_share"))
      .orderBy(col("rank"))
  }

  /** Gini coefficient + Lorenz curve of a nonnegative value column —
    * the concentration readout behind "1% of customers are 40% of
    * revenue" (and, in the corpus world, "a handful of domains are
    * most of the tokens"). Returns one row per Lorenz bucket:
    * (bucket, n, value_sum, cum_value_share, gini) — bucket b holds
    * ranks in [b·n/buckets, (b+1)·n/buckets), cum_value_share is the
    * share of total value held by buckets ≤ b (the Lorenz curve's
    * y-axis), and gini repeats the scalar
    * `(2·Σ rank·x) / (n·Σx) - (n+1)/n` (1-indexed ranks, ascending x).
    *
    * Caller contract: values must be nonnegative (the Lorenz ordering
    * is meaningless otherwise); nulls are dropped.
    *
    * 100 TB shape: the global rank comes from the Quantiles rank
    * device — ONE range repartition by value sorts the data once;
    * per-partition offsets are a 32-row driver collect; ranks are a
    * row_number window WITHIN each range partition (no global
    * single-reducer sort). Both Σ rank·x terms and bucket sums
    * quantize to DECIMAL(38,12), so every aggregate is
    * partition-invariant, and rank permutations within tied values
    * cannot change Σ rank·x (equal x). The bucket frame is
    * buckets-sized; its ordered window is deliberate.
    */
  def giniLorenz(df: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val session = df.sparkSession
    import session.implicits._
    // the Quantiles.exact rank device: range-partition + in-partition
    // sort once, drive global ranks off a 32-row offset table
    val parts = df.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__tb", monotonically_increasing_id())
      .repartitionByRange(col("__x"), col("__tb"))
      .sortWithinPartitions(col("__x"), col("__tb"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().sortBy(_.getInt(0))
    val n = counts.map(_.getLong(1)).sum
    if (n == 0)
      return Seq.empty[(Int, Long, Double, Double, Double)]
        .toDF("bucket", "n", "value_sum", "cum_value_share", "gini")
    var running = 0L
    val offsets = counts.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"), col("__tb"))
    val ranked = parts.join(offsetsDf, Seq("__pid"))
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1 + col("__offset"))
    val perBucket = ranked
      .groupBy((col("__rank") * buckets / n).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,12)")).as("__vsum"),
        sum(((col("__rank") + 1) * col("__x")).cast("decimal(38,12)"))
          .as("__rxsum"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // buckets-sized frame: the unpartitioned windows are intentional
    perBucket
      .withColumn("__total", sum(col("__vsum")).over(wAll))
      .withColumn("__rxtotal", sum(col("__rxsum")).over(wAll))
      .select(col("bucket"), col("n"),
        round(col("__vsum").cast("double"), 6).as("value_sum"),
        round((sum(col("__vsum")).over(wCum) / col("__total"))
          .cast("double"), 6).as("cum_value_share"),
        round((lit(2.0) * col("__rxtotal").cast("double") /
          (lit(n.toDouble) * col("__total").cast("double"))) -
          (lit(n + 1.0) / lit(n.toDouble)), 6).as("gini"))
      .orderBy(col("bucket"))
  }

  /** Exact equi-join size probe: what `a JOIN b ON key` would produce,
    * WITHOUT running the join — Σ over shared keys of cnt_a·cnt_b,
    * computed at KEY grain (two count aggregates + one key-sized join),
    * plus the skew decomposition the number alone hides: the single
    * hottest key's contribution and share. The pre-flight measurement
    * behind the q168/q174 salting decision — "this join is 10⁹ rows
    * and one key is 40% of it" costs seconds at key grain; discovering
    * it mid-shuffle costs the cluster. Returns one row:
    * (n_keys_left, n_keys_right, n_keys_shared, join_rows,
    * top_key, top_key_rows, top_key_share).
    *
    * Keys compare by their STRING form: a join that would match only
    * through numeric coercion (INT 1 vs DOUBLE 1.0) is out of contract
    * — cast both keys to the join's common type before probing, the
    * same way you would before the join itself.
    */
  def joinSizeProbe(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__ca"))
      .localCheckpoint(true) // consumers: key count + the product join
    val rb = right.groupBy(col(rightKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__cb"))
      .localCheckpoint(true)
    val prod = la.join(rb, Seq("__k"))
      .select(col("__k"), (col("__ca") * col("__cb")).as("__rows"))
      .localCheckpoint(true) // consumers: totals + the argmax pick
    val nl = la.agg(count(lit(1))).head().getLong(0)
    val nr = rb.agg(count(lit(1))).head().getLong(0)
    val top = prod.orderBy(col("__rows").desc, col("__k")).limit(1)
    prod
      .agg(count(lit(1)).as("n_keys_shared"),
        coalesce(sum(col("__rows")), lit(0L)).as("join_rows"))
      .withColumn("n_keys_left", lit(nl))
      .withColumn("n_keys_right", lit(nr))
      // left join on true: disjoint key sets leave a null top_key on
      // the (always present) summary row instead of vanishing it
      .join(broadcast(top.select(col("__k").as("top_key"),
        col("__rows").as("top_key_rows"))), lit(true), "left")
      .select(col("n_keys_left"), col("n_keys_right"),
        col("n_keys_shared"), col("join_rows"), col("top_key"),
        col("top_key_rows"),
        round(col("top_key_rows") / col("join_rows").cast("double"), 6)
          .as("top_key_share"))
  }

  /** Two-sample Kolmogorov-Smirnov test: the supremum gap between the
    * two groups' empirical CDFs, `D = max |F_a(x) − F_b(x)|` — the
    * standard distribution-drift detector (did this corpus version's
    * length/score/latency distribution move?), sensitive to shape
    * changes a mean/variance probe misses. Exactly two group labels
    * (lexicographically smaller reports as a). Returns one row
    * (n_a, n_b, d_stat, p_value) — p from the asymptotic Kolmogorov
    * series `2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}`, λ = D·√(n_a·n_b/(n_a+n_b)),
    * 100 terms, clamped to [0,1]; valid for large samples (the regime
    * this operator exists for), rounded to 6 dp.
    *
    * 100 TB shape: the corpus collapses to DISTINCT VALUES with
    * per-group counts in one aggregation (the binaryAuc grain
    * argument); the CDF prefix sums ride the range-partition
    * prefix-sum device (per-partition subtotals collected, offsets
    * rebroadcast — never a global single-partition window); D is one
    * max aggregate over the distinct-value frame. The p series folds
    * in a FIXED left-to-right order on the 1-row frame, so the oracle
    * replays it term for term.
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__x"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"ksTest: need exactly 2 groups, got ${labels.mkString(",")}")
    val (la, lb) = (labels(0), labels(1))
    // distinct-value grain with per-group counts, range-ordered
    val grain = vals.groupBy(col("__x"))
      .agg(count(when(col("__g") === la, 1)).as("__ca"),
        count(when(col("__g") === lb, 1)).as("__cb"))
      .repartitionByRange(col("__x"))
      .sortWithinPartitions(col("__x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries (offsets + scoring)
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(col("__ca")).as("__sa"), sum(col("__cb")).as("__sb"))
      .collect().sortBy(_.getInt(0))
    var runA = 0L; var runB = 0L
    val offsetRows = offsets.map { r =>
      val here = (r.getInt(0), runA, runB)
      runA += r.getLong(1); runB += r.getLong(2); here
    }
    val (na, nb) = (runA, runB)
    require(na > 0 && nb > 0, "ksTest: both groups must be non-empty")
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__offa", "__offb"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val d = grain
      .join(offsetsDf, Seq("__pid"))
      .select(abs(
        (sum(col("__ca")).over(w) + col("__offa")).cast("double") / na -
          (sum(col("__cb")).over(w) + col("__offb")).cast("double") / nb)
        .as("__gap"))
      .agg(max(col("__gap")).as("__d"))
    // asymptotic Kolmogorov series on the 1-row frame, fixed fold
    // order. The alternating series needs k ~ 1/λ terms: below λ=0.05
    // the 100-term partial sum is garbage (at D=0 it reads 0 where the
    // truth is 1), and Q(0.05) = 1 to far beyond 6 dp — so tiny λ
    // short-circuits to p = 1, replayed by the oracle's CASE
    val lam = col("__d") * math.sqrt(na.toDouble * nb / (na.toDouble + nb))
    val series = (1 to 100).map { k =>
      lit(2.0 * (if (k % 2 == 1) 1.0 else -1.0)) *
        exp(lit(-2.0 * k * k) * lam * lam)
    }.reduceLeft(_ + _)
    d.select(lit(na).as("n_a"), lit(nb).as("n_b"),
      round(col("__d"), 6).as("d_stat"),
      round(when(lam < 0.05, lit(1.0))
        .otherwise(greatest(lit(0.0), least(lit(1.0), series))), 6)
        .as("p_value"))
  }

  /** Mann-Whitney U test (Wilcoxon rank-sum): the nonparametric
    * location-shift test — [[ksTest]] asks "did the distribution
    * change shape", this asks "did one group's values stochastically
    * dominate" without assuming normality (the A/B readout for skewed
    * metrics like revenue or latency where the t-test's mean is a lie).
    * Exactly two group labels; smaller label reports as a. Mid-ranks
    * for ties, tie-corrected normal approximation WITHOUT continuity
    * correction (documented convention; exact-small-sample tables are a
    * driver-side concern, not a 100 TB one):
    *
    *   U_a = R_a − n_a(n_a+1)/2,  z = (U_a − n_a·n_b/2) / σ,
    *   σ² = n_a·n_b/12 · (N+1 − Σ(t³−t)/(N(N−1))),
    *   p = 2(1 − Φ(|z|))   (Φ via the Abramowitz-Stegun 7.1.26
    *   polynomial — max abs error 7.5e-8, and REPLAYABLE: an erf
    *   built-in would pin the oracle to one libm's rounding).
    *
    * Returns one row (n_a, n_b, u_a, u_b, z, p_value), z/p 6 dp; an
    * all-tied input (σ = 0) yields null z/p. Every rank sum is a
    * half-integer below 2^53 (exact, order-free); the only floats are
    * the final z/p algebra on the 1-row frame.
    *
    * 100 TB shape: identical to [[binaryAuc]] — the corpus collapses to
    * the distinct-value grain, ranks ride the range-partition prefix
    * sum, one final aggregate.
    */
  def mannWhitney(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__x"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"mannWhitney: need exactly 2 groups, got ${labels.mkString(",")}")
    val (la, lb) = (labels(0), labels(1))
    val grain = vals.groupBy(col("__x"))
      .agg(count(when(col("__g") === la, 1)).as("__ca"),
        count(when(col("__g") === lb, 1)).as("__cb"))
      .repartitionByRange(col("__x"))
      .sortWithinPartitions(col("__x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(col("__ca") + col("__cb")).as("__c"))
      .collect().sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("__ca") + col("__cb")
    val agg = grain
      .join(offsetsDf, Seq("__pid"))
      .withColumn("__cum",
        coalesce(sum(col("__ca") + col("__cb")).over(w), lit(0L)) +
          col("__off"))
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
        // mid-rank of a tied run (cum+1 .. cum+t) = cum + (t+1)/2
        sum(col("__ca") * (col("__cum") + (t + 1) / lit(2.0))).as("__ra"),
        // t³ overflows long once a tie run passes ~2M rows (a constant
        // column at scale) — the cube folds in DECIMAL(38,0)
        sum({ val td = t.cast("decimal(38,0)"); td * td * td - td })
          .as("__ties"))
      .head()
    val (na, nb) = (agg.getLong(0), agg.getLong(1))
    require(na > 0 && nb > 0, "mannWhitney: both groups must be non-empty")
    val ra = agg.getDouble(2)
    val ties = agg.getDecimal(3).doubleValue()
    val bign = (na + nb).toDouble
    val ua = ra - na.toDouble * (na + 1) / 2.0
    val ub = na.toDouble * nb - ua
    val mu = na.toDouble * nb / 2.0
    // bign >= 2 always (both groups non-empty), so the tie ratio is safe
    val sigma2 = na.toDouble * nb / 12.0 *
      (bign + 1.0 - ties / (bign * (bign - 1.0)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r6n(x: Double) = // round-half-up toward +inf matches Spark round
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (z, p) =
      if (sigma2 > 0) {
        val zv = (ua - mu) / math.sqrt(sigma2)
        // Abramowitz-Stegun 7.1.26 for the upper normal tail
        val ax = math.abs(zv)
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) * poly
        (Some(r6n(zv)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    Seq((na, nb, r6(ua), r6(ub), z, p))
      .toDF("n_a", "n_b", "u_a", "u_b", "z", "p_value")
  }

  /** Upper tail of the chi-square distribution at integer df — the
    * closed-form ladder (engine-replayable; a gamma-function library
    * call would pin the oracle to one libm): even df unrolls to
    * `e^(−x/2) · Σ_{j<df/2} (x/2)^j / j!` (term-recurrence, left-assoc
    * sum); odd df starts at `Q(x;1) = 2·Φ̄(√x)` (the A&S 7.1.26
    * polynomial) and climbs `Q(x;ν+2) = Q(x;ν) +
    * x^(ν/2)·e^(−x/2) / (2^(ν/2)·Γ(ν/2+1))` with the half-integer
    * gammas maintained by the factorial recurrence. */
  private[graft] def chiSqUpperTail(x: Double, df: Int): Double = {
    require(df >= 1, "chiSqUpperTail: df must be >= 1")
    if (x <= 0) 1.0
    else if (df % 2 == 0) {
      val hx = x / 2.0
      var term = 1.0
      var s = 1.0
      var j = 1
      while (j <= df / 2 - 1) { term = term * hx / j; s = s + term; j += 1 }
      math.min(1.0, math.exp(-hx) * s)
    } else {
      val ax = math.sqrt(x)
      val tt = 1.0 / (1.0 + 0.2316419 * ax)
      val poly = tt * (0.319381530 + tt * (-0.356563782 +
        tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
      var q = 2.0 *
        (math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) * poly)
      var nu = 1
      var g = math.sqrt(math.Pi) / 2.0 // Γ(3/2)
      while (nu < df) {
        q = q + math.pow(x, nu / 2.0) * math.exp(-x / 2.0) /
          (math.pow(2.0, nu / 2.0) * g)
        g = g * (nu / 2.0 + 1.0) // Γ(ν/2+1) → Γ(ν/2+2)
        nu += 2
      }
      math.min(1.0, q)
    }
  }

  /** Kruskal-Wallis H test (Kruskal & Wallis 1952): [[mannWhitney]]
    * generalized to k groups — "did ANY arm's distribution shift" for
    * a continuous metric across an A/B/n experiment, without the
    * normality the one-way ANOVA borrows. Mid-ranks for ties on the
    * POOLED ranking, the standard tie correction, chi-square(k−1)
    * p-value through the closed-form tail ladder:
    *
    *   H = [ 12/(N(N+1)) · Σ_i R_i²/n_i − 3(N+1) ] / C,
    *   C = 1 − Σ(t³−t)/(N³−N),    p = P(χ²_{k−1} > H),
    *   η² = (H − k + 1)/(N − k)   (the rank-eta effect size — how much
    *   of the rank variance the grouping explains).
    *
    * Returns one row per group (group, n, rank_sum, mean_rank) with
    * the shared (h, dof, p_value, eta_sq) repeated on every row
    * ([[benford]]'s convention for k-row readouts), ordered by group,
    * 6 dp. An all-tied input (C = 0) yields null h/p/eta_sq; with
    * k = 2 the 6-dp H equals [[mannWhitney]]'s z² (the consistency
    * identity, spec-pinned). Rank sums are exact half-integers below
    * 2^53; the Σ R_i²/n_i fold quantizes each term to DECIMAL(38,12)
    * (order-free — the same contract as the plan-side aggregations).
    *
    * 100 TB shape: [[mannWhitney]]'s exactly — ONE (value, group)
    * grain collapse, ranks ride the range-partition prefix-sum device
    * over the value grain, per-group rank sums fold in the same
    * aggregate (k conditional columns, k ≤ 20 a plan-time constant),
    * and the H/p algebra runs on the k-row collect.
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__x"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    val k = labels.length
    require(k >= 2 && k <= 20,
      s"kruskalWallis: need 2..20 groups, got $k")
    val cAggs = labels.zipWithIndex.toSeq.map { case (l, i) =>
      count(when(col("__g") === l, 1)).as(s"__c$i") }
    val grain = vals.groupBy(col("__x"))
      .agg(cAggs.head, cAggs.tail: _*)
      .repartitionByRange(col("__x"))
      .sortWithinPartitions(col("__x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    val t = (0 until k).map(i => col(s"__c$i")).reduce(_ + _)
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(t).as("__c"))
      .collect().sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs =
      (0 until k).map(i => sum(col(s"__c$i")).as(s"__n$i")) ++
        // mid-rank of a tied run (cum+1 .. cum+t) = cum + (t+1)/2
        (0 until k).map(i =>
          sum(col(s"__c$i") * (col("__cum") + (t + 1) / lit(2.0)))
            .as(s"__r$i")) ++
        Seq(sum({ val td = t.cast("decimal(38,0)")
          td * td * td - td }).as("__ties"))
    val m = grain
      .join(offsetsDf, Seq("__pid"))
      .withColumn("__cum",
        coalesce(sum(t).over(w), lit(0L)) + col("__off"))
      .agg(aggs.head, aggs.tail: _*)
      .head()
    val ns = (0 until k).map(i => m.getLong(i))
    require(ns.forall(_ > 0), "kruskalWallis: every group must be non-empty")
    val rs = (0 until k).map(i => m.getDouble(k + i))
    val ties = m.getDecimal(2 * k).doubleValue()
    val nTot = ns.sum
    val nd = nTot.toDouble
    // Σ R_i²/n_i as a FIXED label-order left-assoc double fold — a
    // k-term driver-side sum in one deterministic expression order
    // needs no quantization (the per-row-sum convention), and the
    // oracle writes the same literal chain
    val sumR2n = (0 until k).foldLeft(0.0)((acc, i) =>
      acc + rs(i) * rs(i) / ns(i))
    val hRaw = 12.0 / (nd * (nd + 1.0)) * sumR2n - 3.0 * (nd + 1.0)
    val c = 1.0 - ties / (nd * nd * nd - nd)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (h, p, eta) =
      if (c > 0) {
        val hv = hRaw / c
        val etaV =
          if (nTot > k) Some(r6((hv - k + 1.0) / (nTot - k).toDouble))
          else None
        (Some(r6(hv)), Some(r6(chiSqUpperTail(hv, k - 1))), etaV)
      } else (None, None, None)
    labels.zipWithIndex.toSeq.map { case (l, i) =>
      (l, ns(i), r6(rs(i)), r6(rs(i) / ns(i)), h, k - 1, p, eta)
    }.toDF("group", "n", "rank_sum", "mean_rank", "h", "dof",
      "p_value", "eta_sq")
      .orderBy(col("group"))
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972): did two arms'
    * SURVIVAL CURVES differ? The censoring-aware companion to
    * [[mannWhitney]] — comparing raw durations rank-sums a
    * right-censored subject as if "still alive at cutoff" were its
    * true time, which biases toward whichever arm censors more; the
    * log-rank conditions on each event time's risk set instead, so a
    * censored subject counts in every denominator it survived through
    * and in none after. THE two-arm readout over
    * [[graft.ops.Events.timeToEventSurvival]]-shaped frames (one row
    * per subject: group, duration, event flag 1 = observed /
    * 0 = censored).
    *
    * At each distinct time t with d_t total events, n_t at risk and
    * n_at at risk in arm a (smaller label):
    *
    *   O_a = Σ d_at,   E_a = Σ d_t·(n_at/n_t),
    *   V   = Σ d_t·(n_at/n_t)·(1 − n_at/n_t)·(n_t − d_t)/(n_t − 1)
    *   (hypergeometric variance; an n_t = 1 time contributes 0),
    *   χ² = (O_a − E_a)²/V,  p = P(χ²₁ > χ²) = 2·(1 − Φ(√χ²))
    *   (Φ via the Abramowitz-Stegun 7.1.26 polynomial — replayable).
    *
    * Returns one row (n_a, n_b, o_a, e_a, o_b, e_b, chi2, p_value),
    * 6 dp; V = 0 (no event time has both arms at risk) yields null
    * chi2/p. E/V terms quantize to DECIMAL(38,12) before summing —
    * order-free exact decimal addition, every double op replayable.
    *
    * 100 TB shape: [[mannWhitney]]'s exactly — the corpus collapses to
    * the distinct-TIME grain (per-arm leaving + event counts), at-risk
    * counts ride the range-partition prefix-sum device (n(t) = N −
    * leavings before t), one final aggregate. No global sort, no
    * data-sized collect.
    */
  def logRankTest(df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .filter(col(groupCol).isNotNull && col(timeCol).isNotNull &&
        col(eventCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(timeCol).cast("double").as("__t"),
        col(eventCol).cast("long").as("__e"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"logRankTest: need exactly 2 groups, got ${labels.mkString(",")}")
    val (la, lb) = (labels(0), labels(1))
    val grain = vals.groupBy(col("__t"))
      .agg(count(when(col("__g") === la, 1)).as("__la"),
        count(when(col("__g") === lb, 1)).as("__lb"),
        sum(when(col("__g") === la, col("__e")).otherwise(0L)).as("__da"),
        sum(when(col("__g") === lb, col("__e")).otherwise(0L)).as("__db"))
      .repartitionByRange(col("__t"))
      .sortWithinPartitions(col("__t"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(col("__la") + col("__lb")).as("__call"),
        sum(col("__la")).as("__ca"))
      .collect().sortBy(_.getInt(0))
    var runAll = 0L
    var runA = 0L
    val offsetRows = offsets.map { r =>
      val here = (r.getInt(0), runAll, runA)
      runAll += r.getLong(1); runA += r.getLong(2); here
    }
    val nTotal = runAll
    val naTotal = runA
    val nbTotal = nTotal - naTotal
    require(naTotal > 0 && nbTotal > 0,
      "logRankTest: both groups must be non-empty")
    val offsetsDf =
      broadcast(offsetRows.toSeq.toDF("__pid", "__offall", "__offa"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d12 = (c: Column) => c.cast("decimal(38,12)")
    val agg = grain
      .join(offsetsDf, Seq("__pid"))
      .withColumn("__nt", lit(nTotal) -
        (coalesce(sum(col("__la") + col("__lb")).over(w), lit(0L)) +
          col("__offall")))
      .withColumn("__nat", lit(naTotal) -
        (coalesce(sum(col("__la")).over(w), lit(0L)) + col("__offa")))
      .withColumn("__dt", col("__da") + col("__db"))
      .withColumn("__fa",
        col("__nat").cast("double") / col("__nt").cast("double"))
      .agg(sum(col("__da")).as("__oa"), sum(col("__db")).as("__ob"),
        sum(d12(col("__dt").cast("double") * col("__fa"))).as("__ea"),
        sum(when(col("__nt") > 1,
          d12(col("__dt").cast("double") * col("__fa") *
            (lit(1.0) - col("__fa")) *
            ((col("__nt") - col("__dt")).cast("double") /
              (col("__nt") - 1).cast("double"))))
          .otherwise(d12(lit(0.0)))).as("__v"))
      .head()
    val oa = agg.getLong(0)
    val ob = agg.getLong(1)
    val ea = agg.getDecimal(2).doubleValue()
    val v = agg.getDecimal(3).doubleValue()
    val eb = (oa + ob).toDouble - ea
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (chi2, p) =
      if (v > 0) {
        val x2 = (oa.toDouble - ea) * (oa.toDouble - ea) / v
        // Abramowitz-Stegun 7.1.26: P(chi2_1 > x) = 2·(upper tail at √x)
        val ax = math.sqrt(x2)
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) * poly
        (Some(r6(x2)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    Seq((naTotal, nbTotal, oa, r6(ea), ob, r6(eb), chi2, p))
      .toDF("n_a", "n_b", "o_a", "e_a", "o_b", "e_b", "chi2", "p_value")
  }

  /** Mid-rank map over one column's distinct-value grain: (value,
    * rank) where rank is the average 1-based pooled rank of the
    * value's tie run — the [[mannWhitney]] prefix-sum device factored
    * out (range-partitioned grain, per-partition count offsets
    * collected [32 rows], ranks as cumBefore + (c+1)/2). Exact
    * half-integers below 2^53. */
  private def midRankMap(vals: DataFrame, vCol: String,
      rName: String): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    val grain = vals.groupBy(col(vCol)).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col(vCol))
      .sortWithinPartitions(col(vCol))
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
    val w = Window.partitionBy(col("__pid")).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    grain.join(offsetsDf, Seq("__pid"))
      .select(col(vCol),
        (coalesce(sum(col("__c")).over(w), lit(0L)) + col("__off") +
          (col("__c") + 1) / lit(2.0)).as(rName))
  }

  /** Spearman rank correlation: Pearson's r computed on MID-RANKS —
    * the monotone-association readout that is immune to outliers and
    * to any monotone rescaling of either axis (heavy-tailed metrics
    * like revenue, latency, token counts — where [[correlationMatrix]]'s
    * Pearson is dominated by the tail). Tied values share their
    * average rank (the standard tie convention, = Pearson-on-ranks
    * exactly).
    *
    * Returns one row (n, rho, z, p_value), 6 dp: z = ρ·√(n−1) with
    * p = 2(1 − Φ(|z|)) — the large-sample normal approximation
    * (Fieller et al. 1957; the t-refinement changes nothing at corpus
    * n), Φ via the Abramowitz-Stegun 7.1.26 polynomial (replayable).
    * A rank-degenerate axis (all values tied) has no rank variance:
    * null rho/z/p.
    *
    * 100 TB shape: each axis collapses to its distinct-value grain and
    * ranks ride the range-partition prefix-sum device ([[mannWhitney]]'s);
    * rows re-acquire their two ranks by value equi-joins (grain-sized
    * maps — broadcast when small), then ONE moments aggregation
    * (DECIMAL(38,12)-quantized — ranks are half-integers, products
    * quarter-integers, so the quantization is EXACT and order-free).
    * No global sort, no data-sized collect.
    */
  def spearmanCorr(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .localCheckpoint(true) // three consumers: two grains + the join
    val rx = midRankMap(rows.select(col("__x")), "__x", "__rx")
    val ry = midRankMap(rows.select(col("__y")), "__y", "__ry")
    val d12 = (c: Column) => c.cast("decimal(38,12)")
    val m = rows.join(rx, Seq("__x")).join(ry, Seq("__y"))
      .agg(count(lit(1)).as("n"),
        sum(d12(col("__rx"))).as("sx"), sum(d12(col("__ry"))).as("sy"),
        sum(d12(col("__rx") * col("__rx"))).as("sxx"),
        sum(d12(col("__ry") * col("__ry"))).as("syy"),
        sum(d12(col("__rx") * col("__ry"))).as("sxy"))
      .head()
    val n = m.getLong(0)
    require(n > 1, s"spearmanCorr: need at least 2 rows, got $n")
    def dv(i: Int) = m.getDecimal(i).doubleValue()
    val (sx, sy, sxx, syy, sxy) = (dv(1), dv(2), dv(3), dv(4), dv(5))
    val nD = n.toDouble
    val num = nD * sxy - sx * sy
    val dx = nD * sxx - sx * sx
    val dy = nD * syy - sy * sy
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val out =
      if (dx > 0 && dy > 0) {
        val rho = num / (math.sqrt(dx) * math.sqrt(dy))
        val z = rho * math.sqrt(nD - 1.0)
        val ax = math.abs(z)
        // Abramowitz-Stegun 7.1.26 upper normal tail
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) * poly
        (n, Some(r6(rho)), Some(r6(z)),
          Some(r6(math.min(1.0, 2.0 * tail))))
      } else (n, None, None, None)
    Seq(out).toDF("n", "rho", "z", "p_value")
  }

  /** Quantile treatment effects: the DISTRIBUTIONAL A/B readout —
    * per-quantile differences q_b(τ) − q_a(τ) between two arms
    * (smaller label = a, larger = treated b, the [[mannWhitney]]
    * convention). A mean effect of zero can hide a variance-widening
    * treatment that moves the p10 down and the p90 up; the QTE curve
    * shows exactly where in the distribution the treatment acts.
    * Returns one row per τ: (tau, q_a, q_b, qte), 6 dp.
    *
    * 100 TB shape: [[Quantiles.exactByKey]] — the distributed exact
    * type-7 rank machine (range partition + 32-row offsets; the
    * built-in small-group fast path when both arms fit) — then a
    * τ-keyed pivot of the (2 × |τ|)-row frame.
    */
  def quantileTreatmentEffects(df: DataFrame, groupCol: String,
      valueCol: String,
      taus: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t >= 0 && t <= 1),
      "quantileTreatmentEffects: taus in [0,1]")
    val vals = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__x"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"quantileTreatmentEffects: need exactly 2 groups, got " +
        labels.mkString(","))
    val q = Quantiles.exactByKey(vals, "__g", "__x", taus)
    q.groupBy(col("q").as("tau"))
      .agg(max(when(col("key") === labels(0), col("exact_q"))).as("__qa"),
        max(when(col("key") === labels(1), col("exact_q"))).as("__qb"))
      .select(col("tau"), round(col("__qa"), 6).as("q_a"),
        round(col("__qb"), 6).as("q_b"),
        round(col("__qb") - col("__qa"), 6).as("qte"))
      .orderBy(col("tau"))
  }

  /** Kendall's τ-b (Kendall 1945, the tie-corrected form):
    * concordant-minus-discordant pair share — [[spearmanCorr]]'s
    * sibling with a direct probabilistic reading (P(concordant) −
    * P(discordant)) and better behavior under heavy ties. Computed
    * ENTIRELY on the dense value-pair GRID (the
    * [[chiSquareIndependence]] device): with cell counts n_ij,
    *
    *   C = Σ n_ij·|{pairs in cells strictly greater in BOTH axes}|,
    *   D = Σ n_ij·|{strictly greater in x, strictly less in y}|,
    *   τ-b = 2(C − D) / (√(n(n−1) − Σr(r−1)) · √(n(n−1) − Σc(c−1)))
    *
    * (doubled-unit form — no /2 anywhere, so every quantity stays an
    * exact integer; DECIMAL(19,0)×DECIMAL(19,0) products — pair counts
    * overflow long past ~3e9 rows). Returns one row (n, n_x, n_y,
    * concordant, discordant, tau_b), τ 6 dp; a constant axis yields
    * null τ. Exact under ties by construction.
    *
    * 100 TB shape: the corpus collapses to (x, y) cell counts in one
    * aggregation; everything after lives on the n_x × n_y DENSE grid —
    * the 2-D suffix sums are two windows each PARTITIONED by one axis
    * and bounded by the other's grain. The caller contract is the same
    * as every grain operator's: bounded distinct values per axis
    * (quantize continuous columns first), stated rather than hidden.
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def d19(c: Column) = c.cast("decimal(19,0)")
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // consumers: both marginals + the grid
    val mx = cells.groupBy(col("__x")).agg(sum(col("__n")).as("__rx"))
      .localCheckpoint(true) // grid build + tie aggregate
    val my = cells.groupBy(col("__y")).agg(sum(col("__n")).as("__ry"))
      .localCheckpoint(true)
    val grid = mx.select(col("__x")).crossJoin(my.select(col("__y")))
      .join(cells, Seq("__x", "__y"), "left")
      .select(col("__x"), col("__y"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val wSuf = Window.partitionBy(col("__x")).orderBy(col("__y"))
      .rowsBetween(1, Window.unboundedFollowing)
    val wPre = Window.partitionBy(col("__x")).orderBy(col("__y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wXSuf = Window.partitionBy(col("__y")).orderBy(col("__x"))
      .rowsBetween(1, Window.unboundedFollowing)
    val agg = grid
      .withColumn("__suf", coalesce(sum(col("__n")).over(wSuf), lit(0L)))
      .withColumn("__pre", coalesce(sum(col("__n")).over(wPre), lit(0L)))
      .withColumn("__sgt", coalesce(sum(col("__suf")).over(wXSuf), lit(0L)))
      .withColumn("__slt", coalesce(sum(col("__pre")).over(wXSuf), lit(0L)))
      .agg(sum(d19(col("__n")) * d19(col("__sgt"))).as("__c"),
        sum(d19(col("__n")) * d19(col("__slt"))).as("__d"))
      .head()
    val tx = mx.agg(sum(col("__rx")), count(lit(1)),
      sum(d19(col("__rx")) * d19(col("__rx") - 1))).head()
    val ty = my.agg(count(lit(1)),
      sum(d19(col("__ry")) * d19(col("__ry") - 1))).head()
    val n = tx.getLong(0)
    require(n > 1, s"kendallTauB: need at least 2 rows, got $n")
    val nx = tx.getLong(1)
    val ny = ty.getLong(0)
    val c = agg.getDecimal(0)
    val d = agg.getDecimal(1)
    val t2 = new java.math.BigDecimal(n)
      .multiply(new java.math.BigDecimal(n - 1))
    val dx = t2.subtract(tx.getDecimal(2)).doubleValue()
    val dy = t2.subtract(ty.getDecimal(1)).doubleValue()
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val tau =
      if (dx > 0 && dy > 0)
        Some(r6(2.0 * c.subtract(d).doubleValue() /
          (math.sqrt(dx) * math.sqrt(dy))))
      else None
    Seq((n, nx, ny, c.doubleValue(), d.doubleValue(), tau))
      .toDF("n", "n_x", "n_y", "concordant", "discordant", "tau_b")
  }

  /** Benjamini-Hochberg FDR adjustment (Benjamini & Hochberg 1995):
    * convert a column of per-test p-values into q-values
    * `q_i = min_{j ≥ i} min(1, p_(j)·n/j)` — the multiple-testing
    * control for "we ran [[mannWhitney]]/[[ksTest]]/anomaly scoring on
    * ten thousand keys and 500 look significant" (at α=0.05, 5% of
    * true nulls ALWAYS look significant; BH caps the false-discovery
    * RATE instead of the per-test error). Returns the input columns
    * plus `q_value`; null p-values get null q.
    *
    * 100 TB shape: p-values collapse to their DISTINCT-VALUE grain
    * (tied p share a q by construction — p·n/j minimizes at the tie
    * run's LAST rank, which the grain computes directly); the
    * ascending rank is the range-partition prefix-sum device and the
    * suffix min is the SAME device run descending with per-partition
    * min offsets (min is as broadcastable as sum); the result maps
    * back by an equi-join on p (grain-sized, usually broadcast). No
    * global sort, no single-partition window.
    */
  def bhAdjust(df: DataFrame, pCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grain = df
      .filter(col(pCol).isNotNull)
      .select(col(pCol).cast("double").as("__p"))
      .groupBy(col("__p")).agg(count(lit(1)).as("__c"))
      .repartitionByRange(col("__p"))
      .sortWithinPartitions(col("__p"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin range boundaries
    val offsets = grain.groupBy(col("__pid"))
      .agg(sum(col("__c")).as("__s")).collect().sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val here = running; running += r.getLong(1); (r.getInt(0), here)
    }
    val n = running
    if (n == 0L) return df.withColumn("q_value", lit(null).cast("double"))
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__off"))
    val wAsc = Window.partitionBy(col("__pid")).orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // raw BH value at each distinct p: p·n/rank-of-last-tie
    val raw = grain
      .join(offsetsDf, Seq("__pid"))
      .select(col("__p"),
        (col("__p") * n / (sum(col("__c")).over(wAsc) + col("__off")))
          .as("__raw"))
      .repartitionByRange(col("__p").desc)
      .sortWithinPartitions(col("__p").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // second pass pins its own boundaries
    val minOffsets = raw.groupBy(col("__pid"))
      .agg(min(col("__raw")).as("__m")).collect().sortBy(_.getInt(0))
    var runMin = Double.MaxValue
    val minRows = minOffsets.map { r =>
      val here = runMin; runMin = math.min(runMin, r.getDouble(1))
      (r.getInt(0), here)
    }
    val minDf = broadcast(minRows.toSeq.toDF("__pid", "__moff"))
    val wDesc = Window.partitionBy(col("__pid")).orderBy(col("__p").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val mapping = raw
      .join(minDf, Seq("__pid"))
      .select(col("__p"),
        least(lit(1.0),
          least(min(col("__raw")).over(wDesc), col("__moff")))
          .as("q_value"))
    df.join(mapping, df(pCol).cast("double") === mapping("__p"), "left")
      .drop("__p")
  }

  /** Cochran-Mantel-Haenszel test + Mantel-Haenszel pooled odds ratio:
    * the STRATIFIED 2×2 association test — "did the variant move
    * conversion, controlling for segment" — the Simpson's-paradox-safe
    * A/B readout (a confounder that correlates with both assignment
    * and outcome flips naive pooled rates; CMH conditions on it).
    * Input is unit grain with a stratum label, exactly two group
    * labels (smaller = A) and a 0/1 outcome. Per stratum k with table
    * (a=conv_A, b=non_A, c=conv_B, d=non_B), N=a+b+c+d:
    *
    *   χ² = (Σa − Σ E_k)² / Σ V_k,  E = (a+b)(a+c)/N,
    *   V = (a+b)(c+d)(a+c)(b+d) / (N²(N−1)),
    *   OR_MH = Σ(ad/N) / Σ(bc/N),
    *
    * NO continuity correction (documented convention); p from the
    * 1-df chi-square via the normal tail (χ²₁ = Z², A&S 7.1.26 — the
    * [[mannWhitney]] polynomial, replayable). Strata with N < 2 are
    * dropped (V undefined there). Returns one row (n_strata, n_units,
    * sum_a, chi2, p_value, or_mh), 6 dp; all-degenerate margins
    * (ΣV = 0) yield null chi2/p, OR null when its denominator is 0.
    *
    * 100 TB shape: ONE stratum-keyed aggregation builds every 2×2;
    * per-stratum E/V/OR terms quantize to DECIMAL(38,12) before the
    * final 1-row sum (order-invariant — the house device), so the
    * whole statistic is engine-replayable.
    */
  def cmhTest(units: DataFrame, stratumCol: String, groupCol: String,
      convertedCol: String): DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val vals = units
      .filter(col(stratumCol).isNotNull && col(groupCol).isNotNull &&
        col(convertedCol).isNotNull)
      .select(col(stratumCol).cast("string").as("__s"),
        col(groupCol).cast("string").as("__g"),
        col(convertedCol).cast("int").as("__y"))
    val labels = vals.select(col("__g")).distinct()
      .collect().map(_.getString(0)).sorted
    require(labels.length == 2,
      s"cmhTest: need exactly 2 groups, got ${labels.mkString(",")}")
    val (la, lb) = (labels(0), labels(1))
    val strata = vals.groupBy(col("__s"))
      .agg(
        sum(when(col("__g") === la && col("__y") === 1, 1L)
          .otherwise(0L)).as("__a"),
        sum(when(col("__g") === la && col("__y") === 0, 1L)
          .otherwise(0L)).as("__b"),
        sum(when(col("__g") === lb && col("__y") === 1, 1L)
          .otherwise(0L)).as("__c"),
        sum(when(col("__g") === lb && col("__y") === 0, 1L)
          .otherwise(0L)).as("__d"))
      .withColumn("__n", col("__a") + col("__b") + col("__c") + col("__d"))
      .filter(col("__n") >= 2)
    val nd = col("__n").cast("double")
    val agg = strata.agg(
        count(lit(1)).as("k"), sum(col("__n")).as("nu"),
        sum(col("__a")).as("sa"),
        sum(d12((col("__a") + col("__b")).cast("double") *
          (col("__a") + col("__c")) / nd)).as("se_"),
        sum(d12((col("__a") + col("__b")).cast("double") * (col("__c") + col("__d")) *
          (col("__a") + col("__c")) * (col("__b") + col("__d")) /
          (nd * nd * (nd - 1.0)))).as("sv"),
        sum(d12(col("__a").cast("double") * col("__d") / nd)).as("son"),
        sum(d12(col("__b").cast("double") * col("__c") / nd)).as("sod"))
      .head()
    val k = agg.getLong(0)
    require(k >= 1, "cmhTest: no stratum with N >= 2")
    val nUnits = agg.getLong(1)
    val sa = agg.getLong(2)
    val se = agg.getDecimal(3).doubleValue()
    val sv = agg.getDecimal(4).doubleValue()
    val orNum = agg.getDecimal(5).doubleValue()
    val orDen = agg.getDecimal(6).doubleValue()
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (chi2, p) =
      if (sv > 0) {
        val x = (sa - se) * (sa - se) / sv
        val ax = math.sqrt(x)
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) * poly
        (Some(r6(x)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    val orMh = if (orDen > 0) Some(r6(orNum / orDen)) else None
    Seq((k, nUnits, sa, chi2, p, orMh))
      .toDF("n_strata", "n_units", "sum_a", "chi2", "p_value", "or_mh")
  }

  /** Poisson-bootstrap confidence interval for a mean (the at-scale
    * bootstrap: resampling n rows with replacement is a shuffle of the
    * whole dataset per replica, but each row's multiplicity in a
    * replica is ~Poisson(1), so B replicas are ONE pass with B small
    * integer weights per row — the standard trick for CIs on massive
    * data). Deterministic AND engine-replayable: the Poisson draw
    * compares a 13-hex-char SEGMENT of md5(id:⌊replica/2⌋) against
    * precomputed hex thresholds floor(P(X≤x)·2⁵²) (the q56 split
    * device — pure string comparison, no float conversion anywhere;
    * P(X≤x) for X~Poisson(1): 0.3679, 0.7358, 0.9197, 0.9810, 0.9963,
    * 0.9994; weights cap at 6, P(X>6) ≈ 8e-5). One md5 digest is 32
    * hex chars and a draw consumes 13, so each digest feeds TWO
    * replicas — even replica 2g reads chars 1–13 of md5(id:g), odd
    * replica 2g+1 reads chars 14–26 (independent bits) — halving the
    * hash work, the operator's dominant cost.
    * Returns one row (n, point_mean, ci_lo, ci_hi, replicas) where
    * [ci_lo, ci_hi] is the (alpha/2, 1−alpha/2) percentile interval
    * of the replica means, all rounded to 6 dp.
    *
    * 100 TB shape: the data explodes ×B but carries only (replica,
    * value) — one narrow pass into B partial-aggregated sums; replica
    * means are a B-row frame and the percentile pick is exact
    * (Quantiles.exact literals). Terms quantize to DECIMAL(38,12).
    */
  def bootstrapCiMean(df: DataFrame, idCol: String, valueCol: String,
      replicas: Int = 100, alpha: Double = 0.05): DataFrame = {
    require(replicas >= 10 && replicas <= 10000,
      "replicas in [10,10000] (the replica-mean frame must be " +
        "quantile-meaningful and the explode factor sane)")
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    // P(Poisson(1) <= x) literals, x = 0..5; weight capped at 6
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    val vals = df.select(col(idCol).as("__id"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .localCheckpoint(true) // consumers: point estimate + the explode
    val point = vals.agg(count(lit(1)).as("__n"),
      (sum(col("__x").cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("__mean")).head()
    val n = point.getLong(0)
    require(n > 0, "bootstrapCiMean: no non-null values")
    val pointMean = point.getDouble(1)
    // 13-hex-char md5 segment vs hex thresholds floor(p * 2^52): pure
    // string comparison, identical in any engine with md5. The digest
    // lands in its OWN projection first so the hash runs once per
    // (row, digest) — folded into the weight chain it would be
    // re-evaluated per branch wherever subexpression elimination
    // doesn't reach. Each digest feeds TWO replicas (chars 1-13 and
    // 14-26): the explode factor is ceil(B/2) hashes, then a cheap
    // 2-way struct explode fans out to B (replica, segment) rows, with
    // the phantom replica dropped when B is odd.
    val hexThresholds = cdf.map(p => f"${(p * (1L << 52)).toLong}%013x")
    def wFor(hex: Column): Column = hexThresholds.zipWithIndex.reverse
      .foldLeft(lit(6): Column) { case (acc, (h, x)) =>
        when(hex < h, lit(x)).otherwise(acc)
      }
    val halves = (replicas + 1) / 2
    // one exploded row per (value row, digest) — NOT per (row, replica):
    // both replicas' weighted sums fold side by side in the same
    // aggregation, so the ×B fan-out never materializes as rows and the
    // md5 count is ⌈B/2⌉ per value. The per-digest frame collapses to
    // `halves` rows; the replica fan-out happens on THAT frame (tiny).
    val w1 = wFor(col("__hex1"))
    val w2 = wFor(col("__hex2"))
    // the ⌈B/2⌉ digests per row are the operator's entire cost, and they
    // are minted map-side of the __g exchange — on a single-row-group
    // local file that map side is ONE task (guide §2.5), so the hash
    // work must fan out to the session's cores first (no-op at scale,
    // where the scan partitions already exceed defaultParallelism)
    val perDigest = Scale.fanOut(vals)
      .withColumn("__g", explode(typedLit((0 until halves).toList)))
      .withColumn("__h", md5(concat(
        col("__id").cast("string"), lit(":"),
        col("__g").cast("string")).cast("binary")))
      .withColumn("__hex1", substring(col("__h"), 1, 13))
      .withColumn("__hex2", substring(col("__h"), 14, 13))
      .select(col("__g"),
        (col("__x") * w1).cast("decimal(38,12)").as("__wx1"),
        w1.cast("long").as("__w1"),
        (col("__x") * w2).cast("decimal(38,12)").as("__wx2"),
        w2.cast("long").as("__w2"))
      .groupBy(col("__g"))
      .agg(sum(col("__wx1")).as("__swx1"), sum(col("__w1")).as("__sw1"),
        sum(col("__wx2")).as("__swx2"), sum(col("__w2")).as("__sw2"))
      .localCheckpoint(true) // halves-sized; TWO consumers (the union)
    // a replica that resamples the whole frame to zero total weight
    // (P ≈ e^(−n) per replica — real at tiny n) must yield a NULL mean,
    // not an ANSI DIVIDE_BY_ZERO: guard the division, drop the replica
    // (DuckDB's x/0 → NULL + quantile_cont's null-skip do the same, so
    // the two engines stay aligned), and refuse a frame so degenerate
    // that fewer than half the replicas survived
    val means = perDigest
      .select((col("__g") * 2).as("__b"),
        when(col("__sw1") > 0,
          col("__swx1").cast("double") / col("__sw1")).as("__m"))
      .unionAll(perDigest
        .select((col("__g") * 2 + 1).as("__b"),
          when(col("__sw2") > 0,
            col("__swx2").cast("double") / col("__sw2")).as("__m")))
      .filter(col("__b") < replicas && col("__m").isNotNull)
    val valid = means.count()
    require(valid >= replicas / 2,
      s"bootstrapCiMean: only $valid of $replicas replicas drew nonzero " +
        "total weight — the frame is too small to bootstrap")
    val qs = Quantiles.exact(means, "__m",
        Seq(alpha / 2, 1 - alpha / 2), builtinMaxRows = 0L)
      .collect().sortBy(_.getDouble(0)).map(_.getDouble(1))
    val session = df.sparkSession
    import session.implicits._
    Seq((n, math.floor(pointMean * 1e6 + 0.5) / 1e6,
      math.floor(qs(0) * 1e6 + 0.5) / 1e6,
      math.floor(qs(1) * 1e6 + 0.5) / 1e6, replicas))
      .toDF("n", "point_mean", "ci_lo", "ci_hi", "replicas")
  }

  /** Poisson-bootstrap confidence interval for the DIFFERENCE of two
    * group means — the actual A/B effect interval ([[bootstrapCiMean]]
    * gives one arm's uncertainty; experiments read the gap). Same
    * one-pass hash-weight device: the group label rides the
    * aggregation key, so BOTH groups resample inside the same ⌈B/2⌉-
    * hash scan and each replica's diff pairs the same draw b across
    * arms (the paired-replica bootstrap — variance of the diff, not
    * the sum of marginal variances). Exactly two group labels (smaller
    * = A; diff = mean_B − mean_A); `idCol` must identify rows uniquely
    * or draws correlate. A replica that resamples a group to zero
    * total weight (vanishing for any real group size) contributes no
    * diff and is dropped on both engines. Returns one row (n_a, n_b,
    * mean_a, mean_b, point_diff, ci_lo, ci_hi, replicas), 6 dp.
    *
    * 100 TB shape: identical to [[bootstrapCiMean]] — one narrow
    * exploded pass partial-aggregated into B×2 weighted sums; the
    * replica-diff frame is B rows and the percentile pick is exact.
    */
  def bootstrapCiMeanDiff(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, replicas: Int = 100,
      alpha: Double = 0.05): DataFrame = {
    require(replicas >= 10 && replicas <= 10000,
      "replicas in [10,10000] (the replica-diff frame must be " +
        "quantile-meaningful and the explode factor sane)")
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    val vals = df.select(col(idCol).as("__id"),
        col(groupCol).cast("string").as("__grp"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull && col("__grp").isNotNull)
      .localCheckpoint(true) // consumers: point estimates + the explode
    val pt = vals.groupBy(col("__grp"))
      .agg(count(lit(1)).as("__n"),
        (sum(col("__x").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("__mean"))
      .collect()
    val labels = pt.map(_.getString(0)).sorted
    require(labels.length == 2,
      s"bootstrapCiMeanDiff: need exactly 2 groups, got " +
        labels.mkString(","))
    val ra = pt.find(_.getString(0) == labels(0)).get
    val rb = pt.find(_.getString(0) == labels(1)).get
    val (na, ma) = (ra.getLong(1), ra.getDouble(2))
    val (nb, mb) = (rb.getLong(1), rb.getDouble(2))
    val hexThresholds = cdf.map(p => f"${(p * (1L << 52)).toLong}%013x")
    def wFor(hex: Column): Column = hexThresholds.zipWithIndex.reverse
      .foldLeft(lit(6): Column) { case (acc, (h, x)) =>
        when(hex < h, lit(x)).otherwise(acc)
      }
    val halves = (replicas + 1) / 2
    val w1 = wFor(col("__hex1"))
    val w2 = wFor(col("__hex2"))
    // no fan-out here, unlike bootstrapCiMean: this operator's input
    // (the two-arm experiment frame) arrives multi-partition already,
    // and the round-18 fan-out cost a consistent +0.4 s in both
    // arbitrated bench runs for zero parallelism gained — removed per
    // guide §1 (keep only measured wins)
    val perDigest = vals
      .withColumn("__g", explode(typedLit((0 until halves).toList)))
      .withColumn("__h", md5(concat(
        col("__id").cast("string"), lit(":"),
        col("__g").cast("string")).cast("binary")))
      .withColumn("__hex1", substring(col("__h"), 1, 13))
      .withColumn("__hex2", substring(col("__h"), 14, 13))
      .select(col("__g"), col("__grp"),
        (col("__x") * w1).cast("decimal(38,12)").as("__wx1"),
        w1.cast("long").as("__w1"),
        (col("__x") * w2).cast("decimal(38,12)").as("__wx2"),
        w2.cast("long").as("__w2"))
      .groupBy(col("__g"), col("__grp"))
      .agg(sum(col("__wx1")).as("__swx1"), sum(col("__w1")).as("__sw1"),
        sum(col("__wx2")).as("__swx2"), sum(col("__w2")).as("__sw2"))
      .localCheckpoint(true) // (halves × 2)-sized; TWO consumers
    // same zero-weight guard as bootstrapCiMean: a replica that draws a
    // group to zero total weight gets a NULL arm mean (not an ANSI
    // DIVIDE_BY_ZERO — observed on ~15-row groups, P ≈ e^(−n)); the
    // null propagates through the diff and the replica drops, exactly
    // what DuckDB's x/0 → NULL does on the oracle side
    val gm = perDigest
      .select((col("__g") * 2).as("__b"), col("__grp"),
        when(col("__sw1") > 0,
          col("__swx1").cast("double") / col("__sw1")).as("__m"))
      .unionAll(perDigest
        .select((col("__g") * 2 + 1).as("__b"), col("__grp"),
          when(col("__sw2") > 0,
            col("__swx2").cast("double") / col("__sw2")).as("__m")))
      .filter(col("__b") < replicas)
    val diffs = gm.groupBy(col("__b"))
      .agg((max(when(col("__grp") === labels(1), col("__m"))) -
        max(when(col("__grp") === labels(0), col("__m")))).as("__d"))
      .filter(col("__d").isNotNull)
    val valid = diffs.count()
    require(valid >= replicas / 2,
      s"bootstrapCiMeanDiff: only $valid of $replicas replicas drew " +
        "nonzero weight in both arms — the frame is too small to bootstrap")
    val qs = Quantiles.exact(diffs, "__d",
        Seq(alpha / 2, 1 - alpha / 2), builtinMaxRows = 0L)
      .collect().sortBy(_.getDouble(0)).map(_.getDouble(1))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val session = df.sparkSession
    import session.implicits._
    Seq((na, nb, r6(ma), r6(mb), r6(mb - ma), r6(qs(0)), r6(qs(1)),
      replicas))
      .toDF("n_a", "n_b", "mean_a", "mean_b", "point_diff",
        "ci_lo", "ci_hi", "replicas")
  }

  /** The mSPRT mixture-likelihood algebra shared by [[msprtTest]] and
    * [[graft.streaming.StreamOps.streamingMsprt]] (one code path — the
    * two faces cannot drift): given exact per-arm moments, the
    * two-sample mean difference δ, its variance V (independent-means,
    * sample variances), the mixture likelihood ratio
    * `Λ = √(V/(V+τ²)) · exp(δ²τ²/(2V(V+τ²)))` and the always-valid
    * p = min(1, 1/Λ) (Johari-Koomen-Pekelis-Walsh 2017). Degenerate
    * variance (V = 0 — constant arms) yields None. */
  private[graft] def msprtAlgebra(na: Long, sya: Double, syya: Double,
      nb: Long, syb: Double, syyb: Double,
      tau: Double): (Double, Option[Double], Option[Double], Option[Double]) = {
    val naD = na.toDouble; val nbD = nb.toDouble
    val meanA = sya / naD; val meanB = syb / nbD
    val diff = meanB - meanA
    val va = (naD * syya - sya * sya) / (naD * (naD - 1.0))
    val vb = (nbD * syyb - syb * syb) / (nbD * (nbD - 1.0))
    val v = va / naD + vb / nbD
    if (v > 0) {
      val t2 = tau * tau
      val vt = v + t2
      val lam = math.sqrt(v / vt) *
        math.exp(((diff * diff) * t2) / ((2.0 * v) * vt))
      (diff, Some(v), Some(lam), Some(math.min(1.0, 1.0 / lam)))
    } else (diff, None, None, None)
  }

  /** Always-valid sequential A/B test (mSPRT, Johari et al. 2017) on
    * the difference of two group means — the fixed-horizon t-test's
    * peeking-safe replacement: the reported p is valid at EVERY look,
    * so a dashboard polled daily cannot inflate its false-positive
    * rate the way repeated z-tests do. `tau` is the mixture scale (the
    * prior spread of plausible effects — a caller-owned tuning knob,
    * stated). Exactly two group labels (smaller = A; diff = mean_B −
    * mean_A). Returns one row (n_a, n_b, mean_a, mean_b, diff, v,
    * lambda, p_always), 6 dp; constant arms (V = 0) yield nulls.
    *
    * 100 TB shape: ONE group-keyed DECIMAL-quantized moments
    * aggregation (the cupedAdjust machine); the Λ algebra runs on the
    * 2-row collect and is exactly engine-replayable.
    */
  def msprtTest(df: DataFrame, groupCol: String, valueCol: String,
      tau: Double): DataFrame = {
    require(tau > 0, "msprtTest: tau must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val m = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__y"))
      .filter(col("__g").isNotNull && col("__y").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(d12(col("__y"))).as("sy"),
        sum(d12(col("__y") * col("__y"))).as("syy"))
      .collect()
    val labels = m.map(_.getString(0)).sorted
    require(labels.length == 2,
      s"msprtTest: need exactly 2 groups, got ${labels.mkString(",")}")
    val ra = m.find(_.getString(0) == labels(0)).get
    val rb = m.find(_.getString(0) == labels(1)).get
    def mom(r: org.apache.spark.sql.Row) = (r.getLong(1),
      r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue())
    val (na, sya, syya) = mom(ra)
    val (nb, syb, syyb) = mom(rb)
    require(na >= 2 && nb >= 2,
      s"msprtTest: need n >= 2 per arm, got $na/$nb")
    val (diff, v, lam, p) = msprtAlgebra(na, sya, syya, nb, syb, syyb, tau)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((na, nb, r6(sya / na), r6(syb / nb), r6(diff), v.map(r6),
      lam.map(r6), p.map(r6)))
      .toDF("n_a", "n_b", "mean_a", "mean_b", "diff", "v",
        "lambda", "p_always")
  }

  /** ABC / Pareto classification: rank entities by value descending and
    * class them by CUMULATIVE value share — A up to `aShare` (default
    * 0.8: "the 20% that is 80% of revenue"), B up to `bShare`, C the
    * tail. The inventory-management classic, and the corpus version of
    * "which domains do we actually depend on". Returns
    * (entity, value, cum_share, abc_class) in rank order; ties break
    * on the entity id (deterministic, oracle-replayable). Values must
    * be nonnegative (Pareto share of a mixed-sign column is undefined).
    *
    * 100 TB shape: the q132/q185 range-partition prefix-sum device —
    * ONE range repartition by (value desc, entity), per-partition
    * DECIMAL(38,12) sums collected as a 32-row offset table, cumulative
    * share = broadcast offset + in-partition ordered window sum. No
    * single-reducer global sort, no ntile.
    */
  def abcClassify(df: DataFrame, entityCol: String, valueCol: String,
      aShare: Double = 0.8, bShare: Double = 0.95): DataFrame = {
    require(aShare > 0 && aShare < bShare && bShare < 1,
      "need 0 < aShare < bShare < 1")
    val session = df.sparkSession
    import session.implicits._
    val parts = df.select(col(entityCol).as("entity"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(col("__v").desc, col("entity"))
      .sortWithinPartitions(col("__v").desc, col("entity"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__vd", col("__v").cast("decimal(38,12)"))
      .localCheckpoint(eager = true)
    val sums = parts.groupBy(col("__pid"))
      .agg(sum(col("__vd")).as("__s"))
      .collect().sortBy(_.getInt(0))
    var running = BigDecimal(0)
    val offsetRows = sums.map { r =>
      val here = running
      running += BigDecimal(r.getDecimal(1))
      (r.getInt(0), here.bigDecimal)
    }
    val total = running.toDouble
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__offset"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__v").desc, col("entity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(offsetsDf, Seq("__pid"))
      .withColumn("cum_share",
        round((col("__offset") + sum(col("__vd")).over(w)).cast("double") /
          lit(total), 6))
      .select(col("entity"), col("__v").as("value"), col("cum_share"),
        when(col("cum_share") <= aShare, "A")
          .when(col("cum_share") <= bShare, "B")
          .otherwise("C").as("abc_class"))
      .orderBy(col("value").desc, col("entity"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * intake-profiling face next to [[columnProfile]]: which fields move
    * together (and which "independent" features aren't). ONE aggregate
    * pass computes all moments (n, Σx, Σxy, Σx² for every pair), each
    * quantized to DECIMAL(38,12) so r is partition-invariant and
    * engine-replayable; the r algebra runs on the one moments row.
    * Rows with a null in EITHER column of a pair are dropped from that
    * pair (pairwise deletion, per-pair n). Returns one row per pair
    * (col_a, col_b, n, r), col_a < col_b by position, r rounded to
    * 6 dp (null when either column is constant).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val session = df.sparkSession
    import session.implicits._
    val pairsIdx = for {
      i <- cols.indices; j <- i + 1 until cols.size
    } yield (cols(i), cols(j))
    def d(c: Column) = c.cast("decimal(38,12)")
    // pin the PROJECTED columns first (the Quantiles.exact rule: an
    // unpinned probe would re-run arbitrary upstream joins/explodes
    // just to buy k null counts — assortativity feeds this a
    // two-join pipeline); k doubles per row, so the pin is narrow
    val dfp = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .localCheckpoint(true)
    // dispatch (the exactByKey device): the per-row decimal sums are
    // the whole cost (~37 BigDecimal folds/row for 4 columns under
    // pairwise deletion), but pairwise deletion only DIFFERS from
    // listwise when a column actually holds nulls — probe once, and
    // the null-free common case shares per-COLUMN moments (k·2 + C(k,2)
    // sums instead of C(k,2)·5: 15 vs 36 at k=4, same exact answer)
    val nullFree = dfp.select(
      cols.map(c => count(when(col(c).isNull, 1)).as(c)): _*)
      .head().toSeq.forall(_ == 0L)
    val aggs =
      if (nullFree) {
        val perCol = cols.zipWithIndex.flatMap { case (c, i) =>
          val x = col(c).cast("double")
          Seq(sum(d(x)).as(s"__s_$i"), sum(d(x * x)).as(s"__ss_$i"))
        }
        val perPair = pairsIdx.zipWithIndex.map { case ((a, b), p) =>
          sum(d(col(a).cast("double") * col(b).cast("double")))
            .as(s"__sxy$p")
        }
        (count(lit(1)).as("__nn") +: perCol) ++ perPair
      } else pairsIdx.zipWithIndex.flatMap { case ((a, b), p) =>
        val x = col(a).cast("double"); val y = col(b).cast("double")
        val both = x.isNotNull && y.isNotNull
        val xg = when(both, x); val yg = when(both, y)
        Seq(
          count(when(both, lit(1))).as(s"__n$p"),
          sum(d(xg)).as(s"__sx$p"), sum(d(yg)).as(s"__sy$p"),
          sum(d(xg * xg)).as(s"__sxx$p"), sum(d(yg * yg)).as(s"__syy$p"),
          sum(d(xg * yg)).as(s"__sxy$p"))
      }
    // the DECIMAL moment sums are ~15-36 BigDecimal folds per row and
    // run map-side of the global aggregation — on a single-row-group
    // local file that is ONE task (guide §2.5); fan the pinned narrow
    // frame out first (no-op at scale). Order-free: every term is an
    // exact DECIMAL(38,12) sum.
    val m0 = Scale.fanOut(dfp).groupBy().agg(aggs.head, aggs.tail: _*)
    // null-free path: alias the shared moments into the per-pair names
    // the readout below expects — the algebra is one code path
    val m = (if (nullFree) {
      val aliased = pairsIdx.zipWithIndex.flatMap { case ((a, b), p) =>
        val i = cols.indexOf(a); val j = cols.indexOf(b)
        Seq(col("__nn").as(s"__n$p"),
          col(s"__s_$i").as(s"__sx$p"), col(s"__s_$j").as(s"__sy$p"),
          col(s"__ss_$i").as(s"__sxx$p"), col(s"__ss_$j").as(s"__syy$p"),
          col(s"__sxy$p"))
      }
      m0.select(aliased: _*)
    } else m0).localCheckpoint(true)
    val perPair = pairsIdx.zipWithIndex.map { case ((a, b), p) =>
      val n = col(s"__n$p").cast("double")
      val sx = col(s"__sx$p").cast("double")
      val sy = col(s"__sy$p").cast("double")
      val cov = n * col(s"__sxy$p").cast("double") - sx * sy
      val vx = n * col(s"__sxx$p").cast("double") - sx * sx
      val vy = n * col(s"__syy$p").cast("double") - sy * sy
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n$p").as("n"),
        when(vx > 0 && vy > 0,
          round(cov / sqrt(vx) / sqrt(vy), 6)).as("r"))
    }
    perPair.reduce(_.unionByName(_)).orderBy(col("col_a"), col("col_b"))
  }

  /** Chi-square test of independence between two categorical columns
    * (Pearson 1900): contingency counts, expected cell = row·col/N,
    * `chi2 = Σ (obs − exp)²/exp` with dof = (r−1)(c−1) — "does order
    * priority actually vary by market segment". Returns one row
    * (n, n_a, n_b, dof, chi2), chi2 rounded to 6 dp; cell terms
    * quantize to DECIMAL(38,12) (partition-invariant fold). Null
    * categories are dropped. The expected-count grid is dense: a
    * (segment, priority) pair the data never produced still carries
    * its expected mass — omitting it understates the statistic.
    *
    * Shape: one contingency aggregate (cells-sized), marginals re-agg
    * the pinned cell frame, the dense grid is marginal×marginal
    * (cells-bounded), observed counts left-join onto it.
    */
  def chiSquareIndependence(df: DataFrame, colA: String,
      colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true) // consumers: both marginals + the grid join
    val ma = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__rb"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val grid = ma.crossJoin(mb) // (n_a × n_b)-sized: category grids
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .withColumn("__N", sum(col("__o")).over(wAll))
      .withColumn("__e",
        col("__ra") * col("__rb") / col("__N").cast("double"))
      .withColumn("__chi",
        ((col("__o") - col("__e")) * (col("__o") - col("__e")) /
          col("__e")).cast("decimal(38,12)"))
    grid.agg(
        max(col("__N")).as("n"),
        countDistinct(col("__a")).as("n_a"),
        countDistinct(col("__b")).as("n_b"),
        sum(col("__chi")).as("__c"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        round(col("__c").cast("double"), 6).as("chi2"),
        // Cramér's V = sqrt((chi2/N) / min(r-1, c-1)) — the [0,1]
        // effect size that makes chi2 comparable across table sizes;
        // null for a degenerate (single-category) axis
        when(least(col("n_a"), col("n_b")) > 1,
          round(sqrt((col("__c").cast("double") / col("n").cast("double")) /
            (least(col("n_a"), col("n_b")) - 1).cast("double")), 6))
          .as("cramers_v"))
  }

  /** Benford first-digit audit (Benford 1938; the fraud/data-quality
    * screen): observed first-significant-digit distribution of a
    * positive numeric column vs the Benford expectation
    * `p(d) = log10(1 + 1/d)`, with the chi-square statistic
    * `Σ (n_d - N·p_d)² / (N·p_d)` repeated on every row. Fabricated or
    * mis-joined numeric data rarely survives this test; conforming
    * data (spanning several orders of magnitude) hugs it.
    *
    * The first digit comes from the DECIMAL(38,12) string form, not
    * from floor(log10): the log path misclassifies exact powers of 10
    * when log10 lands at 2.9999…, and decimal-string extraction is
    * engine-portable by construction. Contract: values are read at
    * 12-dp / 26-integer-digit precision — a value within 5e-13 of a
    * power of ten classifies with the rounded form, magnitudes below
    * 5e-13 round to zero and drop, and magnitudes ≥ 1e26 are out of
    * range. Non-positive and null values are dropped (Benford is
    * defined on positive magnitudes).
    *
    * Returns (digit 1..9, n, observed_p, expected_p, chi2) — digits
    * the data never produced still appear with n = 0 (they carry
    * chi-square mass). One count aggregate over the data; everything
    * after is 9-row algebra.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val session = df.sparkSession
    val digits = df
      .select(col(valueCol).cast("decimal(38,12)").as("__v"))
      .filter(col("__v") > 0)
      .select(regexp_extract(col("__v").cast("string"), "[1-9]", 0)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spine = session.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val expP = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    spine.join(digits, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__N", sum(col("n")).over(wAll))
      .withColumn("__exp", col("__N") * expP)
      .withColumn("__chi",
        ((col("n") - col("__exp")) * (col("n") - col("__exp")) /
          col("__exp")).cast("decimal(38,12)"))
      .select(col("digit"), col("n"),
        round(col("n") / col("__N").cast("double"), 6).as("observed_p"),
        round(expP, 6).as("expected_p"),
        round(sum(col("__chi")).over(wAll).cast("double"), 6).as("chi2"))
      .orderBy(col("digit"))
  }

  /** Mutual information between two categorical columns (Shannon 1948;
    * Cover & Thomas ch. 2) — the feature-relevance / redundancy readout
    * beside [[chiSquareIndependence]]: where chi-square asks "are these
    * independent", MI says HOW MANY NATS one column tells you about the
    * other, and NMI (`MI / √(H(X)·H(Y))`, Strehl & Ghosh 2002) rescales
    * it to [0,1] so columns with different cardinalities compare. The
    * standard screen for "does `source` already encode `lang`" before
    * training on either.
    *
    * Returns one row (n, n_a, n_b, h_a, h_b, h_ab, mi, nmi), natural
    * log, 6 dp; a degenerate axis (single category, H = 0) yields null
    * nmi. Every entropy term `p·ln p` quantizes to DECIMAL(38,12)
    * before summing — order-free exact addition, each double op
    * replayable from the cell counts.
    *
    * 100 TB shape: ONE contingency aggregation (map-side combined)
    * collapses the corpus to the category grid; marginals, N and all
    * three entropies are grid-sized re-aggregations of that
    * checkpointed frame. Nothing data-sized moves after the first pass.
    */
  def mutualInformation(df: DataFrame, colA: String,
      colB: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true) // category-grid-sized; consumers: N +
        // both marginals + the joint entropy
    val nRow = cells.agg(sum(col("__o")).as("__N"))
    def ent(grain: DataFrame, cnt: Column): DataFrame = {
      val p = cnt.cast("double") / col("__N").cast("double")
      grain.crossJoin(nRow) // 1-row broadcast
        .agg((-sum(d12(p * log(p)))).cast("double").as("__h"))
    }
    val ma = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__c"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val counts = cells.agg(sum(col("__o")).as("n"),
      countDistinct(col("__a")).as("n_a"),
      countDistinct(col("__b")).as("n_b"))
    counts
      .crossJoin(ent(ma, col("__c")).withColumnRenamed("__h", "__ha"))
      .crossJoin(ent(mb, col("__c")).withColumnRenamed("__h", "__hb"))
      .crossJoin(ent(cells, col("__o")).withColumnRenamed("__h", "__hab"))
      .select(col("n"), col("n_a"), col("n_b"),
        round(col("__ha"), 6).as("h_a"),
        round(col("__hb"), 6).as("h_b"),
        round(col("__hab"), 6).as("h_ab"),
        round(col("__ha") + col("__hb") - col("__hab"), 6).as("mi"),
        when(col("__ha") > 0 && col("__hb") > 0,
          round((col("__ha") + col("__hb") - col("__hab")) /
            sqrt(col("__ha") * col("__hb")), 6)).as("nmi"))
  }

  /** Sample-ratio-mismatch check (Fabijan et al. 2019, "Diagnosing
    * sample ratio mismatch in online controlled experiments") — the
    * guardrail every A/B readout must pass BEFORE anyone reads the
    * metric: are the realized arm counts consistent with the designed
    * allocation? A failed SRM means broken randomization (bot
    * filtering, redirect loss, logging skew) and invalidates the
    * experiment regardless of the lift. `expected` maps each arm to
    * its design weight (any positive scale — normalized internally);
    * rows outside the declared arms are ignored (they are a different
    * bug, surfaced by the per-arm counts themselves).
    *
    * Chi-square goodness of fit `Σ (n_i − N·p_i)²/(N·p_i)` on k = |arms|
    * cells, dof = k−1; p via the Wilson-Hilferty (1931) cube-root
    * normal approximation of the chi-square tail with the
    * Abramowitz-Stegun 7.1.26 polynomial for Φ — closed-form, engine-
    * replayable. Returns one row per declared arm (arm, n, share,
    * expected_share, expected_n, chi2, dof, p_value), chi2/dof/p
    * repeated on every row (the [[benford]] shape), ordered by arm.
    *
    * 100 TB shape: ONE count aggregation to the arm grain; everything
    * after is k-row algebra (chi terms DECIMAL(38,12)-quantized, the
    * all-rows window rides the k-row frame only).
    */
  def srmCheck(df: DataFrame, groupCol: String,
      expected: Map[String, Double]): DataFrame = {
    require(expected.size >= 2, "srmCheck: need >= 2 declared arms")
    require(expected.values.forall(_ > 0),
      "srmCheck: arm weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wsum = expected.values.sum
    val k = expected.size
    val obs = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("arm"))
      .filter(col("arm").isin(expected.keys.toSeq: _*))
      .groupBy(col("arm")).agg(count(lit(1)).as("n"))
    val spine = expected.toSeq.sortBy(_._1).toDF("arm", "__w")
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val dof = (k - 1).toDouble
    val g = spine.join(obs, Seq("arm"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__N", sum(col("n")).over(wAll)) // k-row frame
      .withColumn("__p", col("__w") / lit(wsum))
      .withColumn("__e", col("__N").cast("double") * col("__p"))
      .withColumn("__chi",
        ((col("n") - col("__e")) * (col("n") - col("__e")) /
          col("__e")).cast("decimal(38,12)"))
      .withColumn("chi2", sum(col("__chi")).over(wAll).cast("double"))
    // Wilson-Hilferty: chi2_k ≈ k·(z·sqrt(2/(9k)) + 1 − 2/(9k))³ →
    // upper tail at z = ((chi2/k)^(1/3) − (1 − 2/(9k))) / sqrt(2/(9k))
    val c = 2.0 / (9.0 * dof)
    val z = (pow(col("chi2") / lit(dof), lit(1.0 / 3.0)) -
      lit(1.0 - c)) / lit(math.sqrt(c))
    // A&S 7.1.26 upper normal tail at |z| (the polynomial is only
    // valid for non-negative arguments); z < 0 folds back by symmetry
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    val tail = exp(-az * az / lit(2.0)) / lit(math.sqrt(2.0 * math.Pi)) *
      poly
    val p = when(z >= 0, tail).otherwise(lit(1.0) - tail)
    g.select(col("arm"), col("n"),
        round(col("n") / col("__N").cast("double"), 6).as("share"),
        round(col("__p"), 6).as("expected_share"),
        round(col("__e"), 6).as("expected_n"),
        round(col("chi2"), 6).as("chi2"),
        lit(k - 1).cast("int").as("dof"),
        when(col("__N") > 0,
          round(least(lit(1.0), greatest(lit(0.0), p)), 6))
          .as("p_value"))
      .orderBy(col("arm"))
  }

  /** Cochran-Armitage trend test (Cochran 1954; Armitage 1955): is a
    * BINARY outcome monotonically associated with an ORDERED exposure?
    * The dose-response companion to [[chiSquareIndependence]] — chi-
    * square spends dof on every cell pattern; the trend test pools all
    * its power into the ordered alternative, which is what "does
    * conversion fall with latency bucket" actually asks. Scores are
    * the numeric exposure values themselves.
    *
    *   z = (N·Σsᵢyᵢ − R·Σsᵢ) / √( (R/N)·(1−R/N)·(N·Σsᵢ² − (Σsᵢ)²) )
    *
    * (per-row form; R = Σy, N = rows), two-sided p via the A&S 7.1.26
    * normal tail. Returns one row (n, n_pos, n_levels, z, p_value),
    * 6 dp; a degenerate input (all-same exposure or all-same outcome)
    * yields null z/p.
    *
    * 100 TB shape: ONE moments aggregation (count, Σy, Σs, Σs², Σsy,
    * distinct-score count — DECIMAL(38,12)-quantized, map-side
    * combined); the z algebra runs on the 1-row collect.
    */
  def cochranArmitage(df: DataFrame, scoreCol: String,
      outcomeCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base = df.select(col(scoreCol).cast("double").as("__s"),
        col(outcomeCol).cast("double").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val m = base.agg(count(lit(1)).as("n"),
        sum(d12(col("__y"))).as("sy"),
        sum(d12(col("__s"))).as("ss"),
        sum(d12(col("__s") * col("__s"))).as("sss"),
        sum(d12(col("__s") * col("__y"))).as("ssy"),
        countDistinct(col("__s")).as("k"))
      .head()
    val n = m.getLong(0)
    require(n > 0, "cochranArmitage: empty input after null filtering")
    def dv(i: Int) = m.getDecimal(i).doubleValue()
    val (r, ss, sss, ssy) = (dv(1), dv(2), dv(3), dv(4))
    val kLevels = m.getLong(5)
    val nn = n.toDouble
    val num = nn * ssy - r * ss
    val den2 = (r / nn) * (1.0 - r / nn) * (nn * sss - ss * ss)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (z, p) =
      if (den2 > 0) {
        val zv = num / math.sqrt(den2)
        val ax = math.abs(zv)
        // Abramowitz-Stegun 7.1.26 upper normal tail
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) *
          poly
        (Some(r6(zv)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    Seq((n, r.toLong, kLevels, z, p))
      .toDF("n", "n_pos", "n_levels", "z", "p_value")
  }

  /** Hill tail-index estimator (Hill 1975) over the top-k order
    * statistics of a positive value column:
    * `γ̂ = (1/k) Σ_{i=1..k} ln(x_(i) / x_(k+1))` with `x_(1) ≥ …` the
    * descending order statistics and `x_(k+1)` the threshold; `α̂ =
    * 1/γ̂` is the Pareto tail exponent. The heavy-tail diagnostic
    * behind "can I trust a mean here" — γ̂ near/above 1 means infinite
    * variance territory (web degrees, doc lengths, spend).
    *
    * Ties at the threshold are safe: a term with `x = x_(k+1)` is
    * ln(1) = 0, so the sum over all k+1 retained rows equals the sum
    * over the k largest regardless of which tied row the limit kept.
    * Log terms quantize to DECIMAL(38,12) (order-invariant sum);
    * readouts round to 6 dp. Returns one row
    * (n, k, threshold, gamma_hat, alpha_hat); alpha_hat is null when
    * the top k+1 values are all equal (γ̂ = 0).
    *
    * 100 TB shape: `orderBy(desc).limit(k+1)` compiles to
    * TakeOrderedAndProject — per-partition top-(k+1) heaps merged on
    * the driver, no global sort shuffle; k is bounded at 100k. One
    * full-scan count rides beside it.
    */
  def hillTail(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, "hillTail: k must be in 1..100000")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull && col("__x") > 0)
    val n = base.count()
    require(n > k + 1,
      s"hillTail: need more than ${k + 1} positive values, got $n")
    val top = base.orderBy(col("__x").desc).limit(k + 1)
      .localCheckpoint(eager = true) // (k+1)-row frame; two consumers
    val thr = top.agg(min(col("__x")).as("__thr"))
    val m = top.crossJoin(broadcast(thr))
      .agg(max(col("__thr")).as("thr"),
        sum(when(col("__x") > col("__thr"),
            log(col("__x") / col("__thr"))).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("sl"))
      .head()
    val gamma = m.getDecimal(1).doubleValue() / k.toDouble
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n, k.toLong, r6(m.getDouble(0)), r6(gamma),
      if (gamma > 0) Some(r6(1.0 / gamma)) else None))
      .toDF("n", "k", "threshold", "gamma_hat", "alpha_hat")
  }

  /** Robust-location summary: mean, trimmed mean (values inside the
    * [trim, 1−trim] exact quantiles, thresholds INCLUSIVE), winsorized
    * mean (values clamped to those thresholds —
    * [[graft.ops.Curation.winsorize]]'s readout face), median, and MAD
    * (median absolute deviation) — the one-row "can I trust the mean"
    * card for a heavy-tailed column ([[hillTail]] says how heavy; this
    * says what to use instead). All thresholds come from the
    * distributed exact type-7 quantile machine; sums are
    * DECIMAL(38,12)-quantized. Returns one row
    * (n, mean, trimmed_mean, winsorized_mean, median, mad), 6 dp.
    *
    * 100 TB shape: two quantile passes (value grain + deviation grain)
    * + two moments aggregations; thresholds ride as plan literals.
    */
  def robustLocation(df: DataFrame, valueCol: String,
      trim: Double = 0.05): DataFrame = {
    require(trim > 0 && trim < 0.5, "robustLocation: trim in (0, 0.5)")
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base = df.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .localCheckpoint(eager = true) // quantiles + moments + MAD pass
    val qs = graft.ops.Quantiles.exact(base, "__x",
        Seq(trim, 0.5, 1.0 - trim))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    require(qs.nonEmpty, "robustLocation: empty input")
    val (lo, med, hi) = (qs(trim), qs(0.5), qs(1.0 - trim))
    val m = base.agg(count(lit(1)).as("n"),
        sum(d12(col("__x"))).as("s"),
        count(when(col("__x") >= lo && col("__x") <= hi, lit(1)))
          .as("tn"),
        sum(d12(when(col("__x") >= lo && col("__x") <= hi, col("__x"))
          .otherwise(lit(0.0)))).as("ts"),
        sum(d12(least(greatest(col("__x"), lit(lo)), lit(hi))))
          .as("ws"))
      .head()
    val n = m.getLong(0)
    val tn = m.getLong(2)
    require(tn > 0, "robustLocation: trim removed everything")
    val mad = graft.ops.Quantiles.exact(
        base.select(abs(col("__x") - lit(med)).as("__d")), "__d",
        Seq(0.5))
      .collect()(0).getDouble(1)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n,
      r6(m.getDecimal(1).doubleValue() / n.toDouble),
      r6(m.getDecimal(3).doubleValue() / tn.toDouble),
      r6(m.getDecimal(4).doubleValue() / n.toDouble),
      r6(med), r6(mad)))
      .toDF("n", "mean", "trimmed_mean", "winsorized_mean", "median",
        "mad")
  }

  /** Chapman capture-recapture estimate (Chapman 1951, the
    * bias-corrected Lincoln-Petersen): from two overlapping samples of
    * a closed population, `N̂ = (n1+1)(n2+1)/(m+1) − 1` with Seber's
    * variance — the "how many exist that we haven't seen" estimator
    * (total active users from two observation windows, crawl coverage
    * from two crawl passes, dedup-universe size from two shards).
    * Returns one row (n1, n2, m_overlap, n_hat, se, ci_lo, ci_hi),
    * 6 dp, CI at 95%; a zero overlap still estimates (the +1 terms),
    * with the honest huge variance.
    *
    * 100 TB shape: two distinct-key collapses + one key-keyed join for
    * the overlap; algebra on three counts.
    */
  def captureRecapture(sampleA: DataFrame, sampleB: DataFrame,
      idCol: String): DataFrame = {
    val spark = sampleA.sparkSession
    import spark.implicits._
    val a = sampleA.select(col(idCol).as("__id"))
      .filter(col("__id").isNotNull).distinct()
      .localCheckpoint(eager = true) // count + overlap
    val b = sampleB.select(col(idCol).as("__id"))
      .filter(col("__id").isNotNull).distinct()
      .localCheckpoint(eager = true)
    val n1 = a.count()
    val n2 = b.count()
    require(n1 > 0 && n2 > 0, "captureRecapture: empty sample")
    val m = a.join(b, Seq("__id")).count()
    val (d1, d2, dm) = (n1.toDouble, n2.toDouble, m.toDouble)
    val nHat = (d1 + 1.0) * (d2 + 1.0) / (dm + 1.0) - 1.0
    val varN = (d1 + 1.0) * (d2 + 1.0) * (d1 - dm) * (d2 - dm) /
      ((dm + 1.0) * (dm + 1.0) * (dm + 2.0))
    val se = math.sqrt(varN)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n1, n2, m, r6(nHat), r6(se),
      r6(nHat - 1.959963984540054 * se),
      r6(nHat + 1.959963984540054 * se)))
      .toDF("n1", "n2", "m_overlap", "n_hat", "se", "ci_lo", "ci_hi")
  }

  /** Two-proportion z-test — the plain conversion-rate A/B readout
    * (the [[srmCheck]]/[[msprtTest]] family's fixed-horizon staple):
    * pooled-SE z with the A&S 7.1.26 two-sided p, plus the unpooled
    * 95% CI on the rate difference. Labels sort; exactly two required.
    * Returns one row (n_a, x_a, n_b, x_b, rate_a, rate_b, diff, z,
    * p_value, ci_lo, ci_hi), 6 dp; z/p null when the pooled rate is
    * degenerate (0 or 1).
    *
    * 100 TB shape: ONE grouped count aggregation; algebra on the
    * 2-row collect.
    */
  def twoProportionTest(df: DataFrame, groupCol: String,
      isSuccess: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = df
      .select(col(groupCol).cast("string").as("__g"),
        when(isSuccess, lit(1L)).otherwise(lit(0L)).as("__s"))
      .filter(col("__g").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("x"))
      .collect()
    val labels = m.map(_.getString(0)).sorted
    require(labels.length == 2,
      s"twoProportionTest: need exactly 2 groups, got " +
        labels.mkString(","))
    def row(l: String) = m.find(_.getString(0) == l).get
    val (na, xa) = (row(labels(0)).getLong(1), row(labels(0)).getLong(2))
    val (nb, xb) = (row(labels(1)).getLong(1), row(labels(1)).getLong(2))
    require(na > 0 && nb > 0, "twoProportionTest: empty group")
    val (pa, pb) = (xa.toDouble / na.toDouble, xb.toDouble / nb.toDouble)
    val diff = pb - pa
    val pool = (xa + xb).toDouble / (na + nb).toDouble
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val (z, p) =
      if (pool > 0 && pool < 1) {
        val se = math.sqrt(pool * (1.0 - pool) *
          (1.0 / na.toDouble + 1.0 / nb.toDouble))
        val zv = diff / se
        val ax = math.abs(zv)
        val tt = 1.0 / (1.0 + 0.2316419 * ax)
        val poly = tt * (0.319381530 + tt * (-0.356563782 +
          tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))))
        val tail = math.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.Pi) *
          poly
        (Some(r6(zv)), Some(r6(math.min(1.0, 2.0 * tail))))
      } else (None, None)
    val seU = math.sqrt(pa * (1.0 - pa) / na.toDouble +
      pb * (1.0 - pb) / nb.toDouble)
    Seq((na, xa, nb, xb, r6(pa), r6(pb), r6(diff), z, p,
      r6(diff - 1.959963984540054 * seU),
      r6(diff + 1.959963984540054 * seU)))
      .toDF("n_a", "x_a", "n_b", "x_b", "rate_a", "rate_b", "diff",
        "z", "p_value", "ci_lo", "ci_hi")
  }

  /** Histogram-based outlier score (HBOS, Goldstein & Dengel 2012):
    * per feature, equal-width bins over the observed [min, max]; a
    * row's score is `Σ_f −ln(count_bin/n)` — rare corners of the
    * feature space score high. The linear-time tabular outlier
    * detector (each feature independent — it misses correlation
    * outliers, stated; [[graft.ops.Similarity.dbscan]] is the density
    * face). Returns the topK rows by (score desc, id):
    * (id, score, then one `<col>_bin` per feature), 6 dp.
    *
    * 100 TB shape: one min/max aggregate (collected as plan literals),
    * one count aggregate per feature at BIN grain (bins-bounded),
    * broadcast-joined back; the top-k is TakeOrderedAndProject.
    */
  def hbos(df: DataFrame, idCol: String, cols: Seq[String],
      bins: Int = 20, topK: Int = 100): DataFrame = {
    require(cols.nonEmpty && cols.size <= 12, "hbos: need 1..12 columns")
    require(bins >= 2 && bins <= 1000, "hbos: bins in 2..1000")
    require(topK >= 1, "hbos: topK must be >= 1")
    val base = df
      .select(col(idCol).as("id") +:
        cols.map(c => col(c).cast("double").as(c)): _*)
      .filter(col("id").isNotNull &&
        cols.map(c => col(c).isNotNull).reduce(_ && _))
      .localCheckpoint(eager = true) // bounds + per-feature counts + scan
    val mmAggs = count(lit(1)).as("n") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"__lo_$c"),
        max(col(c)).as(s"__hi_$c")))
    val mm = base.agg(mmAggs.head, mmAggs.tail: _*).head()
    val n = mm.getLong(0)
    require(n > 0, "hbos: empty input after null filtering")
    val bounds = cols.map { c =>
      val lo = mm.getDouble(mm.fieldIndex(s"__lo_$c"))
      val hi = mm.getDouble(mm.fieldIndex(s"__hi_$c"))
      require(hi > lo, s"hbos: constant column '$c' carries no signal")
      c -> (lo, hi)
    }.toMap
    def binOf(c: String): Column = {
      val (lo, hi) = bounds(c)
      least(lit(bins - 1), floor((col(c) - lit(lo)) /
        lit((hi - lo) / bins.toDouble)).cast("int"))
    }
    val binned = base.select(col("id") +:
      cols.map(c => binOf(c).as(s"${c}_bin")): _*)
      .localCheckpoint(eager = true) // per-feature counts + the scan
    val withDens = cols.foldLeft(binned) { (acc, c) =>
      val cnt = binned.groupBy(col(s"${c}_bin"))
        .agg(count(lit(1)).as(s"__cnt_$c"))
      acc.join(broadcast(cnt), Seq(s"${c}_bin"))
    }
    // per-ROW sum in fixed column order (an expression tree, not an
    // aggregation) — deterministic without quantization
    val score = cols.map(c =>
      -log(col(s"__cnt_$c").cast("double") / lit(n.toDouble)))
      .reduce(_ + _)
    withDens
      .withColumn("score", round(score, 6))
      .select(col("id") +: col("score") +:
        cols.map(c => col(s"${c}_bin")): _*)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial moment matching,
    * Robbins 1956 / the James-Stein idea for proportions): per-key
    * success rates `x/n` are pulled toward the population with a Beta
    * prior fitted by moments over the per-key raw rates —
    * `α+β = m(1−m)/v − 1`, `α = m(α+β)` — and each key reads
    * `(x+α)/(n+α+β)`. The fix for "this item has 1/1 = 100% CTR":
    * thin keys shrink hard, fat keys barely move. Returns one row per
    * key: (key, n, x, raw_rate, shrunk_rate, alpha, beta), 6 dp.
    * Degenerate populations (zero/over-dispersed variance → no valid
    * Beta) fail loudly.
    *
    * 100 TB shape: one key aggregate, two moments passes over the
    * pinned KEY-sized frame (squared deviations DECIMAL-quantized),
    * prior algebra on the 1-row collect, map-side shrink readout.
    */
  def ebShrinkRates(df: DataFrame, keyCol: String,
      isSuccess: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val perKey = df
      .select(col(keyCol).as("key"),
        when(isSuccess, lit(1L)).otherwise(lit(0L)).as("__s"))
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("x"))
      .withColumn("raw",
        col("x").cast("double") / col("n").cast("double"))
      .localCheckpoint(eager = true) // key-sized; moments + readout
    val m1 = perKey.agg(count(lit(1)).as("k"),
      sum(d12(col("raw"))).as("sr")).head()
    val kCnt = m1.getLong(0)
    require(kCnt >= 2, s"ebShrinkRates: need >= 2 keys, got $kCnt")
    val mean = m1.getDecimal(1).doubleValue() / kCnt.toDouble
    val m2 = perKey.agg(
      sum(d12((col("raw") - lit(mean)) * (col("raw") - lit(mean))))
        .as("sv")).head()
    val v = m2.getDecimal(0).doubleValue() / kCnt.toDouble
    require(v > 0 && v < mean * (1.0 - mean),
      s"ebShrinkRates: rate variance $v outside (0, m(1-m)) — no " +
        "valid Beta prior (all-equal or over-dispersed rates)")
    val ab = mean * (1.0 - mean) / v - 1.0
    val alpha = mean * ab
    val beta = ab - alpha
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    perKey
      .select(col("key"), col("n"), col("x"),
        round(col("raw"), 6).as("raw_rate"),
        round((col("x").cast("double") + lit(alpha)) /
          (col("n").cast("double") + lit(ab)), 6).as("shrunk_rate"),
        lit(r6(alpha)).as("alpha"), lit(r6(beta)).as("beta"))
      .orderBy(col("key"))
  }

  /** Gumbel extreme-value fit over block maxima (Gumbel 1958, method
    * of moments): block the data by `blockCol`, take each block's max,
    * and fit `β = s·√6/π`, `μ = m − γ·β` (γ = Euler-Mascheroni) on the
    * maxima's mean/population-std — the classic "how bad can a day
    * get" tail model, with return levels
    * `x_T = μ − β·ln(−ln(1 − 1/T))` for T = 30 and 365 blocks. The
    * moments complement [[hillTail]]'s polynomial-tail exponent: Hill
    * asks how heavy the tail is, Gumbel what a 1-in-T block extreme
    * looks like. Returns one row
    * (n_blocks, mu, beta, level_30, level_365), 6 dp.
    *
    * 100 TB shape: one block-keyed max aggregate, one moments
    * aggregate over the block-sized frame (squared deviations
    * DECIMAL(38,12)-quantized), algebra on the 1-row collect.
    */
  def gumbelFit(df: DataFrame, blockCol: Column,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val maxima = df
      .select(blockCol.as("__b"), col(valueCol).cast("double").as("__x"))
      .filter(col("__b").isNotNull && col("__x").isNotNull)
      .groupBy(col("__b")).agg(max(col("__x")).as("__m"))
    val m1 = maxima.agg(count(lit(1)).as("n"),
      sum(d12(col("__m"))).as("sm")).head()
    val n = m1.getLong(0)
    require(n >= 2, s"gumbelFit: need >= 2 blocks, got $n")
    val mean = m1.getDecimal(1).doubleValue() / n.toDouble
    val m2 = maxima.agg(
      sum(d12((col("__m") - lit(mean)) * (col("__m") - lit(mean))))
        .as("sd2")).head()
    val sd = math.sqrt(m2.getDecimal(0).doubleValue() / n.toDouble)
    val euler = 0.5772156649015329
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - euler * beta
    def lvl(tt: Double) = mu - beta * math.log(-math.log(1.0 - 1.0 / tt))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((n, r6(mu), r6(beta), r6(lvl(30.0)), r6(lvl(365.0))))
      .toDF("n_blocks", "mu", "beta", "level_30", "level_365")
  }

  /** Market-concentration readout of a per-entity value distribution:
    * Herfindahl-Hirschman index `HHI = 10000 · Σ sᵢ²` (sᵢ = entity
    * share of the total) plus the CR-4 / CR-8 concentration ratios
    * (top-4 / top-8 entities' combined share). The one-row "is this
    * corpus/revenue/source mix dominated by a few players" audit
    * beside [[abcClassify]]'s per-entity banding and
    * [[keySkewProfile]]'s shuffle-planning face.
    *
    * Entity totals sum in DECIMAL(38,12) (exact); each squared share
    * quantizes to DECIMAL(38,12) before the global sum (order-
    * invariant). Returns one row
    * (n_entities, total, hhi, cr4, cr8), 6 dp.
    *
    * 100 TB shape: one entity-keyed aggregate, one 1-row total
    * broadcast back, one entity-sized fold for HHI; the CR ratios ride
    * a TakeOrderedAndProject top-8 (no global sort).
    */
  def concentration(df: DataFrame, entityCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val per = df
      .select(col(entityCol).as("__e"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__e").isNotNull && col("__v").isNotNull)
      .groupBy(col("__e")).agg(sum(d12(col("__v"))).as("__ev"))
      .localCheckpoint(eager = true) // entity-sized; three consumers
    val tot = per.agg(sum(col("__ev")).as("__t"),
      count(lit(1)).as("__n"))
    val share = col("__ev").cast("double") / col("__t").cast("double")
    val hhiRow = per.crossJoin(broadcast(tot))
      .agg(max(col("__t")).as("t"), max(col("__n")).as("n"),
        sum(d12(share * share)).as("s2"))
      .head()
    // empty input leaves every max() NULL — read the count first so
    // the intended message surfaces instead of an NPE on the decimal
    val nEnt = if (hhiRow.isNullAt(1)) 0L else hhiRow.getLong(1)
    require(nEnt > 0,
      "concentration: need a non-empty, non-zero-total distribution")
    val total = hhiRow.getDecimal(0).doubleValue()
    require(total != 0.0,
      "concentration: need a non-empty, non-zero-total distribution")
    val top8 = per.orderBy(col("__ev").desc).limit(8)
      .collect().map(_.getDecimal(1)) // ≤ 8 rows
    def crK(kk: Int) =
      top8.take(kk).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        .doubleValue() / total
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    Seq((nEnt, r6(total),
      r6(10000.0 * hhiRow.getDecimal(2).doubleValue()),
      r6(crK(4)), r6(crK(8))))
      .toDF("n_entities", "total", "hhi", "cr4", "cr8")
  }

  /** Bayesian two-arm "probability to beat" — the posterior readout an
    * experimenter actually wants next to [[twoProportionTest]]'s
    * frequentist z: with independent uniform-prior Beta posteriors
    * `Beta(1 + conv, 1 + n − conv)` per arm, the probability that the
    * second arm's true rate exceeds the first's,
    * `P(p_b > p_a) = ∫ pdf_b(x)·cdf_a(x) dx`, evaluated on a fixed
    * midpoint grid (deterministic, engine-replayable — no sampling),
    * plus the EXPECTED LOSS of each decision — `exp_loss_a =
    * E[(p_b − p_a)⁺]` (the rate given up if you ship A) and
    * `exp_loss_b = E[(p_a − p_b)⁺]` — the standard Bayesian stopping
    * criterion (ship when the chosen arm's expected loss drops below
    * the care-about threshold; it converges even when the arms are
    * truly equal, where P(best) hovers at 0.5 forever). Same-cell mass
    * pairs contribute 0 to the loss sums (the midpoint convention;
    * bias O(cell²), far below 6 dp at any realistic posterior width).
    * Arms order by label; returns ONE row (group_a, n_a, conv_a,
    * rate_a, group_b, n_b, conv_b, rate_b, prob_b_beats_a,
    * exp_loss_a, exp_loss_b), 6 dp.
    *
    * Grid contract (ENFORCED): the posterior scale is ~√(p(1−p)/n);
    * the default 4,000-point grid resolves it to ~60 points per
    * posterior sd at n = 10k and is 6-dp-accurate for the A/B sizes a
    * Bayesian readout serves. Each arm's exact Beta posterior sd must
    * be ≥ 3 grid cells (3/gridN) or the call FAILS LOUDLY — for
    * n ≫ 10⁶ the posteriors are narrower than the grid and the race
    * silently loses resolution, so use [[twoProportionTest]] (the
    * normal approximation is exact there) or raise `gridN`.
    *
    * Null contract: rows with a null success value are DROPPED, not
    * counted as failures — the same contract as the streaming twin
    * [[graft.streaming.StreamOps.streamingProbBest]], so the
    * documented batch/streaming parity holds on nullable successes.
    *
    * Determinism: the grid masses are exp/ln doubles on identical
    * inputs (cross-engine at 6 dp, the house rule); every SUM over the
    * grid — the two normalizers, the running CDF, the integral — is
    * DECIMAL(38,12)-quantized, so accumulation order cannot move the
    * readout. The running CDF rides ONE unpartitioned ordered window
    * over the gridN-row frame — bounded by construction, stated.
    *
    * 100 TB shape: ONE group-keyed collapse of the input (2-row
    * collect); everything after runs on the constant-size grid frame.
    */
  def probBest(users: DataFrame, groupCol: String, success: Column,
      gridN: Int = 4000): DataFrame = {
    require(gridN >= 100 && gridN <= 20000,
      "probBest: gridN must be in 100..20000")
    val spark = users.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val per = users
      .select(col(groupCol).cast("string").as("__g"),
        success.cast("boolean").as("__s"))
      .filter(col("__g").isNotNull && col("__s").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), count(when(col("__s"), 1)).as("__c"))
      .collect() // 2 rows — group-grain, bounded
    require(per.length == 2,
      s"probBest: need exactly 2 groups, got ${per.length}")
    val srt = per.sortBy(_.getString(0))
    val (ga, na, ca) = (srt(0).getString(0), srt(0).getLong(1),
      srt(0).getLong(2))
    val (gb, nb, cb) = (srt(1).getString(0), srt(1).getLong(1),
      srt(1).getLong(2))
    Seq((ga, na, ca), (gb, nb, cb)).foreach { case (g, n, c) =>
      require(betaSd(n, c) >= 3.0 / gridN,
        s"probBest: arm $g's posterior (n=$n) is narrower than 3 grid " +
          s"cells at gridN=$gridN — raise gridN or use " +
          "twoProportionTest (exact in the normal regime)")
    }
    val grid = spark.range(1, gridN + 1L)
      .select(((col("id").cast("double") - lit(0.5)) /
        lit(gridN.toDouble)).as("__p"))
    def logm(c: Long, f: Long) =
      lit(c.toDouble) * log(col("__p")) +
        lit(f.toDouble) * log(lit(1.0) - col("__p"))
    val g2 = grid.select(col("__p"),
      logm(ca, na - ca).as("__la"), logm(cb, nb - cb).as("__lb"))
    val mx = g2.agg(max(col("__la")).as("__ma"),
      max(col("__lb")).as("__mb"))
    val g3 = g2.crossJoin(broadcast(mx))
      .select(col("__p"),
        exp(col("__la") - col("__ma")).as("__ta"),
        exp(col("__lb") - col("__mb")).as("__tb"))
    // gridN-bounded by construction: the deliberate unpartitioned
    // ordered windows in this operator (prefix CDF + suffix moments).
    // Suffix sums are TOTAL − inclusive prefix — bit-identical to a
    // suffix frame (DECIMAL subtraction is exact) but O(grid) where
    // Spark's UNBOUNDED FOLLOWING frame rescans per row (O(grid²) —
    // 100 s at gridN 20k)
    val wCdf = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    def sufSum(c: Column) =
      (sum(d12(c)).over(wTot) - sum(d12(c)).over(wIncl)).cast("double")
    val g4 = g3
      .withColumn("__cuma",
        coalesce(sum(d12(col("__ta"))).over(wCdf).cast("double"),
          lit(0.0)))
      .withColumn("__sa1", sufSum(col("__ta")))
      .withColumn("__sa2", sufSum(col("__ta") * col("__p")))
      .withColumn("__sb1", sufSum(col("__tb")))
      .withColumn("__sb2", sufSum(col("__tb") * col("__p")))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    g4.agg(
        sum(d12(col("__ta"))).cast("double").as("__za"),
        sum(d12(col("__tb"))).cast("double").as("__zb"),
        sum(d12(col("__tb") *
          (col("__cuma") + col("__ta") / lit(2.0))))
          .cast("double").as("__num"),
        sum(d12(col("__ta") *
          (col("__sb2") - col("__p") * col("__sb1"))))
          .cast("double").as("__ela"),
        sum(d12(col("__tb") *
          (col("__sa2") - col("__p") * col("__sa1"))))
          .cast("double").as("__elb"))
      .select(lit(ga).as("group_a"), lit(na).as("n_a"),
        lit(ca).as("conv_a"),
        lit(r6(ca.toDouble / na.toDouble)).as("rate_a"),
        lit(gb).as("group_b"), lit(nb).as("n_b"), lit(cb).as("conv_b"),
        lit(r6(cb.toDouble / nb.toDouble)).as("rate_b"),
        round(col("__num") / (col("__za") * col("__zb")), 6)
          .as("prob_b_beats_a"),
        round(col("__ela") / (col("__za") * col("__zb")), 6)
          .as("exp_loss_a"),
        round(col("__elb") / (col("__za") * col("__zb")), 6)
          .as("exp_loss_b"))
  }

  /** Exact Beta(1+c, 1+n−c) posterior sd — the [[probBest]] family's
    * grid-resolution rail (a posterior narrower than a few grid cells
    * aliases to one cell and the race silently loses resolution). */
  private[graft] def betaSd(n: Long, c: Long): Double = {
    val a = c.toDouble + 1.0
    val b = (n - c).toDouble + 1.0
    math.sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0)))
  }

  /** The [[probBest]] grid race on four collected counts — shared by
    * the streaming twin ([[graft.streaming.StreamOps.streamingProbBest]]),
    * which holds only (n, conv) per arm in state and needs the readout
    * per micro-batch. Mirrors the in-plan arithmetic EXACTLY: the same
    * midpoint grid doubles, ln/exp term shapes, max shift, and every
    * sum accumulated as 12-dp-quantized decimals in grid order (the
    * window mirror) — `BigDecimal.valueOf(x).setScale(12, HALF_UP)` IS
    * Spark's double→DECIMAL(38,12) cast (the streamingMsprt device),
    * so batch and streaming cannot drift. Returns
    * (prob_b_beats_a, exp_loss_a, exp_loss_b), 6 dp.
    */
  def probBestAlgebra(na: Long, ca: Long, nb: Long, cb: Long,
      gridN: Int = 4000): (Double, Double, Double) = {
    require(gridN >= 100 && gridN <= 20000,
      "probBestAlgebra: gridN must be in 100..20000")
    require(na >= ca && nb >= cb && ca >= 0 && cb >= 0 &&
      na >= 1 && nb >= 1, "probBestAlgebra: need 0 <= conv <= n, n >= 1")
    require(betaSd(na, ca) >= 3.0 / gridN && betaSd(nb, cb) >= 3.0 / gridN,
      s"probBestAlgebra: a posterior is narrower than 3 grid cells at " +
        s"gridN=$gridN — raise gridN or use twoProportionTest")
    import java.math.{BigDecimal => JBD, RoundingMode}
    def q12(x: Double) = JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    val n = gridN
    val ps = Array.tabulate(n)(i => ((i + 1).toDouble - 0.5) / n.toDouble)
    def masses(c: Long, f: Long): Array[Double] = {
      val lm = ps.map(x =>
        c.toDouble * math.log(x) + f.toDouble * math.log(1.0 - x))
      val m = lm.max
      lm.map(x => math.exp(x - m))
    }
    val ta = masses(ca, na - ca)
    val tb = masses(cb, nb - cb)
    val cuma = new Array[Double](n)
    var accA = JBD.ZERO
    for (i <- 0 until n) {
      cuma(i) = accA.doubleValue
      accA = accA.add(q12(ta(i)))
    }
    val za = accA
    def suffix(t: Array[Double], withP: Boolean): Array[Double] = {
      val out = new Array[Double](n)
      var s = JBD.ZERO
      for (i <- n - 1 to 0 by -1) {
        out(i) = s.doubleValue
        s = s.add(q12(if (withP) t(i) * ps(i) else t(i)))
      }
      out
    }
    val sa1 = suffix(ta, withP = false)
    val sa2 = suffix(ta, withP = true)
    val sb1 = suffix(tb, withP = false)
    val sb2 = suffix(tb, withP = true)
    var zb = JBD.ZERO; var num = JBD.ZERO
    var ela = JBD.ZERO; var elb = JBD.ZERO
    for (i <- 0 until n) {
      zb = zb.add(q12(tb(i)))
      num = num.add(q12(tb(i) * (cuma(i) + ta(i) / 2.0)))
      ela = ela.add(q12(ta(i) * (sb2(i) - ps(i) * sb1(i))))
      elb = elb.add(q12(tb(i) * (sa2(i) - ps(i) * sa1(i))))
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val den = za.doubleValue * zb.doubleValue
    (r6(num.doubleValue / den), r6(ela.doubleValue / den),
      r6(elb.doubleValue / den))
  }

  /** Multi-arm (A/B/n) Bayesian "probability to beat" — [[probBest]]
    * generalized from two arms to 2 ≤ K ≤ 8: with independent
    * uniform-prior Beta posteriors per arm, each arm's probability of
    * being the BEST, `P(arm i best) = ∫ pdf_i(x)·∏_{j≠i} cdf_j(x) dx`,
    * and its EXPECTED LOSS `E[(max_{j≠i} p_j − p_i)⁺]` — the K-arm
    * Bayesian stopping criterion (ship arm i when its expected loss
    * drops below the care-about threshold), both on the same
    * deterministic midpoint grid. Ties in a cell use the midpoint
    * convention for P(best) (each same-cell pair splits ½/½, so the
    * K probabilities sum to 1 up to quantization) and contribute 0 to
    * the loss (bias O(cell²), far below 6 dp). At K = 2 the readout
    * equals [[probBest]]'s at 6 dp (prob_best of the higher arm =
    * prob_b_beats_a; the losses map 1:1) — the reduction the spec
    * pins. Returns ONE ROW PER ARM (group, n, conv, rate, prob_best,
    * exp_loss), ordered by group label, 6 dp.
    *
    * Mechanics (every step engine-replayable): per arm the log Beta
    * mass on the midpoint grid, max-shifted exp, then NORMALIZED by
    * the arm's decimal-quantized grid total (unlike the 2-arm face's
    * end-of-race division — K unnormalized CDF products would
    * overflow DECIMAL(38,12)'s 26 integer digits by K = 8). The
    * running per-arm CDFs (exclusive and inclusive) ride the one
    * gridN-bounded ordered window; the max-of-others pmf is the
    * difference of the others' CDF products
    * `qm_i(x) = ∏_{j≠i} F_j(x) − ∏_{j≠i} F_j(x−1)` (at K = 2 exactly
    * the other arm's pmf, which is how the reduction holds); the loss
    * is the same suffix-moment contraction as the 2-arm face,
    * `Σ_x m_i(x)·Σ_{u>x} qm_i(u)·(p_u − p_x)`. Every grid sum is
    * DECIMAL(38,12)-quantized — accumulation order cannot move the
    * readout. Null contract and the ≥ 3-grid-cell resolution rail are
    * [[probBest]]'s.
    *
    * 100 TB shape: ONE group-keyed collapse of the input (K ≤ 8 rows
    * collected); everything after runs on the constant-size grid
    * frame — 2K running-CDF columns + 2K suffix-moment columns over
    * three window specs on gridN rows.
    */
  def probBestK(users: DataFrame, groupCol: String, success: Column,
      gridN: Int = 4000): DataFrame = {
    require(gridN >= 100 && gridN <= 20000,
      "probBestK: gridN must be in 100..20000")
    val spark = users.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val per = users
      .select(col(groupCol).cast("string").as("__g"),
        success.cast("boolean").as("__s"))
      .filter(col("__g").isNotNull && col("__s").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), count(when(col("__s"), 1)).as("__c"))
      .collect() // K <= 8 rows — group-grain, bounded
    require(per.length >= 2 && per.length <= 8,
      s"probBestK: need 2..8 groups, got ${per.length}")
    val srt = per.sortBy(_.getString(0))
    val arms = srt.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    arms.foreach { case (g, n, c) =>
      require(betaSd(n, c) >= 3.0 / gridN,
        s"probBestK: arm $g's posterior (n=$n) is narrower than 3 grid " +
          s"cells at gridN=$gridN — raise gridN or use pairwise " +
          "twoProportionTest (exact in the normal regime)")
    }
    val kk = arms.size
    val grid = spark.range(1, gridN + 1L)
      .select(((col("id").cast("double") - lit(0.5)) /
        lit(gridN.toDouble)).as("__p"))
    def logm(c: Long, f: Long) =
      lit(c.toDouble) * log(col("__p")) +
        lit(f.toDouble) * log(lit(1.0) - col("__p"))
    val g2 = grid.select(col("__p") +: arms.zipWithIndex.map {
      case ((_, n, c), i) => logm(c, n - c).as(s"__l$i") }: _*)
    val mx = g2.agg(max(col("__l0")).as("__m0"),
      (1 until kk).map(i => max(col(s"__l$i")).as(s"__m$i")): _*)
    val g3 = g2.crossJoin(broadcast(mx))
      .select(col("__p") +: (0 until kk).map(i =>
        exp(col(s"__l$i") - col(s"__m$i")).as(s"__t$i")): _*)
    val zs = g3.agg(sum(d12(col("__t0"))).as("__z0"),
      (1 until kk).map(i => sum(d12(col(s"__t$i"))).as(s"__z$i")): _*)
    val g3n = g3.crossJoin(broadcast(zs))
      .select(col("__p") +: (0 until kk).map(i =>
        (col(s"__t$i") / col(s"__z$i").cast("double"))
          .as(s"__u$i")): _*)
    // gridN-bounded by construction: the deliberate unpartitioned
    // ordered windows in this operator (per-arm prefix CDFs, both
    // exclusive and inclusive, + max-of-others suffix moments)
    val wPrev = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val g4 = (0 until kk).foldLeft(g3n) { (acc, i) =>
      acc
        .withColumn(s"__cp$i",
          coalesce(sum(d12(col(s"__u$i"))).over(wPrev).cast("double"),
            lit(0.0)))
        .withColumn(s"__ci$i",
          sum(d12(col(s"__u$i"))).over(wIncl).cast("double"))
    }
    def prodOthers(i: Int, mk: Int => Column): Column =
      (0 until kk).filter(_ != i).map(mk)
        .reduceLeft(_ * _) // left-assoc: the algebra mirrors this order
    val g5 = (0 until kk).foldLeft(g4) { (acc, i) =>
      acc.withColumn(s"__qm$i",
        prodOthers(i, j => col(s"__ci$j")) -
          prodOthers(i, j => col(s"__cp$j")))
    }
    // suffix moments as TOTAL − inclusive prefix: decimal-exact, and
    // O(grid) where an UNBOUNDED FOLLOWING frame rescans per row
    def sufSum(c: Column) =
      (sum(d12(c)).over(wTot) - sum(d12(c)).over(wIncl)).cast("double")
    val g6 = (0 until kk).foldLeft(g5) { (acc, i) =>
      acc
        .withColumn(s"__sm1_$i", sufSum(col(s"__qm$i")))
        .withColumn(s"__sm2_$i", sufSum(col(s"__qm$i") * col("__p")))
    }
    val aggExprs = (0 until kk).flatMap { i =>
      Seq(
        sum(d12(col(s"__u$i") *
          prodOthers(i, j => col(s"__cp$j") + col(s"__u$j") / lit(2.0))))
          .cast("double").as(s"__pb$i"),
        sum(d12(col(s"__u$i") *
          (col(s"__sm2_$i") - col("__p") * col(s"__sm1_$i"))))
          .cast("double").as(s"__el$i"))
    }
    val one = g6.agg(aggExprs.head, aggExprs.tail: _*)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val armStructs = arms.zipWithIndex.map { case ((g, n, c), i) =>
      struct(lit(g).as("group"), lit(n).as("n"), lit(c).as("conv"),
        lit(r6(c.toDouble / n.toDouble)).as("rate"),
        round(col(s"__pb$i"), 6).as("prob_best"),
        round(col(s"__el$i"), 6).as("exp_loss"))
    }
    one.select(explode(array(armStructs: _*)).as("__r"))
      .select(col("__r.group").as("group"), col("__r.n").as("n"),
        col("__r.conv").as("conv"), col("__r.rate").as("rate"),
        col("__r.prob_best").as("prob_best"),
        col("__r.exp_loss").as("exp_loss"))
      .orderBy(col("group"))
  }

  /** The [[probBestK]] grid race on K collected (n, conv) pairs —
    * shared by the streaming twin
    * ([[graft.streaming.StreamOps.streamingProbBestK]]). Mirrors the
    * in-plan arithmetic EXACTLY: normalized masses, per-arm decimal
    * prefix CDFs, the left-assoc others-products, and every grid sum
    * accumulated as 12-dp-quantized decimals in grid order —
    * `BigDecimal.valueOf(x).setScale(12, HALF_UP)` IS Spark's
    * double→DECIMAL(38,12) cast, so batch and streaming cannot drift.
    * Returns per arm (prob_best, exp_loss) in input order, 6 dp.
    */
  def probBestKAlgebra(counts: Seq[(Long, Long)],
      gridN: Int = 4000): Seq[(Double, Double)] = {
    require(gridN >= 100 && gridN <= 20000,
      "probBestKAlgebra: gridN must be in 100..20000")
    require(counts.size >= 2 && counts.size <= 8,
      s"probBestKAlgebra: need 2..8 arms, got ${counts.size}")
    counts.foreach { case (n, c) =>
      require(c >= 0 && n >= c && n >= 1,
        "probBestKAlgebra: need 0 <= conv <= n, n >= 1")
      require(betaSd(n, c) >= 3.0 / gridN,
        s"probBestKAlgebra: a posterior is narrower than 3 grid cells " +
          s"at gridN=$gridN — raise gridN")
    }
    import java.math.{BigDecimal => JBD, RoundingMode}
    def q12(x: Double) = JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    val kk = counts.size
    val gn = gridN
    val ps = Array.tabulate(gn)(i => ((i + 1).toDouble - 0.5) / gn.toDouble)
    val us: Array[Array[Double]] = counts.map { case (n, c) =>
      val lm = ps.map(x =>
        c.toDouble * math.log(x) +
          (n - c).toDouble * math.log(1.0 - x))
      val m = lm.max
      val t = lm.map(x => math.exp(x - m))
      var z = JBD.ZERO
      t.foreach(x => z = z.add(q12(x)))
      val zd = z.doubleValue
      t.map(_ / zd)
    }.toArray
    // per-arm exclusive/inclusive decimal prefix CDFs, per-cell doubles
    val cp = Array.ofDim[Double](kk, gn)
    val ci = Array.ofDim[Double](kk, gn)
    for (i <- 0 until kk) {
      var acc = JBD.ZERO
      for (x <- 0 until gn) {
        cp(i)(x) = acc.doubleValue
        acc = acc.add(q12(us(i)(x)))
        ci(i)(x) = acc.doubleValue
      }
    }
    def prodOthers(i: Int, v: Array[Array[Double]], x: Int): Double = {
      var r = Double.NaN
      var first = true
      for (j <- 0 until kk; if j != i) {
        r = if (first) v(j)(x) else r * v(j)(x)
        first = false
      }
      r
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    (0 until kk).map { i =>
      val qm = Array.tabulate(gn)(x =>
        prodOthers(i, ci, x) - prodOthers(i, cp, x))
      // suffix moments of the max-of-others pmf (the window mirror)
      val sm1 = new Array[Double](gn)
      val sm2 = new Array[Double](gn)
      var s1 = JBD.ZERO
      var s2 = JBD.ZERO
      for (x <- gn - 1 to 0 by -1) {
        sm1(x) = s1.doubleValue
        sm2(x) = s2.doubleValue
        s1 = s1.add(q12(qm(x)))
        s2 = s2.add(q12(qm(x) * ps(x)))
      }
      var pb = JBD.ZERO
      var el = JBD.ZERO
      for (x <- 0 until gn) {
        val mid = {
          var r = Double.NaN
          var first = true
          for (j <- 0 until kk; if j != i) {
            val f = cp(j)(x) + us(j)(x) / 2.0
            r = if (first) f else r * f
            first = false
          }
          r
        }
        pb = pb.add(q12(us(i)(x) * mid))
        el = el.add(q12(us(i)(x) * (sm2(x) - ps(x) * sm1(x))))
      }
      (r6(pb.doubleValue), r6(el.doubleValue))
    }
  }
}
