package graft.ops

import org.apache.spark.sql.DataFrame
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
}
