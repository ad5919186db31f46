package graft.ops

import org.apache.spark.sql.DataFrame
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
}
