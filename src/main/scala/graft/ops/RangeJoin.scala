package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Range (interval) joins: point-in-interval and interval-overlap.
  *
  * Spark's built-in planner turns a pure range predicate
  * (`p BETWEEN s AND e`, `s1 <= e2 AND s2 <= e1`) into a broadcast
  * nested-loop join — O(|L|x|R|) comparisons and a broadcast that falls
  * over once neither side is small. The companion operator to
  * [[AsOfJoin]] (the brief's other "operator Spark lacks"): both map a
  * time/range predicate onto the shuffle engine.
  *
  * Technique (the standard binning / bucketing decomposition, as in
  * Flink's interval join and DuckDB's IEJoin literature): quantize the
  * range domain into fixed-width bins. An interval [s, e] is exploded to
  * its covering bins (floorDiv(s,w)..floorDiv(e,w)); a point belongs to
  * exactly ONE bin — so the bin equi-join emits each qualifying
  * (interval, point) pair exactly once, no post-dedup, and Catalyst
  * plans a plain shuffled equi-join with the exact containment predicate
  * evaluated as a cheap post-filter on bin-collocated rows.
  *
  * Scale shape: one hash shuffle per side on the bin key. Cost is
  * |points| + |intervals| x (avgLen/w + 1) shuffled rows and only
  * bin-local comparisons — never the cross product. Pick `binWidth`
  * near the MEDIAN interval length: too small explodes the interval
  * side's bin cover; too large degrades toward per-bin cross products.
  * Skew (a bin holding a hot spike of points) is AQE's skew-join case —
  * the join is a standard equi-join, so runtime splitting applies.
  *
  * Bin index: `floorDiv` is computed as `(x - pmod(x, w)) / w`, exact in
  * integer space for |x| < 2^53 (a plain `floor(x / w)` in double can
  * round a boundary value across a bin edge and silently drop a match).
  */
object RangeJoin {

  /** Floor division that stays exact for longs up to 2^53: the numerator
    * is an exact multiple of w, so the double division is exact.
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Inner join of `points` to every interval of `intervals` containing
    * them: `startCol <= pointCol <= endCol` (both ends inclusive).
    * Output carries all columns of both inputs (names must not clash).
    * Each qualifying pair appears exactly once.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // empty intervals (start > end) match nothing; dropped up front —
    // Spark's sequence() would otherwise generate a DESCENDING bin
    // cover for them and explode wasted rows
    val iv = intervals.filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(floorDiv(col(startCol), binWidth),
          floorDiv(col(endCol), binWidth))))
    val pt = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    // the equi-key carries the join; the range predicate only filters
    // rows already co-located in the same bin
    iv.join(pt, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Inner join of overlapping interval pairs:
    * `aStart <= bEnd AND bStart <= aEnd` (touching endpoints overlap).
    * Both sides explode to their bin covers; a pair is emitted only at
    * the bin of `max(aStart, bStart)` — a bin inside BOTH covers
    * whenever the intervals overlap (max of starts <= min of ends, and
    * floorDiv is monotone) — so each overlapping pair appears exactly
    * once with no post-dedup shuffle.
    */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // an empty interval (start > end) denotes an empty SET of points, so
    // it overlaps nothing — without this filter the pair predicate below
    // would accept e.g. a=[10,5] against b=[0,20]
    val ae = a.filter(col(aStart) <= col(aEnd)).withColumn("__bin",
      explode(sequence(floorDiv(col(aStart), binWidth),
        floorDiv(col(aEnd), binWidth))))
    val be = b.filter(col(bStart) <= col(bEnd)).withColumn("__bin",
      explode(sequence(floorDiv(col(bStart), binWidth),
        floorDiv(col(bEnd), binWidth))))
    ae.join(be, Seq("__bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bin") === greatest(floorDiv(col(aStart), binWidth),
          floorDiv(col(bStart), binWidth)))
      .drop("__bin")
  }
}
