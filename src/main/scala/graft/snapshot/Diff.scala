package graft.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot drift report: classify every key across two archived
  * snapshots of the same table as inserted / deleted / updated — the
  * operator a librarian user reaches for the moment they have two
  * `archiver snapshot` outputs and asks "what changed?" (the batch
  * complement of the CDC stream, reconstructing the delta when no WAL
  * was captured between snapshots).
  *
  * 100 TB shape: one full-outer shuffle join on the key columns — the
  * minimum possible for a diff; comparison columns ride the join and are
  * compared with null-safe equality (`<=>`), so NULL-to-value
  * transitions count as updates. Unchanged keys are filtered before
  * anything downstream sees them, so the output is delta-sized, not
  * snapshot-sized.
  */
object Diff {

  /** (keys..., op) for every key whose presence or compared columns
    * changed between `before` and `after`; op in
    * {insert, delete, update}. Unchanged keys are dropped.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    val b = before.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__b_$c")) :+
        lit(true).as("__in_b"): _*)
    val a = after.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__a_$c")) :+
        lit(true).as("__in_a"): _*)
    val changed = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduce(_ || _)
    b.join(a, keys, "full_outer")
      .withColumn("op",
        when(col("__in_b").isNull, "insert")
          .when(col("__in_a").isNull, "delete")
          .when(changed, "update")
          .otherwise("same"))
      .filter(col("op") =!= "same")
      .select(keys.map(col) :+ col("op"): _*)
  }
}
