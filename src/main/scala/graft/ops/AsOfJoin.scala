package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of
  * the right row with the greatest `rightTime <= leftTime` for the same
  * key (LEFT OUTER semantics — unmatched left rows keep null payloads).
  *
  * Spark lacks this operator; rather than a custom SparkPlan, it composes
  * as the tagged-union trick (the preferred "(a) compose existing ops"
  * path): union both sides sorted by (key, time, side) with right rows
  * ordered BEFORE left rows at equal time (inclusive match), then a
  * running `last(payload, ignoreNulls)` window carries the most recent
  * right payload forward onto each left row.
  *
  * Scale shape: ONE hash shuffle on the key + a per-partition sort —
  * identical to a sort-merge join's cost envelope, with no range-explosion
  * (a naive `t_r <= t_l` theta-join would be quadratic per key). This is
  * how kdb/Flink-style as-of joins map onto a shuffle engine.
  *
  * Determinism: if several right rows share (key, time), pre-aggregate the
  * right side first (e.g. max payload per key+time) — the window's last()
  * among exact ties follows sort order, which is not total otherwise.
  */
object AsOfJoin {

  def asOf(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq

    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)

    val rTagged = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .select(
        Seq(col("__side")) ++ leftCols.map(col) ++
          payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
