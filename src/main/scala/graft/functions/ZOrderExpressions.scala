package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving — the data-LAYOUT operator: rows
  * sorted by the interleaved bit code of several dimensions cluster
  * multi-dimensionally, so parquet row-group min/max stats prune box
  * queries on ANY of the dimensions, not just the leading sort key
  * (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`). At
  * 100 TB the win is at the FILE level: a lexicographic sort answers a
  * selective 2-dim box query by reading every file matching the first
  * dimension; the z-layout reads ~sqrt of that (measured in
  * SCALECHECK §5n).
  */
object ZOrderKernel {
  /** Interleave the low `bits` bits of each value: bit i of value j
    * lands at position i * n + j (value 0 owns the least-significant
    * lane). Values clamp into [0, 2^bits).
    */
  def zValue(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    val max = (1L << bits) - 1
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        val v = vals(j)
        val c = if (v < 0L) 0L else if (v > max) max else v
        z |= ((c >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    z
  }
}

/** z_value(c1, ..., cn) -> bigint: Morton code of n long columns, low
  * `bits` bits each (n * bits <= 63). Codegen'd; null in any input
  * yields null.
  */
case class ZValue(children: Seq[Expression], bits: Int) extends Expression {
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("z_value needs at least one column")
    else if (bits < 1 || bits * children.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"z_value: bits * n must fit a long, got $bits x ${children.size}")
    else children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"z_value needs bigint columns, got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrderKernel.zValue(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull = evals.map(e => s"${e.isNull}").mkString(" || ")
    val fills = evals.zipWithIndex.map { case (e, j) =>
      s"$arr[$j] = ${e.value};" }.mkString("\n")
    ev.copy(code =
      code"""
         |${evals.map(_.code).mkString("\n")}
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long[] $arr = new long[${children.size}];
         |  $fills
         |  ${ev.value} = graft.functions.ZOrderKernel.zValue($arr, $bits);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}
