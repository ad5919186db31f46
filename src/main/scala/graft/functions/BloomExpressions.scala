package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(hash) -> boolean: membership probe of a 64-bit hash
  * against a driver-built [[BloomFilter]], as a native codegen'd expression.
  *
  * Spark ships `BloomFilterMightContain`, but it is tied to the
  * injected-runtime-filter framework and not public API; a UDF would work
  * but breaks whole-stage codegen exactly where it hurts — the prefilter
  * sits directly on the corpus scan, the single hottest row path in a
  * decontamination pass. This expression keeps the probe inside the
  * generated loop: the filter is shipped once per task as a codegen
  * reference object (same broadcast-by-closure story as the UDF, none of
  * the per-row serialization overhead).
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint hash, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
