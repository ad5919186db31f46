package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** PCA projection kernel: y = C·(x − μ) (optionally scaled per
  * component for whitening), fused into one pass over the input array
  * inside whole-stage codegen. The model (mean, k×d components, per-
  * component scale) ships by reference in the task closure — never as
  * plan literals (a 64×64 component matrix would bloat the plan by 4k
  * nodes, the hyperplane-table lesson).
  */
object PcaKernel {

  /** Flattened model: comps is row-major k×d; scale(j) multiplies
    * component j's output (1.0 = plain projection, 1/√(λ+ε) =
    * whitening).
    */
  final class Proj(val d: Int, val k: Int, val mean: Array[Double],
      val comps: Array[Double], val scale: Array[Double])
    extends Serializable {
    require(mean.length == d && comps.length == k * d && scale.length == k,
      s"PcaKernel.Proj: inconsistent shapes (d=$d, k=$k)")
  }

  def project(v: ArrayData, p: Proj, isFloat: Boolean): ArrayData = {
    val d = p.d
    require(v.numElements() == d,
      s"pca_project: input dim ${v.numElements()} != model dim $d")
    val x = new Array[Double](d)
    var i = 0
    if (isFloat) while (i < d) { x(i) = v.getFloat(i) - p.mean(i); i += 1 }
    else while (i < d) { x(i) = v.getDouble(i) - p.mean(i); i += 1 }
    val out = new Array[Float](p.k)
    var j = 0
    while (j < p.k) {
      var acc = 0.0
      val off = j * d
      i = 0
      while (i < d) { acc += p.comps(off + i) * x(i); i += 1 }
      out(j) = (acc * p.scale(j)).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** pca_project(vec) -> array<float>: k principal-component coordinates
  * of a (mean-centered, optionally whitened) input vector under a
  * carried [[PcaKernel.Proj]] model.
  */
case class PcaProject(child: Expression, proj: PcaKernel.Proj)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pca_project needs array<float|double>, got ${t.simpleString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    PcaKernel.project(v.asInstanceOf[ArrayData], proj, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaProj", proj,
      classOf[PcaKernel.Proj].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcaKernel.project($c, $ref, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
