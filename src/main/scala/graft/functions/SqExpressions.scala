package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels — the 4x-compression midpoint of
  * the ANN storage ladder (raw float32 -> SQ8 -> PQ): each dimension of
  * the unit-normalized vector quantizes INDEPENDENTLY to one byte
  * against a per-dimension trained range [vmin_i, vmin_i + vdiff_i]
  * (FAISS's ScalarQuantizer QT_8bit layout). Unlike PQ there is no
  * codebook search at encode time and no subspace structure — encode is
  * a map-only affine+clamp, and the asymmetric score against a query
  * reduces to one dot product with BYTE codes:
  *
  *   dot(q̂, decode(c)) = Σ_i q̂_i (vmin_i + c_i * vdiff_i/255)
  *                     = c0 + Σ_i w_i * c_i,
  *   with w_i = q̂_i * vdiff_i / 255 and c0 = <q̂, vmin> driver-computed.
  *
  * Quantization error is bounded and deterministic: when no clamp fires
  * (ranges trained on the full data, or any sample covering the value)
  * each dimension is off by at most half a step, so
  * |score - cosine| <= Σ_i |q̂_i| vdiff_i / 510 — tight enough that a
  * small exact rerank restores the true order (SimilaritySpec pins
  * both). Both kernels run inside whole-stage codegen.
  */
object SqKernel {

  /** Encode one vector: unit-normalize, then per-dim affine quantize to
    * [0,255] with round-half-up and clamping (out-of-range values from
    * sample-trained bounds saturate — bounded decode error, never a
    * wrong slot).
    */
  def code(vec: ArrayData, vmin: Array[Float], vdiff: Array[Float]): Array[Byte] = {
    val dim = vmin.length
    var norm = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i); norm += x.toDouble * x; i += 1 }
    val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Byte](dim)
    i = 0
    while (i < dim) {
      val u = vec.getFloat(i) * inv
      val d = vdiff(i)
      val x = if (d == 0f) 0.0 else (u - vmin(i)) / d * 255.0
      val q = math.round(x).toInt
      out(i) = (if (q < 0) 0 else if (q > 255) 255 else q).toByte
      i += 1
    }
    out
  }

  /** Asymmetric score of one code row against the prepared per-query
    * weights: c0 + Σ w_i * code_i. Reads dim BYTES per row — no raw
    * vector access.
    */
  def adc(code: Array[Byte], weights: Array[Float], c0: Double): Double = {
    var s = c0
    var i = 0
    while (i < code.length) {
      s += weights(i).toDouble * (code(i) & 0xFF)
      i += 1
    }
    s
  }
}

/** sq_code(vec) -> binary: the vector's dim-byte SQ8 code under the
  * (plan-time constant) per-dimension ranges.
  */
case class SqCode(child: Expression, vmin: Array[Float], vdiff: Array[Float])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_code"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_code needs array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    SqKernel.code(v.asInstanceOf[ArrayData], vmin, vdiff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minRef = ctx.addReferenceObj("sqVmin", vmin, "float[]")
    val diffRef = ctx.addReferenceObj("sqVdiff", vdiff, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SqKernel.code($v, $minRef, $diffRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sq_adc(code) -> double: asymmetric cosine estimate of the prepared
  * query against an SQ8 code row (codes-only scoring).
  */
case class SqAdc(child: Expression, weights: Array[Float], c0: Double)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_adc needs a binary code, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    SqKernel.adc(v.asInstanceOf[Array[Byte]], weights, c0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("sqWeights", weights, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SqKernel.adc($v, $wRef, $c0)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
