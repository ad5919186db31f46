package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jegou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011): vectors
  * are unit-normalized, the residual against the (normalized) IVF cell
  * centroid is split into `m` subspaces, and each subspace quantizes to
  * its nearest codebook entry — one byte per subspace. Asymmetric
  * distance (ADC) scores a query against CODES ONLY: cosine(q, v) =
  * <q̂, ĉ_cell> + <q̂, r> ≈ cellDot[cell] + Σ_j lut[j][code_j], where the
  * per-query lookup table holds the subspace dot products against every
  * codebook entry. Codebooks/LUTs ship to executors as codegen reference
  * objects; both kernels run inside whole-stage codegen.
  */
object PqKernel {

  /** Encode one vector: m codebook ids (bytes). `cents` is the flattened
    * ncells*dim array of UNIT-NORMALIZED cell centroids; `books` the
    * flattened m*codes*dsub residual codebooks.
    */
  def code(vec: ArrayData, cell: Int, cents: Array[Float], dim: Int,
      books: Array[Float], m: Int, codes: Int): Array[Byte] = {
    val dsub = dim / m
    val u = new Array[Float](dim)
    var norm = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i); norm += x.toDouble * x; i += 1 }
    val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
    i = 0
    while (i < dim) { u(i) = (vec.getFloat(i) * inv).toFloat; i += 1 }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val voff = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes) {
        val boff = (j * codes + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val r = u(voff + t) - cents(cell * dim + voff + t)
          val diff = r - books(boff + t)
          d += diff.toDouble * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** ADC score of one code row against the prepared per-query tables. */
  def adc(code: Array[Byte], cell: Int, lut: Array[Float], codes: Int,
      cellDot: Array[Float]): Double = {
    var s = cellDot(cell).toDouble
    var j = 0
    while (j < code.length) {
      s += lut(j * codes + (code(j) & 0xFF))
      j += 1
    }
    s
  }
}

/** pq_code(vec, cell) -> binary: the vector's m-byte PQ code under the
  * given (plan-time constant) centroids + codebooks.
  */
case class PqCode(left: Expression, right: Expression,
    cents: Array[Float], dim: Int, books: Array[Float], m: Int, codes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_code"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_code needs (array<float>, int cell), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    PqKernel.code(v.asInstanceOf[ArrayData], c.asInstanceOf[Int],
      cents, dim, books, m, codes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[]")
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqKernel.code($v, $c, $centsRef, $dim, $booksRef, $m, $codes)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_adc(code, cell) -> double: asymmetric-distance cosine estimate of
  * the prepared query against a PQ code row (codes-only scoring — the
  * raw vector is never read).
  */
case class PqAdc(left: Expression, right: Expression,
    lut: Array[Float], codes: Int, cellDot: Array[Float])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (binary code, int cell), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    PqKernel.adc(v.asInstanceOf[Array[Byte]], c.asInstanceOf[Int],
      lut, codes, cellDot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "float[]")
    val dotRef = ctx.addReferenceObj("pqCellDot", cellDot, "float[]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqKernel.adc($v, $c, $lutRef, $codes, $dotRef)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
