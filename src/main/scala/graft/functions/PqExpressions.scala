package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Build one query row's m*codes lookup table of subspace dot products
    * (the batch-join form of [[adc]]'s driver-side LUT): normalize the
    * query in place, then dot each subvector against every codebook
    * entry. ~m*codes floats per query (8 KB at m=8/codes=256) — small
    * enough to ride the cell join as a column.
    */
  def lut(vec: ArrayData, books: Array[Float], dim: Int, m: Int,
      codes: Int): ArrayData = {
    val dsub = dim / m
    var norm = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i); norm += x.toDouble * x; i += 1 }
    val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](m * codes)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codes) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          d += vec.getFloat(j * dsub + t) * inv * books((j * codes + c) * dsub + t)
          t += 1
        }
        out(j * codes + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Residual part of the ADC score with the LUT riding as a COLUMN
    * (batch k-NN join): Σ_j lut[j*codes + code_j]. The caller adds the
    * per-probe centroid dot in-plan.
    */
  def adcLut(code: Array[Byte], lut: ArrayData, codes: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < code.length) {
      s += lut.getFloat(j * codes + (code(j) & 0xFF))
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

/** pq_lut(vec) -> array<float>: the query vector's m*codes ADC lookup
  * table under the (plan-time constant) codebooks — the per-query state
  * the batch k-NN join carries as a column so every query can score
  * codes without a driver round-trip.
  */
case class PqLut(child: Expression, books: Array[Float], dim: Int, m: Int,
    codes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PqKernel.lut(v.asInstanceOf[ArrayData], books, dim, m, codes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PqKernel.lut($v, $booksRef, $dim, $m, $codes)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_adc_lut(code, lut) -> double: the residual ADC sum with the lookup
  * table as a per-row COLUMN (batch form of [[PqAdc]] — each query row
  * carries its own table through the cell join).
  */
case class PqAdcLut(left: Expression, right: Expression, codes: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_lut"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_lut needs (binary code, array<float> lut), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(v: Any, l: Any): Any =
    PqKernel.adcLut(v.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData], codes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, l) =>
      s"graft.functions.PqKernel.adcLut($v, $l, $codes)")

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
