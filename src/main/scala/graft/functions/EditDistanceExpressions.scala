package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Normalized edit similarity as ONE fused kernel — `1 - lev/max(len)`
  * rounded to 6 dp, null above `maxLen` (the q131 reporting contract).
  *
  * Exists because the built-in `levenshtein` decodes UTF-8 byte-wise in
  * the DP inner loop (≈50x slower than a primitive-array DP — measured:
  * 6.75 s for 11k ~350-char pairs vs ~0.1 s here), and because a
  * filter on a projected similarity gets pushed through the projection
  * and evaluated twice — fusing decode + DP + normalize into one cheap
  * expression makes both costs irrelevant.
  *
  * Semantics: unit-cost Levenshtein over CODE POINTS (what DuckDB's
  * `levenshtein` computes — the oracle's function), lengths in code
  * points; two empty strings are identical (sim 1.0).
  */
object EditDistanceKernel {

  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val out = new Array[Int](bytes.length)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      val width =
        if (b0 < 0x80) 1
        else if (b0 < 0xE0) 2
        else if (b0 < 0xF0) 3
        else 4
      var cp =
        if (width == 1) b0
        else b0 & (0x7F >> width)
      var j = 1
      while (j < width && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3F)
        j += 1
      }
      out(n) = cp
      n += 1
      i += width
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def editSim(a: UTF8String, b: UTF8String, maxLen: Int): java.lang.Double = {
    val ca = codePoints(a)
    val cb = codePoints(b)
    if (ca.length > maxLen || cb.length > maxLen) return null
    val maxL = math.max(ca.length, cb.length)
    if (maxL == 0) return 1.0 // two empty strings are identical
    // two-row DP over primitive ints
    val n = cb.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= ca.length) {
      cur(0) = i
      val cai = ca(i - 1)
      j = 1
      while (j <= n) {
        val cost = if (cai == cb(j - 1)) 0 else 1
        var m = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < m) m = del
        val ins = cur(j - 1) + 1
        if (ins < m) m = ins
        cur(j) = m
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val lev = prev(n)
    val sim = 1.0 - lev.toDouble / maxL
    // 6dp HALF_UP (sim is never negative) — matches Spark's round() and
    // the oracle's; rint would be HALF_EVEN
    math.floor(sim * 1e6 + 0.5) / 1e6
  }
}

/** edit_similarity(a, b) -> double: fused normalized Levenshtein
  * similarity ([[EditDistanceKernel]]); null when either side exceeds
  * `maxLen` code points (reported, not dropped — the caller's contract).
  */
case class EditSimilarity(left: Expression, right: Expression, maxLen: Int)
  extends BinaryExpression {
  require(maxLen > 0, "maxLen must be positive")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "edit_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"edit_similarity needs two strings, got ${a.simpleString}, ${b.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernel.editSim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // boxed-null result: hand-rolled codegen (defineCodeGen can't
    // express a null-producing kernel)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("boxedSim")
    ev.copy(code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  java.lang.Double $boxed = graft.functions.EditDistanceKernel.editSim(
         |    ${leftGen.value}, ${rightGen.value}, $maxLen);
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Longest-common-subsequence length over two TOKEN arrays — the
  * ROUGE-L kernel ([[graft.ops.TextAnalysis.rougeScores]]). Same
  * two-row primitive DP as [[EditDistanceKernel.editSim]] (token
  * equality instead of unit edit cost); null above `maxLen` tokens a
  * side (the O(n·m) honesty cap, reported not dropped). */
object TokenLcsKernel {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def lcsLen(a: ArrayData, b: ArrayData,
      maxLen: Int): java.lang.Integer = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na > maxLen || nb > maxLen) return null
    if (na == 0 || nb == 0) return 0
    val ta = new Array[UTF8String](na)
    var i = 0
    while (i < na) { ta(i) = a.getUTF8String(i); i += 1 }
    val tb = new Array[UTF8String](nb)
    var j = 0
    while (j < nb) { tb(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](nb + 1)
    var cur = new Array[Int](nb + 1)
    i = 1
    while (i <= na) {
      val tai = ta(i - 1)
      j = 1
      while (j <= nb) {
        cur(j) =
          if (tai == null || tb(j - 1) == null) // null tokens never match
            math.max(prev(j), cur(j - 1))
          else if (tai.equals(tb(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(nb)
  }
}

/** token_lcs(a, b) -> int: LCS length over two string arrays
  * ([[TokenLcsKernel]]); null when either side exceeds `maxLen`. */
case class TokenLcs(left: Expression, right: Expression, maxLen: Int)
  extends BinaryExpression {
  require(maxLen > 0, "maxLen must be positive")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_lcs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"token_lcs needs two string arrays, got ${a.simpleString}, ${b.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenLcsKernel.lcsLen(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("boxedLcs")
    ev.copy(code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = true;
         |int ${ev.value} = 0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  java.lang.Integer $boxed = graft.functions.TokenLcsKernel.lcsLen(
         |    ${leftGen.value}, ${rightGen.value}, $maxLen);
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.intValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
