package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a fused codegen kernel — the record-linkage
  * companion to [[EditDistanceKernel]] (edit similarity penalizes length
  * uniformly; Jaro-Winkler is position-tolerant and prefix-boosted, the
  * standard name/title matcher since the Census Bureau work it's named
  * for).
  *
  * Semantics are pinned to the textbook definition (Winkler 1990), which
  * is also what DuckDB's `jaro_winkler_similarity` computes — the
  * oracle's function, probed empirically before this was written:
  *  - match window `max(0, floor(max(|a|,|b|)/2) - 1)` — NOT clamped to 1
  *    (so two 2-char swapped strings score 0), but clamped at 0 so equal
  *    single-char strings match themselves (jw("a","a") = 1, as DuckDB);
  *  - transpositions = FLOOR of half the out-of-order matched pairs
  *    (integer halving — what DuckDB computes; probed via a 3-mismatch
  *    pair);
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3;
  *  - Winkler boost `jaro + 0.1·l·(1-jaro)` with common prefix l capped
  *    at 4, applied ONLY when jaro > 0.7 (the classic boost threshold);
  *  - either side empty → 0.0 (DuckDB's convention, incl. both-empty —
  *    differs from libraries that define jw("","") = 1).
  * All lengths/positions are in code points.
  */
object JaroWinklerKernel {

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

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val ca = codePoints(a)
    val cb = codePoints(b)
    val la = ca.length
    val lb = cb.length
    if (la == 0 || lb == 0) return 0.0
    // clamped at 0: DuckDB scores jw("a","a") = 1.0 (probed), which the
    // unclamped -1 window would miss entirely; max(|a|,|b|)=2 still yields
    // window 0, preserving the documented jw("ab","ba") = 0 behavior
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && cb(j) == ca(i)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var transpositions = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (ca(i) != cb(j)) transpositions += 1
        j += 1
      }
      i += 1
    }
    // INTEGER halving (floor) — probed: DuckDB scores ABCVWXYZ/CABVWXYZ
    // (3 out-of-order matched pairs) with t = 1, not 1.5; the fractional
    // variant some texts use would read 0.9375 where the oracle says
    // 0.9583
    val t = (transpositions / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && ca(l) == cb(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/** jaro_winkler(a, b) -> double in [0, 1] ([[JaroWinklerKernel]]). */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two strings, got ${a.simpleString}, ${b.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaroWinklerKernel.jaroWinkler($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
