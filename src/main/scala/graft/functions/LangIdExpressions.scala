package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram feature buckets — the feature extractor of the
  * fastText-class language-ID / quality classifiers (Joulin et al.
  * 2016 use hashed n-grams the same way; Cavnar & Trenkle 1994 for
  * char n-grams as language evidence). One bucket per n-gram START
  * (instances, not distinct — multinomial NB counts multiplicity).
  *
  * The hash is a TRANSPARENT polynomial over code points,
  * `((cp1*31 + cp2)*31 + ... + cpN) mod buckets`, NOT an opaque engine
  * hash: any SQL engine can re-derive it from `unicode(substr(...))`
  * arithmetic, which is what makes NB models trained on these buckets
  * cross-checkable row-for-row against an external oracle. For n <= 7
  * and code points < 0x110000 the polynomial fits a 64-bit long
  * without wrapping, so the value is engine-portable exactly.
  */
object CharNgramKernel {
  def buckets(s: UTF8String, n: Int, numBuckets: Int): ArrayData = {
    val bytes = s.getBytes
    // decode code points once (UTF-8 walk, same unit as Spark length())
    val cps = new Array[Int](bytes.length)
    var cpLen = 0
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
      cps(cpLen) = cp
      cpLen += 1
      i += width
    }
    if (cpLen < n) {
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Int](0))
    }
    val out = new Array[Int](cpLen - n + 1)
    var p = 0
    while (p < out.length) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * 31L + cps(p + j); j += 1 }
      out(p) = (((h % numBuckets) + numBuckets) % numBuckets).toInt
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** char_ngram_buckets(text, n, buckets) -> array<int>: hashed char
  * n-gram feature buckets ([[CharNgramKernel]]), one per gram start.
  * Fewer than n code points yields an empty array (too short to carry
  * n-gram evidence). Codegen'd — lives inside whole-stage codegen next
  * to the scan.
  */
case class CharNgramBuckets(child: Expression, n: Int, numBuckets: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_ngram_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && n <= 7 && numBuckets > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_buckets needs a string input, 0 < n <= 7 and buckets > 0, " +
        s"got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    CharNgramKernel.buckets(v.asInstanceOf[UTF8String], n, numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramKernel.buckets($c, $n, $numBuckets)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
