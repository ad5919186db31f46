package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word hashed feature bucket — the hashing-trick feature map of
  * fastText-class supervised text classifiers (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"; Weinberger et al.
  * 2009 for the hashing trick itself): a word maps to one of `buckets`
  * feature slots, so the model is fixed-size no matter the vocabulary.
  *
  * Like [[CharNgramKernel]], the hash is a TRANSPARENT polynomial over
  * code points — NOT an opaque engine hash — so an external SQL oracle
  * can re-derive every bucket from `unicode(substr(...))` arithmetic.
  * Unlike the n-gram kernel (whose grams are <= 7 code points, so the
  * raw polynomial fits a long), a whole word is unbounded; the modulus
  * is therefore applied at EVERY fold step. By modular arithmetic
  * `((h mod m)*31 + c) mod m == (h*31 + c) mod m`, so per-step
  * reduction equals end reduction exactly while keeping every
  * intermediate below `m*31 + 0x110000` — portable to any engine with
  * 64-bit integers and a list fold.
  */
object WordBucketKernel {
  def bucket(s: UTF8String, numBuckets: Int): Int = {
    val bytes = s.getBytes
    var h = 0L
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
      h = (h * 31L + cp) % numBuckets
      i += width
    }
    h.toInt
  }
}

/** word_bucket(word, buckets) -> int: hashed feature slot of a whole
  * word ([[WordBucketKernel]]). The empty string folds zero code points
  * and lands in bucket 0. Codegen'd — rides whole-stage codegen next to
  * the token explode.
  */
case class WordBucket(child: Expression, numBuckets: Int)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if numBuckets > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_bucket needs a string input and buckets > 0, " +
        s"got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    WordBucketKernel.bucket(v.asInstanceOf[UTF8String], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordBucketKernel.bucket($c, $numBuckets)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
