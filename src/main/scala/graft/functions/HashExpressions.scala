package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing for dedup sketches. Self-contained (FNV-1a
  * over UTF-8 bytes + splitmix64 finalizer) so signatures are stable across
  * Spark versions and across engines — nothing here depends on Spark's
  * internal hash seeds.
  */
object Hash64 {
  final val GOLDEN: Long = 0x9E3779B97F4A7C15L

  /** FNV-1a 64-bit over the UTF-8 bytes of a string. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent "permutations" from one base
    * hash (standard MinHash trick; see e.g. the splitmix64 reference
    * implementation by Vigna, public domain).
    */
  def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: perm p's value = min over shingles of
    * mix(fnv64(shingle) ^ mix(p)). One O(shingles) pass computes the base
    * hashes; each of the P permutations is then just a mix() — O(S*P)
    * total, no string re-hashing per permutation.
    */
  def minhash(shingles: ArrayData, numPerm: Int): Array[Long] = {
    val n = shingles.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv64(shingles.getUTF8String(i))
        var p = 0
        while (p < numPerm) {
          val h = mix(base ^ mix(p.toLong))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over a token array: bit b of the result is 1 iff the
    * weighted sum of bit b across token hashes is positive.
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** minhash_sig(shingles, numPerm) -> array<long>. */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numPerm > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string> and numPerm>0, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(Hash64.minhash(v.asInstanceOf[ArrayData], numPerm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Hash64.minhash($c, $numPerm))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(tokens) -> long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    Hash64.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash64.simhash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
