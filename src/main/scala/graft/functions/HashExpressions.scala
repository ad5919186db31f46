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
    fnv64Range(bytes, 0, bytes.length)
  }

  /** FNV-1a 64-bit over a byte range — lets shingle kernels hash windows
    * of one shared buffer without materializing substring copies.
    */
  def fnv64Range(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
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

  // per-permutation seeds, computed once per JVM per numPerm (not per row)
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(numPerm: Int): Array[Long] =
    seedCache.computeIfAbsent(numPerm, p => Array.tabulate(p)(i => mix(i.toLong)))

  /** MinHash signature: perm p's value = min over shingles of
    * mix(fnv64(shingle) ^ seed(p)). One O(shingles) pass computes the base
    * hashes; each of the P permutations is then just a mix() — O(S*P)
    * total, no string re-hashing per permutation.
    */
  def minhash(shingles: ArrayData, numPerm: Int): Array[Long] = {
    val n = shingles.numElements()
    val ss = seeds(numPerm)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv64(shingles.getUTF8String(i))
        var p = 0
        while (p < numPerm) {
          val h = mix(base ^ ss(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    sig
  }

  /** minhash over pre-hashed (long) shingles. */
  def minhashLongs(shingles: ArrayData, numPerm: Int): Array[Long] = {
    val n = shingles.numElements()
    val ss = seeds(numPerm)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = shingles.getLong(i)
      var p = 0
      while (p < numPerm) {
        val h = mix(base ^ ss(p))
        if (h < sig(p)) sig(p) = h
        p += 1
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

/** word_shingle_hashes(tokens, n) -> array<long>: 64-bit hashes of the
  * n-gram shingles of a token array, distinct, order-sensitive combine —
  * WITHOUT materializing shingle strings. One imperative pass; feeds
  * minhash/jaccard at a fraction of the cost of string shingles (whose
  * construction runs as an interpreted HOF lambda per element).
  */
object ShingleHash {
  def shingleHashes(tokens: ArrayData, n: Int): Array[Long] = {
    val m = tokens.numElements()
    val tokHash = new Array[Long](m)
    var i = 0
    while (i < m) {
      tokHash(i) = if (tokens.isNullAt(i)) 0L else Hash64.fnv64(tokens.getUTF8String(i))
      i += 1
    }
    val count = math.max(0, m - n + 1)
    if (count == 0) {
      // fewer tokens than the shingle size: one shingle of everything
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < m) { h = Hash64.mix(h * 31 + tokHash(j)); j += 1 }
      return Array(h)
    }
    val set = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var k = 0
    i = 0
    while (i < count) {
      var h = 0x9E3779B97F4A7C15L
      var j = i
      while (j < i + n) { h = Hash64.mix(h * 31 + tokHash(j)); j += 1 }
      if (set.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    if (k == count) out else java.util.Arrays.copyOf(out, k)
  }

  /** Positional variant: a hash at EVERY shingle start, not deduplicated —
    * array index == 0-based token position of the gram. Fewer than n
    * tokens -> empty array (a positional report has nothing to place).
    * Feeds duplicated-SPAN reporting, where where a gram sits matters as
    * much as what it is.
    */
  def shingleHashesAll(tokens: ArrayData, n: Int): Array[Long] = {
    val m = tokens.numElements()
    val count = m - n + 1
    if (count <= 0) return Array.emptyLongArray
    val tokHash = new Array[Long](m)
    var i = 0
    while (i < m) {
      tokHash(i) = if (tokens.isNullAt(i)) 0L else Hash64.fnv64(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      var h = 0x9E3779B97F4A7C15L
      var j = i
      while (j < i + n) { h = Hash64.mix(h * 31 + tokHash(j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }
}

/** word_shingles(tokens, n) -> array<string>: the space-joined n-gram
  * shingle strings of a token array in one imperative JVM pass. Replaces
  * the transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))
  * composition, whose lambda runs through Catalyst's interpreted
  * per-element HOF evaluation — the dominant cost of corpus n-gram
  * counting (q49 was 8.2 s of 30 s at sf0.1). Semantics match the HOF
  * form exactly: fewer than n tokens -> one shingle of the whole array;
  * null tokens are skipped by the separator join (concat_ws semantics).
  */
object ShingleStrings {
  private val SPACE = UTF8String.fromString(" ")

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val count = m - n + 1
    if (count <= 0) {
      return new GenericArrayData(Array[Any](UTF8String.concatWs(SPACE, toks: _*)))
    }
    val out = new Array[Any](count)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < count) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Char k-gram shingle kernels over a STRING input, by code point (same
  * unit as Spark's `length`/`substr`). Semantics match the HOF form
  * `when(length(s) < k, array(s)).otherwise(transform(sequence(1,
  * length(s)-k+1), i -> substr(s, i, k)))` exactly — fewer than k chars
  * (including empty) yields ONE shingle of the whole string — but run as
  * one imperative pass over the UTF-8 bytes instead of an interpreted
  * per-offset lambda. The hash variant never materializes substrings:
  * each window is FNV-1a'd in place over the shared byte buffer.
  */
object CharShingleKernel {
  /** Byte offsets of each code-point start, plus the end offset; returns
    * the char count and fills `offs` (length >= bytes.length + 1).
    */
  private def charOffsets(bytes: Array[Byte], offs: Array[Int]): Int = {
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(n) = i; n += 1 }
      i += 1
    }
    offs(n) = bytes.length
    n
  }

  def shingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = new Array[Int](bytes.length + 1)
    val n = charOffsets(bytes, offs)
    if (n < k)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    val count = n - k + 1
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + k) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val offs = new Array[Int](bytes.length + 1)
    val n = charOffsets(bytes, offs)
    if (n < k) return Array(Hash64.fnv64Range(bytes, 0, bytes.length))
    val count = n - k + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = Hash64.fnv64Range(bytes, offs(i), offs(i + k))
      i += 1
    }
    out
  }
}

sealed trait CharShingleExpression extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input and n>0, got ${child.dataType.simpleString}")
  }
}

case class CharShingles(child: Expression, n: Int) extends CharShingleExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(v: Any): Any =
    CharShingleKernel.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CharShingleHashes(child: Expression, n: Int) extends CharShingleExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(CharShingleKernel.shingleHashes(v.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CharShingleKernel.shingleHashes($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string> and n>0, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ShingleStrings.shingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleStrings.shingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes needs array<string> and n>0, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(ShingleHash.shingleHashes(v.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHash.shingleHashes($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WordShingleHashesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes_all needs array<string> and n>0, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(ShingleHash.shingleHashesAll(v.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHash.shingleHashesAll($c, $n))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sig(shingles, numPerm) -> array<long>. Accepts array<string>
  * (hashes each element) or array<long> (pre-hashed shingles).
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private def preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if numPerm > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string|long> and numPerm>0, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val ad = v.asInstanceOf[ArrayData]
    val sig = if (preHashed) Hash64.minhashLongs(ad, numPerm)
              else Hash64.minhash(ad, numPerm)
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (preHashed) "minhashLongs" else "minhash"
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Hash64.$fn($c, $numPerm))")
  }

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
