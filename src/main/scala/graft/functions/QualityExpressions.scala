package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Information-theoretic text-quality signals — the entropy / compressibility
  * features of the published pretraining quality batteries (gibberish and
  * boilerplate sit at the two entropy extremes; highly compressible text is
  * template/repetition spam). Both are per-row scalar kernels that ride
  * whole-stage codegen — at 100 TB these run inside the scan's codegen
  * span, no shuffle, no UDF boundary.
  */
object CharEntropyKernel {

  /** Shannon entropy in BITS over the code-point distribution of `s`.
    * Accumulation order is pinned (ascending code point) so the result
    * is bit-identical across partitionings and engines with the same
    * double semantics; empty string = 0 by convention.
    */
  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0.0
    // decode UTF-8 → code points
    val cps = new Array[Int](bytes.length)
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
      cps(n) = cp
      n += 1
      i += width
    }
    // sort → run-length count → entropy, in one deterministic order
    java.util.Arrays.sort(cps, 0, n)
    val total = n.toDouble
    var ent = 0.0
    i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val p = (j - i) / total
      ent -= p * (math.log(p) / math.log(2.0))
      i = j
    }
    ent
  }
}

/** char_entropy(text) -> double: Shannon entropy (bits/char) of the
  * code-point distribution ([[CharEntropyKernel]]). Low entropy =
  * repeated-character spam, high = random gibberish; natural language
  * sits in a stable band, which is what makes it a filter signal.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    CharEntropyKernel.entropy(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropyKernel.entropy($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateKernel {
  // One Deflater per (task thread, level): zlib streams are native
  // allocations — churning one per row is the hot-path killer; reset()
  // between rows reuses the stream. ThreadLocal because local-mode
  // Spark shares expression instances across task threads.
  private val deflaters = ThreadLocal.withInitial[Array[java.util.zip.Deflater]](
    () => new Array[java.util.zip.Deflater](10))

  /** Raw-deflate (nowrap — no zlib header/checksum, so the number is
    * pure entropy-coding output) byte length of the UTF-8 bytes of `s`
    * at compression `level` 1..9.
    */
  def deflateLen(s: UTF8String, level: Int): Int = {
    val pool = deflaters.get()
    var d = pool(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level, true)
      pool(level) = d
    }
    d.reset()
    val in = s.getBytes
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Raw-deflate bytes of the UTF-8 bytes of `s` at `level` — same
    * pooled stream as [[deflateLen]], but materializing the output for
    * the in-plan round-trip check.
    */
  def deflateBytes(s: UTF8String, level: Int): Array[Byte] = {
    val pool = deflaters.get()
    var d = pool(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level, true)
      pool(level) = d
    }
    d.reset()
    val in = s.getBytes
    d.setInput(in)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    out.toByteArray
  }
}

object InflateKernel {
  // Pooled like DeflateKernel.deflaters: one native Inflater per task
  // thread, reset() between rows.
  private val inflaters = ThreadLocal.withInitial[java.util.zip.Inflater](
    () => new java.util.zip.Inflater(true))

  /** Inverse of [[DeflateKernel.deflateBytes]]: raw-inflate (nowrap). */
  def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = inflaters.get()
    inf.reset()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 3))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (!inf.finished()) {
        // ANY zero-progress state short of finished is corrupt input —
        // needsInput (truncated stream) but also needsDictionary on a
        // crafted stream: gating only on needsInput would spin forever
        // on the latter. Self-produced deflate output never hits this;
        // the method is callable with arbitrary bytes.
        throw new java.util.zip.DataFormatException(
          if (inf.needsInput()) "truncated deflate stream"
          else "corrupt deflate stream (zero-progress inflate)")
      }
    }
    out.toByteArray
  }

  /** In-plan proof obligation for the deflate kernel:
    * inflate(deflate(text)) == text, byte-exact on the UTF-8 bytes.
    * Always true for a correct codec, which is exactly what makes it
    * oracle-checkable (the oracle emits literal TRUE) — q65's
    * bounded-error device, here with a zero-width bound.
    */
  def roundtripOk(s: UTF8String, level: Int): Boolean = {
    val in = s.getBytes
    val back = inflate(DeflateKernel.deflateBytes(s, level))
    java.util.Arrays.equals(in, back)
  }
}

/** deflate_size(text) -> int: raw DEFLATE output length at the given
  * level ([[DeflateKernel]]). `deflate_size / octet_length` is the
  * compression-ratio quality signal: near-zero = template spam, ~1 =
  * incompressible gibberish. Not SQL-oracle-able (no external engine
  * exposes deflate) — correctness is proven by inflate-round-trip in the
  * spec instead.
  */
case class DeflateSize(child: Expression, level: Int = 6)
  extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_size needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    DeflateKernel.deflateLen(v.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateKernel.deflateLen($c, $level)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** deflate_roundtrip_ok(text) -> boolean: inflate(deflate(text)) == text,
  * byte-exact ([[InflateKernel.roundtripOk]]). Uniformly true for a
  * correct codec — carried through the plan so the driver's SQL oracle
  * can check the deflate kernel (the oracle side is literal TRUE; any
  * codec bug flips a row to false and fails the hash compare).
  */
case class DeflateRoundtripOk(child: Expression, level: Int = 6)
  extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "deflate_roundtrip_ok"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_roundtrip_ok needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    InflateKernel.roundtripOk(v.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.InflateKernel.roundtripOk($c, $level)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
