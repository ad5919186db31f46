package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** KLL quantile sketch as a mergeable aggregate — the rank/quantile
  * member of the sketch family next to HLL (distinct), Misra-Gries
  * (heavy hitters) and count-min (frequency). The training-pipeline
  * use: "what is the p99 document length / token count across 100 TB"
  * without a global sort; Spark's built-in `percentile` is exact but
  * materialises every value per group, and `percentile_approx` is a
  * single opaque GK variant — this gives the published mergeable
  * summary with an explicit, in-plan-checkable rank bound.
  *
  * Shape (Karnin, Lang, Liberty — "Optimal Quantile Approximation in
  * Streams", FOCS 2016): a tower of levels, level `l` holding items of
  * weight `2^l`; capacities decay geometrically (ratio 2/3) from `k` at
  * the top, floored at 8. A full level sorts and promotes every second
  * item to the level above — halving the count, doubling the weight,
  * preserving total weight exactly, so `sum(weights) == n` is an
  * invariant the spec asserts. The compaction offset alternates via a
  * counter instead of a coin flip: deterministic for a fixed merge
  * order, same worst-case-bound structure (the randomness only
  * tightens constants in expectation). Spark's partial aggregation IS
  * the mergeable-summaries merge: concatenate levels pairwise, then
  * compact while over capacity.
  *
  * Rank error: |est_rank - true_rank| = O(n/k); for k >= 200 the
  * normalized error is well under 2% (DataSketches reports 1.65% at
  * k=200, 99% conf). Callers gate with a generous in-plan bound
  * (q112 uses 5%) so merge-order variation can never flip the check.
  *
  * eval emits struct(n, items, weights) with items sorted ascending,
  * queried by the codegen'd [[KllQuantile]] (cumulative-weight walk).
  */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Buffer] {

  require(k >= 8 && k <= 65536, "kll_sketch: k must be in [8, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("weights", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch needs a double column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): KllSketch.Buffer =
    KllSketch.Buffer.empty()

  override def update(buf: KllSketch.Buffer,
      input: InternalRow): KllSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.levels(0) += v.asInstanceOf[Double]
    buf.n += 1
    KllSketch.compressIfNeeded(buf, k)
    buf
  }

  override def merge(a: KllSketch.Buffer,
      b: KllSketch.Buffer): KllSketch.Buffer = {
    a.n += b.n
    a.compactions += b.compactions
    while (a.levels.size < b.levels.size) a.levels += mutable.ArrayBuffer.empty
    var l = 0
    while (l < b.levels.size) { a.levels(l) ++= b.levels(l); l += 1 }
    KllSketch.compressIfNeeded(a, k)
    a
  }

  override def eval(buf: KllSketch.Buffer): Any = {
    val pairs = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < buf.levels.size) {
      val w = 1L << l
      buf.levels(l).foreach(v => pairs += ((v, w)))
      l += 1
    }
    val sorted = pairs.sortBy(_._1)
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(sorted.map(_._1).toArray),
      new GenericArrayData(sorted.map(_._2).toArray)))
  }

  override def serialize(buf: KllSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeLong(buf.compactions)
    out.writeInt(buf.levels.size)
    buf.levels.foreach { arr =>
      out.writeInt(arr.size)
      arr.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val compactions = in.readLong()
    val numLevels = in.readInt()
    val levels = mutable.ArrayBuffer.fill(numLevels)(
      mutable.ArrayBuffer.empty[Double])
    var l = 0
    while (l < numLevels) {
      val sz = in.readInt()
      var i = 0
      while (i < sz) { levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    new KllSketch.Buffer(n, compactions, levels)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KllSketch {
  final class Buffer(
      var n: Long,
      var compactions: Long,
      val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]])

  object Buffer {
    def empty(): Buffer =
      new Buffer(0L, 0L, mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double]))
  }

  /** Capacity of `level` when the tower currently has `numLevels`
    * levels: k at the top, shrinking by 2/3 per level down, floor 8.
    */
  def capacity(level: Int, numLevels: Int, k: Int): Int = {
    val depth = numLevels - 1 - level
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
  }

  private def totalCapacity(numLevels: Int, k: Int): Int = {
    var s = 0; var l = 0
    while (l < numLevels) { s += capacity(l, numLevels, k); l += 1 }
    s
  }

  private def totalSize(buf: Buffer): Int = {
    var s = 0; var l = 0
    while (l < buf.levels.size) { s += buf.levels(l).size; l += 1 }
    s
  }

  /** Compact the lowest at-capacity level until the tower fits. Each
    * pass sorts the level, promotes every second item of the
    * even-length suffix (offset alternating with `compactions`), and
    * leaves the single odd leftover — total weight is preserved
    * exactly, so sum(weights) == n always.
    */
  def compressIfNeeded(buf: Buffer, k: Int): Unit = {
    // Loop until the tower FITS, not a fixed pass count: a merge of two
    // near-full towers can need more than any constant number of passes
    // (low levels shed as few as ~4 items each). Termination is
    // guaranteed — every compaction strictly shrinks totalSize by
    // evenLen/2 >= 4 while totalCapacity never decreases, and the
    // target<0 return covers the no-level-at-capacity edge.
    while (totalSize(buf) > totalCapacity(buf.levels.size, k)) {
      var l = 0
      var target = -1
      while (target < 0 && l < buf.levels.size) {
        if (buf.levels(l).size >= capacity(l, buf.levels.size, k)) target = l
        l += 1
      }
      if (target < 0) return
      compactLevel(buf, target)
    }
  }

  private def compactLevel(buf: Buffer, l: Int): Unit = {
    if (buf.levels.size == l + 1) buf.levels += mutable.ArrayBuffer.empty
    val sorted = buf.levels(l).sorted
    val leftover = sorted.size % 2
    val offset = leftover + (buf.compactions & 1L).toInt
    val promoted = buf.levels(l + 1)
    var i = offset
    while (i < sorted.size) { promoted += sorted(i); i += 2 }
    buf.levels(l).clear()
    if (leftover == 1) buf.levels(l) += sorted(0)
    buf.compactions += 1
  }
}

/** kll_quantile(items, weights, q) -> double: cumulative-weight walk
  * over a [[KllSketch]] summary, inside whole-stage codegen. items must
  * be sorted ascending with aligned weights (exactly what the
  * aggregate's eval emits).
  */
case class KllQuantile(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs (array<double>, array<bigint>, double), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(it: Any, wt: Any, q: Any): Any =
    KllKernel.quantile(it.asInstanceOf[ArrayData],
      wt.asInstanceOf[ArrayData], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (it, wt, q) =>
      s"graft.functions.KllKernel.quantile($it, $wt, $q)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Shared query kernel (static forwarders callable from generated
  * Java, same discipline as [[CmsKernel]]).
  */
object KllKernel {
  /** Smallest item whose cumulative weight reaches ceil(q * n). */
  def quantile(items: ArrayData, weights: ArrayData, q: Double): Double = {
    val m = items.numElements()
    if (m == 0) return Double.NaN
    var n = 0L
    var i = 0
    while (i < m) { n += weights.getLong(i); i += 1 }
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < m) {
      cum += weights.getLong(i)
      if (cum >= target) return items.getDouble(i)
      i += 1
    }
    items.getDouble(m - 1)
  }
}
