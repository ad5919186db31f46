package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate — the
  * frequent-items summary Spark has no native form of (it ships HLL for
  * distinct counts and KLL/GK for quantiles, nothing for top items).
  * The training-pipeline use: "which tokens / hosts / boilerplate lines
  * dominate this 100 TB corpus" without a full (element, count)
  * aggregate whose cardinality is corpus-sized.
  *
  * Guarantees (DETERMINISTIC, not probabilistic): with capacity k over
  * n items, every retained estimate satisfies
  * `true - n/(k+1) <= est <= true`, and any element with true count
  * > n/(k+1) is guaranteed retained. Merging preserves the same bound
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  * PODS 2012: sum counters, then subtract the (k+1)-th largest and drop
  * non-positive). Spark's partial aggregation IS that merge: each
  * partition sketches locally and the partial buffers combine, so one
  * `agg(mg_sketch(col, k))` runs the published distributed algorithm
  * with k buffer rows per partition on the wire — never the
  * vocabulary-sized exact count map.
  *
  * Buffer is (n, counts); eval emits struct(n, counts) so callers can
  * compute the n/(k+1) bound in-plan (`element_at(sk.counts, item)`).
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch.Buffer] {

  require(k >= 1, "mg_sketch: k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("counts", MapType(StringType, LongType,
      valueContainsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch needs a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): MisraGriesSketch.Buffer =
    new MisraGriesSketch.Buffer(0L, mutable.HashMap.empty)

  override def update(buf: MisraGriesSketch.Buffer,
      input: InternalRow): MisraGriesSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.n += 1
    MisraGriesSketch.offer(buf.counts, k, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MisraGriesSketch.Buffer,
      b: MisraGriesSketch.Buffer): MisraGriesSketch.Buffer = {
    if (b.n == 0) return a
    a.n += b.n
    b.counts.foreach { case (w, c) =>
      a.counts.update(w, a.counts.getOrElse(w, 0L) + c)
    }
    MisraGriesSketch.reduceToK(a.counts, k)
    a
  }

  override def eval(buf: MisraGriesSketch.Buffer): Any = {
    val keys = new Array[Any](buf.counts.size)
    val vals = new Array[Any](buf.counts.size)
    var i = 0
    buf.counts.foreach { case (w, c) =>
      keys(i) = UTF8String.fromString(w); vals(i) = c; i += 1
    }
    new GenericInternalRow(Array[Any](buf.n,
      ArrayBasedMapData(keys, vals)))
  }

  // length-prefixed raw UTF-8, not writeUTF: the sketch is registered
  // for arbitrary string columns (boilerplate LINES among them) and
  // writeUTF throws past 64 KB per value
  override def serialize(buf: MisraGriesSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (w, c) =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    new MisraGriesSketch.Buffer(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MisraGriesSketch {
  final class Buffer(var n: Long, val counts: mutable.HashMap[String, Long])

  /** One observation into an MG counter map — the classic update step
    * (increment if tracked, insert below capacity, else decrement-all).
    * Shared by the aggregate and the streaming heavy-hitters state op.
    */
  def offer(counts: mutable.HashMap[String, Long], k: Int,
      key: String): Unit = {
    val cur = counts.getOrElse(key, 0L)
    if (cur > 0L) counts.update(key, cur + 1)
    else if (counts.size < k) counts.update(key, 1L)
    else {
      // decrement-all step: one "vote" against every retained counter
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (w, c) =>
        if (c == 1L) dead += w else counts.update(w, c - 1)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries reduction: subtract the (k+1)-th largest
    * counter from everything, drop non-positive — size is back to <= k
    * and the n/(k+1) error bound is preserved (Agarwal et al. 2012).
    */
  def reduceToK(counts: mutable.HashMap[String, Long], k: Int): Unit =
    if (counts.size > k) {
      val m = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (w, c) =>
        if (c - m <= 0L) dead += w else counts.update(w, c - m)
      }
      dead.foreach(counts.remove)
    }
}

/** Count-min sketch as a mergeable aggregate — the POINT-FREQUENCY
  * complement of [[MisraGriesSketch]] (Cormode & Muthukrishnan, J.
  * Algorithms 2005). MG answers "which items dominate" with k counters
  * but forgets everything evicted; CMS answers "how often did THIS item
  * occur" for ANY item in O(depth) probes of a fixed depth x width
  * counter table, at the price of one-sided overcount.
  *
  * Guarantees: `est >= true` ALWAYS (counters only increment, min over
  * rows can't undercount), and `est <= true + eps*n` with probability
  * `1 - (1/2)^depth` per query for `eps = 2/width` (each row overcounts
  * by < 2n/width with prob > 1/2 by Markov; the min beats the bound
  * unless every row misses). Merge = elementwise table add — the sums
  * commute with the counting, so Spark's partial aggregation ships one
  * depth x width table per partition (width*depth*8 bytes, constant in
  * corpus size) and the merged sketch is IDENTICAL to a single-pass
  * build: the distributed form is exact, not approximate-on-top.
  *
  * Eval emits struct(n, table) so estimates stay in-plan via the
  * codegen'd [[CmsEstimate]] (same hash kernel on both sides).
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch.Buffer] {

  require(depth >= 1 && depth <= 16, "cms_sketch: depth must be in [1,16]")
  require(width >= 2, "cms_sketch: width must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("table", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): CountMinSketch.Buffer =
    new CountMinSketch.Buffer(0L, new Array[Long](depth * width))

  override def update(buf: CountMinSketch.Buffer,
      input: InternalRow): CountMinSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.n += 1
    val item = v.asInstanceOf[UTF8String]
    var d = 0
    while (d < depth) {
      buf.table(d * width + CmsKernel.bucket(item, d, width)) += 1
      d += 1
    }
    buf
  }

  override def merge(a: CountMinSketch.Buffer,
      b: CountMinSketch.Buffer): CountMinSketch.Buffer = {
    a.n += b.n
    var i = 0
    while (i < a.table.length) { a.table(i) += b.table(i); i += 1 }
    a
  }

  override def eval(buf: CountMinSketch.Buffer): Any =
    new GenericInternalRow(Array[Any](buf.n,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.table)))

  override def serialize(buf: CountMinSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.table.length) { out.writeLong(buf.table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val table = new Array[Long](depth * width)
    var i = 0
    while (i < table.length) { table(i) = in.readLong(); i += 1 }
    new CountMinSketch.Buffer(n, table)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object CountMinSketch {
  final class Buffer(var n: Long, val table: Array[Long])
}

/** Shared hash kernel: the aggregate's update and the estimate
  * expression MUST agree bucket-for-bucket, so both call these statics
  * (Scala object = static forwarders, callable from generated Java).
  * Row seeds are fixed constants — the sketch is deterministic for a
  * given input multiset, merge-order independent.
  */
object CmsKernel {
  def bucket(item: UTF8String, row: Int, width: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      item.getBaseObject, item.getBaseOffset, item.numBytes,
      0x2e7e57e5 + row * 0x9e3779b9)
    java.lang.Math.floorMod(h, width)
  }

  def estimate(table: org.apache.spark.sql.catalyst.util.ArrayData,
      item: UTF8String, depth: Int, width: Int): Long = {
    var min = java.lang.Long.MAX_VALUE
    var d = 0
    while (d < depth) {
      val v = table.getLong(d * width + bucket(item, d, width))
      if (v < min) min = v
      d += 1
    }
    min
  }
}

/** cms_estimate(table, item) -> bigint: min-over-rows point query against
  * a [[CountMinSketch]] table, inside whole-stage codegen. depth/width
  * must match the sketch that built the table (a mismatch reads wrong
  * slots — same contract as any sketch family's (build, query) pair).
  */
case class CmsEstimate(left: Expression, right: Expression,
    depth: Int, width: Int) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        if (depth >= 1 && width >= 2) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "cms_estimate: depth must be >= 1 and width >= 2")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (array<bigint>, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(t: Any, i: Any): Any =
    CmsKernel.estimate(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      i.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, i) =>
      s"graft.functions.CmsKernel.estimate($t, $i, $depth, $width)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
