package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Theta / KMV (k-minimum-values) distinct sketch — the mergeable
  * distinct-count summary that, unlike HLL, supports SET OPERATIONS:
  * because the retained state is an actual uniform sample of the
  * distinct hash space below a threshold θ, two sketches intersect by
  * intersecting their samples (Beyer et al. SIGMOD'07 "On Synopses for
  * Distinct-Value Estimation"; Dasgupta et al. "Theta sketch framework",
  * the DataSketches theory paper). The training-pipeline use: "how much
  * VOCABULARY / how many n-grams do two 100 TB sources share" without a
  * corpus-sized distinct join.
  *
  * State: the k smallest distinct `Hash64.fnv64∘mix` values of the
  * column, as longs shifted into [0, 2^63). Estimation: with fewer than
  * k retained values the count is EXACT (= retained size); at capacity,
  * θ = kth-smallest/2^63 and est = (k-1)/θ — relative standard error
  * ≈ 1/sqrt(k-2). Merge keeps the k smallest of the union (exactly the
  * single-pass sketch of the concatenated stream, so Spark's partial
  * aggregation reproduces the sequential algorithm; k longs per
  * partition on the wire).
  *
  * Intersection: θ = min(θ_a, θ_b); both samples filtered below θ are
  * uniform samples of their sets at the SAME rate, so
  * est = |A∩B below θ| / θ with the same k-driven error profile
  * (degrading as the true Jaccard shrinks — the published caveat).
  */
object ThetaKernel {

  /** Map an item hash into [0, 2^63) — the sketch's value space. */
  @inline def toSpace(h: Long): Long = h >>> 1

  final val Space: Double = 9223372036854775807.0 // 2^63 as double

  /** θ and estimate off a SORTED retained array. */
  def estimate(hashes: Array[Long], k: Int): Double =
    if (hashes.length < k) hashes.length.toDouble
    else (k - 1).toDouble / (hashes(k - 1) / Space)

  def estimateRow(row: InternalRow): Double = {
    val k = row.getInt(0)
    estimate(row.getArray(1).toLongArray(), k)
  }

  // θ of one sketch: 1.0 while exact (below capacity), else kth/2^63.
  // The sample "below θ" is STRICT — in the (k-1)/θ formulation the kth
  // smallest value IS θ, and the uniform sample is the k-1 values under
  // it; set ops must use the same convention or they over-count by the
  // θ-defining element itself.
  private def thetaOf(hashes: Array[Long], k: Int): Double =
    if (hashes.length < k) 1.0 else hashes(k - 1) / Space

  /** Intersection estimate over two eval'd sketch rows (struct(k, hashes)). */
  def intersectEstimate(a: InternalRow, b: InternalRow): Double = {
    val ha = a.getArray(1).toLongArray()
    val hb = b.getArray(1).toLongArray()
    val theta = math.min(thetaOf(ha, a.getInt(0)), thetaOf(hb, b.getInt(0)))
    val bound = (theta * Space).toLong
    // both arrays sorted ascending: linear merge-intersect below θ
    var i = 0; var j = 0; var common = 0
    while (i < ha.length && j < hb.length && ha(i) < bound && hb(j) < bound) {
      if (ha(i) == hb(j)) { common += 1; i += 1; j += 1 }
      else if (ha(i) < hb(j)) i += 1
      else j += 1
    }
    common / theta
  }

  /** Union estimate: both samples filtered strictly below the common θ
    * are complete below it, so their deduped merge is the union's
    * sample; past k entries the kth smallest becomes the union's own θ.
    */
  def unionEstimate(a: InternalRow, b: InternalRow): Double = {
    val k = math.min(a.getInt(0), b.getInt(0))
    val ha = a.getArray(1).toLongArray()
    val hb = b.getArray(1).toLongArray()
    val theta = math.min(thetaOf(ha, a.getInt(0)), thetaOf(hb, b.getInt(0)))
    val bound = (theta * Space).toLong
    val merged = new Array[Long](ha.length + hb.length)
    var i = 0; var j = 0; var n = 0
    while ((i < ha.length && ha(i) < bound) ||
        (j < hb.length && hb(j) < bound)) {
      val fromA = j >= hb.length || hb(j) >= bound ||
        (i < ha.length && ha(i) < bound && ha(i) <= hb(j))
      if (fromA) {
        val v = ha(i); i += 1
        if (j < hb.length && hb(j) == v) j += 1 // dedup equal values
        merged(n) = v; n += 1
      } else {
        merged(n) = hb(j); j += 1; n += 1
      }
    }
    if (n >= k) (k - 1).toDouble / (merged(k - 1) / Space)
    else n / theta
  }
}

/** theta_sketch(col, k) -> struct(k, hashes): mergeable KMV distinct
  * sketch of a string column ([[ThetaKernel]]).
  */
case class ThetaSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSketch.Buffer] {

  require(k >= 8, "theta_sketch: k must be >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def dataType: DataType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch needs a string column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): ThetaSketch.Buffer =
    new ThetaSketch.Buffer(new java.util.TreeSet[java.lang.Long]())

  override def update(buf: ThetaSketch.Buffer,
      input: InternalRow): ThetaSketch.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = ThetaKernel.toSpace(
      Hash64.mix(Hash64.fnv64(v.asInstanceOf[UTF8String])))
    buf.offer(h, k)
    buf
  }

  override def merge(a: ThetaSketch.Buffer,
      b: ThetaSketch.Buffer): ThetaSketch.Buffer = {
    val it = b.set.iterator()
    while (it.hasNext) a.offer(it.next(), k)
    a
  }

  override def eval(buf: ThetaSketch.Buffer): Any = {
    val arr = new Array[Long](buf.set.size)
    val it = buf.set.iterator() // ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericInternalRow(Array[Any](k, new GenericArrayData(arr)))
  }

  override def serialize(buf: ThetaSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ThetaSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object ThetaSketch {
  /** k smallest distinct values; TreeSet gives O(log k) offer with the
    * max at `last()` for the evict check.
    */
  final class Buffer(val set: java.util.TreeSet[java.lang.Long]) {
    def offer(h: Long, k: Int): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }
  }
}

/** theta_estimate(sketch) -> double: distinct-count estimate (exact
  * below capacity).
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs a theta_sketch struct, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ThetaKernel.estimateRow(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ThetaKernel.estimateRow($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** theta_intersect_estimate(a, b) -> double: |A ∩ B| estimate. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType)
        if a.length == 2 && b.length == 2 => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_estimate needs two theta_sketch structs, " +
          s"got ${a.simpleString}, ${b.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernel.intersectEstimate(
      a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaKernel.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** theta_union_estimate(a, b) -> double: |A ∪ B| estimate. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_union_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType)
        if a.length == 2 && b.length == 2 => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"theta_union_estimate needs two theta_sketch structs, " +
          s"got ${a.simpleString}, ${b.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernel.unionEstimate(
      a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaKernel.unionEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
