package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** vec_sum: element-wise sum of array<float> columns as a native
  * TypedImperativeAggregate — the mutable buffer is one double[] per
  * group, updated in place and merged element-wise, so aggregating a
  * million 64-dim vectors shuffles k buffer rows instead of k*dim
  * exploded rows. This is the aggregate that makes distributed k-means
  * updates a plain `groupBy(cell).agg(...)`.
  *
  * Null/empty handling: null input rows are skipped; an all-null group
  * evaluates to null. Mismatched lengths throw (same contract as the
  * scalar vector expressions).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum needs array<float|double>, got ${t.simpleString}")
  }

  // lazy: child may be unresolved at construction time
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // empty buffer sentinel: zero-length array until the first input row
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf.length == 0) new Array[Double](n) else buf
      require(acc.length == n,
        s"vec_sum: length mismatch ${acc.length} != $n")
      var i = 0
      if (isFloat) while (i < n) { acc(i) += arr.getFloat(i); i += 1 }
      else while (i < n) { acc(i) += arr.getDouble(i); i += 1 }
      acc
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.length == 0) a
    else if (a.length == 0) b
    else {
      require(a.length == b.length,
        s"vec_sum: merge length mismatch ${a.length} != ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** vec_moments: count, element-wise sum, and the UPPER TRIANGLE of the
  * second-moment matrix Σ x·xᵀ of array<float|double> vectors, in one
  * mergeable buffer — the single-pass sufficient statistics for a
  * covariance matrix (and therefore PCA/whitening) over any corpus
  * size: the buffer is 1 + d + d(d+1)/2 doubles per group (d = 64 →
  * ~17 KB), so "train PCA on 100 TB of embeddings" shuffles a few KB
  * per partition instead of d² exploded rows per vector.
  *
  * Output layout (flat array<double>, parsed by the caller):
  * [n, sum_0..sum_{d-1}, xx(0,0), xx(0,1)..xx(0,d-1), xx(1,1)..] —
  * row-major upper triangle including the diagonal.
  */
case class VectorMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_moments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_moments needs array<float|double>, got ${t.simpleString}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      require(d <= 1024,
        s"vec_moments: dim $d exceeds the 1024 rail (buffer is O(d^2))")
      val len = 1 + d + d * (d + 1) / 2
      val acc = if (buf.length == 0) new Array[Double](len) else buf
      require(acc.length == len,
        s"vec_moments: dim mismatch (buffer ${acc.length}, need $len)")
      val x = new Array[Double](d)
      var i = 0
      if (isFloat) while (i < d) { x(i) = arr.getFloat(i); i += 1 }
      else while (i < d) { x(i) = arr.getDouble(i); i += 1 }
      acc(0) += 1.0
      i = 0
      while (i < d) { acc(1 + i) += x(i); i += 1 }
      var off = 1 + d
      i = 0
      while (i < d) {
        var j = i
        val xi = x(i)
        while (j < d) { acc(off) += xi * x(j); off += 1; j += 1 }
        i += 1
      }
      acc
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.length == 0) a
    else if (a.length == 0) b
    else {
      require(a.length == b.length,
        s"vec_moments: merge length mismatch ${a.length} != ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
