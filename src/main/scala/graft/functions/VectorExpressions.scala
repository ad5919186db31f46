package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding similarity. These are the hot
  * path of ANN / near-dup at 100 TB: one fused pass over two float arrays,
  * no boxing, and `doGenCode` so they stay inside whole-stage codegen
  * (a Scala UDF here would break the codegen span AND pay
  * serialization per row — see the builder guide's preference order).
  *
  * Semantics: both inputs are array<float>; lengths must match (checked at
  * eval, cheap); any null input -> null (BinaryExpression default).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) = sum_i a(i)*b(i), accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    require(xs.length == ys.length, s"vec_dot: length mismatch ${xs.length} != ${ys.length}")
    var acc = 0.0d
    var i = 0
    while (i < xs.length) { acc += xs(i).toDouble * ys(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |if ($xs.length != $ys.length) {
         |  throw new IllegalArgumentException("vec_dot: length mismatch " + $xs.length + " != " + $ys.length);
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) {
         |  $acc += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH signature (Charikar 2002): bit i of the result =
  * sign(dot(vec, plane_i)). Planes are seeded Gaussians generated once per
  * JVM per (dim, bits, seed) — NOT inlined as literals, which would bloat
  * the expression tree by dim*bits nodes and swamp codegen.
  */
object Hyperplanes {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Float]]]()
  def planes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] =
    cache.computeIfAbsent((dim, bits, seed), { case (d, b, s) =>
      val rnd = new java.util.Random(s)
      Array.fill(b)(Array.fill(d)(rnd.nextGaussian().toFloat))
    })

  def signature(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      dim: Int, bits: Int, seed: Long): Long = {
    val ps = planes(dim, bits, seed)
    val xs = vec.toFloatArray()
    // a silent truncation here would quietly collapse LSH recall — fail
    // loudly like vec_dot/vec_cosine do on length mismatch
    require(xs.length == dim,
      s"hyperplane_sig: vector has ${xs.length} dims, planes built for $dim")
    var sig = 0L
    var b = 0
    while (b < ps.length) {
      val p = ps(b)
      var dot = 0.0d
      var i = 0
      while (i < dim) { dot += xs(i).toDouble * p(i).toDouble; i += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class HyperplaneSignature(child: Expression, dim: Int, bits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits <= 63, "bits must fit in a long")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig needs array<float>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    Hyperplanes.signature(v.asInstanceOf[ArrayData], dim, bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hyperplanes.signature($c, $dim, $bits, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine(a, b) = dot / (|a|*|b|) in ONE pass (three accumulators); 0.0
  * when either norm is zero (convention: nothing is similar to the zero
  * vector).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    require(xs.length == ys.length, s"vec_cosine: length mismatch ${xs.length} != ${ys.length}")
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < xs.length) {
      val x = xs(i).toDouble; val y = ys(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |if ($xs.length != $ys.length) {
         |  throw new IllegalArgumentException("vec_cosine: length mismatch " + $xs.length + " != " + $ys.length);
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) {
         |  double $x = (double) $xs[$i]; double $y = (double) $ys[$i];
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
