package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA / whitening over embedding columns — the linear preprocessing
  * step of large-scale ANN stacks (OPQ-style rotation, energy
  * compaction before product quantization, decorrelation before
  * scalar quantization) and the standard dimensionality reduction for
  * embedding analytics.
  *
  * 100 TB shape: training is ONE aggregation pass — the mergeable
  * [[graft.functions.VectorMoments]] buffer carries
  * (n, Σx, upper-triangle Σx·xᵀ) = 1 + d + d(d+1)/2 doubles per
  * partition (d = 64 → ~17 KB), so the corpus never shuffles anything
  * vector-shaped; the d×d eigenproblem is driver-side (cyclic Jacobi,
  * d ≤ 1024 rail — an 8 MB matrix, microseconds of driver CPU).
  * Projection is a map-only codegen'd kernel
  * ([[graft.functions.PcaProject]]) carried by reference.
  *
  * Covariance is the POPULATION covariance (divide by n), eigenvalues
  * sort descending with an index tie-break, and each component's sign
  * is normalized (largest-|coordinate| entry positive, lowest index on
  * ties) so training is deterministic — eigenvectors are only defined
  * up to sign, and an unnormalized sign would flip between runs.
  */
object Projection {

  final case class PcaModel(dim: Int, k: Int, n: Long,
      mean: Array[Double],
      components: Array[Array[Double]], // k rows, each length dim
      eigenvalues: Array[Double]) {

    /** max_{ij} |Q·Qᵀ − I| — the orthonormality residual of the
      * eigensolver (0 for an exact solution). */
    def orthonormalityResidual: Double = {
      var worst = 0.0
      var a = 0
      while (a < k) {
        var b = 0
        while (b < k) {
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += components(a)(i) * components(b)(i); i += 1 }
          val expect = if (a == b) 1.0 else 0.0
          worst = math.max(worst, math.abs(acc - expect))
          b += 1
        }
        a += 1
      }
      worst
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place
    * on a copy). Returns (eigenvalues, eigenvectors as rows), sorted
    * by eigenvalue descending. Textbook Golub & Van Loan §8.5 —
    * quadratic convergence, unconditionally stable for symmetric
    * input; plenty for d ≤ 1024.
    */
  private[ops] def jacobiEigen(mat: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = mat.length
    val a = Array.tabulate(n, n)((i, j) => mat(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-22) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off = math.max(off, apq * apq)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val rows = order.map(i => Array.tabulate(n)(r => v(r)(i))).toArray
    (eig, rows)
  }

  /** Train a k-component PCA model in one corpus pass (see the object
    * doc for the plan shape and determinism contract). Null vectors
    * are skipped by the aggregate.
    */
  def trainPca(emb: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val flatRow = emb.agg(
      graft.functions.vec_moments(col(vecCol)).as("m")).head()
    require(!flatRow.isNullAt(0), "trainPca: no non-null vectors")
    val flat = flatRow.getSeq[Double](0).toArray
    // invert len = 1 + d + d(d+1)/2
    val d = (math.sqrt(9.0 + 8.0 * (flat.length - 1)).toInt - 3) / 2
    require(1 + d + d * (d + 1) / 2 == flat.length,
      s"trainPca: malformed moments buffer (${flat.length})")
    require(k <= d, s"k=$k exceeds input dim $d")
    val n = flat(0).toLong
    require(n >= 2, s"trainPca: need >= 2 vectors, got $n")
    val mean = Array.tabulate(d)(i => flat(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var off = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = flat(off) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        off += 1; j += 1
      }
      i += 1
    }
    val (eig, rows) = jacobiEigen(cov)
    // sign normalization: flip so the largest-|entry| coordinate
    // (lowest index on ties) is positive
    val comps = rows.take(k).map { r =>
      var bi = 0
      var bv = 0.0
      var x = 0
      while (x < d) {
        if (math.abs(r(x)) > bv) { bv = math.abs(r(x)); bi = x }
        x += 1
      }
      if (r(bi) < 0) r.map(-_) else r
    }
    PcaModel(d, k, n, mean, comps, eig.take(k))
  }

  private def projOf(m: PcaModel, whiten: Boolean,
      eps: Double): graft.functions.PcaKernel.Proj = {
    val scale =
      if (whiten) m.eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
      else Array.fill(m.k)(1.0)
    new graft.functions.PcaKernel.Proj(m.dim, m.k, m.mean,
      m.components.flatten, scale)
  }

  /** Projection column: y = C·(x − μ); `whiten = true` scales each
    * component by 1/√(λ+ε) so projected coordinates have ~unit
    * variance (decorrelation + equalization — SQ/PQ quantizers then
    * spend their bits evenly).
    */
  def pcaProject(vec: Column, m: PcaModel, whiten: Boolean = false,
      eps: Double = 1e-9): Column =
    graft.functions.pca_project(vec, projOf(m, whiten, eps))

  /** Driver-side single-vector projection through the SAME kernel the
    * distributed column uses — query vectors must compress with
    * bit-identical arithmetic to the corpus or the prefilter ranking
    * drifts between driver and executors.
    */
  def projectOne(m: PcaModel, v: Seq[Float], whiten: Boolean = false,
      eps: Double = 1e-9): Seq[Float] =
    graft.functions.PcaKernel.project(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
      projOf(m, whiten, eps), isFloat = true)
      .toFloatArray().toSeq

  /** Persist / load (the train-once economics of the KN and ANN model
    * faces): mean, components, eigenvalues as parquet + 1-row manifest.
    */
  def savePcaModel(spark: SparkSession, m: PcaModel, path: String): Unit = {
    import spark.implicits._
    Seq((m.dim, m.k, m.n)).toDF("dim", "k", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    m.mean.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("i", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/mean")
    m.eigenvalues.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("i", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/eigenvalues")
    m.components.zipWithIndex.flatMap { case (row, j) =>
      row.zipWithIndex.map { case (v, i) => (j, i, v) }
    }.toSeq.toDF("j", "i", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/components")
  }

  def loadPcaModel(spark: SparkSession, path: String): PcaModel = {
    val mf = spark.read.parquet(s"$path/manifest").head()
    val (dim, k, n) = (mf.getInt(0), mf.getInt(1), mf.getLong(2))
    def vecOf(sub: String, len: Int): Array[Double] = {
      val out = new Array[Double](len)
      spark.read.parquet(s"$path/$sub").collect()
        .foreach(r => out(r.getInt(0)) = r.getDouble(1))
      out
    }
    val comps = Array.ofDim[Double](k, dim)
    spark.read.parquet(s"$path/components").collect()
      .foreach(r => comps(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    PcaModel(dim, k, n, vecOf("mean", dim), comps,
      vecOf("eigenvalues", k))
  }
}
