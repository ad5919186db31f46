package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("trainPca: hand-computed 2D eigensystem, sign normalization, descending order") {
    // mean 0; cov = [[0.5, 0], [0, 2]] -> eigs (2, 0.5), axes (y, x)
    val m = Projection.trainPca(emb(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(0f, 2f)), (4L, Seq(0f, -2f))), "embedding", 2)
    assert(m.n == 4 && m.dim == 2)
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-12)
    assert(math.abs(m.eigenvalues(1) - 0.5) < 1e-12)
    // sign-normalized: dominant coordinate positive
    assert(math.abs(m.components(0)(1) - 1.0) < 1e-12 &&
      math.abs(m.components(0)(0)) < 1e-12)
    assert(math.abs(m.components(1)(0) - 1.0) < 1e-12)
    assert(m.orthonormalityResidual < 1e-12)
  }

  test("pcaProject: exact coordinates; whitening gives ~unit-variance components") {
    val data = emb(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(0f, 2f)), (4L, Seq(0f, -2f)))
    val m = Projection.trainPca(data, "embedding", 2)
    val y = data.orderBy("vec_id")
      .select(Projection.pcaProject(col("embedding"), m))
      .as[Seq[Float]].collect()
    // comp0 = (0,1): y0 = x2; comp1 = (1,0): y1 = x1
    assert(y(0) == Seq(0f, 1f) && y(2) == Seq(2f, 0f))
    val w = data.select(Projection.pcaProject(col("embedding"), m,
        whiten = true).as("y"))
      .agg(graft.functions.vec_moments(col("y"))).head().getSeq[Double](0)
    // moments layout: [n, s0, s1, xx00, xx01, xx11]
    val n = w(0)
    val var0 = w(3) / n - math.pow(w(1) / n, 2)
    val var1 = w(5) / n - math.pow(w(2) / n, 2)
    assert(math.abs(var0 - 1.0) < 1e-6 && math.abs(var1 - 1.0) < 1e-6,
      s"whitened variances: $var0 $var1")
  }

  test("projected variance equals the eigenvalue on correlated data; partition invariant") {
    // correlated 2D cloud with nonzero mean, exact values
    val rows = (0 until 64).map { i =>
      val t = (i % 8).toFloat
      (i.toLong, Seq(t + 1f, 2f * t + (i / 8).toFloat * 0.25f))
    }
    val data = emb(rows: _*)
    val m = Projection.trainPca(data, "embedding", 2)
    assert(m.orthonormalityResidual < 1e-10)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    val st = data.select(Projection.pcaProject(col("embedding"), m).as("y"))
      .agg(graft.functions.vec_moments(col("y"))).head().getSeq[Double](0)
    val n = st(0)
    val v0 = st(3) / n - math.pow(st(1) / n, 2)
    val v1 = st(5) / n - math.pow(st(2) / n, 2)
    assert(math.abs(v0 / m.eigenvalues(0) - 1.0) < 1e-7, s"$v0 vs ${m.eigenvalues(0)}")
    assert(math.abs(v1 / m.eigenvalues(1) - 1.0) < 1e-7, s"$v1 vs ${m.eigenvalues(1)}")
    // partition invariance within FP noise
    val m7 = Projection.trainPca(data.repartition(7), "embedding", 2)
    assert(m.eigenvalues.zip(m7.eigenvalues).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("save -> load round-trips the model; projections bit-equal") {
    val data = emb(
      (1L, Seq(1f, 0f, 3f)), (2L, Seq(-1f, 2f, 0f)),
      (3L, Seq(0f, 2f, 1f)), (4L, Seq(4f, -2f, 2f)))
    val m = Projection.trainPca(data, "embedding", 3)
    val dir = java.nio.file.Files.createTempDirectory("pcam").toString
    try {
      Projection.savePcaModel(spark, m, dir)
      val l = Projection.loadPcaModel(spark, dir)
      assert(l.dim == m.dim && l.k == m.k && l.n == m.n)
      assert(l.mean.toSeq == m.mean.toSeq)
      assert(l.eigenvalues.toSeq == m.eigenvalues.toSeq)
      assert(l.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
      val a = data.orderBy("vec_id")
        .select(Projection.pcaProject(col("embedding"), m))
        .as[Seq[Float]].collect().toSeq
      val b = data.orderBy("vec_id")
        .select(Projection.pcaProject(col("embedding"), l))
        .as[Seq[Float]].collect().toSeq
      assert(a == b)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pcaTopK: full shortlist reproduces exact topK; projectOne matches the column kernel") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 5).toFloat,
        (i % 3).toFloat, 1f))
    }
    val data = emb(rows: _*)
    val m = Projection.trainPca(data, "embedding", 2)
    val q = Seq(3f, 2f, 1f, 1f)
    // shortlist = corpus: the rerank is exact, so output == topK
    val full = Similarity.pcaTopK(data, "vec_id", "embedding", m, q,
        k = 8, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.topK(data, "vec_id", "embedding", q, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
    // projectOne == the distributed kernel on the same vector
    val viaCol = data.filter(col("vec_id") === 7L)
      .select(Projection.pcaProject(col("embedding"), m))
      .as[Seq[Float]].head()
    assert(Projection.projectOne(m, rows(7)._2) == viaCol)
  }

  test("rails: k > dim rejected; dim mismatch at projection rejected") {
    val data = emb((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    intercept[IllegalArgumentException] {
      Projection.trainPca(data, "embedding", 3)
    }
    val m = Projection.trainPca(data, "embedding", 2)
    val bad = emb((1L, Seq(1f, 0f, 0f)))
    val e = intercept[Exception] {
      bad.select(Projection.pcaProject(col("embedding"), m)).collect()
    }
    assert(e.getMessage != null)
  }
}
