package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.{AnyFunSuite => SqlSuite}

/** The pure-SQL surface: every custom expression callable from
  * `spark.sql` after `registerAll` (same set GraftExtensions injects at
  * config time).
  */
class SqlRegistrationSpec extends SqlSuite {
  lazy val spark = SparkTestSession.spark

  test("all kernels are callable from SQL with literal parameters") {
    graft.functions.registerAll(spark)
    spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .limit(50).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT vec_id,
        |  vec_dot(embedding, embedding) AS d,
        |  vec_cosine(embedding, embedding) AS c,
        |  hyperplane_sig(embedding, 64, 16, 42) AS sig
        |FROM emb_sql ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    assert(r.length == 3)
    assert(r.forall(row => math.abs(row.getDouble(2) - 1.0) < 1e-6))
    assert(r.forall(row => row.getDouble(1) > 0.0))

    val txt = spark.sql(
      """SELECT simhash64(array('a','b','c')) AS sh,
        |  minhash_sig(array('x','y'), 8) AS mh,
        |  word_shingles(array('a','b','c'), 2) AS ws,
        |  word_shingle_hashes(array('a','b','c'), 2) AS wh""".stripMargin).head
    assert(txt.getSeq[Long](1).length == 8)
    assert(txt.getSeq[String](2) == Seq("a b", "b c"))
    assert(txt.getSeq[Long](3).length == 2)

    val agg = spark.sql(
      "SELECT vec_sum(embedding) AS s FROM emb_sql").head.getSeq[Double](0)
    assert(agg.length == 64)

    val tk = spark.sql(
      """SELECT count_in_set(array('a','b','a'), array('a','c')) AS multi,
        |  count_in_set(array('a','b','a'), array('a','c'), true) AS types,
        |  count_matching(array('x1','yy'), '[0-9]') AS digits""".stripMargin).head
    assert(tk.getInt(0) == 2 && tk.getInt(1) == 1 && tk.getInt(2) == 1)

    // non-literal parameter is rejected with a clear message
    val ex = intercept[Exception](
      spark.sql("SELECT word_shingles(array('a'), vec_id) FROM emb_sql").collect())
    assert(ex.getMessage.contains("integer literal") ||
      Option(ex.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("dot product matches reference computation") {
    val a = Seq(1f, 2f, 3f); val b = Seq(4f, 5f, 6f)
    val got = df2(a, b).select(vec_dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 32.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0, opposite is -1") {
    assert(math.abs(df2(Seq(1f, 2f), Seq(1f, 2f))
      .select(vec_cosine(col("a"), col("b"))).head.getDouble(0) - 1.0) < 1e-12)
    assert(df2(Seq(1f, 0f), Seq(0f, 1f))
      .select(vec_cosine(col("a"), col("b"))).head.getDouble(0) == 0.0)
    assert(math.abs(df2(Seq(1f, 1f), Seq(-1f, -1f))
      .select(vec_cosine(col("a"), col("b"))).head.getDouble(0) + 1.0) < 1e-12)
  }

  test("zero vector convention: cosine = 0") {
    assert(df2(Seq(0f, 0f), Seq(1f, 2f))
      .select(vec_cosine(col("a"), col("b"))).head.getDouble(0) == 0.0)
  }

  test("null input -> null") {
    val got = Seq((Some(Seq(1f)), Option.empty[Seq[Float]]))
      .toDF("a", "b").select(vec_cosine(col("a"), col("b"))).head
    assert(got.isNullAt(0))
  }

  test("length mismatch raises") {
    val ex = intercept[Exception] {
      df2(Seq(1f, 2f), Seq(1f)).select(vec_dot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("type check rejects non-float arrays at analysis") {
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception](bad.select(vec_dot(col("a"), col("b"))).collect())
  }

  test("SQL registration works") {
    registerAll(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_cosine(a, b) AS s FROM vecs").head.getDouble(0) == 1.0)
  }

  test("agrees with a driver-side double computation on real embeddings") {
    val emb = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = emb.head._2
    val expected = emb.map { case (id, v) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      v.indices.foreach { i =>
        dot += v(i).toDouble * q(i); na += v(i).toDouble * v(i); nb += q(i).toDouble * q(i)
      }
      id -> dot / (math.sqrt(na) * math.sqrt(nb))
    }.toMap
    val got = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .limit(50)
      .select(col("vec_id"), vec_cosine(col("embedding"), lit_vec(q.toSeq)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"vec $id: $e vs ${got(id)}")
    }
  }

  test("minhash_sig: identical inputs same sig; sig length = numPerm") {
    val d = Seq((Seq("a b", "b c", "c d"), Seq("a b", "b c", "c d")),
      (Seq("x y", "y z", "z w"), Seq("q r", "r s", "s t"))).toDF("s1", "s2")
    val rows = d.select(minhash_sig(col("s1"), 16).as("m1"),
      minhash_sig(col("s2"), 16).as("m2")).collect()
    assert(rows(0).getSeq[Long](0) == rows(0).getSeq[Long](1))
    assert(rows(0).getSeq[Long](0).length == 16)
    assert(rows(1).getSeq[Long](0) != rows(1).getSeq[Long](1))
  }

  test("simhash64: identical token sets equal; disjoint differ") {
    val d = Seq((Seq("spark", "fast", "engine"), Seq("spark", "fast", "engine")),
      (Seq("aa", "bb", "cc"), Seq("xx", "yy", "zz"))).toDF("t1", "t2")
    val rows = d.select(simhash64(col("t1")), simhash64(col("t2"))).collect()
    assert(rows(0).getLong(0) == rows(0).getLong(1))
    assert(rows(1).getLong(0) != rows(1).getLong(1))
  }

  test("in_sorted_longs: matches Set membership through codegen; empty set never matches") {
    val keys = (0L until 1000L).map(_ * 7L)
    val set = keys.filter(_ % 3 == 0).toArray.sorted
    val bc = spark.sparkContext.broadcast(set)
    val got = keys.toDF("k")
      .filter(in_sorted_longs(col("k"), bc))
      .collect().map(_.getLong(0)).toSet
    assert(got == set.toSet, "probe must equal exact membership")
    val emptyBc = spark.sparkContext.broadcast(Array.empty[Long])
    assert(keys.toDF("k").filter(in_sorted_longs(col("k"), emptyBc)).count() == 0)
  }
}
