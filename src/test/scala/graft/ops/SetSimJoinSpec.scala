package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("hand case: exact Jaccard values and threshold cut") {
    val sets = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),   // J(1,2) = 3/5 = 0.6
      (3L, Seq("a", "b", "x", "y")),   // J(1,3) = J(2,3) = 2/6 = 0.333
      (4L, Seq("p", "q"))              // disjoint from all
    ).toDF("doc_id", "els")
    val out = pairs(SetSimJoin.jaccardJoin(sets, "doc_id", "els", 0.5))
    assert(out == Seq((1L, 2L, 0.6)))
    val loose = pairs(SetSimJoin.jaccardJoin(sets, "doc_id", "els", 0.3))
    assert(loose == Seq((1L, 2L, 0.6), (1L, 3L, 0.333333), (2L, 3L, 0.333333)))
  }

  test("identical sets and threshold 1.0") {
    val sets = Seq(
      (1L, Seq("a", "b")), (2L, Seq("b", "a")), (3L, Seq("a", "c")))
      .toDF("doc_id", "els")
    assert(pairs(SetSimJoin.jaccardJoin(sets, "doc_id", "els", 1.0)) ==
      Seq((1L, 2L, 1.0)))
  }

  test("duplicate elements in the input array are set-deduped") {
    val sets = Seq(
      (1L, Seq("a", "a", "b")), (2L, Seq("a", "b", "b", "b")))
      .toDF("doc_id", "els")
    assert(pairs(SetSimJoin.jaccardJoin(sets, "doc_id", "els", 0.9)) ==
      Seq((1L, 2L, 1.0)))
  }

  test("losslessness: prefix-filtered result == brute force on random sets") {
    // 120 random sets over a 30-element universe with planted near-dups:
    // skewed element frequencies exercise the df ordering, varied sizes
    // exercise the length filter.
    val rnd = new scala.util.Random(42)
    val universe = (0 until 30).map(i => s"e$i")
    val baseSets = (0 until 80).map { i =>
      val sz = 3 + rnd.nextInt(10)
      // zipf-ish skew: low indices much more frequent
      (i.toLong, Seq.fill(sz)(universe(math.min(29,
        (math.pow(rnd.nextDouble(), 2.0) * 30).toInt))).distinct)
    }
    val mutated = (0 until 40).map { i =>
      val (id, els) = baseSets(rnd.nextInt(80))
      val drop = if (els.size > 2 && rnd.nextBoolean()) els.tail else els
      (100L + i, (drop :+ universe(rnd.nextInt(30))).distinct)
    }
    val all = (baseSets ++ mutated).filter(_._2.nonEmpty)
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val brute = (for {
        (ia, a) <- all; (ib, b) <- all if ia < ib
        inter = a.toSet.intersect(b.toSet).size
        j = inter.toDouble / (a.toSet.size + b.toSet.size - inter)
        if j >= t
      } yield (ia, ib,
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy(p => (p._1, p._2))
      val got = pairs(SetSimJoin.jaccardJoin(
        all.toDF("doc_id", "els"), "doc_id", "els", t))
      assert(got == brute, s"prefix join lost/invented pairs at t=$t")
    }
  }

  test("shingle sets on the real corpus match DuckDB-style construction") {
    val corpus = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val out = SetSimJoin.jaccardJoin(
      SetSimJoin.shingleSets(corpus, "doc_id", "text", 5), "doc_id", "els", 0.5)
    // measured against the DuckDB quadratic at sf0.01: 25 pairs, all >= 0.5
    assert(out.count() == 25)
    assert(out.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("candidate volume stays far under the quadratic") {
    val corpus = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val sets = SetSimJoin.shingleSets(corpus, "doc_id", "text", 5)
    val n = sets.count()
    val cand = SetSimJoin.candidates(
      SetSimJoin.prepared(sets, "doc_id", "els"), 0.5).count()
    val quadratic = n * (n - 1) / 2
    assert(cand < quadratic / 50,
      s"candidates $cand vs quadratic $quadratic — prefix filter not pruning")
  }

  test("containment: asymmetric by construction (quote inside a big doc)") {
    val sets = Seq(
      (1L, Seq("a", "b", "c")),                         // the "quote"
      (2L, ('a' to 'z').map(_.toString)),               // contains 1 fully
      (3L, Seq("x", "q9", "q8"))                        // overlaps 2 barely
    ).toDF("doc_id", "els")
    val got = pairs(SetSimJoin.containmentJoin(sets, "doc_id", "els", 0.9))
    // 1 ⊂ 2 at containment 1.0; the reverse direction is 3/26 — absent
    assert(got == Seq((1L, 2L, 1.0)))
    // symmetric jaccard at the same bar finds NOTHING (3/26 ≈ 0.12)
    assert(pairs(SetSimJoin.jaccardJoin(sets, "doc_id", "els", 0.9)).isEmpty)
  }

  test("containment losslessness: prefix+postings result == brute force") {
    val rnd = new scala.util.Random(7)
    val universe = (0 until 30).map(i => s"e$i")
    val all = (0 until 100).map { i =>
      val sz = 2 + rnd.nextInt(12)
      (i.toLong, Seq.fill(sz)(universe(math.min(29,
        (math.pow(rnd.nextDouble(), 2.0) * 30).toInt))).distinct)
    }.filter(_._2.nonEmpty)
    for (t <- Seq(0.5, 0.7, 1.0)) {
      val brute = (for {
        (ia, a) <- all; (ib, b) <- all if ia != ib
        c = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.size
        if c >= t
      } yield (ia, ib,
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy(p => (p._1, p._2))
      val got = pairs(SetSimJoin.containmentJoin(
        all.toDF("doc_id", "els"), "doc_id", "els", t))
      assert(got == brute, s"containment join lost/invented pairs at t=$t")
    }
  }
}
