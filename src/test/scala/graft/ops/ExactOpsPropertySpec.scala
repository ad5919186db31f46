package graft.ops

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two EXACT operators added in round 8 — both
  * claim losslessness (no probabilistic recall argument), so both are
  * checked against naive Scala brute force on arbitrary generated
  * inputs: the prefix-filtered Jaccard join against the quadratic pair
  * scan, and phrase/proximity search against a position-by-position
  * token walk. Spark jobs are sized small (tens of docs) so hundreds of
  * generated cases stay fast; the fixed-seed specs cover the
  * corpus-scale shapes.
  */
class ExactOpsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.oneOf((0 until 12).map(i => s"w$i"))

  // ---- SetSimJoin vs quadratic brute force ---------------------------

  private val setsGen: Gen[List[List[String]]] =
    Gen.chooseNum(2, 14).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 8).flatMap(m => Gen.listOfN(m, word))))

  test("property: prefix-filtered Jaccard join == quadratic brute force") {
    val prop = Prop.forAll(setsGen, Gen.oneOf(0.3, 0.5, 0.75, 1.0)) {
      (rawSets, t) =>
        val all = rawSets.zipWithIndex
          .map { case (els, i) => (i.toLong, els.distinct) }
          .filter(_._2.nonEmpty)
        val brute = (for {
          (ia, a) <- all; (ib, b) <- all if ia < ib
          inter = a.toSet.intersect(b.toSet).size
          j = inter.toDouble / (a.toSet.size + b.toSet.size - inter)
          if j >= t
        } yield (ia, ib)).toSet
        val got = SetSimJoin.jaccardJoin(
          all.toDF("doc_id", "els"), "doc_id", "els", t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got == brute
    }
    check(prop, 60)
  }

  // ---- phrase / proximity search vs token walks ----------------------

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 1000000L)
    n <- Gen.chooseNum(0, 14)
    ws <- Gen.listOfN(n, word)
  } yield (id, ws.mkString(" "))

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.distinctBy(_._1))

  private def naivePhrase(toks: Seq[String], ph: Seq[String]): Seq[Int] =
    if (toks.size < ph.size) Seq.empty
    else (0 to toks.size - ph.size).filter(i =>
      ph.indices.forall(j => toks(i + j) == ph(j)))

  test("property: phrase search (direct AND index) == naive token walk") {
    val phraseGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(docsGen, phraseGen) { (docs, ph) =>
      val df = docs.toDF("doc_id", "text")
      val expect = docs.flatMap { case (id, text) =>
        val hits = naivePhrase(
          text.split("\\s+").filter(_.nonEmpty).toSeq, ph)
        if (hits.isEmpty) None
        else Some((id, hits.size.toLong, hits.head.toLong))
      }.sortBy(_._1)
      val direct = Invert.phraseSearch(df, "doc_id", "text", ph)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val indexed = Invert.phraseSearchIndex(
        Invert.postings(df, "doc_id", "text"), ph)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      direct == expect && indexed == expect
    }
    check(prop, 60)
  }

  test("property: proximity search == naive window walk") {
    val termsGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, word).map(_.distinct))
    val prop = Prop.forAll(docsGen, termsGen, Gen.chooseNum(1, 6)) {
      (docs, terms, w) =>
        val expect = docs.flatMap { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
          if (!terms.forall(toks.contains)) None
          else {
            val starts = toks.indices
              .filter(i => terms.contains(toks(i)))
              .filter(p => terms.forall(t =>
                (p until math.min(p + w, toks.size)).exists(q => toks(q) == t)))
            if (starts.isEmpty) None else Some((id, starts.min.toLong))
          }
        }.sortBy(_._1)
        val got = Invert.proximitySearch(
          Invert.postings(docs.toDF("doc_id", "text"), "doc_id", "text"),
          terms, w)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        got == expect
    }
    check(prop, 60)
  }
}
