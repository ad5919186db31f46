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

  // ---- Unigram Viterbi vs exhaustive segmentation enumeration --------

  private val pieceAlpha = Seq("a", "b", "c")
  private val pieceGen: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(pieceAlpha)).map(_.mkString))
  private val unigramVocabGen: Gen[Map[String, Double]] = for {
    n <- Gen.chooseNum(2, 8)
    ps <- Gen.listOfN(n, pieceGen)
    // quarter-step scores make exact float ties common — the tie-break
    // rules get exercised, and score comparison stays exact
    ss <- Gen.listOfN(n, Gen.chooseNum(-16, -1).map(_ / 4.0))
  } yield ps.zip(ss).toMap // duplicate pieces: last score wins, like the Table

  test("property: unigram Viterbi is OPTIMAL vs exhaustive enumeration") {
    import org.apache.spark.sql.functions.col
    val unk = graft.functions.UnigramKernel.UnkScore
    val wordGen = Gen.chooseNum(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(pieceAlpha :+ "z")).map(_.mkString))
    val prop = Prop.forAll(unigramVocabGen, wordGen) { (vocabMap, w) =>
      val vocab = vocabMap.toSeq.sortBy(_._1)
      val pieceIdx = vocab.map(_._1).zipWithIndex.toMap
      // exhaustive: every way to cut w into pieces, scoring UNK singles
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq())
        else (1 to s.length).flatMap { l =>
          val head = s.take(l)
          val ok = vocabMap.contains(head) || l == 1
          if (ok) segs(s.drop(l)).map(head +: _) else Seq()
        }
      def score(seg: Seq[String]): Double =
        seg.map(p => vocabMap.getOrElse(p, unk)).sum
      val best = segs(w).map(score).max
      val ids = Seq(w).toDF("w")
        .select(graft.functions.unigram_token_ids(col("w"), vocab, -1).as("ids"))
        .head.getSeq[Int](0)
      // reconstruct the kernel's path score from its ids: UNK id (-1)
      // scores UnkScore; the id sequence must also re-spell the word
      val spelled = ids.map {
        case -1 => null
        case id => vocab(id)._1
      }
      val kernelScore = ids.map {
        case -1 => unk
        case id => vocab(id)._2
      }.sum
      val respells = {
        // UNK pieces are single chars by construction
        var pos = 0; var ok = true
        spelled.foreach {
          case null => pos += 1
          case p =>
            if (w.regionMatches(pos, p, 0, p.length)) pos += p.length else ok = false
        }
        ok && pos == w.length
      }
      respells && kernelScore == best
    }
    check(prop, 300)
  }
}
