package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),          // tf=3 for 'spark', dl=4
    (2L, "spark engine"),                      // tf=1, dl=2
    (3L, "a much longer document about nothing with many many filler words spark"),
    (4L, "completely unrelated text here")     // no query terms
  ).toDF("doc_id", "text")

  test("bm25: hand-computed score on a tiny corpus") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N=4, df(spark)=3, idf = ln(1 + (4-3+0.5)/(3+0.5)) = ln(1+1.5/3.5)
    val idf = math.log(1 + 1.5 / 3.5)
    val avgdl = (4 + 2 + 12 + 4) / 4.0
    def s(tf: Int, dl: Int) =
      BigDecimal(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 has no hits
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == s(3, 4))
    assert(byId(2L) == s(1, 2))
    assert(byId(3L) == s(1, 12))
    assert(out.forall(_._3 == 1L)) // one distinct term hit each
  }

  test("bm25: rarer terms out-score common ones at equal tf") {
    val d = Seq(
      (1L, "common rare"), (2L, "common filler"), (3L, "common stuff"),
      (4L, "common words")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", Seq("common", "rare"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 hits both terms; 'rare' df=1 dominates its score
    assert(out(1L) > out(2L) * 2)
  }

  test("bm25: k truncates and ties break by doc_id") {
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", Seq("x"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("unigramNll: uniform corpus scores equal nll; rare tokens raise it") {
    val d = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a z")).toDF("doc_id", "text")
    val out = Retrieval.unigramNll(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    assert(out.map(_._2) == List(2L, 2L, 2L))
    // docs 1,2 identical -> identical nll; doc 3 carries the rare 'z'
    assert(out(0)._3 == out(1)._3)
    assert(out(2)._3 > out(0)._3)
    // hand value: p(a)=(3+1)/(6+3), p(b)=(2+1)/9 -> nll = -(ln(4/9)+ln(3/9))/2
    val expect = BigDecimal(-(math.log(4.0 / 9) + math.log(3.0 / 9)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 == expect)
  }

  test("unigramNll: empty/whitespace docs yield no row (no 0-token NaN)") {
    val d = Seq((1L, "some words"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val ids = Retrieval.unigramNll(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  test("bigramNll: hand-computed interpolated probabilities") {
    // corpus: "a b a" + "a b" -> unigrams a:3 b:2 (tot=5, V=2);
    // bigrams (a,b):2 (b,a):1; contexts a:2 b:1
    val d = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = Retrieval.bigramNll(d, "doc_id", "text", lambda = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    val pAB = 0.8 * (2.0 / 2) + 0.2 * ((2 + 1).toDouble / (5 + 2))
    val pBA = 0.8 * (1.0 / 1) + 0.2 * ((3 + 1).toDouble / (5 + 2))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(t => (t._1, t._2)) == List((1L, 2L), (2L, 1L)))
    assert(out(0)._3 == r6(-(math.log(pAB) + math.log(pBA)) / 2))
    assert(out(1)._3 == r6(-math.log(pAB)))
  }

  test("bigramNll: single-token and empty docs yield no row") {
    val d = Seq((1L, "one two"), (2L, "solo"), (3L, " ")).toDF("doc_id", "text")
    val ids = Retrieval.bigramNll(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  test("knBigramNll: hand-computed interpolated Kneser-Ney probabilities") {
    // corpus: "a b a" + "a b" -> bigram types (a,b) cb=2 and (b,a) cb=1
    // (B=2); contexts: a cw=2 nfollow=1, b cw=1 nfollow=1;
    // continuation counts: nprec(b)=1, nprec(a)=1
    val d = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = Retrieval.knBigramNll(d, "doc_id", "text", discount = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    val D = 0.75
    val pAB = (2.0 - D) / 2 + (D * 1 / 2) * (1.0 / 2)
    val pBA = (1.0 - D) / 1 + (D * 1 / 1) * (1.0 / 2)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(t => (t._1, t._2)) == List((1L, 2L), (2L, 1L)))
    assert(out(0)._3 == r6(-(math.log(pAB) + math.log(pBA)) / 2))
    assert(out(1)._3 == r6(-math.log(pAB)))
  }

  test("knBigramNll: continuation counts penalize fixed-context collocations") {
    // 'y' completes 4 distinct contexts while 'z' only ever follows 'q'
    // (the "Francisco" shape). KN's continuation unigram must give the
    // versatile word more backoff mass: Pcont(y)=4/B > Pcont(z)=1/B.
    val d = Seq((1L, "a y"), (2L, "b y"), (3L, "c y"), (7L, "d y"),
      (4L, "q z"), (5L, "q z"), (6L, "q z")).toDF("doc_id", "text")
    // compare p(y|a) (c=1, cw=1) vs p(z|q) (c=3, cw=3): the discounted
    // ML terms are (1-D)/1 vs (3-D)/3, and the backoff term
    // D*nfollow/cw * nprec/B carries y's 4-context continuation count
    // against z's 1 — both asserted against the closed form below.
    // B = 5 bigram types: (a,y),(b,y),(c,y),(d,y),(q,z).
    val out = Retrieval.knBigramNll(d, "doc_id", "text", discount = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val B = 5.0
    val pYgivenA = (1 - 0.75) / 1 + (0.75 * 1 / 1) * (4 / B)
    val pZgivenQ = (3 - 0.75) / 3 + (0.75 * 1 / 3) * (1 / B)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == r6(-math.log(pYgivenA)))
    assert(out(4L) == r6(-math.log(pZgivenQ)))
    // the COMPUTED NLLs order as KN predicts: the versatile word's
    // bigram (p = 0.85) beats the fixed-context collocation's (p = 0.80)
    assert(out(1L) < out(4L))
  }

  test("knBigramNllAgainst: all three unseen-mass branches, hand-computed") {
    // reference: "a b a" + "a b" -> bm {(a,b):2, (b,a):1}, B=2,
    // ctx {a: cw=2 nf=1, b: cw=1 nf=1}, prec {b:1, a:1}
    val ref = Seq((100L, "a b a"), (101L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),   // seen bigram: full KN probability
      (2L, "b b"),   // UNSEEN bigram, seen context b, seen word b
      (3L, "z a"),   // UNSEEN context z, seen word a -> pure Pcont(a)
      (4L, "a q")    // seen context a, UNK word q -> backoff * 1/(2B)
    ).toDF("doc_id", "text")
    val out = Retrieval.knBigramNllAgainst(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val D = 0.75; val B = 2.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pSeen = (2 - D) / 2 + (D * 1 / 2) * (1 / B)         // p(b|a)
    val pUnseenBigram = 0.0 / 1 + (D * 1 / 1) * (1 / B)     // p(b|b)
    val pUnseenCtx = 1 / B                                   // Pcont(a)
    val pUnk = (D * 1 / 2) * (0.5 / B)                       // p(q|a)
    assert(out(1L) == (0L, r6(-math.log(pSeen))))
    assert(out(2L) == (1L, r6(-math.log(pUnseenBigram))))
    assert(out(3L) == (1L, r6(-math.log(pUnseenCtx))))
    assert(out(4L) == (1L, r6(-math.log(pUnk))))
  }

  // independent naive order-n interpolated-KN model, implemented from
  // the Chen-Goodman definition with plain Scala collections (explicit
  // recursion over Map lookups) — shares nothing with the operator's
  // padded-frame/join machinery
  private def knToks(s: String) =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
  private def naiveKn(refTexts: Seq[String], order: Int,
      D: Double): List[String] => Double = {
    val corpus = refTexts.map(knToks)
    def grams(n: Int) = corpus.flatMap(t =>
      if (t.length >= n) t.sliding(n).map(_.toList).toSeq else Nil)
    val topC = grams(order).groupBy(identity)
      .map { case (g, l) => g -> l.size.toDouble }
    val topCw = grams(order).groupBy(_.init)
      .map { case (h, l) => h -> l.size.toDouble }
    val topNf = grams(order).distinct.groupBy(_.init)
      .map { case (h, l) => h -> l.size.toDouble }
    // continuation tables for k = 2 .. order-1, from (k+1)-gram TYPES
    val contA = (2 until order).map { k =>
      k -> grams(k + 1).distinct.groupBy(_.drop(1))
        .map { case (g, l) => g -> l.size.toDouble }
    }.toMap
    val contAd = contA.map { case (k, m) =>
      k -> m.toSeq.groupBy(_._1.init)
        .map { case (h, l) => h -> l.map(_._2).sum } }
    val contAnf = contA.map { case (k, m) =>
      k -> m.toSeq.groupBy(_._1.init)
        .map { case (h, l) => h -> l.size.toDouble } }
    val biTypes = grams(2).distinct
    val B = biTypes.size.toDouble
    val nprec = biTypes.groupBy(_.last)
      .map { case (w, l) => w -> l.size.toDouble }
    (gram: List[String]) => {
      require(gram.length == order)
      var p = nprec.get(gram.last).map(_ / B).getOrElse(0.5 / B)
      (2 until order).foreach { k =>
        val g = gram.takeRight(k); val h = g.init
        contAd(k).get(h).foreach { ad =>
          p = math.max(contA(k).getOrElse(g, 0.0) - D, 0.0) / ad +
            (D * contAnf(k)(h) / ad) * p
        }
      }
      topCw.get(gram.init).foreach { c =>
        p = math.max(topC.getOrElse(gram, 0.0) - D, 0.0) / c +
          (D * topNf(gram.init) / c) * p
      }
      p
    }
  }
  private def naiveKn3(refTexts: Seq[String], D: Double) = {
    val p = naiveKn(refTexts, 3, D)
    (w1: String, w2: String, w3: String) => p(List(w1, w2, w3))
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def naiveNll(p: List[String] => Double, order: Int,
      text: String): (Long, Double) = {
    val t = knToks(text)
    val gs = t.sliding(order).filter(_.length == order).map(_.toList).toSeq
    (gs.size.toLong, r6(-gs.map(g => math.log(p(g))).sum / gs.size))
  }
  private def naiveNll3(p: (String, String, String) => Double,
      text: String): (Long, Double) = {
    val t = knToks(text)
    val tris = t.sliding(3).filter(_.length == 3).toSeq
    (tris.size.toLong,
      r6(-tris.map(g => math.log(p(g(0), g(1), g(2)))).sum / tris.size))
  }

  test("knNgramNll(3): matches the independent naive trigram KN model") {
    val texts = Seq("a b c a b", "b c a", "a b c c", "c a b a", "b b")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p = naiveKn3(texts, 0.75)
    val got = Retrieval.knNgramNll(docs, "doc_id", "text", order = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // "b b" has < 3 tokens: no row; every other doc matches the model
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    texts.zipWithIndex.filter(_._1.trim.split("\\s+").length >= 3)
      .foreach { case (t, i) =>
        assert(got(i.toLong) == naiveNll3(p, t), s"doc $i ($t)")
      }
  }

  test("knNgramNllAgainst(3): every backoff level, vs the naive model") {
    val refTexts = Seq("a b c a b", "b c a", "a b c c")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val docTexts = Seq(
      "a b c",   // seen trigram: full recursion on real counts
      "a b b",   // unseen trigram, seen context (a,b), seen (b,b)? no —
                 //   a2 misses (b,b) but ad2(b) exists: order-2 discount 0
      "z b c",   // unseen context (z,b): full backoff to order 2 (seen)
      "z z c",   // both contexts unseen: pure continuation unigram
      "a b z")   // unk word z: 1/(2B) at the bottom, backed off through
    val docs = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p = naiveKn3(refTexts, 0.75)
    val got = Retrieval.knNgramNllAgainst(docs, "doc_id", "text",
        ref, "text", order = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    docTexts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naiveNll3(p, t), s"doc $i ($t)")
    }
  }

  test("KN model save -> load -> score bit-equals the in-session model") {
    val ref = Seq((100L, "a b c a b"), (101L, "b c a"), (102L, "a b c c"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "z b c"), (3L, "c a q"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("knmodel").toString
    try {
      val m = Retrieval.knModel(ref, "text", order = 3)
      Retrieval.saveKnModel(m, dir)
      val loaded = Retrieval.loadKnModel(spark, dir)
      assert(loaded.order == 3 && loaded.btypes == m.btypes)
      def score(mm: Retrieval.KnModel) =
        Retrieval.knNgramNllAgainstModel(docs, "doc_id", "text", mm)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      assert(score(loaded) == score(m))
      // and the loaded score equals the one-shot train+score face
      val oneShot = Retrieval.knNgramNllAgainst(docs, "doc_id", "text",
          ref, "text", order = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(score(loaded) == oneShot)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("orders 4 and 5: recursion depth vs the naive model (multi-level cont + re-distinct)") {
    // order >= 4 is where the model build walks code order 3 cannot
    // reach: more than one intermediate continuation level, and the
    // below-full-width projections that must re-distinct before
    // counting types. Corpus repeats phrases so every backoff level
    // carries real (not degenerate) counts.
    val refTexts = Seq(
      "a b c d e a b c d", "b c d e f", "a b c d e", "c d e f a b",
      "e f a b c d", "d e f a b c")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val docTexts = Seq(
      "a b c d e",   // seen 5-grams/4-grams throughout
      "f a b c d",   // mixed: some grams seen, some back off
      "z b c d e",   // unseen leading context at every order
      "a b z c d")   // unk-ish interior: deep backoff mid-gram
    val docs = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(4, 5).foreach { order =>
      val p = naiveKn(refTexts, order, 0.75)
      val got = Retrieval.knNgramNllAgainst(docs, "doc_id", "text",
          ref, "text", order = order)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
        .toMap
      docTexts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == naiveNll(p, order, t),
          s"order $order doc $i ($t)")
      }
    }
  }

  // independent naive MODIFIED-KN model (Chen-Goodman three-discount
  // estimator): same tables as naiveKn plus per-level count-of-count
  // discounts and per-context count-class totals — plain collections,
  // nothing shared with the operator's frames
  private def naiveModDiscounts(counts: Iterable[Double],
      fallback: Double = 0.75): (Double, Double, Double) = {
    val n1 = counts.count(_ == 1.0).toDouble
    val n2 = counts.count(_ == 2.0).toDouble
    val n3 = counts.count(_ == 3.0).toDouble
    val n4 = counts.count(_ == 4.0).toDouble
    // non-positive estimates fall back too (a zero class discount
    // would zero some contexts' backoff weight -> p = 0)
    def pick(nk: Double, raw: => Double, hi: Double) =
      if (nk > 0.0 && raw > 0.0) math.min(raw, hi) else fallback
    val y = if (n1 + 2.0 * n2 > 0.0) n1 / (n1 + 2.0 * n2) else 0.0
    (pick(n1, 1.0 - 2.0 * y * n2 / n1, 1.0),
      pick(n2, 2.0 - 3.0 * y * n3 / n2, 2.0),
      pick(n3, 3.0 - 4.0 * y * n4 / n3, 3.0))
  }
  private def naiveKnMod(refTexts: Seq[String],
      order: Int): List[String] => Double = {
    val corpus = refTexts.map(knToks)
    def grams(n: Int) = corpus.flatMap(t =>
      if (t.length >= n) t.sliding(n).map(_.toList).toSeq else Nil)
    val topC = grams(order).groupBy(identity)
      .map { case (g, l) => g -> l.size.toDouble }
    val topCw = grams(order).groupBy(_.init)
      .map { case (h, l) => h -> l.size.toDouble }
    def classes(m: Map[List[String], Double]) =
      m.toSeq.groupBy(_._1.init).map { case (h, l) =>
        h -> (l.count(_._2 == 1.0).toDouble, l.count(_._2 == 2.0).toDouble,
          l.count(_._2 >= 3.0).toDouble) }
    val topCls = classes(topC)
    val topD = naiveModDiscounts(topC.values)
    val contA = (2 until order).map { k =>
      k -> grams(k + 1).distinct.groupBy(_.drop(1))
        .map { case (g, l) => g -> l.size.toDouble }
    }.toMap
    val contAd = contA.map { case (k, m) =>
      k -> m.toSeq.groupBy(_._1.init)
        .map { case (h, l) => h -> l.map(_._2).sum } }
    val contCls = contA.map { case (k, m) => k -> classes(m) }
    val contD = contA.map { case (k, m) => k -> naiveModDiscounts(m.values) }
    val biTypes = grams(2).distinct
    val B = biTypes.size.toDouble
    val nprec = biTypes.groupBy(_.last)
      .map { case (w, l) => w -> l.size.toDouble }
    def disc(c: Double, d: (Double, Double, Double)) =
      if (c >= 3.0) d._3 else if (c == 2.0) d._2
      else if (c == 1.0) d._1 else 0.0
    (gram: List[String]) => {
      require(gram.length == order)
      var p = nprec.get(gram.last).map(_ / B).getOrElse(0.5 / B)
      (2 until order).foreach { k =>
        val g = gram.takeRight(k); val h = g.init
        contAd(k).get(h).foreach { ad =>
          val a = contA(k).getOrElse(g, 0.0)
          val d = contD(k); val (c1, c2, c3) = contCls(k)(h)
          p = math.max(a - disc(a, d), 0.0) / ad +
            ((d._1 * c1 + d._2 * c2 + d._3 * c3) / ad) * p
        }
      }
      topCw.get(gram.init).foreach { cw =>
        val c = topC.getOrElse(gram, 0.0)
        val (c1, c2, c3) = topCls(gram.init)
        p = math.max(c - disc(c, topD), 0.0) / cw +
          ((topD._1 * c1 + topD._2 * c2 + topD._3 * c3) / cw) * p
      }
      p
    }
  }

  test("modified KN (3): every backoff level, vs the naive three-discount model") {
    // corpus with counts spread across classes 1/2/3+ at both levels
    // so all three discounts actually differ and apply
    val refTexts = Seq(
      "a b c a b c a b c", // (a,b,c) count 3 -> D3+ class
      "b c a b c a",       // (b,c,a) count 2+
      "a b c d e",         // singletons -> D1 class
      "c a b d a b", "d e a b c d")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val docTexts = Seq(
      "a b c",   // count-3+ trigram
      "b c a",   // count-2 trigram
      "a b d",   // count-1 trigram
      "a b b",   // unseen trigram, seen context -> pure backoff weight
      "z b c",   // unseen context -> order-2 continuation level
      "z z c",   // both contexts unseen -> continuation unigram
      "a b z")   // unk word -> 1/(2B) through every level
    val docs = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p = naiveKnMod(refTexts, 3)
    val got = Retrieval.knNgramNllModAgainst(docs, "doc_id", "text",
        ref, "text", order = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    docTexts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == naiveNll(p, 3, t), s"doc $i ($t)")
    }
    // and the discounts genuinely differ from the fixed 0.75 — the
    // modified face is not silently scoring single-discount
    val single = Retrieval.knNgramNllAgainst(docs, "doc_id", "text",
        ref, "text", order = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(docTexts.indices.exists(i => got(i.toLong)._2 != single(i.toLong)))
  }

  test("modified KN: self-scored face and orders 2/4 vs the naive model") {
    val texts = Seq("a b c a b c a b", "b c a b c a", "a b c d",
      "c a b a c a b", "d a b c d a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(2, 4).foreach { order =>
      val p = naiveKnMod(texts, order)
      val got = Retrieval.knNgramNllMod(docs, "doc_id", "text", order)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      texts.zipWithIndex
        .filter(_._1.trim.split("\\s+").length >= order)
        .foreach { case (t, i) =>
          assert(got(i.toLong) == naiveNll(p, order, t),
            s"order $order doc $i ($t)")
        }
    }
  }

  test("modified KN: save -> load preserves discounts; scores bit-equal; degenerate counts fall back") {
    val ref = Seq((0L, "a b c a b c a b"), (1L, "b c a b"), (2L, "a b d"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "z b c"), (3L, "a b q"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("knmod").toString
    try {
      val m = Retrieval.knModel(ref, "text", order = 3)
      assert(m.mods.keySet == Set(2, 3))
      Retrieval.saveKnModel(m, dir)
      val loaded = Retrieval.loadKnModel(spark, dir)
      assert(loaded.mods == m.mods)
      def score(mm: Retrieval.KnModel) =
        Retrieval.knNgramNllModAgainstModel(docs, "doc_id", "text", mm)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      assert(score(loaded) == score(m))
      // degenerate corpus: every trigram count is 1 -> n2=n3=0, so D2/D3
      // fall back to 0.75 while D1 estimates (clamped into [0,1]); the
      // model still scores finitely everywhere
      val degRef = Seq((0L, "p q r s t u")).toDF("doc_id", "text")
      val dm = Retrieval.knModel(degRef, "text", order = 3)
      assert(dm.mods(3).d2 == 0.75 && dm.mods(3).d3 == 0.75)
      assert(dm.mods(3).d1 >= 0.0 && dm.mods(3).d1 <= 1.0)
      val deg = Retrieval.knNgramNllModAgainstModel(
          Seq((1L, "p q r"), (2L, "x y z")).toDF("doc_id", "text"),
          "doc_id", "text", dm)
        .collect().map(r => r.getDouble(3))
      assert(deg.forall(java.lang.Double.isFinite))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("tuneJmLambda: trace matches a naive deleted-interpolation EM; direction follows the evidence") {
    val trainTexts = Seq("a b c a b", "b c a d", "a b c")
    val heldSeen = Seq("a b c", "b c a")       // train-like: bigram term earns weight
    val heldUnseen = Seq("x y z", "y z x")     // foreign: unigram backoff wins
    def naive(held: Seq[String], iters: Int, l0: Double): Seq[Double] = {
      val corpus = trainTexts.map(knToks)
      val toks = corpus.flatten
      val n = toks.groupBy(identity).map { case (w, l) => w -> l.size }
      val (tot, v) = (toks.size.toDouble, n.size.toDouble)
      val bi = corpus.flatMap(t => t.sliding(2).filter(_.length == 2).map(_.toList))
      val cb = bi.groupBy(identity).map { case (g, l) => g -> l.size.toDouble }
      val cw = bi.groupBy(_.head).map { case (w, l) => w -> l.size.toDouble }
      val hb = held.map(knToks).flatMap(t =>
        t.sliding(2).filter(_.length == 2).map(_.toList))
        .groupBy(identity).map { case (g, l) => g -> l.size }
      def r12(x: Double) =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      var lam = l0
      val out = Seq.newBuilder[Double]; out += lam
      (1 to iters).foreach { _ =>
        var rsum = BigDecimal(0); var csum = 0L
        hb.foreach { case (g, c) =>
          val pml = if (cb.contains(g)) cb(g) / cw(g.head) else 0.0
          val pbo = (n.getOrElse(g.last, 0) + 1).toDouble / (tot + v)
          val r = (lam * pml) / (lam * pml + (1.0 - lam) * pbo)
          rsum += BigDecimal(c) * r12(r); csum += c
        }
        lam = r6(rsum.toDouble / csum)
        out += lam
      }
      out.result()
    }
    val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def tune(held: Seq[String]) = Retrieval.tuneJmLambda(
      train, "text",
      held.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", iterations = 4)
    val up = tune(heldSeen)
    assert(up == naive(heldSeen, 4, 0.5))
    assert(up.last > 0.5, s"seen held-out must push lambda up: $up")
    val down = tune(heldUnseen)
    assert(down == naive(heldUnseen, 4, 0.5))
    // every held-out bigram unseen -> r = 0 everywhere -> lambda -> 0
    assert(down.last == 0.0, s"foreign held-out zeroes the bigram term: $down")
    // held-out without a single bigram fails fast
    val e = intercept[Exception] {
      Retrieval.tuneJmLambda(train, "text",
        Seq((1L, "solo")).toDF("doc_id", "text"), "text")
    }
    assert(e.getMessage.contains("no bigrams"))
  }

  test("tuneJmLambda: lambda clamps strictly below 1.0 when held-out coverage saturates") {
    // train: one bigram type with pml = 1; held-out fully covered. At
    // lambda0 = 0.999999 the responsibility rounds to 0.9999995 at
    // 12 dp and the 6-dp update would land exactly 1.0 — where pml=0
    // rows in any later mix would compute 0/0 = NULL and silently
    // corrupt the sum. The clamp pins every update at 0.999999.
    val train = (0 until 50).map(i => (i.toLong, "aa bb"))
      .toDF("doc_id", "text")
    val held = Seq((0L, "aa bb"), (1L, "aa bb")).toDF("doc_id", "text")
    val trace = Retrieval.tuneJmLambda(train, "text", held, "text",
      iterations = 3, lambda0 = 0.999999)
    assert(trace.tail.forall(l => l > 0.99 && l < 1.0), trace.toString)
  }

  test("count pruning: frequent grams bit-identical, pruned grams back off as unseen") {
    // "a b c" occurs 3x (survives pruneMinTopCount=2); "d e f" once
    // (pruned). Docs made only of frequent grams must score EXACTLY as
    // under the full model; docs carrying the pruned gram score it as
    // unseen (strictly higher NLL, still finite).
    val refTexts = Seq("a b c", "a b c", "a b c", "d e f")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    def score(prune: Long) = {
      val m = Retrieval.knModel(ref, "text", order = 3,
        pruneMinTopCount = prune)
      Retrieval.knNgramNllAgainstModel(docs, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
        .toMap
    }
    val full = score(1L); val pruned = score(2L)
    assert(full(1L) == pruned(1L))          // frequent path bit-identical
    assert(full(1L)._1 == 0L)
    assert(pruned(2L)._1 == 1L)             // "d e f" now counts unseen
    assert(full(2L)._1 == 0L)
    assert(pruned(2L)._2 > full(2L)._2)     // mass lost -> NLL rises
    assert(java.lang.Double.isFinite(pruned(2L)._2)) // backoff holds
    // the pruned model's top frame is actually smaller
    assert(Retrieval.knModel(ref, "text", 3, 2L).top.count() <
      Retrieval.knModel(ref, "text", 3).top.count())
  }

  test("knPerplexityBuckets: assignment is monotone in nll; composes the scoring face") {
    val ref = Seq((100L, "a b c a b c a b"), (101L, "b c a b c")).toDF("doc_id", "text")
    // strictly increasing unseen tail -> 8 DISTINCT nll levels, so the
    // quartile cutoffs interpolate between distinct values and all
    // three bands are populated (an all-tied quartile collapses tail
    // into middle by the <=/> banding — correct, but not this test)
    val docs = (1L to 8L).map(i =>
      (i, "a b c a b " + (1 to i.toInt).map(j => s"z$j").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Retrieval.knModel(ref, "text", order = 3)
    val out = Retrieval.knPerplexityBuckets(docs, "doc_id", "text", m,
        exact = true)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    // monotone: every head nll <= every middle nll <= every tail nll
    def band(b: String) = out.filter(_._3 == b).map(_._2)
    assert(band("head").nonEmpty && band("tail").nonEmpty)
    assert(band("head").max <= (band("middle") ++ band("tail")).min)
    if (band("middle").nonEmpty)
      assert(band("middle").max <= band("tail").min)
    // compose parity: same rows as scoring + manual quartile banding
    val scored = Retrieval.knNgramNllAgainstModel(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.map(t => t._1 -> t._2).toMap == scored)
  }

  test("knNgramNll(2) bit-equals knBigramNll (one kernel, two faces)") {
    val d = Seq((1L, "a b a c a b"), (2L, "c a b")).toDF("doc_id", "text")
    val viaN = Retrieval.knNgramNll(d, "doc_id", "text", order = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBi = Retrieval.knBigramNll(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaN == viaBi)
  }

  test("oovRate: top-n vocab membership with count-desc/token-asc ties") {
    // counts: x:3, y:1, z:1 — vocabSize=2 must break the y/z tie by token
    // asc, so vocab = {x, y} and only z is OOV
    val d = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = Retrieval.oovRate(d, "doc_id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toList
    assert(out == List((1L, 3L, 0L, 0.0), (2L, 2L, 1L, 0.5)))
    // vocabSize=1 -> only x in-vocab
    val strict = Retrieval.oovRate(d, "doc_id", "text", vocabSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toList
    assert(strict == List((1L, 1L), (2L, 1L)))
  }

  test("perplexityBuckets: assignment is monotone in nll; approx path agrees") {
    // distinct repetition levels -> distinct nll per doc
    val d = Seq(
      (1L, "a a a a"), (2L, "a a a b"), (3L, "a a b c"), (4L, "a b c d"),
      (5L, "b c d e"), (6L, "c d e f"), (7L, "d e f g"), (8L, "e f g h")
    ).toDF("doc_id", "text")
    val out = Retrieval.perplexityBuckets(d, "doc_id", "text", exact = true)
      .collect().map(r => (r.getDouble(2), r.getString(3))).sortBy(_._1)
    // head = lowest-nll quarter, tail = highest; assignment never
    // decreases as nll rises
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    assert(out.head._2 == "head" && out.last._2 == "tail")
    assert(out.map(t => order(t._2)).sliding(2).forall(p => p(0) <= p(1)))
    // the scale-default approx path buckets this small corpus identically
    val approx = Retrieval.perplexityBuckets(d, "doc_id", "text", exact = false)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val exact = Retrieval.perplexityBuckets(d, "doc_id", "text", exact = true)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(approx == exact)
  }

  test("tfidfKeywords: smooth idf ranks rare terms over common ones") {
    val d = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toList
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idfRare = math.log(3.0 / 2) + 1 // df=1, N=2
    assert(out.map(t => (t._1, t._2, t._3)) == List(
      (1L, 1L, "apple"), (1L, 2L, "banana"),
      (2L, 1L, "cherry"), (2L, 2L, "banana")))
    assert(out(0)._4 == r6(2 * idfRare)) // tf=2 on the rare term
    assert(out(1)._4 == 1.0)             // df=N -> idf collapses to 1
  }

  test("hybridSearch: alpha extremes reduce to pure lexical / pure dense order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha"), // strongest lexical match
      (1L, "alpha beta gamma delta"),
      (2L, "alpha unrelated words here"),
      (3L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    // embeddings chosen so the DENSE order inverts the lexical one
    val emb = Seq(
      (0L, Seq(0.0f, 1.0f)),
      (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val qv = Seq(1.0f, 0.0f)
    def ids(alpha: Double) = Retrieval.hybridSearch(docs, "doc_id", "text",
      emb, "vec_id", "embedding", Seq("alpha", "beta"), qv,
      k = 3, alpha = alpha).collect().map(_.getLong(0)).toSeq
    // alpha=1: BM25 order among docs that HAVE embeddings (0 strongest)
    assert(ids(1.0).head == 0L, s"pure lexical should lead with doc 0: ${ids(1.0)}")
    // alpha=0: cosine order over the lexical candidates (2 is the
    // dense-closest candidate; 3 matches no query term, so it is not a
    // candidate at any alpha)
    val dense = ids(0.0)
    assert(dense.head == 2L, s"pure dense should lead with doc 2: $dense")
    assert(!dense.contains(3L) && !ids(1.0).contains(3L),
      "non-candidates must never appear")
    // blended scores stay within the convex hull of the two signals
    val rows = Retrieval.hybridSearch(docs, "doc_id", "text",
      emb, "vec_id", "embedding", Seq("alpha", "beta"), qv,
      k = 3, alpha = 0.5).collect()
    rows.foreach { r =>
      val score = r.getDouble(3)
      assert(score <= 1.0 + 1e-9 && score >= -1.0 - 1e-9, s"score bound: $r")
    }
  }

  test("bm25Prf: expansion terms from the feedback set rescue vocabulary-mismatched docs") {
    import spark.implicits._
    // query 'alpha'; feedback docs all pair alpha with 'omega'; doc 5
    // never says alpha but is rich in omega — PRF must surface it
    val docs = Seq(
      (1L, "alpha omega one"), (2L, "alpha omega two"),
      (3L, "alpha omega three"), (4L, "noise words here entirely"),
      (5L, "omega omega omega pure")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25Prf(docs, "doc_id", "text", Seq("alpha"),
      k = 5, fbDocs = 3, fbTerms = 1)
    val rows = out.collect()
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.contains(5L), s"PRF must rescue doc 5: $ids")
    assert(!ids.contains(4L), "noise doc matches nothing")
    // the audit column carries exactly the picked expansion term
    assert(rows.head.getSeq[String](3) == Seq("omega"),
      rows.head.toString)
    // expansion never includes an original query term
    val out2 = Retrieval.bm25Prf(docs, "doc_id", "text",
      Seq("alpha", "omega"), k = 5, fbDocs = 3, fbTerms = 2)
    assert(!out2.head().getSeq[String](3).contains("alpha"))
  }

  test("rrfFusion: hand-computed fusion; single-list docs still fuse; k truncates") {
    import spark.implicits._
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val l2 = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFusion(Seq(l1, l2), "id", k = 4, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 10: 1/61 + 1/62; 20: 1/62 + 1/61 (tie, id order); 30: 1/63; 40: 1/63
    val both = r6(1.0 / 61 + 1.0 / 62)
    assert(got.toSeq == Seq(
      (10L, both, 2L), (20L, both, 2L),
      (30L, r6(1.0 / 63), 1L), (40L, r6(1.0 / 63), 1L)))
    // k truncates after the (rrf desc, id) order
    assert(Retrieval.rrfFusion(Seq(l1, l2), "id", k = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 20L))
  }

  test("hybridRrf: fuses lexical and dense frontiers; one-list docs carry a null rank") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha unrelated words here"),
      (3L, "nothing relevant at all") // lexical non-candidate
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(0.0f, 1.0f)),
      (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val rows = Retrieval.hybridRrf(docs, "doc_id", "text",
      emb, "vec_id", "embedding", Seq("alpha", "beta"), Seq(1.0f, 0.0f),
      k = 4, rrfK = 60, candidates = 3).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 0: bm25 rank 1; dense ranks: cos(2)=1 > cos(3)≈.995 > cos(1)≈.707
    // so dense top-3 = (2,3,1) and doc 0 is dense-unranked
    assert(byId(0L).getInt(1) == 1 && byId(0L).isNullAt(2))
    assert(byId(0L).getLong(3) == 1L)
    // doc 3: lexical non-candidate, dense rank 2
    assert(byId(3L).isNullAt(1) && byId(3L).getInt(2) == 2)
    // doc 2 sits in both lists and must out-fuse every one-list doc
    assert(byId(2L).getLong(3) == 2L)
    assert(rows.head.getLong(0) == 2L, rows.mkString(","))
  }

  test("mmrDiversify: defers redundant picks; lambda=1 reduces to pure top-k; first pick is top-rel") {
    import spark.implicits._
    // query along x; doc 1 IS doc 2 (duplicates, rel ~.995); doc 3
    // slightly less relevant but orthogonal to them
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),   // query anchor
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // exact duplicate of 1
      (3L, Seq(0.85f, 0.0f, 0.3f)),
      (4L, Seq(0.0f, 1.0f, 0.0f))    // irrelevant
    ).toDF("vec_id", "embedding")
    val qv = Seq(1.0f, 0.0f, 0.0f)
    val picks = Retrieval.mmrDiversify(emb, "vec_id", "embedding",
        qv, k = 3, lambda = 0.5, candidates = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // rank 1: doc 0 (the anchor itself, rel 1.0); rank 2 must NOT be
    // the duplicate pair's second member right after its first —
    // diversity sends doc 3 ahead of the copy
    assert(picks(0) == (1, 0L))
    val order = picks.map(_._2).toSeq
    val i1 = order.indexOf(1L); val i2 = order.indexOf(2L)
    val i3 = order.indexOf(3L)
    assert((i1 >= 0 && i3 >= 0 && i3 < math.max(i1, if (i2 < 0) 99 else i2))
      || i2 < 0,
      s"diversification must interleave the orthogonal doc: $order")
    // lambda = 1: redundancy ignored -> exactly the cosine top-k order
    val pure = Retrieval.mmrDiversify(emb, "vec_id", "embedding",
        qv, k = 4, lambda = 1.0, candidates = 5)
      .collect().map(_.getLong(1)).toSeq
    val topk = Similarity.topK(emb, "vec_id", "embedding", qv, 4)
      .collect().map(_.getLong(0)).toSeq
    assert(pure == topk, s"$pure vs $topk")
  }

  test("queryLikelihoodTopK: hand-computed Dirichlet scores; zero-cf terms drop; no-hit docs rank by length prior") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"), // tf(a)=2, dl=3
      (2L, "a c"),   // tf(a)=1, dl=2
      (3L, "c c c c")// no hits, dl=4
    ).toDF("doc_id", "text")
    // query = (a, zz): cf(a)=3, cf(zz)=0 -> zz drops, n_seen=1; |C|=9
    val mu = 2.0
    val got = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("a", "zz"), k = 3, mu = mu)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pC = 3.0 / 9.0
    def score(tf: Double, dl: Double) =
      r6((if (tf > 0) math.log(1 + tf / (mu * pC)) else 0.0) +
        1.0 * math.log(mu / (dl + mu)))
    val exp = Seq(
      (1L, 1L, score(2, 3)), (2L, 1L, score(1, 2)), (3L, 0L, score(0, 4)))
      .sortBy(t => (-t._3, t._1))
    assert(got == exp, s"got $got, expected $exp")
    // doc with hits outranks the no-hit doc; the no-hit doc still scores
    assert(got.last._1 == 3L && got.last._2 == 0L)
  }
}
