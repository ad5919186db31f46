package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Distinct character inventories per "language" — the signal a char
  // n-gram model keys on. Deterministic doc synthesis (seeded index
  // arithmetic), 60 docs/lang.
  private val langWords = Map(
    "de" -> Seq("der", "die", "das", "und", "nicht", "schön", "über",
      "straße", "zeit", "machen", "wichtig", "zwischen"),
    "en" -> Seq("the", "and", "with", "that", "would", "through", "people",
      "because", "think", "which", "world", "should"),
    "es" -> Seq("el", "la", "que", "de", "los", "señor", "mañana",
      "también", "porque", "después", "años", "ciudad"),
    "fr" -> Seq("le", "la", "les", "être", "avoir", "français",
      "très", "après", "déjà", "où", "même", "peut"))

  private def corpus(docsPerLang: Int) = {
    val rows = for {
      (lang, words) <- langWords.toSeq.sortBy(_._1)
      d <- 0 until docsPerLang
    } yield {
      val n = 20 + (d % 11)
      val text = (0 until n)
        .map(i => words((d * 31 + i * 7 + i * i) % words.size))
        .mkString(" ")
      (lang.hashCode.toLong * 1000 + d, lang, text)
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("self-classification accuracy >= 0.95 on a 4-language corpus") {
    val docs = corpus(60)
    val model = LangId.train(docs, "lang", "text", n = 3, numBuckets = 2048)
    val conf = LangId.confusion(docs, "doc_id", "lang", "text", model)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = conf.values.sum
    val correct = conf.collect { case ((l, p), c) if l == p => c }.sum
    assert(total == 240L, s"every doc classified once, got $total")
    assert(correct.toDouble / total >= 0.95,
      s"accuracy ${correct.toDouble / total} below 0.95: $conf")
  }

  test("held-out split still separates languages (not memorization)") {
    val docs = corpus(60)
    val train = docs.filter($"doc_id" % 3 =!= 0)
    val test = docs.filter($"doc_id" % 3 === 0)
    val model = LangId.train(train, "lang", "text", n = 3, numBuckets = 2048)
    val conf = LangId.confusion(test, "doc_id", "lang", "text", model)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = conf.values.sum
    val correct = conf.collect { case ((l, p), c) if l == p => c }.sum
    assert(correct.toDouble / total >= 0.9,
      s"held-out accuracy ${correct.toDouble / total}: $conf")
  }

  test("scores: one row per (doc, label); Laplace smoothing prices unseen grams") {
    val docs = Seq((1L, "en", "the and with"), (2L, "fr", "le la tres"))
      .toDF("doc_id", "lang", "text")
    val model = LangId.train(docs, "lang", "text", n = 3, numBuckets = 256)
    val sc = LangId.scores(docs, "doc_id", "text", model)
    assert(sc.count() == 4L, "2 docs x 2 labels")
    // an unseen-gram doc still scores finitely under both labels
    val unseen = Seq((9L, "zzz qqq xxx")).toDF("doc_id", "text")
    val s9 = LangId.scores(unseen, "doc_id", "text", model)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(s9.size == 2 && s9.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("docs shorter than n code points are dropped; ties break to smallest label") {
    val docs = Seq((1L, "a", "xy"), (2L, "b", "xyzw")).toDF("doc_id", "lang", "text")
    val model = LangId.train(docs, "lang", "text", n = 3, numBuckets = 64)
    val out = LangId.classify(docs, "doc_id", "text", model).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L), "2-char doc has no 3-gram")
    // symmetric single-doc labels -> equal likelihoods, equal priors:
    // the tie must deterministically pick the smallest label
    val tied = Seq((1L, "a", "xyzw"), (2L, "b", "xyzw")).toDF("doc_id", "lang", "text")
    val m2 = LangId.train(tied, "lang", "text", n = 3, numBuckets = 64)
    val preds = LangId.classify(tied, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "a", 2L -> "a"))
  }

  test("training is deterministic and the model is dense over L x B") {
    val docs = corpus(20)
    val m1 = LangId.train(docs, "lang", "text", n = 3, numBuckets = 512)
    val m2 = LangId.train(docs, "lang", "text", n = 3, numBuckets = 512)
    assert(m1.likelihoods.count() == 4L * 512L, "dense grid: L x B rows")
    val s1 = m1.likelihoods.orderBy("label", "b").collect().toSeq
    val s2 = m2.likelihoods.orderBy("label", "b").collect().toSeq
    assert(s1 == s2)
    assert(m1.labels.orderBy("label").collect().toSeq ==
      m2.labels.orderBy("label").collect().toSeq)
  }

  test("char_ngram_buckets: poly-31 formula, code-point walk, short input") {
    val out = Seq(("abc"), ("ab"), ("café"))
      .toDF("t")
      .select(graft.functions.char_ngram_buckets(col("t"), 3, 4096).as("b"))
      .collect().map(_.getSeq[Int](0))
    def b3(a: Char, b: Char, c: Char) =
      ((((a.toInt * 31 + b.toInt) * 31 + c.toInt) % 4096) + 4096) % 4096
    assert(out(0) == Seq(b3('a', 'b', 'c')))
    assert(out(1) == Seq(), "2 chars < n=3 -> no grams")
    assert(out(2) == Seq(b3('c', 'a', 'f'), b3('a', 'f', 'é')),
      "non-ASCII code point hashes by its unicode value")
    // supplementary characters count as ONE code point
    val emoji = Seq(("a😀b")).toDF("t")
      .select(graft.functions.char_ngram_buckets(col("t"), 3, 4096).as("b"))
      .head.getSeq[Int](0)
    assert(emoji == Seq(((('a'.toInt * 31L + 0x1F600) * 31L + 'b'.toInt) % 4096L).toInt))
  }
}
