package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("token counts: whitespace and bpe-ish") {
    val r = one("Hello world, it's 42 degrees!").select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeTokenCount(col("text"))).head
    assert(r.getInt(0) == 5)
    // Hello|world|,|it|'|s|42|degrees|! = 9
    assert(r.getInt(1) == 9)
  }

  test("punct ratio and empty text safety") {
    val r = one("a,b.c").select(TextAnalysis.punctRatio(col("text"))).head.getDouble(0)
    assert(math.abs(r - 0.4) < 1e-9)
    val e = one("").select(TextAnalysis.punctRatio(col("text"))).head.getDouble(0)
    assert(e == 0.0)
  }

  test("stopword ratio counts multiplicity") {
    val r = one("the cat and the dog").select(
      TextAnalysis.stopwordRatio(col("text"))).head.getDouble(0)
    assert(math.abs(r - 0.6) < 1e-9) // the, and, the = 3/5
  }

  test("langId predicts marker-bearing text; und when no markers") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy"),
      (2L, "der hund und die katze sind nicht zu hause"),
      (3L, "le chat est dans la maison pour la nuit"),
      (4L, "el perro y la casa es muy grande por ahora"),
      (5L, "qwerty zxcvb asdfgh")).toDF("doc_id", "text")
    val got = samples.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "es")
    assert(got(5L) == "und")
  }

  test("fingerprint is stable under whitespace/case noise, differs across content") {
    val d = Seq(
      (1L, "The Quick  Brown   Fox"),
      (2L, "the quick brown fox"),
      (3L, "a totally different sentence")).toDF("doc_id", "text")
    val fp = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("shingles: char and word shapes") {
    val r = one("abcdef").select(TextAnalysis.charShingles(col("text"), 4)).head.getSeq[String](0)
    assert(r == Seq("abcd", "bcde", "cdef"))
    val w = one("a b c d").select(
      TextAnalysis.wordShingles(TextAnalysis.tokens(col("text")), 2)).head.getSeq[String](0)
    assert(w == Seq("a b", "b c", "c d"))
    // shorter than the shingle size falls back to the whole text
    val s = one("ab").select(TextAnalysis.charShingles(col("text"), 4)).head.getSeq[String](0)
    assert(s == Seq("ab"))
  }

  test("wordShingles edges match the HOF semantics (ADVICE r2)") {
    // fewer tokens than n -> ONE shingle of the whole array
    val single = one("hello").select(
      TextAnalysis.wordShingles(TextAnalysis.tokens(col("text")), 2)).head.getSeq[String](0)
    assert(single == Seq("hello"))
    // empty token array -> one empty shingle (concat_ws of nothing)
    val empty = spark.sql("SELECT array()").select(
      TextAnalysis.wordShingles(col("array()").cast("array<string>"), 3)).head.getSeq[String](0)
    assert(empty == Seq(""))
    // null tokens are skipped by the separator join (concat_ws semantics)
    val withNulls = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS toks")
      .select(TextAnalysis.wordShingles(col("toks"), 2)).head.getSeq[String](0)
    assert(withNulls == Seq("a", "b"))
    // and the whole-array fallback also drops nulls
    val nullsShort = spark.sql("SELECT array('a', CAST(NULL AS STRING)) AS toks")
      .select(TextAnalysis.wordShingles(col("toks"), 3)).head.getSeq[String](0)
    assert(nullsShort == Seq("a"))
  }

  test("gopher rules: published gates admit prose, reject degenerate docs") {
    val prose = ("the data and the model that we have built with care " * 6).trim // 66 words
    val docs = Seq(
      (1L, prose),                                  // passes all five gates
      (2L, "short doc of the and that"),            // < 50 words
      (3L, ("## ### #### " * 20 + prose)),          // symbol ratio > 0.1
      (4L, ("a b c d e f g h i j " * 6) + "the of") // mean word len < 3
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("passes_gopher"))
    assert(got(1L).getAs[Long]("n_words") == 66L)
    assert(got(1L).getAs[Long]("stopword_types") >= 4) // the/and/that/have/with
    assert(got(1L).getAs[Double]("alpha_word_ratio") == 1.0)
    assert(!got(2L).getAs[Boolean]("passes_gopher"))
    assert(!got(3L).getAs[Boolean]("passes_gopher"))
    assert(got(3L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!got(4L).getAs[Boolean]("passes_gopher"))

    val kept = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("token-count kernels match their HOF equivalents") {
    val df = spark.sql(
      "SELECT array('the','cat','the','dog', CAST(NULL AS STRING), 'a1') AS toks")
    val r = df.select(
      graft.functions.count_in_set(col("toks"), Seq("the", "a", "dog")).as("multi"),
      graft.functions.count_in_set(col("toks"), Seq("the", "a", "dog"),
        distinct = true).as("types"),
      graft.functions.count_matching(col("toks"), "[0-9]").as("with_digit"),
      // HOF reference forms
      size(filter(col("toks"), t =>
        array_contains(array(lit("the"), lit("a"), lit("dog")), t))).as("multi_hof"),
      size(array_intersect(col("toks"),
        array(lit("the"), lit("a"), lit("dog")))).as("types_hof"),
      size(filter(col("toks"), t => t.rlike("[0-9]"))).as("digit_hof")).head
    assert(r.getInt(0) == 3 && r.getInt(0) == r.getInt(3)) // the,the,dog
    assert(r.getInt(1) == 2 && r.getInt(1) == r.getInt(4)) // {the,dog}
    assert(r.getInt(2) == 1 && r.getInt(2) == r.getInt(5)) // a1
    // null array -> null result
    val n = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks")
      .select(graft.functions.count_in_set(col("toks"), Seq("x"))).head
    assert(n.isNullAt(0))
  }

  test("repetitionRatio: duplicate n-gram fraction, short-doc guard") {
    val df = Seq(
      (1L, "a b a b a b"),        // bigrams: ab,ba,ab,ba,ab -> 2 distinct of 5
      (2L, "one two three four"), // all distinct
      (3L, "word")                // too short for a bigram
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      round(TextAnalysis.repetitionRatio(TextAnalysis.tokens(col("text")), 2), 4).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.6)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("documentStats runs over the real documents table with sane ranges") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val stats = TextAnalysis.documentStats(docs, "doc_id", "text")
    val rows = stats.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("n_tokens")) > 0)
      val q = r.getDouble(r.fieldIndex("quality"))
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $q")
      val pr = r.getDouble(r.fieldIndex("punct_ratio"))
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("quality favors normal prose over degenerate text") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far into the quiet woods " * 4),
      (2L, "!!! ??? ... ;;; ::: @@@ ### $$$ %%% ^^^"),
      (3L, "x")).toDF("doc_id", "text")
    val q = d.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) > q(2L), s"prose ${q(1L)} should beat punct soup ${q(2L)}")
    assert(q(1L) > q(3L), s"prose ${q(1L)} should beat single char ${q(3L)}")
  }

  test("cleanText: NFC composes, consonant sequences stay, controls strip") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val rows = Seq(
      (1L, "e\u0301clair"),           // e + combining acute -> precomposed
      (2L, "b\u0301x"),               // no precomposed form: stays 2 cps
      (3L, "a\u0007b\tc   d "),      // controls -> spaces -> collapsed
      (4L, "caf\u00e9")               // already NFC: unchanged
    ).toDF("id", "t")
    val out = rows.select(col("id"), TextAnalysis.cleanText(col("t")).as("c"),
        length(TextAnalysis.cleanText(col("t"))).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L)._1 == "\u00e9clair" && out(1L)._2 == 6, s"got ${out(1L)}")
    assert(out(2L)._1 == "b\u0301x" && out(2L)._2 == 3, s"got ${out(2L)}")
    assert(out(3L)._1 == "a b c d", s"got ${out(3L)}")
    assert(out(4L)._1 == "caf\u00e9", s"got ${out(4L)}")
  }

  test("c4Stats: line gate, sentence count, content flags \u2014 hand-computed") {
    import spark.implicits._
    val docs = Seq(
      // 3 keepable sentences + one short line + one unpunctuated line
      (1L, "the first full sentence has plenty here.\nshort one.\n" +
        "another proper sentence sits right here!\nno terminal punctuation line with words\n" +
        "a third full sentence finishes the page?"),
      (2L, "function f() { return 1; } with a sentence here though."), // brace
      (3L, "lorem ipsum dolor sit amet plus a real sentence here.\n" +
        "second proper sentence with enough words.\nthird proper sentence with enough words."),
      (4L, "only two sentences but both fully valid here.\n" +
        "the second one is also long enough truly.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    // doc 1: 5 lines; "short one." has < 5 words, the unpunctuated line
    // fails the ending rule -> 3 kept -> 3 sentences -> passes
    assert(out(1L) == ((5L, 3L, 3L, false, false, true)), s"got ${out(1L)}")
    assert(out(2L)._4 && !out(2L)._6, s"brace page must fail: ${out(2L)}")
    assert(out(3L)._5 && !out(3L)._6, s"lorem page must fail: ${out(3L)}")
    // doc 4: both lines kept but only 2 sentences -> fails the page gate
    assert(out(4L) == ((2L, 2L, 2L, false, false, false)), s"got ${out(4L)}")
  }

  test("c4Filter rewrites text to the surviving lines and drops failing pages") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a good long sentence number one here.\nbad line\n" +
        "a good long sentence number two here.\na good long sentence number three here."),
      (2L, "code { inside } this page with sentences.")
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.c4Filter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L))
    assert(kept(1L) == "a good long sentence number one here.\n" +
      "a good long sentence number two here.\na good long sentence number three here.",
      s"got ${kept(1L)}")
  }

  test("pmiCollocations: hand-computed PMI over a tiny corpus") {
    import spark.implicits._
    // bigrams: "a b" x2, "b a" (doc1), "c d" (doc2) -> B=4
    // left: a=2 b=1 c=1; right: b=2 a=1 d=1
    // pmi(a b) = ln(2*4/(2*2)) = ln 2
    // pmi(b a) = pmi(c d) = ln(1*4/(1*1)) = ln 4 — tie, bigram asc
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
        minCount = 1, topK = 10).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a b") == ((2L, 2L, 2L, math.rint(math.log(2) * 1e6) / 1e6)))
    assert(out("c d")._4 == math.rint(math.log(4) * 1e6) / 1e6)
    assert(out("b a")._4 == out("c d")._4)
    // ranking: the exclusive pairs out-score the frequent one; the
    // tie breaks on the bigram string
    val top = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 1, topK = 1).collect()
    assert(top(0).getString(0) == "b a")
  }

  test("pmiCollocations: minCount floors rare pairs; marginals stay global") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
        minCount = 2, topK = 10).collect().map(_.getString(0))
    // "x z" (count 1) and "y x" (count 2)? bigrams: x y, y x, x y, y x, x y / x z
    // counts: "x y"=3, "y x"=2, "x z"=1 -> minCount=2 keeps two
    assert(out.toSet == Set("x y", "y x"))
  }

  test("zipfFit: exact power law recovers its slope with r2 = 1") {
    import spark.implicits._
    // term t_r appears floor(1024 / 2^(r-1)) times: ln f = ln 1024 -
    // (r-1) ln 2 over ranks 1,2,4,8,... not linear in ln r — instead
    // build f_r = 1024 / r for r = 1..8 (slope exactly -1 in log-log)
    val doc = (1 to 8).flatMap(r =>
      Seq.fill(1024 / r)(f"t$r%02d")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq((1L, doc)).toDF("id", "text"),
      "text", topK = 8).collect()(0)
    assert(out.getLong(0) == 8L)
    // 1024/r truncates at r=3 (341), so slope is ~-1, not exactly
    assert(math.abs(out.getDouble(1) + 1.0) < 0.01, s"slope ${out.getDouble(1)}")
    assert(out.getDouble(3) > 0.9999, s"r2 ${out.getDouble(3)}")
  }

  test("zipfFit: deterministic under ties and partition counts") {
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(i % 5 + 2)(s"w${i % 11}").mkString(" ")))
    def run(parts: Int) =
      TextAnalysis.zipfFit(docs.toDF("id", "text").repartition(parts),
        "text", topK = 10).collect()(0).toSeq
    assert(run(1) == run(13))
  }

  test("lexicalDiversity: hand spectrum, case folding, empty docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b c"), // N=4 V=3 V1=2 sm2=6: ttr .75, hapax 2/3, K 1250
      (2L, "A a"), // case-folds to one type: N=2 V=1 V1=0 sm2=4, K 5000
      (3L, "   "), // zero tokens: dropped
      (4L, "x y z")) // all hapax: ttr 1, hapax 1, K 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(!out.contains(3L))
    assert(out(1L) == ((4L, 3L, 0.75, 0.666667, 1250.0)))
    assert(out(2L) == ((2L, 1L, 0.5, 0.0, 5000.0)))
    assert(out(4L) == ((3L, 3L, 1.0, 1.0, 0.0)))
  }

  test("bleuCorpus: hand precisions, clipping, BP, degenerate cases") {
    import spark.implicits._
    def one(cand: String, ref: String) =
      TextAnalysis.bleuCorpus(Seq((1L, cand, ref)).toDF("id", "c", "r"),
        "c", "r", "id").collect()(0)
    // hand case: p = (1, 3/4, 2/3, 1/2), BP = e^(1-6/5)
    val h = one("a b c d e", "a b c d f e")
    assert(h.getDouble(3) == 1.0)
    assert(h.getDouble(4) == 0.75)
    assert(math.abs(h.getDouble(5) - 2.0 / 3.0) < 1e-6)
    assert(h.getDouble(6) == 0.5)
    val expBleu = math.exp(1.0 - 6.0 / 5.0) *
      math.pow(1.0 * 0.75 * (2.0 / 3.0) * 0.5, 0.25)
    assert(math.abs(h.getDouble(8) - expBleu) < 1e-5)
    // clipping: "the" appears once in the ref, three times in the cand
    val c = one("the the the", "the cat")
    assert(math.abs(c.getDouble(3) - 1.0 / 3.0) < 1e-6)
    // identical pair: every precision 1, BP 1, BLEU 1
    val i = one("x y z w v", "x y z w v")
    assert(i.getDouble(7) == 1.0 && i.getDouble(8) == 1.0)
    // candidates too short for 4-grams: p4 null, bleu 0
    val s = one("the cat sat", "the cat sat on the mat")
    assert(s.isNullAt(6) && s.getDouble(8) == 0.0)
    // corpus sums pool across pairs (not an average of pair scores)
    val corp = TextAnalysis.bleuCorpus(
      Seq((1L, "a b c d e", "a b c d f e"),
        (2L, "x y z w v", "x y z w v")).toDF("id", "c", "r"),
      "c", "r", "id").collect()(0)
    assert(corp.getLong(0) == 2L && corp.getLong(1) == 10L)
    assert(corp.getDouble(3) == 1.0) // 1-grams all match in both pairs
    assert(math.abs(corp.getDouble(4) - 7.0 / 8.0) < 1e-6)
  }

  test("keyness: hand G2 values, directions, ordering") {
    import spark.implicits._
    val a = Seq("cat cat dog").toDF("text")
    val b = Seq("dog bird bird bird").toDF("text")
    val out = TextAnalysis.keyness(a, b, "text", topK = 10).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("cat", "bird", "dog"))
    def g2(na: Long, nb: Long, ta: Long, tb: Long): Double = {
      val ea = (na + nb).toDouble * ta / (ta + tb)
      val eb = (na + nb).toDouble * tb / (ta + tb)
      val s = (if (na > 0) na * math.log(na / ea) else 0.0) +
        (if (nb > 0) nb * math.log(nb / eb) else 0.0)
      math.floor(2.0 * s * 1e6 + 0.5) / 1e6
    }
    val byWord = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(4), r.getString(5))).toMap
    assert(byWord("cat") == ((2L, 0L, g2(2, 0, 3, 4), "over")))
    assert(byWord("bird") == ((0L, 3L, g2(0, 3, 3, 4), "under")))
    // dog: rate 1/3 in A vs 1/4 in B -> over-represented in A
    assert(byWord("dog") == ((1L, 1L, g2(1, 1, 3, 4), "over")))
    // identical corpora: every G2 is exactly 0
    val same = TextAnalysis.keyness(a, a, "text", topK = 10).collect()
    assert(same.forall(_.getDouble(4) == 0.0))
    intercept[IllegalArgumentException] {
      TextAnalysis.keyness(a, Seq("").toDF("text"), "text").collect()
    }
  }

  test("rougeScores: order sensitivity of ROUGE-L, clipping, nulls") {
    import spark.implicits._
    def one(cand: String, ref: String) =
      TextAnalysis.rougeScores(
        Seq((1L, cand, ref)).toDF("id", "c", "r"), "c", "r", "id")
        .collect()(0)
    // columns: 0 id, 1..3 rouge1 p/r/f, 4..6 rouge2, 7..9 rougeL
    // reversal: every unigram matches but the LCS is a single token
    val rev = one("c b a", "a b c")
    assert(rev.getDouble(1) == 1.0) // rouge1_p
    assert(math.abs(rev.getDouble(7) - 1.0 / 3.0) < 1e-6) // rougeL_p
    // bigram overlap: cand (a b, b x); ref (a b, b c) -> m2 = 1
    val bg = one("a b x", "a b c")
    assert(bg.getDouble(4) == 0.5) // rouge2_p = 1/2
    // clipping: repeated cand token counts once against a single ref
    val cl = one("w w w", "w z")
    assert(math.abs(cl.getDouble(1) - 1.0 / 3.0) < 1e-6) // rouge1_p
    assert(cl.getDouble(2) == 0.5) // rouge1_r = 1/2
    // LCS respects multiplicity: "a a" vs "a b a" -> lcs 2
    val mult = one("a a", "a b a")
    assert(mult.getDouble(7) == 1.0) // rougeL_p = 2/2
    assert(math.abs(mult.getDouble(8) - 2.0 / 3.0) < 1e-6)
    // single-token sides: rouge2 denominators are 0 -> nulls
    val tiny = one("a", "a")
    assert(tiny.isNullAt(4) && tiny.isNullAt(5) && tiny.isNullAt(6))
    assert(tiny.getDouble(9) == 1.0) // rougeL_f on identical singletons
    // the maxTokens cap surfaces as null ROUGE-L, not truncation
    val capped = TextAnalysis.rougeScores(
      Seq((1L, "a b c d e f", "a b c")).toDF("id", "c", "r"),
      "c", "r", "id", maxTokens = 4).collect()(0)
    assert(capped.isNullAt(7) && capped.isNullAt(8) && capped.isNullAt(9))
    assert(!capped.isNullAt(1)) // rouge-n unaffected by the LCS cap
  }

  test("textRank: symmetric pair, hub outranks leaves, stopwords out") {
    import spark.implicits._
    // one repeated bigram (+ a stopword-laced doc that reduces to the
    // same pair): two symmetric nodes -> both score exactly 1.0
    val sym = Seq("alpha beta alpha beta alpha", "the alpha the beta")
      .toDF("text")
    val s = TextAnalysis.textRank(sym, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s.keySet == Set("alpha", "beta"))
    assert(s.values.forall(_ == 1.0))
    // star graph: the hub holds more rank than any leaf
    val star = Seq("hub one", "hub two", "hub three", "hub four")
      .toDF("text")
    val st = TextAnalysis.textRank(star, "text", topK = 10).collect()
    assert(st.head.getString(0) == "hub")
    assert(st.head.getDouble(1) > st(1).getDouble(1))
    assert(st.length == 5)
    // self-adjacency alone builds no edge -> loud failure
    intercept[IllegalArgumentException] {
      TextAnalysis.textRank(Seq("zz zz zz").toDF("text"), "text")
    }
    // topK caps the output
    assert(TextAnalysis.textRank(star, "text", topK = 2)
      .collect().length == 2)
  }

  test("heapsLaw: linear vocab growth fits beta ~ 1, fixed vocab ~ 0") {
    // every doc introduces one fresh word plus two stock words
    val grow = (1L to 200L).map(i => (i, s"w$i common stock"))
      .toDF("doc_id", "text")
    val g = TextAnalysis.heapsLaw(grow, "doc_id", "text").collect()
    assert(g.length == 10)
    assert(math.abs(g.head.getDouble(3) - 1.0) < 0.12,
      s"beta=${g.head.getDouble(3)}")
    assert(g.head.getDouble(5) > 0.99) // near-perfect log-log line
    // types strictly non-decreasing along the curve
    assert(g.map(_.getLong(2)).sliding(2).forall(p => p(0) <= p(1)))
    // fixed tiny vocab: the curve flattens
    val flat = (1L to 200L).map(i => (i, s"a b c d"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.heapsLaw(flat, "doc_id", "text").collect()
    assert(math.abs(f.head.getDouble(3)) < 0.05)
  }

  test("collocations: PMI matches the hand formula, filters apply") {
    // "nova york" always adjacent (4x); "rio" floats free; "de" is a
    // stopword-free 2-char token but "a" is single-char (filtered)
    val docs = Seq(
      "nova york rio", "nova york", "rio nova york",
      "nova york a rio rio").toDF("text")
    val out = TextAnalysis.collocations(docs, "text",
      minCount = 2L, topK = 10).collect()
    val top = out.head
    assert((top.getString(0), top.getString(1)) == ("nova", "york"))
    // T = 13 tokens, P = 9 pairs, c(nova,york)=4, c(nova)=4, c(york)=4
    val pmi = math.log((4.0 / 9.0) / ((4.0 / 13.0) * (4.0 / 13.0)))
    assert(math.abs(top.getDouble(3) - pmi) < 1e-6)
    // single-char tokens never appear in a kept pair
    assert(out.forall(r => r.getString(0).length >= 2 &&
      r.getString(1).length >= 2))
    // below minCount is cut
    assert(!out.exists(r => r.getLong(2) < 2L))
  }

  test("latentTopics: planted disjoint vocabularies separate, " +
    "deterministic, guards") {
    import spark.implicits._
    // 30 fruit docs + 30 animal docs with DISJOINT vocabularies: EM
    // from the perturbed-uniform init must pull the blocks apart
    val fruit = Seq("apple", "banana", "cherry", "date")
    val beast = Seq("zebra", "yak", "wolf", "vole")
    def doc(words: Seq[String], i: Int): String =
      (0 until 12).map(j => words((i + j) % 4)).mkString(" ")
    val docs = ((1 to 30).map(i => (i.toLong, doc(fruit, i))) ++
      (1 to 30).map(i => (30L + i, doc(beast, i))))
      .toDF("doc_id", "text")
    val out = TextAnalysis.latentTopics(docs, "doc_id", "text",
      k = 2, iters = 6, vocabSize = 10, topTerms = 4)
    val rows = out.collect()
    assert(rows.length == 8)
    val byTopic = rows.groupBy(_.getInt(0))
      .map { case (t, rs) =>
        t -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    assert(byTopic.keySet == Set(0, 1))
    // each topic's top-4 is one pure block (either assignment)
    val tops = byTopic.values.map(_.toSet).toSet
    assert(tops == Set(fruit.toSet, beast.toSet), s"$byTopic")
    // weights are probabilities over the topic's vocabulary slice
    rows.foreach(r => assert(r.getDouble(3) > 0.0 &&
      r.getDouble(3) <= 1.0))
    // deterministic + partition-invariant (decimal-quantized M steps)
    def run(parts: Int) = TextAnalysis.latentTopics(
      docs.repartition(parts), "doc_id", "text",
      k = 2, iters = 6, vocabSize = 10, topTerms = 4)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(17))
    intercept[IllegalArgumentException] {
      TextAnalysis.latentTopics(docs, "doc_id", "text", k = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.latentTopics(docs, "doc_id", "text", iters = 0)
    }
    // the mixture face: every fruit doc routes to the fruit topic,
    // every animal doc to the other; weights per doc sum to ~1; one
    // dominant row per doc
    val fruitTopic = byTopic.find(_._2.toSet == fruit.toSet).get._1
    val mix = TextAnalysis.latentTopicMixture(docs, "doc_id", "text",
      k = 2, iters = 6, vocabSize = 10).collect()
    assert(mix.length == 120) // 60 docs x 2 topics
    val byDoc = mix.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rs) =>
      assert(math.abs(rs.map(_.getDouble(2)).sum - 1.0) < 1e-5, s"$d")
      val dom = rs.filter(_.getBoolean(3))
      assert(dom.length == 1, s"doc $d dominant rows: ${dom.length}")
      val want = if (d <= 30) fruitTopic else 1 - fruitTopic
      assert(dom.head.getInt(1) == want,
        s"doc $d routed to ${dom.head.getInt(1)}, want $want")
    }
  }

  test("ppmiEmbeddings: planted synonyms embed identically, disjoint " +
    "contexts orthogonally, ANN loop closes") {
    import spark.implicits._
    // alpha and beta share every context; gamma lives in its own
    val docs = Seq(
      "c1 alpha c2", "c3 alpha c4", "c5 alpha c1",
      "c1 beta c2", "c3 beta c4", "c5 beta c1",
      "x1 gamma x2", "x2 gamma x1", "x1 gamma x2").toDF("text")
    val emb = TextAnalysis.ppmiEmbeddings(docs, "text",
        vocabSize = 50, dim = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    assert(cos(emb("alpha"), emb("beta")) > 0.999,
      s"synonyms: ${cos(emb("alpha"), emb("beta"))}")
    assert(math.abs(cos(emb("alpha"), emb("gamma"))) < 0.3,
      s"disjoint: ${cos(emb("alpha"), emb("gamma"))}")
    // the corpus -> embeddings -> ANN loop: feed the frame to the
    // Similarity scorer as float vectors; alpha's own row ranks first
    // (sim 1.0), the planted synonym second
    val embDf = TextAnalysis.ppmiEmbeddings(docs, "text",
        vocabSize = 50, dim = 8)
      .select(col("term"),
        col("embedding").cast("array<float>").as("embedding"))
    val q = emb("alpha").map(_.toFloat).toSeq
    val ann = Similarity.topK(embDf, "term", "embedding", q, 2)
      .collect().map(_.getString(0))
    assert(ann.head == "alpha" && ann(1) == "beta", ann.mkString(","))
  }

  test("ppmiNeighbors: truncated-dim pool recovers the exact block " +
    "structure, deterministic across partitionings") {
    import spark.implicits._
    // 4 disjoint co-occurrence blocks x 6 words: within-block
    // adjacencies only, all frequencies equal — each word's true PPMI
    // neighbors are its block-mates; dim 8 << the 24-term vocab forces
    // the pool through genuine truncation
    val blocks = (0 until 4).map(b => (0 until 6).map(w => f"b${b}w$w"))
    val docs = blocks.zipWithIndex.flatMap { case (ws, _) =>
      (0 until 6).map(r => ws.drop(r).mkString(" ") + " " +
        ws.take(r).mkString(" ")) // rotations: every adjacency occurs
    }.toDF("text")
    val out = TextAnalysis.ppmiNeighbors(docs, "text", nProbes = 3,
      topK = 3, vocabSize = 50, dim = 8).collect()
    // in a pure 6-cycle, a word's row = its two adjacent words, so the
    // only nonzero ROW cosines are the two second-neighbors (shared
    // context words): exactly 2 candidates per probe, both in-block
    assert(out.length == 6, out.mkString(","))
    out.foreach { r =>
      val (probe, nb) = (r.getString(0), r.getString(2))
      assert(probe.take(2) == nb.take(2),
        s"$probe's neighbor $nb crossed blocks")
      assert(r.getBoolean(4))
    }
    val again = TextAnalysis.ppmiNeighbors(docs.repartition(7), "text",
      nProbes = 3, topK = 3, vocabSize = 50, dim = 8)
      .collect().map(_.toSeq)
    assert(out.map(_.toSeq).toSeq == again.toSeq)
  }
}
