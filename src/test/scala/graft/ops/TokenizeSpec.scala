package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wordVocab counts corpus frequency per distinct token") {
    val d = Seq((1L, "ab ab cd"), (2L, "ab CD")).toDF("doc_id", "text")
    val v = Tokenize.wordVocab(d, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("ab" -> 3L, "cd" -> 2L)) // lowercased merge
  }

  test("topBpePairs weights pairs by word frequency with multiplicity") {
    // 'aaa' x2 -> pair 'aa' twice per occurrence = 4; 'ab' x3 -> 'ab' = 3
    val d = Seq((1L, "aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("aa" -> 4L, "ab" -> 3L))
  }

  test("single-char tokens contribute no pair; ties break by pair asc") {
    val d = Seq((1L, "x y zw wz")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("wz" -> 1L, "zw" -> 1L))
  }

  test("the top pair is the first BPE merge on a realistic skew") {
    // 'the' dominates -> 'th' (and 'he') lead the count
    val d = Seq((1L, "the the the then he")).toDF("doc_id", "text")
    val top = Tokenize.topBpePairs(d, "text", k = 1).head
    assert(top.getString(0) == "he" && top.getLong(1) == 5L)
  }

  test("bpeEncodedLength applies merges in rank order, hand-computed") {
    // merges (t,h) then (th,e): 'the' -> t h e -> th e -> the (1 token);
    // 'then' -> th e n -> the n (2); 'in' -> i n -> in (1) via (i,n)
    val d = Seq((1L, "the then in"), (2L, "the the")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"))
    val out = Tokenize.bpeEncodedLength(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 4L)), s"the=1 then=2 in=1 -> 4 tokens: $out")
    assert(out(2L) == ((2L, 2L)))
    // ORDER matters: without the (t,h) merge first, (th,e) never fires
    val reversed = Tokenize.bpeEncodedLength(d, "doc_id", "text",
      Seq(("th", "e"), ("t", "h"), ("i", "n")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reversed(1L) == 6L, // the -> th e (2), then -> th e n (3), in (1)
      s"rank order must change the encoding: $reversed")
  }

  test("merges never fire across segment boundaries (the 'there' case)") {
    // there -> t h e r e -> (t,h) -> th e r e -> (th,e) -> the r e;
    // (e,r) must NOT match the 'e r' spanning segments [the][r] — the
    // segment pairs are (the,r),(r,e); then (r,e) -> [the, re] = 2.
    // A plain substring replace on 'the r e' wrongly merged to 1.
    val d = Seq((1L, "there")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("r", "e"))
    val out = Tokenize.bpeEncodedLength(d, "doc_id", "text", merges)
      .head
    assert(out.getLong(2) == 2L, s"'there' must encode to [the, re]: $out")
  }

  test("bpeTokenIds: id sequences in token order, OOV -> unkId") {
    val d = Seq((1L, "the there Zap"), (2L, "in")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("r", "e"), ("i", "n"))
    // vocab: the merge products + the letters they decompose to; 'z'/'p'
    // missing so 'zap' maps to [unk, 0, unk]
    val vocab = Seq("a", "e", "h", "i", "n", "r", "t", "th", "the", "re", "in")
    val out = Tokenize.bpeTokenIds(d, "doc_id", "text", merges, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // doc 1: the=[the]=8, there=[the,re]=[8,9], zap=[-1,0,-1]
    assert(out(1L) == Seq(8, 8, 9, -1, 0, -1), s"got ${out(1L)}")
    assert(out(2L) == Seq(10), s"got ${out(2L)}")
  }

  test("bpeTokenIds: recompute path (pinTokenFrame=false) matches the pinned default") {
    val docs = spark.read.parquet(s"${graft.SparkTestSession.sf0001}/documents.parquet")
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("r", "e"), ("i", "n"),
      ("a", "n"), ("o", "n"), ("a", "t"))
    val vocab = ('a' to 'z').map(_.toString) ++
      merges.map { case (a, b) => a + b }
    def run(pin: Boolean) =
      Tokenize.bpeTokenIds(docs, "doc_id", "text", merges, vocab,
        pinTokenFrame = pin)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val pinned = run(pin = true)
    val recomputed = run(pin = false)
    assert(pinned.nonEmpty && pinned == recomputed,
      "pin and recompute paths must produce identical id sequences")
  }

  // ------------------------------------------------------ trainer —

  test("trainBpeMerges learns the canonical Sennrich example in order") {
    // the classic corpus: low x5, lower x2, newest x6, widest x3
    // expected greedy merges: (e,s)=9 -> (es,t)=9 -> (l,o)=7 -> (lo,w)=7
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))
    ).toDF("doc_id", "text")
    val merges = Tokenize.trainBpeMerges(docs, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got $merges")
  }

  test("trainer stops early below minCount; singleton pairs learn nothing") {
    val docs = Seq((1L, "abc def ghi")).toDF("doc_id", "text")
    assert(Tokenize.trainBpeMerges(docs, "text", numMerges = 10) == Seq(),
      "every pair occurs once -> no merge at minCount=2")
    assert(Tokenize.trainBpeMerges(docs, "text", numMerges = 2,
      minCount = 1L).length == 2, "minCount=1 permits singleton merges")
  }

  test("trained merges feed the apply kernel: encoded lengths shrink correctly") {
    val docs = Seq((1L, "low low low lowest"), (2L, "lowest low")).toDF("doc_id", "text")
    val merges = Tokenize.trainBpeMerges(docs, "text", numMerges = 3, minCount = 2L)
    // 'low' (x5) drives (l,o) then (lo,w); 'lowest' follows with its prefix
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")), s"got $merges")
    val lens = Tokenize.bpeEncodedLength(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1: low=1 token x3 + lowest -> [low,e,s,t]=4 (or fewer if a 3rd
    // merge fired on e/s/t pairs: lowest appears twice corpus-wide, so
    // (low,e) or (e,s)... count=2 -> a 3rd merge exists; recompute exactly:
    // after (l,o),(lo,w): vocab low:5 -> [low]; lowest:2 -> [low,e,s,t]
    // pairs: (low,e)=2 (e,s)=2 (s,t)=2 -> tie breaks lex: (e,s) wins
    // lowest -> [low,es,t] = 3 tokens
    assert(merges(2) == (("e", "s")), s"got $merges")
    assert(lens == Map(1L -> (3L + 3L), 2L -> (3L + 1L)),
      s"doc1: 3x low(1) + lowest(3) = 6; doc2: lowest(3) + low(1) = 4; got $lens")
  }

  test("unigram Viterbi picks the max-score segmentation, hand-computed") {
    import org.apache.spark.sql.functions.col
    // "abc": [ab(-1), c(-3)] = -4 beats [a(-2), b(-2), c(-3)] = -7 and
    // [a(-2), bc(-2.5)] = -4.5
    val vocab = Seq("a" -> -2.0, "b" -> -2.0, "c" -> -3.0,
      "ab" -> -1.0, "bc" -> -2.5)
    val ids = Seq("abc").toDF("w")
      .select(graft.functions.unigram_token_ids(col("w"), vocab, -1).as("ids"))
      .head.getSeq[Int](0)
    assert(ids == Seq(3, 2), s"expected [ab, c] ids [3, 2], got $ids")
  }

  test("unigram: score ties prefer fewer pieces, then the longer head piece") {
    import org.apache.spark.sql.functions.col
    // "aa": [aa](-4) ties [a, a](-2 + -2); fewer pieces must win
    val v1 = Seq("a" -> -2.0, "aa" -> -4.0)
    val t1 = Seq("aa").toDF("w")
      .select(graft.functions.unigram_token_ids(col("w"), v1, -1).as("ids"))
      .head.getSeq[Int](0)
    assert(t1 == Seq(1), s"fewer-pieces tie-break failed: $t1")
    // "ab": [ab](-4) ties [a, b](-4) -> fewer pieces; and among equal
    // piece counts "ab"+"c" vs "a"+"bc" at equal score the longer FIRST
    // piece wins
    val v2 = Seq("a" -> -1.0, "b" -> -1.0, "c" -> -1.0,
      "ab" -> -1.5, "bc" -> -0.5)
    val t2 = Seq("abc").toDF("w")
      .select(graft.functions.unigram_token_ids(col("w"), v2, -1).as("ids"))
      .head.getSeq[Int](0)
    // [a, bc] = -1.5 equals [ab, c] = -2.5? no: -1.0 + -0.5 = -1.5 vs
    // -1.5 + -1.0 = -2.5 -> strictly better, takes [a, bc]
    assert(t2 == Seq(0, 4), s"expected [a, bc], got $t2")
  }

  test("unigram: UNK chars fall back per character with the penalty") {
    import org.apache.spark.sql.functions.col
    val vocab = Seq("a" -> -1.0, "ab" -> -0.5)
    val ids = Seq("axb").toDF("w")
      .select(graft.functions.unigram_token_ids(col("w"), vocab, 99).as("ids"))
      .head.getSeq[Int](0)
    // x and b are not pieces: a(-1) + UNK(x) + UNK(b); the UNK penalty
    // never lets a multi-char unknown absorb known pieces
    assert(ids == Seq(0, 99, 99), s"got $ids")
  }

  test("unigramTokenIds assembles per-doc sequences in token order") {
    val vocab = Seq("lo" -> -1.0, "w" -> -1.5, "l" -> -3.0, "o" -> -3.0,
      "e" -> -2.0, "s" -> -2.0, "t" -> -2.0, "r" -> -2.0)
    val docs = Seq((1L, "low lower"), (2L, "low")).toDF("doc_id", "text")
    val out = Tokenize.unigramTokenIds(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // low -> [lo, w]; lower -> [lo, w, e, r]
    assert(out(1L) == Seq(0, 1, 0, 1, 4, 7), s"got ${out(1L)}")
    assert(out(2L) == Seq(0, 1))
    // pin and recompute agree, like the BPE path
    val re = Tokenize.unigramTokenIds(docs, "doc_id", "text", vocab,
      pinTokenFrame = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(re == out)
  }

  test("trainer segments by code point: supplementary chars merge whole") {
    // "😀😀" repeated: a per-UTF-16-char trainer would learn merges over
    // lone surrogate halves that the apply kernel (code-point initial
    // segments) can never match. Trained merges must be whole code
    // points and must round-trip through the encoder.
    val docs = Seq((1L, Array.fill(3)("😀😀").mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Tokenize.trainBpeMerges(docs, "text", numMerges = 1)
    assert(merges == Seq(("😀", "😀")), s"got $merges")
    val lens = Tokenize.bpeEncodedLength(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lens == Map(1L -> 3L), s"3 words x 1 merged token each; got $lens")
  }

  test("trainer is deterministic and vocabCap bounds the working set") {
    val docs = Seq((1L, "zz zz yy yy xx xx ww vv uu")).toDF("doc_id", "text")
    val a = Tokenize.trainBpeMerges(docs, "text", 3)
    val b = Tokenize.trainBpeMerges(docs, "text", 3)
    assert(a == b)
    // cap to the 3 most frequent words: zz/yy/xx (freq 2) survive, the
    // singletons fall away -- same result as uncapped here since
    // singletons can't reach minCount anyway
    val capped = Tokenize.trainBpeMerges(docs, "text", 3, vocabCap = 3)
    assert(capped == a)
  }

  // --- WordPiece (greedy longest-match-first, BERT semantics) ---

  private val wpVocab = Seq("[UNK]", "a", "b", "u", "n", "un", "ab",
    "able", "##a", "##b", "##c", "##l", "##e", "##le", "##able", "##bc")

  private def wp(words: String*): Map[String, Seq[Int]] = {
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val ids = Tokenize.wordpieceTokenIds(docs, "doc_id", "text", wpVocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    words.zipWithIndex.map { case (w, i) => w -> ids(i.toLong) }.toMap
  }

  test("wordpiece takes the longest match at each position") {
    val out = wp("unable", "able", "abc")
    // 'unable': start 'un' (beats 'u'), then '##able' (beats '##a'/'##ab')
    assert(out("unable") == Seq(wpVocab.indexOf("un"), wpVocab.indexOf("##able")))
    // 'able' is a start piece whole
    assert(out("able") == Seq(wpVocab.indexOf("able")))
    // 'abc': 'ab' + '##c' (greedy start match 'ab' over 'a')
    assert(out("abc") == Seq(wpVocab.indexOf("ab"), wpVocab.indexOf("##c")))
  }

  test("start and continuation pieces are distinct inventories") {
    // 'aa': position 0 uses 'a' (start), position 1 must use '##a'
    assert(wp("aa")("aa") ==
      Seq(wpVocab.indexOf("a"), wpVocab.indexOf("##a")))
  }

  test("any unmatchable position voids the whole word to [UNK]") {
    val out = wp("abz", "zab", "ab")
    assert(out("abz") == Seq(0), "uncovered 'z' mid-word")
    assert(out("zab") == Seq(0), "uncovered 'z' at start")
    assert(out("ab") == Seq(wpVocab.indexOf("ab")))
  }

  test("greedy is not optimal: longest-first can fragment the tail") {
    // 'ablc': greedy start 'able'? no -- 'abl' not a piece boundary;
    // start 'ab' + '##l' + '##c'; a smarter split 'a ##b ##l ##c' ties.
    // The point: greedy takes 'ab' first even though '##bc' would pair
    // with 'a' -- 'abc' stays 'ab ##c', never 'a ##bc'.
    assert(wp("abc")("abc") ==
      Seq(wpVocab.indexOf("ab"), wpVocab.indexOf("##c")))
  }

  test("wordpiece walks code-point boundaries: no surrogate-half matches") {
    // A vocab polluted with lone surrogate halves must NOT match inside
    // the emoji (BERT/HF code-point semantics): the word is [UNK], not
    // two garbage half-tokens.
    val half = Seq("[UNK]", "\uD83D", "##\uDE00")
    val docs1 = Seq((0L, "😀")).toDF("doc_id", "text")
    assert(Tokenize.wordpieceTokenIds(docs1, "doc_id", "text", half)
      .head.getSeq[Int](1) == Seq(0))
    // and a vocab that covers the emoji per code point tokenizes it
    val whole = Seq("[UNK]", "a", "##😀", "😀")
    val out = Tokenize.wordpieceTokenIds(
      Seq((0L, "a😀"), (1L, "😀")).toDF("doc_id", "text"), "doc_id", "text", whole)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(0L) == Seq(1, 2), s"got ${out(0L)}")
    assert(out(1L) == Seq(3), s"got ${out(1L)}")
  }

  test("wordpiece doc sequences assemble in word-position order") {
    val docs = Seq((7L, "ab unable ab")).toDF("doc_id", "text")
    val ids = Tokenize.wordpieceTokenIds(docs, "doc_id", "text", wpVocab)
      .head.getSeq[Int](1)
    val ab = wpVocab.indexOf("ab")
    assert(ids == Seq(ab, wpVocab.indexOf("un"), wpVocab.indexOf("##able"), ab))
    // pinned and recomputed token frames agree
    val re = Tokenize.wordpieceTokenIds(docs, "doc_id", "text", wpVocab,
      pinTokenFrame = false).head.getSeq[Int](1)
    assert(re == ids)
  }

  // ---- unigram-LM trainer -------------------------------------------

  test("unigram trainer: one EM step matches the hand-computed lattice") {
    // corpus = "ab" x2. Seed: a(2) b(2) ab(2) -> p0 = 1/3 each.
    // Word 'ab': paths [a,b] p=1/9, [ab] p=1/3; Z = 4/9.
    // E[ab] = .75, E[a] = E[b] = .25 (x freq 2 -> 1.5 / .5 / .5).
    // M-step: p1(ab) = .6, p1(a) = p1(b) = .2. Loss = -2 ln(4/9).
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val tr = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 0,
      maxPieceLen = 2, emIters = 1)
    val m = tr.vocab.toMap
    assert(m.keySet == Set("a", "b", "ab"))
    assert(math.abs(m("ab") - math.log(0.6)) < 1e-12)
    assert(math.abs(m("a") - math.log(0.2)) < 1e-12)
    assert(math.abs(m("b") - math.log(0.2)) < 1e-12)
    // score-desc then piece-asc ordering: ab, then a/b tie by piece
    assert(tr.vocab.map(_._1) == Seq("ab", "a", "b"))
    assert(math.abs(tr.losses.head - (-2.0 * math.log(4.0 / 9.0))) < 1e-12)
  }

  test("unigram trainer: EM loss is non-increasing over iterations") {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the bat and the rat sat"), (3L, "a cat and a bat")
    ).toDF("doc_id", "text")
    val tr = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 0,
      maxPieceLen = 3, emIters = 6)
    assert(tr.losses.length == 6)
    tr.losses.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"EM loss increased: ${tr.losses}")
    }
  }

  test("unigram trainer is deterministic across runs") {
    val docs = Seq((1L, "abc abd abc bcd"), (2L, "abc bcd bcd ab")
    ).toDF("doc_id", "text")
    val a = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 2)
    val b = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 8,
      maxPieceLen = 3, emIters = 2)
    assert(a.vocab == b.vocab)
  }

  test("unigram trainer prunes to vocabSize but never drops single chars") {
    val docs = Seq((1L, "abab baba abba baab"), (2L, "abab abab bb aa")
    ).toDF("doc_id", "text")
    val tr = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 4,
      maxPieceLen = 4, emIters = 1)
    val ps = tr.vocab.map(_._1)
    assert(ps.length == 4, s"got $ps")
    assert(ps.contains("a") && ps.contains("b"))
    // survivors carry normalized scores: sum of probs == 1
    assert(math.abs(tr.vocab.map(v => math.exp(v._2)).sum - 1.0) < 1e-9)
  }

  test("unigram trainer treats supplementary chars as single pieces") {
    // the emoji is one code point (two UTF-16 units): seed must contain
    // it whole, never a lone surrogate half
    val docs = Seq((1L, "😀a 😀a")).toDF("doc_id", "text")
    val tr = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 0,
      maxPieceLen = 2, emIters = 1)
    assert(tr.vocab.map(_._1).toSet ==
      Set("😀", "a", "😀a"))
    assert(tr.vocab.forall(v => !v._2.isNaN && !v._2.isInfinite))
  }

  // ---- subword-regularization sampling ------------------------------

  private val srVocab = Seq("ab" -> math.log(0.6),
    "a" -> math.log(0.2), "b" -> math.log(0.2))

  private def sampleFreq(alpha: Double, n: Int): Double = {
    // n copies of the word 'ab' with distinct (doc_id, pos)-derived
    // seeds; returns the fraction segmented as the single piece [ab]
    val docs = (0 until n).map(i => (i.toLong, "ab")).toDF("doc_id", "text")
    val out = Tokenize.unigramSampleIds(docs, "doc_id", "text", srVocab,
      alpha = alpha, run = 7L)
      .collect().map(_.getSeq[Int](1))
    assert(out.forall(ids => ids == Seq(0) || ids == Seq(1, 2)),
      "sample produced an invalid segmentation")
    out.count(_ == Seq(0)).toDouble / n
  }

  test("unigram sampling: alpha=1 tracks the exact posterior") {
    // P([ab]) = 0.6 / (0.6 + 0.04) = 0.9375; 4000 draws, ~3 sigma = 1.2%
    val f = sampleFreq(alpha = 1.0, n = 4000)
    assert(math.abs(f - 0.9375) < 0.02, s"got $f, want ~0.9375")
  }

  test("unigram sampling: alpha=0 is uniform over segmentations") {
    val f = sampleFreq(alpha = 0.0, n = 4000)
    assert(math.abs(f - 0.5) < 0.03, s"got $f, want ~0.5")
  }

  test("unigram sampling is deterministic per (corpus, run)") {
    val docs = Seq((1L, "ab ab abab"), (2L, "ba ab")).toDF("doc_id", "text")
    val a = Tokenize.unigramSampleIds(docs, "doc_id", "text", srVocab,
      alpha = 0.3, run = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Tokenize.unigramSampleIds(docs, "doc_id", "text", srVocab,
      alpha = 0.3, run = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
    // and occurrences draw independently: across runs and positions the
    // 'ab ab' doc is not forced to segment both tokens identically
    val many = Tokenize.unigramSampleIds(
      (0 until 200).map(i => (i.toLong, "ab ab")).toDF("doc_id", "text"),
      "doc_id", "text", srVocab, alpha = 0.0, run = 1L)
      .collect().map(_.getSeq[Int](1))
    assert(many.exists(ids => ids.take(1) != ids.drop(ids.length / 2).take(1))
      || many.map(_.length).distinct.length > 1,
      "per-occurrence seeds collapsed to one draw per word")
  }

  test("unigram sampling: UNK chars fall back per character") {
    val docs = Seq((1L, "axb")).toDF("doc_id", "text")
    val ids = Tokenize.unigramSampleIds(docs, "doc_id", "text", srVocab,
      alpha = 1.0, run = 0L, unkId = -7).head.getSeq[Int](1)
    assert(ids.contains(-7)) // 'x' has no piece
  }

  test("trained unigram vocab drives the Viterbi encoder end-to-end") {
    val docs = Seq((1L, "hello hell low"), (2L, "hello low hell")
    ).toDF("doc_id", "text")
    val tr = Tokenize.trainUnigramVocab(docs, "text", vocabSize = 12,
      maxPieceLen = 4, emIters = 2)
    val ids = Tokenize.unigramTokenIds(docs, "doc_id", "text",
        tr.vocab, unkId = -1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // every char is in the vocab, so no UNK ids anywhere
    assert(ids.values.flatten.forall(_ >= 0))
    assert(ids(1L).nonEmpty && ids(2L).nonEmpty)
  }
}
