package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-training statistics: the counting core of BPE (Sennrich et
  * al. 2016; GPT-2's byte-level variant). A BPE trainer repeats "count
  * all adjacent symbol pairs over the corpus, merge the most frequent";
  * this operator computes one such counting pass distributed.
  *
  * 100 TB shape: pair counting factors through the word vocabulary —
  * count each distinct word once (one token-explode + aggregate with
  * map-side combine; vocabulary-sized output by Heaps' law), then expand
  * pairs per DISTINCT word weighted by its corpus frequency. The
  * per-character work happens on millions of vocab rows, not trillions
  * of corpus tokens — exactly how production BPE trainers
  * (SentencePiece, HF tokenizers) structure the loop.
  */
object Tokenize {

  /** Corpus frequency of every distinct whitespace token. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair counts over corpus token instances — the
    * statistic the first BPE merge maximizes. Weighted by word frequency;
    * a word of length L contributes L-1 pairs (with multiplicity) per
    * occurrence. Top `k` pairs, count-desc then pair-asc.
    *
    * The substring lambda below is interpreted, but it runs over the
    * vocabulary (distinct words), not the corpus — bounded work no
    * matter the scale (the whole point of the vocab factoring).
    */
  def topBpePairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    wordVocab(docs, textCol)
      .filter(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** APPLY a learned BPE merge table: per document, the subword token
    * count under the given merges — the number a sequence-packing /
    * context-budget pass actually needs. Encoding is the standard BPE
    * apply (Sennrich et al. 2016 §3): the merges run IN ORDER over the
    * word's segment ARRAY — one codegen'd kernel pass per word
    * ([[graft.functions.bpe_segments]]); the surviving segment count is
    * the word's token count. Array-based on purpose: a space-separated
    * string `replace` fold can fire a merge across segment boundaries
    * (segments [the, r, e] match 'e r'), which the kernel cannot.
    *
    * 100 TB shape: the encode factors through the word vocabulary
    * (Heaps-law bounded — per-char work on millions of vocab rows, not
    * trillions of corpus tokens); per-doc counts come from the pinned
    * (doc, word) frame joined back to the vocabulary's encoded lengths.
    */
  def bpeEncodedLength(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    val docw = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val vocab = docw.groupBy(col("w"))
      .agg(sum(col("c")).as("__f")) // just to reduce to distinct words
      .select(col("w"), size(graft.functions.bpe_segments(col("w"), merges))
        .cast("long").as("__wtoks"))
    docw.join(vocab, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("__wtoks")).as("n_bpe_tokens"))
  }

  /** Full BPE ENCODE to vocab ids: per document, the subword id sequence
    * in token order — the tensor a TFRecord/packing export actually
    * ships. `vocab(i)` is the subword with id `i`; segments outside the
    * vocab map to `unkId`. Returns (doc_id, ids array<int>).
    *
    * 100 TB shape: same vocab factoring as [[bpeEncodedLength]] — the
    * kernel encode + id lookup ([[graft.functions.bpe_token_ids]], vocab
    * shipped by reference, never as 2N plan literals) runs once per
    * DISTINCT word; documents re-attach by a word equi-join, and the
    * per-doc sequence assembles with one ordered collect per doc
    * (output-sized state: the id sequence IS the result row).
    *
    * `pinTokenFrame` governs the (doc, pos, word) frame that feeds both
    * the distinct-word pass and the re-attach join — ~one row per corpus
    * token (~24 B + the word bytes each). Pinned (default), it
    * materializes once in executor storage and is read twice; at 100 TB
    * that storage is roughly the tokenized corpus over again, a real
    * spill surface, so `pinTokenFrame = false` trades a second
    * tokenize+explode scan for zero pinned state. Correctness is
    * unaffected either way (deterministic tokenize; only cost moves).
    */
  def bpeTokenIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocab: Seq[String],
      unkId: Int = -1, pinTokenFrame: Boolean = true): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    require(vocab.nonEmpty, "vocab must be non-empty")
    val docw0 = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val docw = if (pinTokenFrame) docw0.localCheckpoint(true) else docw0
    val enc = docw.select(col("w")).distinct()
      .select(col("w"),
        graft.functions.bpe_token_ids(col("w"), merges, vocab, unkId)
          .as("__wids"))
    docw.join(enc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("__wids")))),
        x => x.getField("__wids"))).as("ids"))
  }

  /** Unigram-LM (SentencePiece-style) token ids: Viterbi-BEST piece
    * sequence per word under a scored piece vocabulary — the other
    * major subword family next to BPE (Kudo 2018). Where BPE replays a
    * fixed merge history, unigram SOLVES for the max-score segmentation,
    * so one vocab admits alternative splits (the property subword
    * regularization samples from). Same vocab-factored shape as
    * [[bpeTokenIds]]: the codegen'd Viterbi kernel
    * (`unigram_token_ids`) runs over DISTINCT words only; per-doc
    * sequences assemble by position. Characters outside the vocabulary
    * emit `unkId` via the kernel's penalized single-char fallback, so
    * segmentation is total.
    */
  def unigramTokenIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)], unkId: Int = -1,
      pinTokenFrame: Boolean = true): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val docw0 = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val docw = if (pinTokenFrame) docw0.localCheckpoint(true) else docw0
    val enc = docw.select(col("w")).distinct()
      .select(col("w"),
        graft.functions.unigram_token_ids(col("w"), vocab, unkId).as("__wids"))
    docw.join(enc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("__wids")))),
        x => x.getField("__wids"))).as("ids"))
  }

  /** Subword-REGULARIZATION token ids (Kudo 2018 §4): per document, a
    * segmentation SAMPLED from `P(seg | word)^alpha` under the scored
    * vocabulary — the stochastic counterpart of [[unigramTokenIds]]'s
    * Viterbi argmax, and the reason unigram vocabularies exist (training
    * sees alternative splits of the same text; `alpha` interpolates from
    * uniform-over-segmentations at 0 toward Viterbi as it grows).
    *
    * NOT vocab-factored, deliberately: every token OCCURRENCE draws an
    * independent sample, so the codegen'd kernel runs once per corpus
    * token with a per-occurrence seed (`xxhash64(doc_id, pos, run)`) —
    * map-only work, no extra shuffle beyond the per-doc assembly, and
    * deterministic: equal (corpus, run) yields equal samples.
    */
  def unigramSampleIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)], alpha: Double = 0.5, run: Long = 0L,
      unkId: Int = -1): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(alpha >= 0, "alpha must be non-negative")
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"),
        graft.functions.unigram_sample_ids(col("w"),
          xxhash64(col("doc_id"), col("pos"), lit(run)), vocab, alpha, unkId)
          .as("__wids"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("__wids")))),
        x => x.getField("__wids"))).as("ids"))
  }

  /** WordPiece (BERT) token ids: greedy longest-match-first subword
    * segmentation per word under a fixed piece vocabulary — start
    * pieces at position 0, `##`-continuations after; a word with any
    * unmatchable position becomes one `unkId` token whole (Wu et al.
    * 2016). The third subword family next to [[bpeTokenIds]] (merge
    * replay) and [[unigramTokenIds]] (Viterbi): pure vocab scan, no
    * training state. Same vocab-factored 100 TB shape: the codegen'd
    * `wordpiece_ids` kernel runs over DISTINCT words only, documents
    * re-attach by word equi-join, sequences assemble by position.
    */
  def wordpieceTokenIds(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], unkId: Int = 0,
      pinTokenFrame: Boolean = true): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val docw0 = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val docw = if (pinTokenFrame) docw0.localCheckpoint(true) else docw0
    val enc = docw.select(col("w")).distinct()
      .select(col("w"),
        graft.functions.wordpiece_ids(col("w"), vocab, unkId).as("__wids"))
    docw.join(enc, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("__wids")))),
        x => x.getField("__wids"))).as("ids"))
  }

  /** A unigram-LM training run: the final scored piece vocabulary
    * (score-desc then piece-asc — id 0 is the most probable piece, the
    * SentencePiece convention) plus the EM loss trace, one corpus
    * negative log-likelihood per E-step, measured under the scores that
    * step ran with. Within a fixed vocabulary the trace is non-increasing
    * (EM's guarantee); a prune step may bump it back up.
    */
  final case class UnigramTraining(vocab: Seq[(String, Double)],
      losses: Seq[Double])

  /** TRAIN a unigram-LM piece vocabulary (Kudo 2018 §3.2 — the
    * SentencePiece trainer; the missing half of the unigram lifecycle
    * next to [[unigramTokenIds]]'s Viterbi encode):
    *
    *  1. SEED: every substring of ≤ `maxPieceLen` code points over the
    *     frequency-weighted word vocabulary, counted distributed; the
    *     top `seedSize` by count (ties piece-asc) plus ALL single-char
    *     pieces (they keep segmentation total). Initial scores are the
    *     normalized log seed counts.
    *  2. EM: `emIters` rounds of — distributed E-step (the codegen'd
    *     forward–backward kernel `unigram_expected_counts` runs over
    *     DISTINCT words; per-piece posterior counts and the corpus NLL
    *     aggregate in the same vocab-factored pass, weighted by word
    *     frequency) then driver M-step (scores := normalized log expected
    *     counts — a seed-bounded array op).
    *  3. PRUNE: drop the lowest-expected-count multi-char pieces down to
    *     `max(vocabSize, ceil(size * shrink))`, re-run EM, repeat until
    *     `vocabSize`. Single-char pieces are never pruned.
    *     `vocabSize = 0` skips pruning (seed + EM only — the oracle-
    *     checkable configuration).
    *
    * 100 TB shape: the corpus is touched once (word-vocab aggregate,
    * Heaps-bounded output, pinned); every E-step is one pass over
    * DISTINCT words with map-side partial aggregation into a seed-bounded
    * (piece, count) frame. Driver state is two seed-bounded collects per
    * round (piece counts + the 1-row loss), never corpus-sized.
    * Deterministic: all orderings tie-break on the piece string, the
    * kernel's per-word sweep order is fixed, and equal corpora yield
    * equal vocabularies.
    */
  def trainUnigramVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, seedSize: Int = 100000, emIters: Int = 2,
      shrink: Double = 0.75): UnigramTraining = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(seedSize >= 1, "seedSize must be >= 1")
    require(emIters >= 1, "emIters must be >= 1")
    require(shrink > 0 && shrink < 1, "shrink must be in (0,1)")
    val words = wordVocab(docs, textCol).localCheckpoint(true)

    // seed counts: piece -> sum over words of freq * occurrences-in-word;
    // the substring explode runs over the DISTINCT-word frame (Heaps-
    // bounded), mirroring topBpePairs' vocab factoring
    val sub = words.select(col("freq"), explode(flatten(expr(
        s"""transform(sequence(1, least(length(w), $maxPieceLen)),
           |  l -> transform(sequence(1, length(w) - l + 1),
           |    i -> substring(w, i, l)))""".stripMargin))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("c"))
      .localCheckpoint(true)
    val chars = sub.filter(length(col("piece")) === 1)
      .orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    // seed-bounded collect (documented): top multi-char candidates only —
    // never corpus- or vocab-of-words-sized
    val multis = sub.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece"))
      .limit(math.max(0, seedSize - chars.length))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    require(chars.nonEmpty, "trainUnigramVocab: corpus has no tokens")

    var pieces: Array[String] = (chars ++ multis).map(_._1)
    var scores: Array[Double] = {
      val tot = (chars ++ multis).map(_._2).sum
      (chars ++ multis).map(p => math.log(p._2 / tot))
    }
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastCounts: Map[String, Double] = Map.empty

    // one distributed E-step + driver M-step under the current scores
    def emStep(): Unit = {
      val vocab = pieces.zip(scores).toSeq
      val ew = words.select(col("freq"),
          graft.functions.unigram_expected_counts(col("w"), vocab).as("e"))
        .localCheckpoint(true) // one E-pass feeds both aggregates below
      losses += -ew.agg(sum(col("freq") * col("e.logz"))).head().getDouble(0)
      val counts = ew
        .select(col("freq"),
          explode(arrays_zip(col("e.ids"), col("e.cs"))).as("z"))
        .groupBy(col("z.ids").as("id"))
        .agg(sum(col("z.cs") * col("freq")).as("c"))
        .collect().map(r => pieces(r.getInt(0)) -> r.getDouble(1)).toMap
      lastCounts = counts
      val tot = pieces.map(p => counts.getOrElse(p, 0.0)).sum
      scores = pieces.map(p => math.log(counts.getOrElse(p, 0.0) / tot))
    }

    (1 to emIters).foreach(_ => emStep())
    if (vocabSize > 0) {
      val floorSize = chars.length
      while (pieces.length > math.max(vocabSize, floorSize)) {
        val target = math.max(math.max(vocabSize, floorSize),
          math.ceil(pieces.length * shrink).toInt)
        val (single, multi) = pieces.zip(scores)
          .partition { case (p, _) => p.codePointCount(0, p.length) == 1 }
        val kept = multi
          .sortBy { case (p, _) => (-lastCounts.getOrElse(p, 0.0), p) }
          .take(math.max(0, target - single.length))
        val next = (single ++ kept)
        pieces = next.map(_._1); scores = next.map(_._2)
        (1 to emIters).foreach(_ => emStep())
      }
    }
    val order = pieces.zip(scores)
      .sortBy { case (p, s) => (-s, p) }
    UnigramTraining(order.toSeq, losses.toSeq)
  }

  /** TRAIN a BPE merge table end-to-end (the loop [[topBpePairs]] is one
    * round of): one distributed vocab aggregate, then the exact greedy
    * trainer over the frequency-weighted vocabulary on the driver with
    * incrementally-maintained pair counts — the SentencePiece/HF
    * structure (the corpus is touched ONCE; every merge round is
    * vocab-sized work, and only words containing the merged pair are
    * rewritten via a pair -> words index, not a full rescan).
    *
    * `vocabCap` bounds driver memory by taking the top words by corpus
    * frequency (ties broken lexicographically): Heaps' law bounds true
    * vocabularies, and tail singletons contribute negligible pair mass —
    * the same cutoff production trainers apply. Deterministic: merge
    * ties break on the lexicographically smallest pair, so equal corpora
    * yield equal tables. Training stops early when no pair reaches
    * `minCount` (default 2 — a pair seen once generalizes nothing).
    *
    * The learned table feeds [[bpeEncodedLength]] / [[bpeTokenIds]]
    * directly: rank order IS the apply order (Sennrich §3), and the
    * greedy left-to-right non-overlapping rewrite here is the SAME
    * discipline as the `bpe_segments` kernel, so training and encoding
    * agree on segment boundaries.
    */
  def trainBpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 1000000, minCount: Long = 2L): Seq[(String, String)] = {
    import scala.collection.mutable
    val vocab = wordVocab(docs, textCol)
      .orderBy(col("freq").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // Initial segments per CODE POINT (mirrors BpeKernel.segments'
    // codePointAt/charCount walk) — a per-UTF-16-char split would learn
    // merges over lone surrogate halves the apply kernel can never match.
    val words: Array[mutable.ArrayBuffer[String]] = vocab.map { v =>
      val s = v._1
      val buf = mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < s.length) {
        val cc = Character.charCount(s.codePointAt(ci))
        buf += s.substring(ci, ci + cc)
        ci += cc
      }
      buf
    }
    val freqs: Array[Long] = vocab.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val segs = words(i)
      var j = 0
      while (j < segs.length - 1) {
        val p = (segs(j), segs(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(i)
        if (c <= 0L) { pairCount.remove(p); pairWords.get(p).foreach(_.remove(i)) }
        else {
          pairCount.update(p, c)
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges && pairCount.nonEmpty) {
      // max count, lexicographically smallest pair on ties — deterministic
      val (best, cnt) = pairCount.foldLeft((("", ""), Long.MinValue)) {
        case (acc @ (bp, bc), (p, c)) =>
          if (c > bc || (c == bc && (p._1 < bp._1 ||
            (p._1 == bp._1 && p._2 < bp._2)))) (p, c) else acc
      }
      if (cnt < minCount) continue = false
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
        affected.foreach { i =>
          addWord(i, -1L) // retract old pair contributions
          // greedy left-to-right non-overlapping rewrite (kernel parity)
          val segs = words(i)
          val out = mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < segs.length) {
            if (j < segs.length - 1 && segs(j) == best._1 && segs(j + 1) == best._2) {
              out += segs(j) + segs(j + 1); j += 2
            } else { out += segs(j); j += 1 }
          }
          words(i) = out
          addWord(i, 1L)
        }
        pairCount.remove(best)
        pairWords.remove(best)
      }
    }
    merges.toSeq
  }
}
