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
}
