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
}
