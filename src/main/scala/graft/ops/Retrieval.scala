package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-retrieval and language-model scoring operators for
  * training-data pipelines: BM25 ranking (the standard quality/relevance
  * retrieval primitive, Robertson & Zaragoza 2009) and unigram-LM
  * negative log-likelihood (the CCNet-style "perplexity" filtering
  * signal, Wenzek et al. 2020 — CCNet buckets documents by LM perplexity
  * and keeps the low-perplexity head).
  *
  * 100 TB shape (both operators): the corpus is touched by map-only
  * tokenize/explode passes; everything model-sized (query-term document
  * frequencies, the unigram vocabulary) is aggregated down first, pinned,
  * and BROADCAST back — the corpus itself never shuffles token-level
  * rows, only per-doc partial aggregates move.
  */
object Retrieval {

  /** BM25 scores of every document against a bag of query terms,
    * top-k by score. Uses the Lucene/standard formulation:
    *
    *   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(d) = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))
    *
    * Plan shape: one map-only pass computes per-doc length; the token
    * explode is filtered to the query terms BEFORE the (doc, term)
    * aggregate, so the shuffle carries only query-term hits (a few rows
    * per doc, not the token stream). df/avgdl/N are tiny aggregates that
    * ride broadcasts into the scoring join.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = TextAnalysis.tokens(col(textCol))
    // per-doc length; pinned once, reused by the scoring join and avgdl
    val dl = docs.select(col(idCol).as("doc_id"),
        size(toks).cast("long").as("dl"))
      .localCheckpoint(true)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl"))
    // (doc, term) -> tf, restricted to the query terms pre-shuffle
    val tf = docs.select(col(idCol).as("doc_id"), explode(toks).as("w"))
      .filter(col("w").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("tot_dl").cast("double") / col("n_docs"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__s", col("__idf") * col("tf") /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__s")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
    scored.orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** Per-document unigram-LM negative log-likelihood (mean -ln p(w),
    * nats/token) against a model fit on the corpus itself, add-one
    * smoothed — CCNet's filtering signal with the corpus standing in for
    * the reference LM. Low = head (keep), high = tail (drop/bucket).
    * Returns (doc_id, n_tokens, nll) for docs with >= 1 token.
    */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val words = docs.select(col(idCol).as("doc_id"), explode(toks).as("w"))
    // vocabulary-sized model, pinned so totals + scoring read the agg,
    // never the corpus subtree (the q67/DSIR device)
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val totals = vocab.agg(sum(col("n")).as("tot"), count(lit(1)).as("v"))
    words
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .join(broadcast(vocab), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("__lp",
        col("c") * log((col("n") + 1).cast("double") / (col("tot") + col("v"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        round(-sum(col("__lp")) / sum(col("c")), 6).as("nll"))
  }
}
