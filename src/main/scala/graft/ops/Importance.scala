package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by
  * the log-likelihood ratio of a target bag-of-words model over the raw
  * corpus model, with add-one smoothing — documents that "look like" the
  * target domain get high scores and can be importance-resampled into the
  * training mix.
  *
  * 100 TB shape: two corpus passes, both map-heavy. Pass 1 builds the two
  * language models with one feature-keyed aggregate (map-side combine
  * straight off the token explode; the result is vocabulary-sized and
  * pinned with a localCheckpoint). Pass 2 scores: the model table rides a
  * BROADCAST into a map-side join against the token stream, and the only
  * shuffle is the per-doc sum, partial-aggregated to one row per doc per
  * partition before it moves. No token-level shuffle anywhere. The
  * paper's hashed-feature variant ([[dsirScoresHashed]]) hard-bounds the
  * broadcast at `buckets` rows no matter the vocabulary.
  */
object Importance {

  /** Score a (doc_id, is_target, w) token-instance frame. Two corpus
    * passes — the floor without materializing token-level state: pass 1
    * aggregates the language models (map-side combine straight off the
    * explode, pinned with an eager localCheckpoint so the totals and the
    * scoring join both read the vocabulary-sized result, never the
    * corpus subtree); pass 2 scores via a BROADCAST join (unigram
    * vocabularies are millions of rows against a corpus of billions —
    * Heaps' law; the hashed variant hard-bounds it at `buckets`) and one
    * doc-keyed shuffle that partial-aggregates down to per-doc rows
    * before it moves.
    */
  private def scoreWords(words: DataFrame): DataFrame = {
    val vocab = words.groupBy(col("w"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
      .localCheckpoint(true)
    val totals = vocab.agg(sum(col("n_raw")).as("tot_raw"),
      sum(col("n_tgt")).as("tot_tgt"), count(lit(1)).as("v"))
    words.join(broadcast(vocab), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("__lr",
        log((col("n_tgt") + 1).cast("double") / (col("tot_tgt") + col("v"))) -
          log((col("n_raw") + 1).cast("double") / (col("tot_raw") + col("v"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__lr")), 6).as("dsir_score"),
        count(lit(1)).as("n_tokens"))
  }

  /** Unigram importance scores: feature = the token itself (the
    * DuckDB-reproducible form — the oracle rebuilds both language models
    * from the same token stream). `isTarget` marks the in-domain rows
    * (e.g. a language or a quality gate).
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val words = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(toks).as("w"))
    scoreWords(words)
  }

  /** Hashed-feature importance scores — the paper's actual device: each
    * word n-gram is hashed into one of `buckets` buckets, so the model
    * table is fixed-size regardless of vocabulary (hash collisions trade
    * a little fidelity for a hard memory bound). With unigrams and a
    * bucket count far above the vocabulary size this reproduces
    * [[dsirScores]] exactly (no collisions -> same counts, same distinct
    * feature count).
    */
  def dsirScoresHashed(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, ngram: Int = 1, buckets: Int = 1 << 20): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val feature =
      if (ngram == 1) explode(toks)
      else explode(TextAnalysis.wordShingles(toks, ngram))
    val words = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        feature.as("__f"))
      .select(col("doc_id"), col("is_target"),
        pmod(xxhash64(col("__f")), lit(buckets.toLong)).as("w"))
    scoreWords(words)
  }
}
