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
  * 100 TB shape: the corpus reduces to (doc_id, feature, count) — one
  * groupBy with map-side combine; the two language models are one more
  * aggregate over that frame (vocabulary-sized, not corpus-sized); the
  * scoring join is feature-partitioned on both sides (the vocab side is
  * already partitioned by feature after its aggregate, so AQE reuses the
  * exchange), and the scalar totals ride a broadcast. No driver-side
  * state at any size; the paper's hashed-feature variant
  * ([[dsirScoresHashed]]) additionally bounds the model table to
  * `buckets` rows no matter the vocabulary.
  */
object Importance {

  private def scoreDocWords(docWords: DataFrame): DataFrame = {
    val vocab = docWords.groupBy(col("w"))
      .agg(sum(col("c")).as("n_raw"),
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("n_tgt"))
    val totals = vocab.agg(sum(col("n_raw")).as("tot_raw"),
      sum(col("n_tgt")).as("tot_tgt"), count(lit(1)).as("v"))
    docWords.join(vocab, Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("__lr",
        log((col("n_tgt") + 1).cast("double") / (col("tot_tgt") + col("v"))) -
          log((col("n_raw") + 1).cast("double") / (col("tot_raw") + col("v"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c") * col("__lr")), 6).as("dsir_score"),
        sum(col("c")).as("n_tokens"))
  }

  /** Unigram importance scores: feature = the token itself (the
    * DuckDB-reproducible form — the oracle rebuilds both language models
    * from the same token stream). `isTarget` marks the in-domain rows
    * (e.g. a language or a quality gate).
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val docWords = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(toks).as("w"))
      .groupBy(col("doc_id"), col("is_target"), col("w"))
      .agg(count(lit(1)).as("c"))
    scoreDocWords(docWords)
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
    val docWords = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        feature.as("__f"))
      .select(col("doc_id"), col("is_target"),
        pmod(xxhash64(col("__f")), lit(buckets.toLong)).as("w"))
      .groupBy(col("doc_id"), col("is_target"), col("w"))
      .agg(count(lit(1)).as("c"))
    scoreDocWords(docWords)
  }
}
