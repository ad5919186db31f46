package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the standard LLM-training-data hygiene
  * pass: find (and drop) training documents that share word n-grams with
  * an evaluation/benchmark set, so test data doesn't leak into training.
  * The n-gram-overlap rule is the published methodology (GPT-3 appendix C
  * uses 13-grams; PaLM/Llama report 8–10-gram variants); n is a knob
  * here.
  *
  * 100 TB shape: both sides reduce to (id, 64-bit gram hash) — the
  * codegen'd `word_shingle_hashes` kernel, no gram strings materialized.
  * The benchmark gram set is deduped and broadcast (eval suites are
  * orders of magnitude smaller than the corpus), so the scan side never
  * shuffles: explode -> broadcast-hash-join -> partial-aggregated count
  * per doc. Gram-hash equality stands in for string equality at ~1e-19
  * collision odds per pair.
  */
object Decontamination {

  /** (id?, gram-hash) pairs: distinct word n-gram hashes per document.
    * Documents with fewer than n tokens carry no n-gram (the whole-array
    * fallback shingle would fake one) — they cannot be contaminated.
    */
  private[ops] def gramHashes(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    df.withColumn("__toks", toks)
      .filter(size(col("__toks")) >= n)
      // the kernel already emits DISTINCT hashes — no extra dedup pass
      .withColumn("g", explode(
        graft.functions.word_shingle_hashes(col("__toks"), n)))
      .drop("__toks")
  }

  /** Per-training-doc count of distinct n-grams shared with ANY benchmark
    * document: (trainId, n_shared), only contaminated docs returned.
    */
  def overlapReport(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int = 8): DataFrame = {
    val tg = gramHashes(train.select(col(trainId).as("doc_id"), col(trainText)),
      trainText, n).select(col("doc_id"), col("g"))
    val bg = gramHashes(bench.select(col(benchText)), benchText, n)
      .select(col("g")).distinct()
    // per-(doc, g) rows are unique on both sides -> count(*) == distinct
    tg.join(broadcast(bg), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[overlapReport]] with a BLOOM-FILTER pre-filter on the corpus side —
    * the variant for benchmark sets too large to broadcast as a join set.
    * A bloom at fpp=0.01 costs ~10 bits per gram vs 64+ bits for the
    * broadcast hash set, and the probe is a per-row O(1) check that
    * prunes ~99% of corpus grams BEFORE the join; blooms have no false
    * negatives, so the exact verify join on the survivors returns
    * byte-identical results to [[overlapReport]] (false positives die in
    * the verify). The filter is built distributed (per-partition blooms
    * OR-merged — `DataFrameStatFunctions.bloomFilter` is a
    * treeAggregate) and shipped once per executor via a codegen
    * reference object, and the probe itself is a native expression
    * ([[graft.functions.bloom_might_contain]]) so the prefilter stays
    * inside the scan's whole-stage-codegen loop.
    *
    * The verify join carries NO broadcast hint — that is the point of
    * this variant: when the benchmark gram set is too big to broadcast,
    * the prefilter has already cut the corpus side to ~fpp of its grams,
    * so a shuffled join is cheap; when it does fit, AQE broadcasts it on
    * its own. (Forcing the hint here would reintroduce exactly the OOM
    * this variant exists to avoid.)
    *
    * `minShared` gates the report (GPT-3 appendix C flags on any
    * 13-gram hit; stricter pipelines require several shared grams).
    */
  def bloomOverlapReport(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int = 8,
      minShared: Int = 1, fpp: Double = 0.01): DataFrame = {
    val bg = gramHashes(bench.select(col(benchText)), benchText, n)
      .select(col("g")).distinct().localCheckpoint(true)
    val nGrams = math.max(bg.count(), 1L) // benchmark-sized driver action
    val bloom = bg.stat.bloomFilter("g", nGrams, fpp)
    val tg = gramHashes(train.select(col(trainId).as("doc_id"), col(trainText)),
      trainText, n).select(col("doc_id"), col("g"))
      .filter(graft.functions.bloom_might_contain(col("g"), bloom))
    tg.join(bg, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Span-level contamination report — [[overlapReport]]'s positional
    * refinement (the [[Dedup.duplicatedSpanReport]] device pointed at a
    * benchmark): for each training doc, the maximal token spans whose
    * n-grams appear in the benchmark set, so a surgical pipeline can CUT
    * the leaked passage instead of dropping the whole document. Returns
    * (doc_id, n_spans, contaminated_tokens) for flagged docs only.
    *
    * 100 TB shape: the corpus maps to positional gram hashes (codegen'd
    * kernel), the deduped benchmark gram set rides a broadcast semi-join
    * (the corpus never shuffles on grams), and the span merge is a
    * doc-keyed window over only the MATCHING positions — benchmark-hit
    * volume, not corpus volume.
    */
  def contaminationSpans(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int = 8): DataFrame = {
    val positional = Dedup.positionalGrams(train, trainId, trainText, n)
    val bg = gramHashes(bench.select(col(benchText)), benchText, n)
      .select(col("g")).distinct()
    val covered = positional.join(broadcast(bg), Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos"))
    Dedup.mergePositionsToSpans(covered, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__p2") - col("__p1") + n).as("contaminated_tokens"))
  }

  /** Drop training docs sharing >= minShared n-grams with the benchmark
    * set (anti-join on the flagged ids only — the corpus never shuffles).
    */
  def decontaminate(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int = 8,
      minShared: Int = 1): DataFrame = {
    val flagged = overlapReport(train, trainId, trainText, bench, benchText, n)
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id").as(trainId))
    train.join(flagged, Seq(trainId), "left_anti")
  }
}
