package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact all-pairs set-similarity join by prefix filtering — the EXACT
  * counterpart of the MinHash-LSH near-dup path (`Dedup.minhashPairs`):
  * every pair of documents whose element sets (tokens, word shingles,
  * hashed shingles — the operator is agnostic to the element type) have
  * Jaccard >= t, with NO false negatives and NO probabilistic recall
  * argument. Prefix filtering (Chaudhuri et al., ICDE 2006; Bayardo et
  * al., WWW 2007; Vernica et al., SIGMOD 2010 give the MapReduce form
  * this plan mirrors) is LOSSLESS: under any global element order, two
  * sets with J(a,b) >= t must share an element within each set's first
  * |x| - ceil(t*|x|) + 1 elements, so an equi-join on prefix elements
  * finds every qualifying pair and an exact verify step removes the
  * false positives.
  *
  * 100 TB shape:
  *  - element document frequencies: one explode + hash aggregate
  *    (shuffle keyed by element — same cost class as the postings
  *    build);
  *  - the global order is ASCENDING df with the element value as
  *    tie-break: prefixes are dominated by RARE elements, so the
  *    candidate equi-join buckets on rare keys — the hot-key
  *    (stopword) blowup that sinks a naive any-shared-element join
  *    never reaches the join;
  *  - candidate volume is sum over prefix elements of C(df_prefix, 2)
  *    restricted by the length filter (|a| >= t*|b|), orders of
  *    magnitude below the corpus quadratic (measured in SCALECHECK);
  *  - the verify join carries candidate pairs only; the corpus-sized
  *    set frame is PINNED once (eager localCheckpoint in `prepared`) —
  *    it feeds four consumers (document frequencies, prefixes, both
  *    verify sides), and measured at sf0.1 the re-derivation was ~30%
  *    of both operators' wall; the spill surface of one materialized
  *    set frame is the price of dropping three full tokenize/shingle
  *    passes (the opposite call from `bpeTokenIds`, whose derived
  *    frame has ONE consumer).
  */
object SetSimJoin {

  /** All pairs (doc_a < doc_b) with exact Jaccard(sets) >= threshold.
    *
    * @param sets   frame holding one row per document with its element
    *               array (duplicates tolerated — deduped internally)
    * @param idCol  document id column
    * @param setCol element array column
    * @return (doc_a, doc_b, jaccard) — jaccard rounded to 6 dp for
    *         display, the threshold filter applied on the unrounded
    *         double (i / (|a|+|b|-i), identical in any engine given
    *         identical integer inputs)
    */
  def jaccardJoin(sets: DataFrame, idCol: String, setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val base = prepared(sets, idCol, setCol)
    // exact verify on the candidate pairs only
    candidates(base, threshold)
      .join(base.select(col("doc_id").as("da"), col("els").as("ea"),
        col("sz").as("sa")), Seq("da"))
      .join(base.select(col("doc_id").as("db"), col("els").as("eb"),
        col("sz").as("sb")), Seq("db"))
      .withColumn("inter", size(array_intersect(col("ea"), col("eb"))))
      .withColumn("j",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("j"), 6).as("jaccard"))
  }

  /** Deduped, size-annotated set frame — the shared input of the
    * candidate and verify stages. PINNED (eager localCheckpoint): the
    * frame feeds FOUR consumers (document frequencies, prefixes, and
    * both sides of the exact verify join); unpinned, the upstream
    * tokenize/shingle/distinct would recompute for each — at 100 TB
    * that is three extra full passes over the corpus, far costlier
    * than materializing the set frame once.
    */
  private[graft] def prepared(sets: DataFrame, idCol: String,
      setCol: String): DataFrame =
    sets
      .select(col(idCol).as("doc_id"), array_distinct(col(setCol)).as("els"))
      .filter(size(col("els")) > 0)
      .withColumn("sz", size(col("els")))
      .localCheckpoint(true)

  /** Distinct candidate pairs (da < db) from the prefix-filter
    * equi-join — exposed so tests and ScaleCheck can measure the exact
    * candidate volume the verify stage pays for.
    */
  private[graft] def candidates(base: DataFrame,
      threshold: Double): DataFrame = {
    // global order: ascending document frequency, element as tie-break
    val dfs = base.select(explode(col("els")).as("el"))
      .groupBy(col("el")).agg(count(lit(1)).as("df"))

    // per-doc prefix under that order; ceil takes an epsilon slack so FP
    // rounding can only LENGTHEN the prefix (extra candidates are
    // removed by verify; a short prefix would lose pairs)
    val prefixes = base
      .select(col("doc_id"), col("sz"), explode(col("els")).as("el"))
      .join(dfs, Seq("el"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("el")))).as("ranked"))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("doc_id"), col("sz"),
        explode(slice(col("ranked.el"), lit(1), col("plen"))).as("el"))

    // a pair sharing several prefix elements collapses in the distinct
    prefixes.toDF("da", "sa", "el")
      .join(prefixes.toDF("db", "sb", "el"), Seq("el"))
      .filter(col("da") < col("db") &&
        least(col("sa"), col("sb")).cast("double") >=
          lit(threshold) * greatest(col("sa"), col("sb")).cast("double") - lit(1e-9))
      .select(col("da"), col("db")).distinct()
  }

  /** ASYMMETRIC containment join: all ordered pairs (a, b), a != b,
    * with `|A ∩ B| / |A| >= threshold` — "most of A's content sits
    * inside B": quote/extract detection, subset-document discovery,
    * the directional question Jaccard blurs (a 50-shingle doc fully
    * contained in a 5000-shingle doc has Jaccard ~0.01 but containment
    * 1.0).
    *
    * Same lossless prefix-filter argument as [[jaccardJoin]], adapted
    * to the asymmetric bound (PPJoin's overlap form): containment
    * requires overlap o = ceil(t*|A|), so A must share one of its
    * first |A| - o + 1 elements (ascending-df order) with B — but B's
    * prefix bound depends on A's size, so the B side joins with its
    * FULL element list (the postings shape). Candidate volume is
    * A-prefix (rare elements) x those elements' postings, bounded by
    * the size filter |B| >= t*|A|; exact verify on candidates only.
    */
  def containmentJoin(sets: DataFrame, idCol: String, setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val base = prepared(sets, idCol, setCol)
    val dfs = base.select(explode(col("els")).as("el"))
      .groupBy(col("el")).agg(count(lit(1)).as("df"))
    val prefixes = base
      .select(col("doc_id"), col("sz"), explode(col("els")).as("el"))
      .join(dfs, Seq("el"))
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("el")))).as("ranked"))
      // overlap needed: o = ceil(t*sa); prefix = sa - o + 1 (epsilon
      // slack lengthens, never shortens — see jaccardJoin)
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("doc_id").as("da"), col("sz").as("sa"),
        explode(slice(col("ranked.el"), lit(1), col("plen"))).as("el"))
    val postings = base.select(col("doc_id").as("db"), col("sz").as("sb"),
      explode(col("els")).as("el"))
    val cands = prefixes.join(postings, Seq("el"))
      .filter(col("da") =!= col("db") &&
        col("sb").cast("double") >=
          lit(threshold) * col("sa").cast("double") - lit(1e-9))
      .select(col("da"), col("db")).distinct()
    cands
      .join(base.select(col("doc_id").as("da"), col("els").as("ea"),
        col("sz").as("sa")), Seq("da"))
      .join(base.select(col("doc_id").as("db"), col("els").as("eb")),
        Seq("db"))
      .withColumn("inter", size(array_intersect(col("ea"), col("eb"))))
      .withColumn("c", col("inter").cast("double") / col("sa"))
      .filter(col("c") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("c"), 6).as("containment"))
  }

  /** Convenience: documents -> distinct word-n-gram shingle sets
    * (string form — DuckDB-reproducible; production pipelines can pass
    * `word_shingle_hashes` sets to [[jaccardJoin]] instead for compact
    * 8-byte elements).
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      array_distinct(TextAnalysis.wordShingles(
        TextAnalysis.tokens(col(textCol)), n)).as("els"))
      .filter(size(col("els")) > 0)
}
