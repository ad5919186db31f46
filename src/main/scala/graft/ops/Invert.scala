package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index and exact phrase search — the sparse-IR
  * primitive that complements the dense-ANN stack (`ops/Similarity`):
  * find documents where a sequence of tokens appears ADJACENTLY, with
  * occurrence counts, either by a map-only direct scan (one-off query)
  * or against a persisted term-partitioned postings index (amortized
  * across many queries, e.g. building contamination/attribution report
  * sets for a training corpus).
  *
  * 100 TB shape:
  *  - [[postings]] is one posexplode + one (term, doc_id) hash
  *    aggregate — a single shuffle keyed by (term, doc_id), which also
  *    spreads hot stopword terms across partitions (no single-reducer
  *    skew on "the"); positions aggregate into one sorted array per
  *    (term, doc).
  *  - [[writeIndex]] persists partitioned by a CRC32 bucket of the term
  *    (a public checksum both Spark — `crc32()` — and the driver-side
  *    pruning predicate compute identically), so a phrase query's scan
  *    prunes to at most |phrase| of `nBuckets` partitions at
  *    file-listing time — the same device as the IVF cell index
  *    (`Similarity.writeIndex`).
  *  - [[phraseSearchIndex]] touches only the phrase's postings rows:
  *    the candidate aggregate carries |docs containing a phrase term|
  *    rows, never the corpus; adjacency is verified with higher-order
  *    array functions (codegen'd, no UDF, no self-join on positions —
  *    the classic positional-merge is expressed as `filter` +
  *    `array_contains` over per-term sorted position arrays).
  *  - [[phraseSearch]] (direct) is map-only: ZERO shuffles at any
  *    scale; use it when the query set doesn't justify an index build.
  */
object Invert {

  /** Positional postings: one row per (term, doc) with the sorted
    * 0-based token positions and the term frequency.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))))
      .toDF("doc_id", "pos", "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tf", size(col("positions")).cast("long"))

  /** CRC32-of-UTF8 bucket — computable identically in-plan
    * (`crc32(col)`) and on the driver (for partition-pruning literals).
    */
  private[graft] def termBucket(term: String, nBuckets: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % nBuckets).toInt
  }

  /** Persist the postings index partitioned by term bucket. A phrase
    * query then lists at most |phrase| of `nBuckets` directories.
    *
    * The bucket count is EMBEDDED in the data (constant `nb` column —
    * parquet RLE stores it in a few bytes), so query functions derive
    * the modulus from the index itself instead of trusting a caller
    * parameter: a mismatched caller value would silently prune the
    * wrong partitions and return false negatives.
    */
  def writeIndex(postings: DataFrame, path: String, nBuckets: Int = 64): Unit =
    postings
      .withColumn("bucket", pmod(crc32(col("term")), lit(nBuckets.toLong)).cast("int"))
      .withColumn("nb", lit(nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** The bucket modulus a query must use with this index: the embedded
    * `nb` constant when present (one-row read), else the caller's
    * fallback (pre-`nb` indexes), else no pruning for unbucketed
    * postings.
    */
  private def bucketModulus(index: DataFrame, fallback: Int): Option[Int] =
    if (!index.columns.contains("bucket")) None
    else if (index.columns.contains("nb"))
      index.select(col("nb")).limit(1).collect()
        .headOption.map(_.getInt(0)).orElse(Some(fallback))
    else Some(fallback)

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Exact phrase search against a postings index (output of
    * [[postings]] or [[readIndex]]). Returns (doc_id, n_hits,
    * first_pos) for documents with >= 1 adjacent occurrence of
    * `phrase` (terms are lowercased to match the tokenizer).
    *
    * Plan: prune to the phrase's buckets (partition-pruned if the
    * index is bucket-partitioned) and terms, aggregate the <= |phrase|
    * postings rows per doc into a term->positions map, keep docs
    * containing ALL distinct terms, then verify adjacency in-plan:
    * a position p of phrase(0) is a hit iff p+i is in phrase(i)'s
    * positions for every i. Duplicate terms in the phrase (e.g.
    * "buffalo buffalo") are handled — the map has one entry per
    * DISTINCT term and the adjacency predicate indexes it per slot.
    */
  def phraseSearchIndex(index: DataFrame, phrase: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val terms = phrase.map(_.toLowerCase)
    val distinctTerms = terms.distinct
    val pruned = bucketModulus(index, nBuckets) match {
      case Some(n) => index.filter(col("bucket")
        .isin(distinctTerms.map(termBucket(_, n)).distinct: _*))
      case None => index
    }
    val perDoc = pruned
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("positions"))))
        .as("pmap"))
      .filter(size(col("pmap")) === distinctTerms.size)
    val headPositions = col("pmap")(lit(terms.head))
    def adjacentAt(p: Column): Column =
      terms.zipWithIndex.tail
        .map { case (t, i) => array_contains(col("pmap")(lit(t)), p + lit(i)) }
        .foldLeft(lit(true))(_ && _)
    perDoc
      .withColumn("matches", filter(headPositions, p => adjacentAt(p)))
      .filter(size(col("matches")) > 0)
      .select(col("doc_id"),
        size(col("matches")).cast("long").as("n_hits"),
        element_at(col("matches"), 1).cast("long").as("first_pos"))
  }

  /** Proximity search: documents where ALL of `terms` co-occur inside
    * some window of `window` consecutive token positions (in any
    * order) — the relevance primitive between phrase match (window =
    * |phrase|, ordered) and bag-of-words AND. Returns (doc_id,
    * span_start) with the first qualifying window start.
    *
    * Exactness: a qualifying window can always be shrunk so it STARTS
    * at one of the terms' occurrences (the minimum selected position),
    * so probing only observed positions as window starts is lossless.
    * Same plan shape as [[phraseSearchIndex]] — postings rows for the
    * query terms only, then in-plan nested higher-order array checks.
    */
  def proximitySearch(index: DataFrame, terms: Seq[String], window: Int,
      nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(window >= 1, "window must be >= 1")
    val distinctTerms = terms.map(_.toLowerCase).distinct
    val pruned = bucketModulus(index, nBuckets) match {
      case Some(n) => index.filter(col("bucket")
        .isin(distinctTerms.map(termBucket(_, n)).distinct: _*))
      case None => index
    }
    val perDoc = pruned
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("positions"))))
        .as("pmap"))
      .filter(size(col("pmap")) === distinctTerms.size)
    val starts = array_sort(flatten(map_values(col("pmap"))))
    def coveredFrom(p: Column): Column =
      distinctTerms
        .map(t => exists(col("pmap")(lit(t)),
          q => q >= p && q < p + lit(window)))
        .reduce(_ && _)
    perDoc
      .withColumn("matches", filter(starts, p => coveredFrom(p)))
      .filter(size(col("matches")) > 0)
      .select(col("doc_id"),
        element_at(col("matches"), 1).cast("long").as("span_start"))
  }

  /** Per-document token counts derived from the postings (sum of tf) —
    * computed ONCE at index-build time and persisted beside the index,
    * so ranked retrieval never rescans the corpus. The dl frame DEFINES
    * the scored collection (n_docs/avgdl in [[bm25FromIndex]]): docs
    * with zero tokens have no postings rows and are absent here, so on
    * a corpus containing empty docs this differs from
    * `Retrieval.bm25TopK` (which counts them with dl=0). For exact
    * parity on such a corpus, derive dl from the corpus instead
    * (`docs.select(id, size(tokens(text)))`); the fixture corpora have
    * no empty docs (asserted in InvertSpec), and curated pipelines drop
    * them at the quality gate.
    */
  def docLengths(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("dl"))

  /** BM25 top-k against the postings index — `Retrieval.bm25TopK`'s
    * exact scoring (same Lucene/standard formulation) with the corpus
    * scan replaced by a pruned index read: only the query terms'
    * postings rows (|hits| rows, bucket-pruned at file-listing time on
    * a persisted index) plus the build-time doc-length table are
    * touched. df/avgdl/N are tiny aggregates riding broadcasts, the
    * per-doc score sum shuffles |hits| rows — the corpus itself is
    * never read at query time.
    */
  def bm25FromIndex(index: DataFrame, docLengths: DataFrame,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      nBuckets: Int = 64): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // terms matched AS GIVEN — Retrieval.bm25TopK does not case-fold its
    // query terms, and score parity (pinned in InvertSpec) requires the
    // same no-match behavior for e.g. 'Window' vs 'window'
    val terms = queryTerms.distinct
    val pruned = bucketModulus(index, nBuckets) match {
      case Some(n) => index.filter(col("bucket")
        .isin(terms.map(termBucket(_, n)).distinct: _*))
      case None => index
    }
    val tf = pruned.filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = docLengths.select(col("doc_id"), col("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    tf.join(broadcast(dfx), Seq("term"))
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
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** BATCH BM25 — thousands of queries against the index in ONE plan:
    * the retrieval-evaluation / negative-mining shape ([[bm25FromIndex]]
    * runs one term bag; eval sets and mining runs carry 10⁵⁺ queries,
    * and a per-query driver loop would plan 10⁵ jobs). `queries` is
    * (qid, array<string> terms); returns per query the top-k
    * (qid, doc_id, bm25, n_terms_hit) under exactly
    * [[bm25FromIndex]]'s scoring algebra and rounding (parity pinned
    * in `InvertSpec`), ties broken by doc_id.
    *
    * Scale shape: query terms explode to a (qid, term) frame that
    * equi-joins the postings on the TERM (AQE broadcasts it while the
    * query set fits; shuffles both sides beyond); document frequencies
    * come from the index semi-joined to the DISTINCT query terms —
    * corpus df, query-volume independent; the per-(qid, doc) score sum
    * and the per-qid rank window shuffle |hits| rows on qid. No bucket
    * pruning: a large query set touches most buckets by construction,
    * and the term join prunes harder than an isin ever could.
    */
  def bm25Batch(index: DataFrame, docLengths: DataFrame,
      queries: DataFrame, qidCol: String, termsCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qt = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(col(termsCol))).as("term"))
    val tf = index.select(col("doc_id"), col("term"), col("tf"))
    // df over the DISTINCT query-term vocabulary (corpus statistics,
    // independent of how many queries share a term)
    val dfx = tf
      .join(qt.select(col("term")).distinct(), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true) // query-vocab sized; hit join + nothing else
    val dl = docLengths.select(col("doc_id"), col("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("bm25").desc, col("doc_id"))
    qt.join(tf, Seq("term"))
      .join(broadcast(dfx), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("tot_dl").cast("double") / col("n_docs"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__s", col("__idf") * col("tf") /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("__s")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Incremental index maintenance: fold a DELTA batch's postings into
    * an existing index without re-tokenizing the base corpus. Documents
    * present in the delta REPLACE their base postings wholesale (a
    * changed document's old terms must disappear — per-term merging
    * can't express deletion); all other base rows pass through
    * untouched. The result is row-identical to rebuilding [[postings]]
    * over the updated corpus (pinned in InvertSpec), so every query
    * function ([[phraseSearchIndex]], [[bm25FromIndex]], [[docLengths]])
    * works on merged output unchanged. This two-arg form derives the
    * replaced set from the delta POSTINGS — sufficient when every delta
    * doc still has at least one term; for deletions or emptied docs use
    * the three-arg overload with an explicit doc-id set.
    *
    * 100 TB shape: the base side streams through ONE doc_id-keyed
    * anti-join against the delta's distinct doc ids (delta docs are a
    * tiny fraction of the corpus, so AQE broadcasts that side) — cost is
    * a base scan + the delta's own build, NEVER a corpus re-tokenize or
    * a per-(term, doc) merge shuffle. Chain batches by folding each new
    * delta into the previous merge; persist checkpoints with
    * [[writeIndex]] (bucketing is a property of the WRITE, so merged
    * output re-buckets cleanly at the next checkpoint).
    */
  def mergePostings(base: DataFrame, delta: DataFrame): DataFrame =
    mergePostings(base, delta, delta.select(col("doc_id")).distinct())

  /** [[mergePostings]] with the delta's doc-id set passed EXPLICITLY.
    * Required for correctness when a delta document became EMPTY (its
    * new text tokenizes to nothing) or was DELETED outright: such a doc
    * produces zero delta postings rows, so a doc-id set derived from the
    * delta postings would never anti-join its stale base rows away —
    * false-positive search/BM25 hits after the update. Derive
    * `deltaDocIds` from the delta DOCS frame (every updated-or-deleted
    * id), not from the delta postings.
    */
  def mergePostings(base: DataFrame, delta: DataFrame,
      deltaDocIds: DataFrame): DataFrame = {
    // normalize to the postings shape so a persisted base (readIndex
    // carries bucket/nb partition columns) merges as cleanly as an
    // in-memory one
    val shape = Seq("term", "doc_id", "positions", "tf").map(col)
    val replaced = deltaDocIds.select(col("doc_id")).distinct()
    base.join(replaced, Seq("doc_id"), "left_anti")
      .select(shape: _*) // using-column joins reorder; pin postings shape
      .unionByName(delta.select(shape: _*))
  }

  /** Index-free direct phrase scan — map-only (zero shuffles): filter
    * candidate start positions of the token array with a conjunction of
    * `element_at` probes. Same output contract as
    * [[phraseSearchIndex]]; use for one-off queries, the index form
    * when queries amortize the build.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val terms = phrase.map(_.toLowerCase)
    val n = terms.size
    // sequence(a, b) DESCENDS when a > b — guard short docs explicitly.
    val starts = when(size(col("__toks")) >= n,
      sequence(lit(0), size(col("__toks")) - lit(n)))
      .otherwise(array().cast("array<int>"))
    def matchesAt(i: Column): Column =
      terms.zipWithIndex
        .map { case (t, j) => element_at(col("__toks"), i + lit(j + 1)) === lit(t) }
        .reduce(_ && _)
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("matches", filter(starts, i => matchesAt(i)))
      .filter(size(col("matches")) > 0)
      .select(col("doc_id"),
        size(col("matches")).cast("long").as("n_hits"),
        element_at(col("matches"), 1).cast("long").as("first_pos"))
  }
}
