package graft.ops

import graft.functions.{minhash_sig, simhash64, vec_cosine}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *   - exact: one hash-shuffle on the key (map-side combine via the
  *     aggregate form); no sort of the full data.
  *   - MinHash-LSH: per-doc signature (map-only, custom codegen'd
  *     expression), explode into `bands` keys, shuffle on band key only —
  *     candidate pairs are generated inside buckets, never a cross join.
  *   - SimHash: 64-bit signature, near-dup = Hamming<=3 via 4-chunk
  *     pigeonhole banding (any pair at distance <=3 shares at least one
  *     exact 16-bit chunk).
  *   - embedding cosine: LSH banding over random-hyperplane sign bits, then
  *     exact cosine verification inside buckets.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `orderCol` per key.
    * Window + filter keeps whole rows; a single hash shuffle on `keys`.
    */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-dup groups: key -> surviving id + number of copies (aggregate
    * form — map-side partial aggregation, cheapest possible exact dedup
    * audit).
    */
  def exactGroups(df: DataFrame, key: String, idCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash-LSH candidate pairs with exact Jaccard verification.
    *
    * @param shingle  word n-gram size for the shingle set
    * @param numPerm  signature length (permutations)
    * @param bands    LSH bands; rows-per-band = numPerm / bands. With
    *                 (128, 32) the match probability curve crosses ~50% at
    *                 jaccard ~ (1/32)^(1/4) ~ 0.42 — standard LSH tuning
    *                 (Leskovec et al., Mining of Massive Datasets ch.3).
    * @param threshold exact-Jaccard cutoff applied to candidates
    */
  /** Shared LSH derivation: hashed shingles, minhash signature, and the
    * (id, band, bkey) band-explode for one input frame.
    */
  private case class LshFrames(shingled: DataFrame, signed: DataFrame,
      banded: DataFrame)

  private def lshFrames(docs: DataFrame, idCol: String, textCol: String,
      shingle: Int, numPerm: Int, bands: Int): LshFrames = {
    val rows = numPerm / bands
    val toks = TextAnalysis.tokens(col(textCol))
    // Shingles are 64-bit hashes, not strings (word_shingle_hashes is one
    // codegen'd pass; string shingles would run an interpreted HOF lambda
    // per n-gram). Exact-jaccard verification over the hash sets is exact
    // up to 64-bit collisions (~1e-19 per pair).
    val shingles = graft.functions.word_shingle_hashes(toks, shingle)
    // Signature computation is CPU-bound; small inputs arrive as a single
    // file split, so spread it across the cluster explicitly (at 100 TB
    // the same rule applies: parallelism for this stage should track
    // cores, not input bytes).
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val withShingles = spread.select(col(idCol).as("id"), shingles.as("shingles"))
    val withSig = withShingles.select(
      col("id"), minhash_sig(col("shingles"), numPerm).as("sig"))
    // band key = hash of the band's signature slice; explode -> shuffle on
    // (band, key) only. CRITICAL at scale: the candidate join moves ONLY
    // (id, band, bkey) — candidate-pair volume is quadratic in bucket
    // size, so payloads (shingle sets here) must not ride through it;
    // they are re-attached per UNIQUE pair afterwards.
    // bands is a plan-time constant, so the band keys are a literal array
    // of codegen'd hash(slice(...)) expressions — not a transform() HOF,
    // whose lambda would evaluate interpreted per band per row
    val banded = withSig.select(
      col("id"),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)).as(Seq("band", "bkey")))
    LshFrames(withShingles, withSig, banded)
  }

  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val frames = lshFrames(docs, idCol, textCol, shingle, numPerm, bands)
    val withShingles = frames.shingled
    val withSig = frames.signed

    val l = frames.banded.as("l")
    val r = frames.banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Signature-estimated jaccard (fraction of agreeing minhash slots)
    // prunes candidates before the exact set intersection — 128 long
    // comparisons vs ~hundreds of string hashes per pair (MMDS ch.3's
    // estimate-then-verify). Margin of threshold/2 keeps est-vs-exact
    // variance from costing recall.
    val sigA = withSig.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sigB = withSig.select(col("id").as("id_b"), col("sig").as("sig_b"))
    val estimated = candidates
      .join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("est_j",
        graft.functions.sig_agreement(col("sig_a"), col("sig_b"))
          .cast("double") / numPerm.toDouble)
      .filter(col("est_j") >= threshold / 2)
      .select(col("id_a"), col("id_b"))

    val shA = withShingles.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = withShingles.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    estimated
      .join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** INCREMENTAL dedup: MinHash-LSH pairs of a NEW batch against an
    * existing REFERENCE corpus — the daily-increment shape. Instead of
    * re-clustering everything, only the asymmetric new-side x ref-side
    * band join runs: candidate volume is |new-batch buckets| x matching
    * ref buckets, never ref x ref. Same estimate-then-verify pipeline as
    * [[minhashPairs]]; id spaces are the caller's (no ordering
    * constraint between new and ref ids). Returns
    * (new_id, ref_id, jaccard >= threshold).
    *
    * At 100 TB the reference side's signatures/bands are computed once
    * and PERSISTED (they are pure functions of the text — the
    * [[graft.ops.Similarity]] index device); each increment then pays
    * only its own signature pass plus the band join.
    */
  def minhashPairsAgainst(newDocs: DataFrame, idCol: String, textCol: String,
      refDocs: DataFrame, refIdCol: String, refTextCol: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val nf = lshFrames(newDocs, idCol, textCol, shingle, numPerm, bands)
    val rf = lshFrames(refDocs, refIdCol, refTextCol, shingle, numPerm, bands)
    val candidates = nf.banded.as("l").join(rf.banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey"))
      .select(col("l.id").as("new_id"), col("r.id").as("ref_id"))
      .dropDuplicates("new_id", "ref_id")
    val estimated = candidates
      .join(nf.signed.select(col("id").as("new_id"), col("sig").as("sig_a")), "new_id")
      .join(rf.signed.select(col("id").as("ref_id"), col("sig").as("sig_b")), "ref_id")
      .withColumn("est_j",
        graft.functions.sig_agreement(col("sig_a"), col("sig_b"))
          .cast("double") / numPerm.toDouble)
      .filter(col("est_j") >= threshold / 2)
      .select(col("new_id"), col("ref_id"))
    estimated
      .join(nf.shingled.select(col("id").as("new_id"), col("shingles").as("sh_a")), "new_id")
      .join(rf.shingled.select(col("id").as("ref_id"), col("shingles").as("sh_b")), "ref_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("ref_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** The (id, band, bkey) LSH band assignment of a corpus — the
    * persistable reference-side index for incremental
    * ([[minhashPairsAgainst]]) and streaming
    * ([[graft.streaming.StreamOps.streamingDedupAgainstReference]])
    * dedup: a pure function of the text, computed once, written as
    * parquet, reused by every increment/micro-batch.
    */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    lshFrames(docs, idCol, textCol, shingle, numPerm, bands).banded
  }

  /** Keep only the new-batch docs with NO near-dup in the reference
    * corpus (the act step of [[minhashPairsAgainst]]).
    */
  def dedupAgainst(newDocs: DataFrame, idCol: String, textCol: String,
      refDocs: DataFrame, refIdCol: String, refTextCol: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashPairsAgainst(newDocs, idCol, textCol,
      refDocs, refIdCol, refTextCol, shingle, numPerm, bands, threshold)
      .select(col("new_id").as(idCol)).distinct()
    newDocs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected pair list: each node gets
    * the MINIMUM id reachable from it (the canonical cluster
    * representative for transitive near-dup dedup — greedy drop-larger
    * keeps every "local minimum" of the pair graph; CC collapses whole
    * chains a-b, b-c to one survivor even when a-c never paired).
    *
    * Scale shape: iterative min-label propagation with POINTER JUMPING
    * (comp := comp(comp) each round — CC in O(log n) rounds instead of
    * O(diameter); cf. large-star/small-star, Kiveris et al. 2014). The
    * edge list is made SELF-INCLUSIVE once up front ((id, id) loops), so
    * each round's `least(own, min over neighbors)` is a single join +
    * partial-agg min — the self row both contributes the node's own
    * label to the min and carries its old label out for the convergence
    * probe. Round 1 needs no join at all: with comp0(x) = x the
    * neighbor-min is just min(d) per s. Per round after that: one join +
    * agg, one pointer-jump join, all on (id, comp) pairs only — payloads
    * never enter. Each round is localCheckpoint'ed so lineage stays flat
    * and the convergence probe rides the checkpoint job via observe().
    * The label table holds only nodes that APPEAR IN PAIRS — at 100 TB
    * that is the near-dup subgraph, orders of magnitude smaller than the
    * corpus.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIters)._1

  /** [[connectedComponents]] plus the number of label-propagation rounds
    * it took — the observable the O(log diameter) pointer-jumping claim
    * is tested against (ScaleCheck's planted chain/star graphs).
    */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 50): (DataFrame, Int) = {
    val edges = pairs
      .select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
      .unionByName(pairs.select(col(bCol).cast("long").as("s"),
        col(aCol).cast("long").as("d")))
    // self-inclusive, deduplicated, pinned: the upstream pair pipeline
    // (LSH) must not recompute per round
    val withSelf = edges
      .unionByName(edges.select(col("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint(eager = true)
    // round 1 closed-form: comp1 = min(N(id) ∪ {id}) since comp0(x) = x
    var labels = withSelf.groupBy(col("s").as("id")).agg(min(col("d")).as("comp"))
      .localCheckpoint(eager = true)
    var converged = false
    var iter = 1
    while (!converged && iter < maxIters) {
      // comp := min(own, neighbors' comps) in ONE join + agg over the
      // self-inclusive edges; the self row (d == s) carries the old label
      // cached: the pointer-jump below self-joins minN, and without the
      // cache each round would recompute the neighbor-min join+agg twice
      val minN = withSelf
        .join(labels.select(col("id").as("d"), col("comp").as("dcomp")), Seq("d"))
        .groupBy(col("s").as("id"))
        .agg(min(col("dcomp")).as("ncomp"),
          max(when(col("d") === col("s"), col("dcomp"))).as("old"))
        .cache()
      // pointer jump: comp := comp(comp) — collapses chains exponentially
      val jumped = minN
        .join(minN.select(col("id").as("ncomp"), col("ncomp").as("jcomp")),
          Seq("ncomp"), "left")
        .select(col("id"), col("old"), coalesce(col("jcomp"), col("ncomp")).as("comp"))
      // convergence probe rides the checkpoint's materialization job via
      // observe() — no separate count job per round. freshStats on the
      // checkpoint: each round's plan squares the carried size estimate
      // (minN self-join), so without resetting it the Catalyst stats
      // BigInt doubles its bit count every round and overflows near
      // round ~24 — past CCDEEP's 18 rounds but inside the 50-round
      // budget a 30M-diameter graph would legitimately use (the same
      // failure pageRankConverged hit; see GraftSqlShim.freshStats).
      val obs = org.apache.spark.sql.Observation()
      labels = org.apache.spark.sql.GraftSqlShim.freshStats(jumped
        .observe(obs, max((col("comp") =!= col("old")).cast("int")).as("changed"))
        .drop("old")
        .localCheckpoint(eager = true))
      // null = zero rows observed (empty pair graph) -> trivially converged
      val changed = obs.get("changed")
      converged = changed == null || changed == 0
      minN.unpersist(blocking = false) // labels is checkpointed; drop the round's cache
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    (labels.select(col("id"), col("comp").as("cluster_id")), iter)
  }

  /** Corpus-level duplicate-line removal (MassiveText-style boilerplate
    * filtering): every line occurring more than `maxOccurrences` times
    * ACROSS the corpus is dropped from every document; surviving lines
    * are reassembled in order (docs whose every line was boilerplate
    * come back as empty strings, not dropped rows).
    *
    * Scale shape: explode lines (map-only), count by line (one shuffle
    * with map-side combine), keep only the FREQUENT lines (tiny — the
    * boilerplate set), broadcast anti-join, then one ordered-window
    * reassembly shuffle on the doc id. The corpus lines never join
    * against each other — only against the broadcast boilerplate set,
    * the same shape as decontamination.
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long = 3L): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boilerplate = lines.groupBy(col("line"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxOccurrences)
      .select(col("line"))
    val kept = lines.join(broadcast(boilerplate), Seq("line"), "left_anti")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val reassembled = kept
      .withColumn("__clean", array_join(collect_list(col("line")).over(w), "\n"))
      .groupBy(col(idCol)).agg(first(col("__clean")).as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  /** Within-corpus duplicated n-gram report: for each document, how many
    * of its distinct word n-grams also appear in at least one OTHER
    * document — the distributed approximation of exact-substring dedup
    * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", uses suffix arrays on a single machine; hashed fixed-length
    * n-grams are the shuffle-friendly form used by large corpus
    * pipelines).
    *
    * Scale shape: the corpus reduces to (doc_id, 64-bit gram hash) via the
    * codegen'd `word_shingle_hashes` kernel (already distinct per doc) —
    * one groupBy(g) with map-side combine marks grams seen in >1 doc,
    * then one hash join back on g (both sides g-partitioned after the
    * aggregate, so AQE reuses the exchange) and a final per-doc count.
    * No gram strings materialize and no doc joins any other doc directly
    * — pair volume never appears, unlike pairwise dedup.
    */
  def duplicatedGramReport(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val grams = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) >= n)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.word_shingle_hashes(col("__toks"), n)).as("g"))
    // per-(doc, g) rows are unique -> count(*) == distinct-doc count
    val gramDocCounts = grams.groupBy(col("g"))
      .agg((count(lit(1)) > 1).as("isdup"))
    grams.join(gramDocCounts, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("isdup"), 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
  }

  /** Duplicated-SPAN report — the positional refinement of
    * [[duplicatedGramReport]] and the shuffle-friendly form of exact-
    * substring dedup (Lee et al. 2021 ExactSubstr, which builds one giant
    * suffix array on a single machine): a token position is COVERED when
    * the word n-gram starting there occurs more than once in the corpus
    * (any repeat — other doc or the same one); overlapping covered
    * intervals [pos, pos+n-1] merge into maximal spans. Per doc:
    * span count, covered token count, covered fraction — the numbers a
    * span-removal pass would act on.
    *
    * Scale shape: the corpus reduces to (doc_id, pos, 64-bit gram hash)
    * via the codegen'd positional kernel (no gram strings materialize);
    * one groupBy(g) marks repeated grams, one hash join back on g (both
    * sides g-partitioned after the aggregate), then the span merge is a
    * doc-keyed window (lag + running sum — each doc's positions, never
    * the corpus, in one partition). The doc-length frame is a separate
    * column-pruned projection; at petabyte scale derive n_tokens from the
    * per-doc gram count (m = grams + n - 1) instead and skip the second
    * text scan.
    */
  /** Merge a (doc_id, pos) frame of covered GRAM-start positions into
    * maximal spans: positions whose [pos, pos+n-1] token intervals
    * overlap coalesce. Returns (doc_id, __p1, __p2) inclusive gram-start
    * ranges. Shared by [[duplicatedSpanReport]]/[[removeDuplicatedSpans]]
    * and [[Decontamination.contaminationSpans]] so the merge rule (gap
    * test n-1, lag + running sum) has exactly one definition.
    */
  private[ops] def mergePositionsToSpans(positions: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    positions
      .withColumn("__new",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + (n - 1), 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(cum))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("pos")).as("__p1"), max(col("pos")).as("__p2"))
  }

  /** (doc_id, pos, g): one 64-bit hash per gram START position (shared
    * corpus-to-positional-grams pass).
    */
  private[ops] def positionalGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) >= n)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.word_shingle_hashes_all(col("__toks"), n)))
      .withColumnRenamed("col", "g")
  }

  /** Shared span derivation: (doc_id, __p1, __p2) — maximal merged
    * inclusive GRAM-start ranges of corpus-repeated n-grams per doc.
    */
  private def spanFrame(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // pinned: both the repeated-gram aggregate and the join back read
    // this — without the checkpoint the tokenize+posexplode+hash subtree
    // (the dominant cost) executes twice
    val grams = positionalGrams(docs, idCol, textCol, n).localCheckpoint(true)
    val repeated = grams.groupBy(col("g"))
      .agg((count(lit(1)) > 1).as("__rep"))
      .filter(col("__rep"))
    mergePositionsToSpans(
      grams.join(repeated, Seq("g")).select(col("doc_id"), col("pos")), n)
  }

  def duplicatedSpanReport(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val perDoc = spanFrame(docs, idCol, textCol, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__p2") - col("__p1") + n).as("covered_tokens"))
    docs.select(col(idCol).as("doc_id"), size(toks).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_span_frac",
        when(col("n_tokens") === 0, 0.0).otherwise(
          round(col("covered_tokens").cast("double") / col("n_tokens"), 6)))
  }

  /** The ACT step of [[duplicatedSpanReport]]: rewrite each document with
    * its duplicated spans removed (ExactSubstr removal at n-gram
    * granularity). Output: (doc_id, n_tokens, kept_tokens, clean_text) —
    * clean_text is the surviving tokens joined by single spaces (the
    * tokenizer's normalized form, like [[dedupLines]]).
    *
    * Scale shape: the span frame is tiny (a few rows per affected doc),
    * so it collects into two long arrays per doc (collect_list over the
    * doc-keyed aggregate — bounded by spans-per-doc, not corpus size) and
    * rides the join back; the removal itself is the codegen'd
    * remove_token_ranges kernel — ONE map pass over the corpus, no
    * token-row explode, no per-token lambda.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val ranges = spanFrame(docs, idCol, textCol, n)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("__p1").cast("long")).as("__starts"),
        collect_list((col("__p2") + (n - 1)).cast("long")).as("__ends"),
        sum(col("__p2") - col("__p1") + n).as("__covered"))
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .join(ranges, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - coalesce(col("__covered"), lit(0L)))
          .cast("long").as("kept_tokens"),
        graft.functions.remove_token_ranges(col("__toks"),
          col("__starts"), col("__ends")).as("clean_text"))
  }

  /** Cluster-level dedup: keep each component's minimum-id doc (plus every
    * doc with no near-dup pair at all). The transitive-closure form of
    * [[minhashDedup]].
    */
  def dedupByComponents(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    // min-id survivor: the label IS the policy (cheaper than the scored
    // overload's window — a plain filter on the label table)
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupByComponents]] with a survivor POLICY: keep the cluster
    * member maximizing `score` (ties: lowest id) instead of the minimum
    * id. The scoring window runs over the near-dup subgraph only —
    * ids+score rows, never the corpus.
    */
  def dedupByComponents(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: org.apache.spark.sql.Column, aCol: String,
      bCol: String): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
    val scored = docs.select(col(idCol).as("id"), score.as("__score"))
      .join(labels, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("__score").desc, col("id"))
    val losers = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Greedy MinHash dedup: drop every doc that near-matches a smaller id
    * (the standard single-pass policy; see [[dedupByComponents]] for the
    * transitive-closure variant).
    */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashPairs(docs, idCol, textCol, shingle, numPerm, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Near-dup removal keeping the BEST member of each duplicate cluster —
    * the production survivor policy (keep the longest / highest-quality
    * copy, not the smallest id): exact-verified minhash pairs →
    * transitive clusters ([[connectedComponents]]) → per-cluster argmax
    * by (`score` desc, id asc) → anti-join the losers. Docs in no pair
    * never enter the cluster machinery and always survive.
    *
    * 100 TB shape: same as [[minhashDedup]] plus one ids+score-only
    * window over the clustered subgraph (near-dup-sized, not
    * corpus-sized); the corpus itself is touched only by the final
    * anti-join on loser ids.
    */
  def minhashDedupKeepBest(docs: DataFrame, idCol: String, textCol: String,
      score: org.apache.spark.sql.Column, shingle: Int = 3,
      numPerm: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame =
    dedupByComponents(docs, idCol,
      minhashPairs(docs, idCol, textCol, shingle, numPerm, bands, threshold),
      score, "id_a", "id_b")

  /** Per-doc 64-bit SimHash frame. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        simhash64(TextAnalysis.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs at Hamming distance <= maxDist (default 3).
    * Pigeonhole banding: split 64 bits into (maxDist+1) chunks; any pair
    * within maxDist agrees exactly on >=1 chunk, so candidates come from
    * an equi-join on (chunk index, chunk value) — never a cross join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val sigs = simhashSignatures(docs, idCol, textCol)

    val chunkCols = (0 until chunks).map(c =>
      shiftright(col("simhash"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "ckey")))

    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): assign every embedding to
    * its nearest centroid by cosine, then find near-duplicate pairs ONLY
    * within a cluster — the quadratic stage is bounded by cluster size,
    * never the corpus. Cross-cluster pairs are deliberately out of scope
    * (that is the algorithm's recall trade).
    *
    * Scale shape: assignment is map-only — centroids inline as literals
    * into K codegen'd `vec_cosine` kernel calls (K is a plan-time
    * constant; at web scale K grows with the corpus — the paper uses 50k
    * clusters — keeping per-cluster pair counts bounded, and the
    * assignment becomes the IVF probe in [[Similarity]]). The only
    * shuffle is the equi-join on the cluster key; vectors must ride it
    * because every within-cluster pair needs its exact cosine — that is
    * SemDeDup's defined cost, not an implementation accident.
    *
    * Ties in the argmax go to the smallest centroid index
    * (deterministic, engine-reproducible).
    */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Float]], threshold: Double = 0.9): DataFrame = {
    require(centroids.size >= 2, "semanticPairs needs at least 2 centroids")
    val cosCols = centroids.map(c => vec_cosine(col("__vec"), graft.functions.lit_vec(c)))
    val m = greatest(cosCols: _*)
    val cluster = cosCols.zipWithIndex.tail
      .foldLeft(when(cosCols.head === m, 0)) {
        case (acc, (cc, j)) => acc.when(cc === m, j)
      }
    val base = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .withColumn("cluster", cluster)
    val a = base.select(col("cluster"), col("id").as("id_a"), col("__vec").as("va"))
    val b = base.select(col("cluster"), col("id").as("id_b"), col("__vec").as("vb"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(vec_cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cluster"), col("sim"))
  }

  /** Block-indicator centroids (centroid j is 1 on dimensions i where
    * i % k == j): a deterministic, engine-reproducible centroid set for
    * testing/oracling [[semanticPairs]] — production callers pass
    * [[Similarity.trainCentroids]] output instead.
    */
  def blockCentroids(k: Int, dim: Int): Seq[Seq[Float]] =
    (0 until k).map(j => (0 until dim).map(i => if (i % k == j) 1.0f else 0.0f))

  /** Embedding near-dup pairs: random-hyperplane LSH bucketing + exact
    * cosine verification. Plane signs are generated from a fixed seed on
    * the driver and inlined as literals (tiny), so assignment is map-only;
    * the only shuffle is on the band keys.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, bits: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col("vec"), dim, bits, seed)
    val rowsPer = bits / bands
    val bandCols = (0 until bands).map(b =>
      shiftright(col("sig"), b * rowsPer).bitwiseAND(lit((1L << rowsPer) - 1)))
    // ids + 8-byte signature through the quadratic candidate join (sigs
    // are cheap enough to ride; vectors are not — see minhashPairs).
    val base = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val banded = base.select(col("id"), sigCol.as("sig"))
      .select(col("id"), col("sig"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
    val l = banded.as("l"); val r = banded.as("r")
    // Hamming pre-filter: E[hamming] = bits * acos(cos_sim)/pi, so pairs
    // above `threshold` concentrate below bits*acos(threshold)/pi; a
    // +25% margin keeps the variance tail. Survivors only then pay the
    // vector re-attach + exact cosine.
    val maxHam = math.ceil(bits * math.acos(threshold) / math.Pi * 1.25).toInt
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .filter(bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= maxHam)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = base.select(col("id").as("id_a"), col("vec").as("va"))
    val vb = base.select(col("id").as("id_b"), col("vec").as("vb"))
    candidates
      .join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", vec_cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** EDIT-SIMILARITY verification of candidate pairs: normalized
    * Levenshtein similarity `1 - lev/max(len)` — the character-exact
    * near-dup measure (catches reorder-free edits shingle Jaccard
    * blurs, and the standard verify for short docs where shingle sets
    * are too small to trust).
    *
    * 100 TB shape: this is the VERIFY stage — candidates come from
    * MinHash/SimHash banding (bucket-bounded volume), never all-pairs;
    * the quadratic cost is per candidate, not per corpus. Levenshtein
    * is O(len_a * len_b) per pair, so `maxLen` guards the kernel
    * against pathological giant docs (over-length pairs are REPORTED
    * with sim = null, not silently dropped and not silently truncated).
    *
    * `pairs` needs (id_a, id_b); doc texts are attached by two id
    * equi-joins against `docs` (co-partitioned with the candidate
    * stream, AQE-sized).
    */
  def editSimilarityVerify(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxLen: Int = 20000): DataFrame = {
    require(threshold >= 0 && threshold <= 1, "threshold must be in [0,1]")
    require(maxLen > 0, "maxLen must be positive")
    val ta = docs.select(col(idCol).as("id_a"), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as("id_b"), col(textCol).as("__tb"))
    // spread BEFORE the text joins: candidate frames are byte-small but
    // the DP downstream is compute-heavy, and both AQE coalescing and a
    // single-partition candidate source (e.g. a broadcast-join pair
    // generator) would otherwise serialize the kernel — the filter
    // below legitimately pushes into these joins, so the joins
    // themselves must already run wide
    pairs.select(col("id_a"), col("id_b"))
      .repartition(pairs.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
      .join(ta, "id_a").join(tb, "id_b")
      // LOSSLESS length prefilter before the O(len^2) kernel ever runs:
      // lev >= |len_a - len_b| always, so sim <= 1 - diff/max — a pair
      // whose length gap alone breaks the threshold never pays the DP.
      // (Kept pairs are unchanged; the null-reporting maxLen path is
      // exempt so over-length pairs still surface.)
      .filter(
        length(col("__ta")) > maxLen || length(col("__tb")) > maxLen ||
          lit(1.0) -
            abs(length(col("__ta")) - length(col("__tb"))).cast("double") /
            greatest(length(col("__ta")), length(col("__tb")))
            >= threshold)
      // fused kernel: decode + DP + normalize in one codegen'd pass
      // (~50x the built-in levenshtein, which re-decodes UTF-8 in the
      // DP inner loop; null = over-length report, same contract)
      .withColumn("edit_sim", org.apache.spark.sql.GraftSqlShim.column(
        graft.functions.EditSimilarity(
          org.apache.spark.sql.GraftSqlShim.expression(col("__ta")),
          org.apache.spark.sql.GraftSqlShim.expression(col("__tb")),
          maxLen)))
      .filter(col("edit_sim").isNull || col("edit_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("edit_sim"))
  }
}
