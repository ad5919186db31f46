package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental snapshot-release maintenance — the composition the
  * monthly-release workflow hand-wires from parts this library already
  * has: [[Curation.corpusDiff]] finds what moved between snapshot
  * versions, a curation gate vets the delta, and the persisted LSH
  * dedup-reference index ([[Dedup.lshBands]] — the reference side of
  * incremental and streaming dedup) is updated in place: added/changed
  * docs that pass the gate are (re-)indexed, removed and changed docs'
  * old bands are tombstoned. One diff pass drives all three.
  *
  * Index layout under `indexPath`:
  *  - `bands/`     — (id, band, bkey, gen) parquet, append-only;
  *  - `tombstones/`— (id, gen) parquet, append-only;
  *  - `manifest/`  — 1-row (gen) parquet, rewritten per release (the
  *    [[Retrieval.saveKnModel]] manifest device — no index scan needed
  *    to learn the current generation).
  *
  * A band row is live unless a STRICTLY NEWER tombstone for its id
  * exists: a changed doc's tombstone and its re-indexed bands land at
  * the SAME generation, so the new bands survive while every older
  * generation dies; a later re-add of a removed id lands at a higher
  * generation than its tombstone. Append-only writes mean a release
  * never rewrites existing index data — at 100 TB the monthly delta is
  * ~1% of the corpus, and that is all the release touches (compaction
  * of dead bands is a separate periodic rewrite, same policy as the
  * ANN index's [[Similarity.appendIndex]]).
  */
object Release {

  /** Build the reference index from a released corpus (as-is — gate
    * the corpus BEFORE the initial build if it isn't already curated;
    * increments are gated by [[incrementalRelease]]). */
  def initReferenceIndex(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, shingle: Int = 3, numPerm: Int = 128,
      bands: Int = 32): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.lshBands(docs, idCol, textCol, shingle, numPerm, bands)
      .withColumn("gen", lit(0L))
      .write.mode("overwrite").parquet(s"$indexPath/bands")
    // zero-row tombstone frame pins the schema (id type mirrors bands)
    spark.read.parquet(s"$indexPath/bands")
      .select(col("id")).limit(0).withColumn("gen", lit(0L))
      .write.mode("overwrite").parquet(s"$indexPath/tombstones")
    Seq(0L).toDF("gen").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/manifest")
  }

  /** The LIVE (id, band, bkey, gen) rows: bands not shadowed by a
    * strictly newer tombstone. Feed this to
    * [[graft.streaming.StreamOps.streamingDedupAgainstReference]] or
    * join it as [[Dedup.minhashPairsAgainst]]'s reference side. */
  def readReferenceBands(spark: SparkSession, indexPath: String): DataFrame = {
    val bands = spark.read.parquet(s"$indexPath/bands")
    val tomb = spark.read.parquet(s"$indexPath/tombstones")
      .groupBy(col("id")).agg(max(col("gen")).as("__tgen"))
    bands.join(tomb, Seq("id"), "left")
      .filter(col("__tgen").isNull || col("gen") >= col("__tgen"))
      .drop("__tgen")
  }

  /** Compact the index: rewrite the LIVE bands as one generation and
    * drop every tombstone — the periodic rewrite that reclaims dead
    * band rows after many releases (same policy as the ANN index:
    * append per release, compact on a schedule, never per-release).
    * The live set is computed first and pinned, so the rewrite is safe
    * against its own source.
    *
    * Crash safety: the compacted bands land at the CURRENT manifest
    * generation, NOT at 0 — no existing tombstone is strictly newer
    * than that, so if the process dies between the bands overwrite and
    * the tombstone clear, every compacted band is already live under
    * the read rule and nothing vanishes (gen-0 compaction would be
    * shadowed by any surviving tombstone). The tombstone clear that
    * follows is pure cleanup; the manifest is untouched, so the next
    * release's generation still advances past everything.
    */
  def compactIndex(spark: SparkSession, indexPath: String): Unit = {
    import spark.implicits._
    // max(manifest, max tombstone): a release that crashed after its
    // tombstone append but before its manifest rewrite leaves
    // tombstones one generation PAST the manifest — compacting at the
    // manifest gen alone would land bands those tombstones strictly
    // shadow. Taking the ceiling over both closes that window too.
    val mgen = spark.read.parquet(s"$indexPath/manifest").head().getLong(0)
    val tgenRow = spark.read.parquet(s"$indexPath/tombstones")
      .agg(max(col("gen"))).head()
    val gen = math.max(mgen,
      if (tgenRow.isNullAt(0)) 0L else tgenRow.getLong(0))
    val live = readReferenceBands(spark, indexPath)
      .drop("gen").withColumn("gen", lit(gen))
      .localCheckpoint(true) // pin BEFORE overwriting the source files
    live.write.mode("overwrite").parquet(s"$indexPath/bands")
    spark.read.parquet(s"$indexPath/bands")
      .select(col("id")).limit(0).withColumn("gen", lit(0L))
      .write.mode("overwrite").parquet(s"$indexPath/tombstones")
    // keep the next release's generation past the compacted one even
    // when the compaction gen came from orphaned tombstones
    if (gen > mgen) Seq(gen).toDF("gen").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/manifest")
  }

  /** A curation gate keeping docs whose interpolated-KN NLL against a
    * reference model stays at or under `maxNll` — the CCNet quality
    * gate (Wenzek et al. 2020) as a release-gate face: train the model
    * once ([[Retrieval.knModel]] → [[Retrieval.saveKnModel]]), then
    * every release scores its ~1% delta against the loaded frames and
    * no release ever repays the reference pass. Composes with any base
    * gate (`base` runs first; both only filter, so the result is safe
    * for `gatePreservesText = true`).
    *
    * Scale shape: [[Retrieval.knNgramNllAgainstModel]]'s plan — one
    * delta-sized n-gram shuffle, model frames AQE-joined — feeding a
    * doc-id left-semi join back into the gated frame; the delta text
    * is never carried through the scoring join.
    */
  /** `modified = true` scores with the Chen-Goodman count-class
    * discounts ([[Retrieval.knNgramNllModAgainstModel]]) — the KenLM
    * estimator; the model must carry its discount triples (any model
    * built or persisted since they ship does).
    *
    * Short-doc contract: a doc with fewer than `m.order` tokens has no
    * top-order n-gram, so the scorer emits NO row for it — the model
    * simply has no opinion. Such docs PASS this gate (the filter is
    * an anti-join on the docs the model scored as unfit, so unscored
    * docs survive even at tight `maxNll`). Gate them by an explicit
    * length rule instead: `minTokens` drops docs under that token
    * count BEFORE scoring — a visible, documented policy rather than
    * a silent artifact of the model order.
    */
  def knPerplexityGate(m: Retrieval.KnModel, maxNll: Double,
      idCol: String, textCol: String,
      base: DataFrame => DataFrame = identity[DataFrame] _,
      modified: Boolean = false, minTokens: Int = 0)
      : DataFrame => DataFrame = { df =>
    val lengthGated =
      if (minTokens > 0)
        df.filter(TextAnalysis.tokenCount(col(textCol)) >= minTokens)
      else df
    val scoredAll =
      if (modified)
        Retrieval.knNgramNllModAgainstModel(lengthGated, idCol, textCol, m)
      else Retrieval.knNgramNllAgainstModel(lengthGated, idCol, textCol, m)
    // anti-join the FAILURES so docs the model never scored (fewer
    // than m.order tokens) pass — see the short-doc contract above
    val fail = scoredAll
      .filter(col("nll") > maxNll)
      .select(col("doc_id").as(idCol))
    base(lengthGated).join(fail, Seq(idCol), "left_anti")
  }

  /** Diff `oldSnap` → `newSnap`, gate the delta, update the reference
    * index, and return the per-id disposition:
    * (id, status, indexed) where `status` is [[Curation.corpusDiff]]'s
    * added/removed/changed/unchanged and `indexed` is true iff the doc
    * was (re-)indexed this release (added/changed AND passed `gate`).
    * Unchanged docs keep their existing bands (bands are a pure
    * function of the text); changed docs that FAIL the gate are
    * tombstoned and not re-added — the new version is unfit and the
    * old version no longer exists in the release.
    *
    * Scale shape: one full-outer id-hash join for the diff (carrying
    * (id, md5) only, never bodies); everything after runs on the DELTA
    * (added/changed docs — the ~1% a monthly snapshot moves), which is
    * what gets gated, shingled, and appended. The diff frame pins once
    * and drives the tombstone write, the delta join, and the returned
    * disposition.
    */
  /** `dedupThreshold`: when set, delta docs whose exact jaccard against
    * a LIVE reference doc reaches the threshold are DROPPED before the
    * quality gate — the reason the band index exists: new arrivals are
    * checked against everything already released without recomputing
    * any reference signature. Candidates come from the index's band
    * buckets (delta bands × live bands); exact verification shingles
    * only the candidate docs on each side (every live index id is
    * still present in `newSnap`, so the reference text is at hand).
    * Within-delta duplicates are out of scope (run `Dedup.minhashDedup`
    * on the delta upstream if the increment itself may self-duplicate).
    * Output gains a `deduped` column (always false when off).
    *
    * Crash/retry: a release that dies mid-write can be RE-RUN with the
    * same arguments — the diff is deterministic, duplicate tombstones
    * collapse under the per-id max(gen), duplicate band appends (same
    * generation, same content) inflate rows until the next compaction
    * but never change liveness, and the dedup probe reads only bands
    * at `gen < this release's gen`, so bands a crashed attempt already
    * appended are invisible to the re-run and its dispositions
    * reproduce run 1's exactly (including for within-delta near-dup
    * pairs). The manifest write lands LAST, so a completed manifest
    * implies a completed release, and [[compactIndex]] tolerates
    * tombstones a crashed release left one generation past the
    * manifest.
    *
    * `gatePreservesText`: minhash signatures are the dominant CPU cost
    * of a release, and with the dedup probe on they are computed for
    * the whole delta; if the gate only FILTERS (never rewrites
    * `textCol` — not true of e.g. `TextAnalysis.c4Filter`, which edits
    * pages), set this to reuse the probe's bands for the append via an
    * id semi-join instead of recomputing them on the gated survivors.
    * The safe default recomputes, because indexed bands must encode
    * the text as indexed.
    */
  def incrementalRelease(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String, hashCols: Seq[String],
      gate: DataFrame => DataFrame, indexPath: String,
      shingle: Int = 3, numPerm: Int = 128, bands: Int = 32,
      dedupThreshold: Option[Double] = None,
      gatePreservesText: Boolean = false,
      hashColsCoverText: Boolean = false): DataFrame = {
    val spark = newSnap.sparkSession
    import spark.implicits._
    // contract: the diff must SEE text edits, or stale bands stay live
    // while the index claims to encode the corpus text. A caller
    // diffing on a precomputed content-hash column derived from the
    // text opts out explicitly with hashColsCoverText = true.
    require(hashColsCoverText || hashCols.contains(textCol),
      s"incrementalRelease: hashCols must include textCol '$textCol' — " +
        "otherwise a text-only edit diffs as 'unchanged', its stale " +
        "bands stay live, and the index no longer encodes the corpus " +
        "text. Add it, or pass hashColsCoverText = true if a hash " +
        "column derived from the text already covers it")
    // read the generation BEFORE the manifest rewrite below
    val gen = spark.read.parquet(s"$indexPath/manifest")
      .head().getLong(0) + 1L
    val diff = Curation.corpusDiff(oldSnap, newSnap, idCol, hashCols)
      .localCheckpoint(true) // three consumers: tombstones, delta, return
    // tombstones FIRST: a changed doc's old self leaves the live set
    // before the dedup probe below, so it cannot self-match
    diff.filter(col("status").isin("removed", "changed"))
      .select(col("id")).withColumn("gen", lit(gen))
      .write.mode("append").parquet(s"$indexPath/tombstones")
    val delta = newSnap.join(
      diff.filter(col("status").isin("added", "changed"))
        .select(col("id").as(idCol)), Seq(idCol))
      .localCheckpoint(true) // delta-sized; bands + dedup + gate read it
    def shinglesOf(df: DataFrame): DataFrame = df.select(
      col(idCol).as("id"),
      graft.functions.word_shingle_hashes(
        TextAnalysis.tokens(col(textCol)), shingle).as("__sh"))
    val deltaBands0 = Dedup.lshBands(delta, idCol, textCol,
      shingle, numPerm, bands)
    // one flag drives BOTH the pin here and the reuse at the append —
    // they must stay in lock-step (pinning without reuse wastes memory,
    // reusing without the pin re-runs the minhash)
    val reuseProbeBands = dedupThreshold.isDefined && gatePreservesText
    val deltaBands =
      if (reuseProbeBands) deltaBands0.localCheckpoint(true)
      else deltaBands0
    val dupIds: Option[DataFrame] = dedupThreshold.map { th =>
      // gen < this release's gen: bands a CRASHED attempt of THIS
      // release appended are excluded from the probe's live set, so a
      // re-run sees exactly the pre-release index and its dispositions
      // reproduce run 1's (without the filter, within-delta near-dup
      // pairs would dedup against run 1's appended bands — disposition
      // and index disagreeing). Tombstones at this gen still apply:
      // a changed doc's old self must stay out of the probe.
      val live = readReferenceBands(spark, indexPath)
        .filter(col("gen") < gen)
        .select(col("id").as("ref_id"), col("band"), col("bkey"))
      val cands = deltaBands.select(col("id").as("new_id"),
          col("band"), col("bkey"))
        .join(live, Seq("band", "bkey"))
        .filter(col("new_id") =!= col("ref_id"))
        .select(col("new_id"), col("ref_id")).distinct()
        .localCheckpoint(true) // candidate-pair-sized
      // fail fast on index/snapshot drift: the exact verify reads
      // reference TEXT from newSnap, which is sound only when every
      // live index id is still a row of the corpus (this release's
      // tombstones have already retired removed/changed ids). A
      // candidate ref_id missing from newSnap means the index was
      // built from some other corpus lineage — the inner join below
      // would silently drop the pair and true duplicates would pass
      // unverified. The audit is candidate-sized (the precise set
      // whose absence corrupts the verify), and newSnap membership
      // reads off the PINNED diff (status != removed ⇔ id ∈ newSnap;
      // an id absent from the diff is in neither snapshot) — no second
      // corpus scan.
      val missingRef = cands.select(col("ref_id")).distinct()
        .join(diff.filter(col("status") =!= "removed")
            .select(col("id").as("ref_id")),
          Seq("ref_id"), "left_anti")
        .limit(3).collect()
      require(missingRef.isEmpty,
        "incrementalRelease: candidate reference id(s) " +
          missingRef.map(_.get(0)).mkString("[", ", ", "]") +
          " are live in the index but absent from newSnap — the index " +
          "was not built from this snapshot lineage, so near-duplicate " +
          "candidates cannot be exact-verified. Rebuild the index from " +
          "the released corpus (initReferenceIndex) or release against " +
          "the corpus the index encodes")
      // exact verify shingles ONLY candidate docs: semi-join prunes
      // each side to the candidate ids before the shingle map
      val newSh = shinglesOf(delta.join(
        cands.select(col("new_id").as(idCol)).distinct(),
        Seq(idCol), "left_semi"))
      val refSh = shinglesOf(newSnap.join(
        cands.select(col("ref_id").as(idCol)).distinct(),
        Seq(idCol), "left_semi"))
      cands
        .join(newSh.select(col("id").as("new_id"), col("__sh").as("__sa")),
          Seq("new_id"))
        .join(refSh.select(col("id").as("ref_id"), col("__sh").as("__sb")),
          Seq("ref_id"))
        .filter(size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          size(array_union(col("__sa"), col("__sb"))).cast("double") >= th)
        .select(col("new_id").as(idCol)).distinct()
        // pin the verify's verdict (dup-id-sized): it feeds the
        // surviving anti-join AND the returned disposition, and without
        // the pin the candidate shingling + joins would re-execute on
        // every action the caller takes on the result
        .localCheckpoint(true)
    }
    val surviving = dupIds match {
      case Some(d) => delta.join(d, Seq(idCol), "left_anti")
      case None    => delta
    }
    // delta-sized pin (the release increment, not the corpus): the
    // gated frame feeds both the band append and the disposition
    val passed = gate(surviving).localCheckpoint(true)
    // bands for the append: reuse the probe's pinned bands when the
    // caller asserts the gate never rewrites text; otherwise recompute
    // on the gated survivors so indexed bands encode the indexed text
    val appendBands =
      if (reuseProbeBands)
        deltaBands.join(passed.select(col(idCol).as("id")),
          Seq("id"), "left_semi")
      else Dedup.lshBands(passed, idCol, textCol, shingle, numPerm, bands)
    appendBands
      .withColumn("gen", lit(gen))
      .write.mode("append").parquet(s"$indexPath/bands")
    Seq(gen).toDF("gen").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/manifest")
    val passedIds = passed.select(col(idCol).as("id"))
      .withColumn("__passed", lit(true))
    val dedupedIds = dupIds match {
      case Some(d) => d.select(col(idCol).as("id"))
        .withColumn("__dup", lit(true))
      case None => // zero-row frame with diff's own id type
        diff.select(col("id")).limit(0).withColumn("__dup", lit(true))
    }
    diff.join(passedIds, Seq("id"), "left")
      .join(dedupedIds, Seq("id"), "left")
      .select(col("id"), col("status"),
        (col("status").isin("added", "changed") &&
          coalesce(col("__passed"), lit(false))).as("indexed"),
        coalesce(col("__dup"), lit(false)).as("deduped"))
  }
}
