package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end incremental-release composition: two snapshot versions
  * through diff → gate → index update, with the live index asserted
  * EQUAL to a from-scratch index of the docs that should be in it.
  */
class ReleaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4-token docs pass a >= 4 gate; 2-token docs fail it
  private def doc(id: Long, words: String) = (id, words)

  private val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => df.filter(TextAnalysis.tokenCount(col("text")) >= 4)

  private def bandsOf(df: org.apache.spark.sql.DataFrame) =
    Dedup.lshBands(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  private def liveBands(path: String) =
    Release.readReferenceBands(spark, path)
      .select(col("id"), col("band"), col("bkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("two releases: diff drives gate + tombstones; index reflects each version exactly") {
    val dir = java.nio.file.Files.createTempDirectory("relidx").toString
    try {
      val v1 = Seq(
        doc(1L, "alpha beta gamma delta"),
        doc(2L, "epsilon zeta eta theta"),
        doc(3L, "iota kappa lambda mu"),
        doc(4L, "nu xi omicron pi"),
        doc(5L, "rho sigma tau upsilon")).toDF("doc_id", "text")
      Release.initReferenceIndex(v1, "doc_id", "text", dir)
      assert(liveBands(dir) == bandsOf(v1))

      // v2: remove 1; change 2 (still passes gate); change 3 to a
      // 2-token doc (FAILS gate -> tombstoned, not re-added); add 6
      // (passes) and 7 (fails)
      val v2 = Seq(
        doc(2L, "epsilon zeta eta theta CHANGED"),
        doc(3L, "iota kappa"),
        doc(4L, "nu xi omicron pi"),
        doc(5L, "rho sigma tau upsilon"),
        doc(6L, "phi chi psi omega"),
        doc(7L, "tiny doc")).toDF("doc_id", "text")
      val disp = Release.incrementalRelease(v1, v2, "doc_id", "text",
          Seq("text"), gate, dir)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
        .toMap
      assert(disp == Map(
        1L -> ("removed", false),
        2L -> ("changed", true),
        3L -> ("changed", false),
        4L -> ("unchanged", false),
        5L -> ("unchanged", false),
        6L -> ("added", true),
        7L -> ("added", false)))
      // the live index IS the index of {2'(new text), 4, 5, 6}
      val expected2 = v2.filter(col("doc_id").isin(2L, 4L, 5L, 6L))
      assert(liveBands(dir) == bandsOf(expected2))

      // v3: re-add 1 (a fresh add after its gen-1 tombstone must
      // survive — generation stacking), change 2 AGAIN, remove 6
      val v3 = Seq(
        doc(1L, "alpha beta gamma delta"),
        doc(2L, "epsilon zeta eta theta CHANGED TWICE"),
        doc(3L, "iota kappa"),
        doc(4L, "nu xi omicron pi"),
        doc(5L, "rho sigma tau upsilon"),
        doc(7L, "tiny doc")).toDF("doc_id", "text")
      val disp3 = Release.incrementalRelease(v2, v3, "doc_id", "text",
          Seq("text"), gate, dir)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
        .toMap
      assert(disp3 == Map(
        1L -> ("added", true),
        2L -> ("changed", true),
        3L -> ("unchanged", false),
        4L -> ("unchanged", false),
        5L -> ("unchanged", false),
        6L -> ("removed", false),
        7L -> ("unchanged", false)))
      // live index = {1, 2''(newest text), 4, 5}; 3 stays out (its
      // failed-gate tombstone holds), 7 was never indexed
      val expected3 = v3.filter(col("doc_id").isin(1L, 2L, 4L, 5L))
      assert(liveBands(dir) == bandsOf(expected3))

      // compaction: live set unchanged, dead rows + tombstones gone,
      // and a post-compaction release still works. Compacted bands
      // land at the CURRENT manifest generation (crash-safe against
      // any tombstone that survives a partial compaction), never 0
      Release.compactIndex(spark, dir)
      assert(liveBands(dir) == bandsOf(expected3))
      assert(spark.read.parquet(s"$dir/tombstones").count() == 0)
      val mgen = spark.read.parquet(s"$dir/manifest").head.getLong(0)
      assert(mgen == 2L) // two releases so far; manifest untouched
      assert(spark.read.parquet(s"$dir/bands")
        .agg(min(col("gen")), max(col("gen"))).head.toSeq ==
        Seq(mgen, mgen))
      val v4 = v3.filter(col("doc_id") =!= 4L) // remove 4 after compaction
      Release.incrementalRelease(v3, v4, "doc_id", "text",
        Seq("text"), gate, dir).collect()
      val expected4 = v3.filter(col("doc_id").isin(1L, 2L, 5L))
      assert(liveBands(dir) == bandsOf(expected4))

      // dedup gate: v5 adds 8 (verbatim copy of live doc 5 -> dropped
      // as a near-dup of the accumulated reference, never indexed) and
      // 9 (genuinely new -> indexed); the index reflects only 9
      val v5 = v4.unionByName(Seq(
        doc(8L, "rho sigma tau upsilon"),
        doc(9L, "one two three four")).toDF("doc_id", "text"))
      // gatePreservesText: the token-count gate only filters, so the
      // probe's bands are reused for the append (no second minhash)
      val disp5 = Release.incrementalRelease(v4, v5, "doc_id", "text",
          Seq("text"), gate, dir, dedupThreshold = Some(0.9),
          gatePreservesText = true)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getBoolean(2), r.getBoolean(3)))
        .toMap
      assert(disp5(8L) == ("added", false, true))  // dup: not indexed
      assert(disp5(9L) == ("added", true, false))  // new: indexed
      assert(disp5(5L) == ("unchanged", false, false))
      val expected5 = v5.filter(col("doc_id").isin(1L, 2L, 5L, 9L))
      assert(liveBands(dir) == bandsOf(expected5))

      // orphaned tombstone one generation PAST the manifest (a release
      // that died before its manifest write): it shadows its doc
      // immediately, and compaction must land PAST it — not at the
      // stale manifest gen, where the orphan would shadow every
      // compacted band — and advance the manifest
      val g5 = spark.read.parquet(s"$dir/manifest").head.getLong(0)
      Seq((9L, g5 + 1L)).toDF("id", "gen")
        .write.mode("append").parquet(s"$dir/tombstones")
      val expectedOrphan = v5.filter(col("doc_id").isin(1L, 2L, 5L))
      assert(liveBands(dir) == bandsOf(expectedOrphan))
      Release.compactIndex(spark, dir)
      assert(liveBands(dir) == bandsOf(expectedOrphan)) // stable
      assert(spark.read.parquet(s"$dir/manifest").head.getLong(0) == g5 + 1L)
      assert(spark.read.parquet(s"$dir/tombstones").count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("knPerplexityGate: release indexes only docs fluent under the reference model") {
    val dir = java.nio.file.Files.createTempDirectory("relknidx").toString
    try {
      // reference corpus: the model sees these trigram patterns
      val ref = Seq(
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the cat ran to the dog",
        "a dog ran on the mat").toDF("text")
      val m = Retrieval.knModel(ref, "text", order = 3)
      val inlier = "the cat sat on the rug"   // in-distribution
      val outlier = "zyx qwv jkl pqr mno abc" // all-unseen gibberish
      // threshold BETWEEN the two docs' measured scores — the gate's
      // verdict is then exactly the model's fluency ordering, not a
      // hand-tuned constant
      val scored = Retrieval.knNgramNllAgainstModel(
          Seq((1L, inlier), (2L, outlier)).toDF("doc_id", "text"),
          "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(scored(1L) < scored(2L))
      val maxNll = (scored(1L) + scored(2L)) / 2.0

      val v1 = Seq(doc(10L, "the dog ran to the mat")).toDF("doc_id", "text")
      Release.initReferenceIndex(v1, "doc_id", "text", dir)
      // v2 adds: 11 fluent+long (passes both gates), 12 gibberish
      // (fails the KN gate), 13 fluent but 3 tokens (fails the
      // composed token gate) — both gates only filter
      val v2 = v1.unionByName(Seq(
        doc(11L, inlier),
        doc(12L, outlier),
        doc(13L, "the cat sat")).toDF("doc_id", "text"))
      val knGate = Release.knPerplexityGate(m, maxNll, "doc_id", "text",
        base = gate)
      val disp = Release.incrementalRelease(v1, v2, "doc_id", "text",
          Seq("text"), knGate, dir, gatePreservesText = true)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
        .toMap
      assert(disp == Map(
        10L -> ("unchanged", false),
        11L -> ("added", true),
        12L -> ("added", false),
        13L -> ("added", false)))
      val expected = v2.filter(col("doc_id").isin(10L, 11L))
      assert(liveBands(dir) == bandsOf(expected))

      // the modified-discount gate draws the same fluency line (its
      // scores differ, the ordering of inlier vs gibberish does not)
      val scoredMod = Retrieval.knNgramNllModAgainstModel(
          Seq((1L, inlier), (2L, outlier)).toDF("doc_id", "text"),
          "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(scoredMod(1L) < scoredMod(2L))
      val modGate = Release.knPerplexityGate(m,
        (scoredMod(1L) + scoredMod(2L)) / 2.0, "doc_id", "text",
        base = gate, modified = true)
      val gated = modGate(v2).collect().map(_.getLong(0)).toSet
      assert(gated == Set(10L, 11L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("knPerplexityGate: docs shorter than the model order pass; minTokens gates them explicitly") {
    val ref = Seq("the cat sat on the mat",
      "the dog sat on the rug").toDF("text")
    val m = Retrieval.knModel(ref, "text", order = 3)
    val docs = Seq(
      doc(1L, "the cat sat on the mat"), // 6 tokens, scored
      doc(2L, "hi"),                     // 1 token — no trigram, unscored
      doc(3L, "the cat")                 // 2 tokens — unscored
    ).toDF("doc_id", "text")
    // pass-everything threshold: unscored docs must survive too (the
    // CLI default maxNll=1e300 means "no perplexity gating")
    val passAll = Release.knPerplexityGate(m, 1e300, "doc_id", "text")
    assert(passAll(docs).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // fail-everything threshold: scored docs drop, unscored still pass
    // (the model has no opinion on them — length is a separate rule)
    val tight = Release.knPerplexityGate(m, -1.0, "doc_id", "text")
    assert(tight(docs).collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // the explicit length rule drops short docs BEFORE scoring
    val minTok = Release.knPerplexityGate(m, 1e300, "doc_id", "text",
      minTokens = 3)
    assert(minTok(docs).collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("incrementalRelease retry: crashed-attempt bands are invisible to the re-run's dedup probe") {
    val dir = java.nio.file.Files.createTempDirectory("relretry").toString
    try {
      val v1 = Seq(doc(1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      Release.initReferenceIndex(v1, "doc_id", "text", dir)
      // the delta carries a within-delta duplicate PAIR (2, 3) — out of
      // the probe's scope by contract, so both index on a clean run
      val v2 = v1.unionByName(Seq(
        doc(2L, "one two three four five"),
        doc(3L, "one two three four five")).toDF("doc_id", "text"))
      def run() = Release.incrementalRelease(v1, v2, "doc_id", "text",
          Seq("text"), gate, dir, dedupThreshold = Some(0.9),
          gatePreservesText = true)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getBoolean(2), r.getBoolean(3)))
        .toMap
      val first = run()
      assert(first(2L) == ("added", true, false))
      assert(first(3L) == ("added", true, false))
      // simulate a crash AFTER the band append but BEFORE the manifest
      // write: rewind the manifest so the retry recomputes the same gen
      Seq(0L).toDF("gen").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/manifest")
      // without the gen < releaseGen probe filter, run 1's appended
      // bands would be live here and 2/3 would dedup against each other
      val retry = run()
      assert(retry == first,
        s"retry dispositions must reproduce run 1: $retry vs $first")
      assert(liveBands(dir) ==
        bandsOf(v2.filter(col("doc_id").isin(1L, 2L, 3L))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("incrementalRelease: fails fast when a candidate reference id is absent from the snapshot lineage") {
    val dir = java.nio.file.Files.createTempDirectory("reldrift").toString
    try {
      // index initialized from a FOREIGN corpus: id 99 never appears in
      // the snapshots being released
      Release.initReferenceIndex(
        Seq(doc(99L, "one two three four five")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
      val v1 = Seq(doc(1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      val v2 = v1.unionByName(
        Seq(doc(2L, "one two three four five")).toDF("doc_id", "text"))
      val e = intercept[IllegalArgumentException] {
        Release.incrementalRelease(v1, v2, "doc_id", "text",
          Seq("text"), gate, dir, dedupThreshold = Some(0.9))
      }
      assert(e.getMessage.contains("absent from newSnap"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
