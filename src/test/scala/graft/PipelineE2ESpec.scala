package graft

import graft.ops.{Curation, Decontamination, Dedup, Sampling, TfRecords}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data pipeline over the REAL fixture corpus: the
  * stages a production run chains — quality gate, exact + near dedup,
  * benchmark decontamination, duplicated-span removal, deterministic
  * split, sequence packing, TFRecord export — composed in one spec with
  * stage-wise invariants. Each operator has its own oracle-checked
  * query; this test is about the COMPOSITION: outputs feed inputs, doc
  * counts only ever shrink, and the final shards are CRC-valid.
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gate -> dedup -> decontaminate -> despan -> split -> pack -> export") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val n0 = docs.count()

    // 1. quality gate + exact dedup + language annotation (curate's
    //    output is the annotation frame — re-attach text by id for the
    //    downstream text stages)
    val curated = Curation.curate(docs, "doc_id", "text")
    val n1 = curated.count()
    assert(n1 > 0 && n1 <= n0, s"gate must shrink or hold: $n0 -> $n1")
    val curatedDocs = docs.join(curated.select("doc_id"), Seq("doc_id"), "left_semi")

    // 2. near-dup removal (MinHash-LSH, transitive via components)
    val deduped = Dedup.minhashDedup(curatedDocs, "doc_id", "text", threshold = 0.5)
    val n2 = deduped.count()
    assert(n2 > 0 && n2 <= n1, s"dedup must shrink or hold: $n1 -> $n2")

    // 3. decontaminate against a benchmark carved from the corpus itself
    //    (every 10th doc) — afterwards nothing shares 8-grams with it
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val train = deduped.filter(col("doc_id") % 10 =!= 0)
    val clean = Decontamination.decontaminate(train, "doc_id", "text",
      bench, "text", n = 8)
    val n3 = clean.count()
    assert(n3 <= train.count())
    assert(Decontamination.overlapReport(clean, "doc_id", "text",
      bench, "text", n = 8).count() == 0,
      "no surviving doc may share an 8-gram with the benchmark")

    // 4. cut remaining corpus-internal duplicated spans; token counts
    //    never grow
    val despanned = Dedup.removeDuplicatedSpans(clean, "doc_id", "text", n = 8)
    val shrunk = despanned.filter(col("kept_tokens") > col("n_tokens")).count()
    assert(shrunk == 0, "span removal cannot add tokens")
    assert(despanned.count() == n3, "span removal rewrites, never drops docs")

    // 5. deterministic split: partitions are disjoint and exhaustive
    val split = Sampling.hashSplit(
      despanned.filter(col("kept_tokens") > 0), "doc_id",
      Seq(("train", 0.9), ("val", 0.1)))
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == split.count())
    assert(bySplit.keySet.subsetOf(Set("train", "val")))

    // 6. pack the train split into ~128-token sequences: every doc gets
    //    a pack, pack ids are dense from 0
    val packed = Curation.packSequential(
      split.filter(col("split") === "train")
        .select(col("doc_id"), col("kept_tokens").as("n_tokens")),
      "doc_id", "n_tokens", budget = 128L)
    val packIds = packed.select("pack_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(packIds.nonEmpty && packIds.head == 0L)
    assert(packed.count() == bySplit.getOrElse("train", 0L))

    // 7. export as TFRecord shards; the CRC-checked reader must
    //    round-trip every doc
    val outDir = java.nio.file.Files.createTempDirectory("e2e_shards").toString
    val payloads = split.filter(col("split") === "train")
      .select(col("clean_text").cast("binary").as("payload"))
    val nExported = payloads.count()
    val manifest = TfRecords.writeShards(payloads, "payload", outDir,
      recordsPerShard = 64).collect()
    assert(manifest.map(_.getLong(1)).sum == nExported,
      "every train doc lands in exactly one shard")
    val readBack = manifest.map { r =>
      val in = new java.io.FileInputStream(
        new java.io.File(new java.net.URI(r.getString(0)).getPath))
      try TfRecords.readRecords(in).size.toLong finally in.close()
    }.sum
    assert(readBack == nExported, "CRC-verified read-back sees every record")

    // 8. the REAL export: BPE-encode the train split to vocab ids and
    //    ship the id sequences themselves as TFRecord shards — the
    //    tokenized-training-data endpoint. Read-back must reproduce
    //    every doc's id sequence bit-exactly.
    val trainDocs = docs.join(
      split.filter(col("split") === "train").select("doc_id"),
      Seq("doc_id"), "left_semi")
    val ids = graft.ops.Tokenize.bpeTokenIds(trainDocs, "doc_id", "text",
      SparkEntry.bpeMerges, SparkEntry.bpeVocab)
    val expected = ids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).mkString(",")).toMap
    assert(expected.nonEmpty && expected.values.forall(_.nonEmpty))
    assert(!expected.values.exists(_.contains("-1")),
      "the letters+merges vocab must cover the a-z corpus (no OOV)")
    val idDir = java.nio.file.Files.createTempDirectory("e2e_id_shards").toString
    val idPayloads = ids.select(concat_ws("|",
      col("doc_id"), concat_ws(",", col("ids"))).cast("binary").as("payload"))
    val idManifest = TfRecords.writeShards(idPayloads, "payload", idDir,
      recordsPerShard = 64).collect()
    val decoded = idManifest.flatMap { r =>
      val in = new java.io.FileInputStream(
        new java.io.File(new java.net.URI(r.getString(0)).getPath))
      try TfRecords.readRecords(in).map(new String(_, "UTF-8")).toArray
      finally in.close()
    }.map { s =>
      val Array(id, seq) = s.split('|')
      id.toLong -> seq
    }.toMap
    assert(decoded == expected,
      "TFRecord round-trip must reproduce every id sequence bit-exactly")
  }

  test("crawl ingest: warc -> http -> html strip -> quality gate -> url dedup") {
    // The crawl-side composition of the round-10 faces: fixture docs
    // wrapped as HTTP+HTML crawl payloads, shipped through digest-
    // labelled gzip WARC shards, parsed back, boilerplate-stripped,
    // quality-gated, and URL-deduped — every stage an operator with its
    // own oracle/spec; this test is about the composition surviving the
    // full loop with the text intact.
    import graft.ops.Web
    import graft.sources.Warc
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val n0 = docs.count()

    // 1. crawl payloads: HTTP response + HTML wrapper; TWO urls map to
    //    the same canonical key per doc pair (doc_id/2) — the planted
    //    duplicate-fetch scenario (same page fetched with and without
    //    tracking params)
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
      lit("<html><head><title>t</title><style>p{}</style></head><body><p>"),
      col("text"), lit("</p><script>var x=1;</script></body></html>"))
    val url = concat(lit("https://EX"), (col("doc_id") / 2).cast("long"),
      lit(".example.com/page?"),
      when(col("doc_id") % 2 === 0, lit("a=1&utm_source=x"))
        .otherwise(lit("utm_medium=y&a=1")))
    val crawl = docs.select(col("doc_id"),
      encode(payload, "UTF-8").as("payload"), url.as("url"))

    // 2. through digest-labelled gzip WARC shards
    val dir = java.nio.file.Files.createTempDirectory("e2e_crawl").toString
    Warc.writeShards(crawl, "doc_id", "payload", dir,
      recordsPerShard = 100, gzip = true, metaCols = Seq("url"))
    val back = Warc.read(spark, s"$dir/*.warc.gz")
      .selectExpr("CAST(substr(record_id, 11) AS BIGINT) AS doc_id",
        "CAST(payload AS STRING) AS http", "headers['x-graft-url'] AS url")
    assert(back.count() == n0, "records lost in the WARC loop")

    // 3. http split + html strip recovers the original text exactly
    //    (the wrapper adds only the title token)
    val recovered = back
      .withColumn("status", Web.httpStatus(col("http")))
      .withColumn("text", Web.stripHtml(Web.httpBody(col("http"))))
    assert(recovered.filter(col("status") =!= 200).count() == 0)
    val mismatch = recovered.join(docs.select(col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("orig")), "doc_id")
      .filter(col("text") =!= concat(lit("t "), col("orig")))
      .count()
    assert(mismatch == 0, s"$mismatch docs corrupted through the crawl loop")

    // 4. quality gate: entropy band + compression ratio + blocklist
    val gated = recovered
      .withColumn("ent", graft.functions.char_entropy(col("text")))
      .withColumn("ratio",
        graft.functions.deflate_size(col("text")).cast("double") /
          octet_length(col("text")))
      .withColumn("hits", graft.functions.keyword_hit_total(col("text"),
        Seq("viagra", "click here now")))
      .filter(col("ent").between(2.0, 6.0) && col("ratio") > 0.2 &&
        col("hits") === 0)
    val n4 = gated.count()
    assert(n4 == n0, s"clean fixture corpus should fully pass the gate: $n4/$n0")

    // 5. URL-canonical dedup: both fetch variants collapse per page
    val deduped = graft.ops.Dedup.exactKeepFirst(
      gated.withColumn("canon", Web.urlNormalize(col("url"))),
      Seq("canon"), "doc_id")
    assert(deduped.count() == (n0 + 1) / 2,
      "tracking-param variants of the same page must collapse")
  }

  test("streaming crawl: landed WARC shards -> gates -> ref dedup, two batches, exactly once") {
    // The continuously-arriving-crawl composition: a fetcher deposits
    // WARC shards into a watched directory; Warc.readStream picks each
    // up exactly once (file-source checkpoint), the curation gates run
    // stateless inside the micro-batch, and the minhash reference-dedup
    // face flags docs near-duplicating an already-ingested corpus —
    // across TWO shard drops, with exactly-once accounting on both the
    // gate counts and the flag set.
    import graft.sources.Warc
    import graft.streaming.StreamOps
    val spark2 = spark
    import spark2.implicits._

    val refText = "the quick brown fox jumps over the lazy dog while " +
      "the cat watches from the warm windowsill near the quiet garden"
    def prose(i: Int): String =
      s"document number $i discusses columnar storage layout planning " +
        s"compaction policies and shuffle exchange reuse in distributed " +
        s"query engines with partition pruning detail $i"
    val refBands = graft.ops.Dedup.lshBands(
      Seq((100L, refText)).toDF("doc_id", "text"), "doc_id", "text")

    val root = java.nio.file.Files.createTempDirectory("e2e_stream_crawl")
    val land = s"$root/land"
    new java.io.File(land).mkdirs()
    def drop(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = s"$root/$name"
      Warc.writeShards(
        rows.toDF("doc_id", "text")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .coalesce(1),
        "doc_id", "payload", stage, recordsPerShard = 3)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".warc")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$land/$name-${f.getName}"))
        }
    }

    // batch 1: one exact ref dup (1), one near ref dup (2), clean prose
    // (3,4), a template-spam doc (5) the compression gate must drop,
    // and a robots-disallowed doc (6) the politeness gate must drop
    // BEFORE dedup (it duplicates the reference verbatim — if the
    // robots gate leaked it, it would flag)
    drop("b1", Seq(
      1L -> refText,
      2L -> refText.replace("warm", "cold"),
      3L -> prose(3), 4L -> prose(4),
      5L -> ("buy now! " * 60),
      6L -> refText))

    // crawl politeness: docs land on /doc/<id>; ids ending in 6 sit
    // under a disallowed prefix (robots gate is a stateless codegen
    // expression, so it composes into the stream like any filter)
    val robotsPolicy = "User-agent: *\nDisallow: /doc/6\n"
    val parsed = Warc.readStream(spark, land)
      .selectExpr("CAST(substr(record_id, 11) AS BIGINT) AS doc_id",
        "CAST(payload AS STRING) AS text")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val gated = parsed
      .filter(graft.ops.Web.robotsAllowed(lit(robotsPolicy),
        concat(lit("/doc/"), col("doc_id")), "graftbot"))
      .withColumn("ratio",
        graft.functions.deflate_size(col("text")).cast("double") /
          octet_length(col("text")))
      .withColumn("ent", graft.functions.char_entropy(col("text")))
      .filter(col("ratio") > 0.2 && col("ent").between(2.0, 6.0))
      .drop("ratio", "ent")
    val flagged = StreamOps.streamingDedupAgainstReference(
      gated, "doc_id", "text", "ts", refBands)
    val q = flagged.writeStream.format("memory").queryName("crawl_flags")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val f1 = spark.table("crawl_flags").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(f1 == Seq(1L, 2L),
        s"batch 1: exactly the two ref near-dups must flag (spam doc " +
          s"and robots-disallowed verbatim dup gated before dedup): got $f1")

      // batch 2: one more ref dup (12) among fresh prose — only the NEW
      // flag arrives; batch-1 rows are not re-emitted (exactly once)
      drop("b2", Seq(10L -> prose(10), 11L -> prose(11), 12L -> refText))
      q.processAllAvailable()
      val f2 = spark.table("crawl_flags").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(f2 == Seq(1L, 2L, 12L),
        s"batch 2 must add exactly doc 12: got $f2")
    } finally q.stop()
  }
}
