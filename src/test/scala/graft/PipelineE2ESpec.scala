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
}
