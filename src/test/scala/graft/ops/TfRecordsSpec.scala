package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class TfRecordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("record framing matches an independently computed vector") {
    // expected bytes computed with a python bitwise CRC32C implementation
    // of the published format (LE u64 length + masked len CRC + payload +
    // masked payload CRC) — not our own encoder checking itself
    val rec = TfRecords.encodeRecord("hello".getBytes(StandardCharsets.UTF_8))
    val expectedHex = "0500000000000000eab2043e68656c6c6fbb1f1c19"
    assert(rec.map(b => f"${b & 0xFF}%02x").mkString == expectedHex)
    assert(TfRecords.maskedCrc32c("hello".getBytes(StandardCharsets.UTF_8)) == 421273531)
  }

  test("records round-trip through the reader; truncation and flips raise") {
    val payloads = Seq("a", "", "some longer payload with spaces", "éµ")
      .map(_.getBytes(StandardCharsets.UTF_8))
    val bytes = payloads.flatMap(TfRecords.encodeRecord(_).toSeq).toArray
    val back = TfRecords.readRecords(new ByteArrayInputStream(bytes)).toSeq
    assert(back.size == payloads.size)
    back.zip(payloads).foreach { case (b, p) => assert(b.sameElements(p)) }

    // cuts at record boundaries are indistinguishable from a shorter file
    // and must yield exactly the preceding records; any other cut raises
    val boundaries = payloads.map(TfRecords.encodeRecord(_).length)
      .scanLeft(0)(_ + _).toSet
    (1 until bytes.length).foreach { cut =>
      if (boundaries.contains(cut)) {
        val n = TfRecords.readRecords(new ByteArrayInputStream(bytes.take(cut))).size
        assert(n == boundaries.toSeq.sorted.indexOf(cut), s"boundary cut $cut")
      } else {
        val raised =
          try { TfRecords.readRecords(new ByteArrayInputStream(bytes.take(cut))).toSeq; false }
          catch { case _: Exception => true }
        assert(raised, s"truncation at $cut read silently")
      }
    }
    (0 until bytes.length).foreach { i =>
      val c = bytes.clone(); c(i) = (c(i) ^ 0x04).toByte
      val raised =
        try { TfRecords.readRecords(new ByteArrayInputStream(c)).toSeq; false }
        catch { case _: Exception => true }
      assert(raised, s"bit flip at $i read silently")
    }
  }

  test("writeShards bounds shard size, manifest counts match, payloads survive") {
    import spark.implicits._
    val docs = (0 until 23).map(i => s"doc-payload-$i")
    val df = docs.toDF("text")
      .select(org.apache.spark.sql.functions.col("text").cast("binary").as("payload"))
      .repartition(2)
    val out = Files.createTempDirectory("tfrec").toString + "/shards"
    val manifest = TfRecords.writeShards(df, "payload", out, recordsPerShard = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(manifest.map(_._2).sum == 23, s"manifest: ${manifest.mkString(";")}")
    assert(manifest.forall(_._2 <= 5), "a shard exceeded recordsPerShard")
    assert(manifest.forall(m => m._1.endsWith(".tfrecord")))

    // read every shard back with the independent reader and compare sets
    val back = manifest.flatMap { case (path, n, _) =>
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try {
        val recs = TfRecords.readRecords(in).map(new String(_, StandardCharsets.UTF_8)).toList
        assert(recs.size.toLong == n, s"$path: manifest $n vs read ${recs.size}")
        recs
      } finally in.close()
    }
    assert(back.toSet == docs.toSet, "payloads must survive the shard round-trip")
  }
}
