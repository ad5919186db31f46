package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.Files

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"warc_$tag").toString

  private def docs(n: Int): Seq[(Long, Array[Byte], String)] =
    (0 until n).map(i =>
      (i.toLong, s"document body $i é中".getBytes(UTF_8), s"lang${i % 3}"))

  test("record framing is the published ISO 28500 layout, byte for byte") {
    val bos = new java.io.ByteArrayOutputStream()
    val payload = "hello warc".getBytes(UTF_8)
    val n = Warc.writeRecord(bos, "42", payload,
      extraHeaders = Seq("X-Graft-lang" -> "en"))
    val expected =
      "WARC/1.0\r\n" +
        "WARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:graft:42>\r\n" +
        "WARC-Date: 1970-01-01T00:00:00Z\r\n" +
        "Content-Type: text/plain\r\n" +
        "Content-Length: 10\r\n" +
        // digest pinned from an independent sha1+base32 computation
        "WARC-Block-Digest: sha1:GAVUVWS4HFI5NI6FF3C6QBP45KCWS2ET\r\n" +
        "X-Graft-lang: en\r\n" +
        "\r\n" +
        "hello warc\r\n\r\n"
    assert(new String(bos.toByteArray, ISO_8859_1) == expected)
    assert(n == bos.toByteArray.length)
  }

  test("reader accepts an independently hand-built record (not just our writer)") {
    // folded differently from the writer: different field order, extra
    // spaces after colons, uppercase field names, response type
    val payload = Array[Byte](0, 1, 2, '\r', '\n', 3) // binary incl CRLF bytes
    val raw = new java.io.ByteArrayOutputStream()
    raw.write(("WARC/1.1\r\n" +
      "CONTENT-LENGTH:   6\r\n" +
      "WARC-TYPE: response\r\n" +
      "Content-Type: application/octet-stream\r\n" +
      "WARC-Record-ID: <urn:uuid:abc-def>\r\n" +
      "\r\n").getBytes(ISO_8859_1))
    raw.write(payload)
    raw.write("\r\n\r\n".getBytes(ISO_8859_1))
    val rs = Warc.readRecords(new ByteArrayInputStream(raw.toByteArray)).toVector
    assert(rs.length == 1)
    assert(rs.head.recordId == "urn:uuid:abc-def")
    assert(rs.head.warcType == "response")
    assert(rs.head.contentType == "application/octet-stream")
    assert(rs.head.payload.toSeq == payload.toSeq)
  }

  test("header values: UTF-8 round-trips; raw Latin-1 falls back byte-lossless") {
    // spec-conformant UTF-8 header value round-trips through writer+reader
    val out = new java.io.ByteArrayOutputStream()
    Warc.writeRecord(out, "rid-ü", "p".getBytes(UTF_8),
      extraHeaders = Seq("X-Graft-Title" -> "café 中文 ✓"))
    val r1 = Warc.readRecords(
      new ByteArrayInputStream(out.toByteArray)).toVector.head
    assert(r1.recordId == "urn:graft:rid-ü")
    assert(r1.headers("x-graft-title") == "café 中文 ✓")
    // a pre-1.0/sloppy archive with a RAW Latin-1 byte (0xE9 'é') in a
    // header — invalid UTF-8 — must decode byte-lossless via the
    // ISO-8859-1 fallback, not mangle to U+FFFD
    val raw = new java.io.ByteArrayOutputStream()
    raw.write("WARC/1.0\r\nContent-Length: 1\r\nWARC-Type: resource\r\n".getBytes(ISO_8859_1))
    raw.write("WARC-Target-URI: http://x/caf".getBytes(ISO_8859_1))
    raw.write(0xE9) // bare Latin-1 é
    raw.write("\r\n\r\n".getBytes(ISO_8859_1))
    raw.write('p')
    raw.write("\r\n\r\n".getBytes(ISO_8859_1))
    val r2 = Warc.readRecords(
      new ByteArrayInputStream(raw.toByteArray)).toVector.head
    assert(r2.headers("warc-target-uri") == "http://x/café")
  }

  test("reader raises on truncation and framing violations, never fabricates") {
    def bytes(s: String) = new ByteArrayInputStream(s.getBytes(ISO_8859_1))
    // truncated payload
    intercept[Exception] {
      Warc.readRecords(bytes(
        "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")).toVector
    }
    // no version line
    intercept[Exception] {
      Warc.readRecords(bytes("HTTP/1.1 200 OK\r\n\r\n")).toVector
    }
    // missing record separator after payload
    intercept[Exception] {
      Warc.readRecords(bytes(
        "WARC/1.0\r\nContent-Length: 2\r\n\r\nhiXXXX")).toVector
    }
    // missing Content-Length
    intercept[Exception] {
      Warc.readRecords(bytes(
        "WARC/1.0\r\nWARC-Type: resource\r\n\r\n")).toVector
    }
  }

  test("plain shards round-trip ids, payload bytes, and meta headers") {
    val dir = tmpDir("plain")
    val df = docs(11).toDF("doc_id", "payload", "lang")
    val manifest = Warc.writeShards(df.repartition(2), "doc_id", "payload",
      dir, recordsPerShard = 3, metaCols = Seq("lang"))
    val m = manifest.collect()
    assert(m.map(_.getLong(1)).sum == 11)
    // manifest byte counts match the files on disk
    m.foreach { r =>
      assert(new java.io.File(new java.net.URI(r.getString(0)).getPath)
        .length == r.getLong(2) ||
        new java.io.File(r.getString(0)).length == r.getLong(2))
    }
    val back = Warc.read(spark, s"$dir/*.warc")
      .selectExpr("record_id", "payload", "headers['x-graft-lang'] AS lang")
      .as[(String, Array[Byte], String)].collect()
      .map { case (id, p, l) => (id.stripPrefix("urn:graft:").toLong, p.toSeq, l) }
      .sortBy(_._1)
    val want = docs(11).map { case (id, p, l) => (id, p.toSeq, l) }
    assert(back.toSeq == want)
  }

  test("gzip shards are one member per record and round-trip through Spark") {
    val dir = tmpDir("gz")
    val df = docs(9).toDF("doc_id", "payload", "lang")
    Warc.writeShards(df.coalesce(1), "doc_id", "payload", dir,
      recordsPerShard = 4, gzip = true, metaCols = Seq("lang"))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
    assert(files.length == 3) // 4 + 4 + 1
    // multi-member structure: the 4-record shard contains 4 gzip member
    // headers (magic 1f 8b appears at each member boundary)
    val b = Files.readAllBytes(files.head.toPath)
    val memberStarts = b.indices.count(i =>
      (b(i) & 0xff) == 0x1f && i + 1 < b.length && (b(i + 1) & 0xff) == 0x8b)
    assert(memberStarts == 4)
    val back = Warc.read(spark, s"$dir/*.warc.gz")
      .selectExpr("record_id", "payload", "headers['x-graft-lang'] AS lang")
      .as[(String, Array[Byte], String)].collect()
      .map { case (id, p, l) => (id.stripPrefix("urn:graft:").toLong, p.toSeq, l) }
      .sortBy(_._1)
    assert(back.toSeq == docs(9).map { case (id, p, l) => (id, p.toSeq, l) })
  }

  test("plain shards are byte-identical across re-exports (determinism)") {
    val d1 = tmpDir("det1"); val d2 = tmpDir("det2")
    val df = docs(5).toDF("doc_id", "payload", "lang").coalesce(1)
    Warc.writeShards(df, "doc_id", "payload", d1, metaCols = Seq("lang"))
    Warc.writeShards(df, "doc_id", "payload", d2, metaCols = Seq("lang"))
    def bytesOf(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).sortBy(_.getName)
      .map(f => Files.readAllBytes(f.toPath).toSeq).toSeq
    assert(bytesOf(d1) == bytesOf(d2))
  }

  test("streaming ingest picks up landed shards exactly once, across batches") {
    val dir = tmpDir("stream")
    // land the first batch of shards before the stream starts
    Warc.writeShards(docs(6).toDF("doc_id", "payload", "lang").coalesce(1),
      "doc_id", "payload", s"$dir/land", recordsPerShard = 4,
      metaCols = Seq("lang"))
    val q = Warc.readStream(spark, s"$dir/land")
      .selectExpr("record_id", "octet_length(payload) AS n",
        "headers['x-graft-lang'] AS lang")
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 6)
      // land a second drop — only the NEW records arrive (checkpointed
      // file tracking, no reprocessing of batch one)
      Warc.writeShards(
        docs(9).toDF("doc_id", "payload", "lang")
          .filter($"doc_id" >= 6).coalesce(1),
        "doc_id", "payload", s"$dir/land2", recordsPerShard = 4,
        metaCols = Seq("lang"))
      // move the new shards into the watched dir under fresh names
      // (shards only — not the local-FS .crc sidecars, which a rename
      // would un-hide into the glob's view)
      new java.io.File(s"$dir/land2").listFiles()
        .filter(_.getName.endsWith(".warc")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$dir/land/drop2-${f.getName}"))
        }
      q.processAllAvailable()
      val rows = spark.table("warc_stream")
        .selectExpr("CAST(substr(record_id, 11) AS BIGINT)").collect()
        .map(_.getLong(0)).sorted
      assert(rows.toSeq == (0L until 9L))
    } finally q.stop()
  }

  test("block digests catch ANY payload corruption; digest-less records pass") {
    // write a shard, flip every payload byte position in turn — the
    // reader must raise on each one (headers corrupted instead would be
    // framing/parse failures; this fuzz targets the silent-payload case
    // that only the digest can see)
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeRecord(bos, "7", "corruptme".getBytes(UTF_8))
    val clean = bos.toByteArray
    // locate payload: after the blank line
    val blank = {
      val s = new String(clean, ISO_8859_1); s.indexOf("\r\n\r\n") + 4
    }
    assert(Warc.readRecords(new ByteArrayInputStream(clean)).toVector
      .head.payload.toSeq == "corruptme".getBytes(UTF_8).toSeq)
    for (off <- 0 until "corruptme".length) {
      val bad = clean.clone()
      bad(blank + off) = (bad(blank + off) ^ 0x01).toByte
      intercept[Exception] {
        Warc.readRecords(new ByteArrayInputStream(bad)).toVector
      }
    }
    // verification off: the corrupt payload is surfaced (caller's risk)
    val bad = clean.clone(); bad(blank) = (bad(blank) ^ 0x01).toByte
    val rs = Warc.readRecords(new ByteArrayInputStream(bad),
      verifyDigests = false).toVector
    assert(rs.head.payload.toSeq != "corruptme".getBytes(UTF_8).toSeq)
    // foreign record without a digest header: readable as always
    val foreign = ("WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes(ISO_8859_1)
    assert(Warc.readRecords(new ByteArrayInputStream(foreign)).toVector
      .head.payload.toSeq == "hi".getBytes(UTF_8).toSeq)
  }

  test("writer rejects CR/LF header injection and null payloads") {
    intercept[Exception] {
      Warc.writeRecord(new java.io.ByteArrayOutputStream(), "a\r\nX: y",
        Array[Byte]())
    }
    intercept[Exception] {
      Warc.writeRecord(new java.io.ByteArrayOutputStream(), "ok", null)
    }
  }
}
