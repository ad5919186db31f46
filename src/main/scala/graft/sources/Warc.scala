package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (Web ARChive, ISO 28500) source + sink — the interchange format
  * of web-crawl corpora (Common Crawl ships WARC/WET), i.e. the raw-input
  * side of a 100 TB pretraining pipeline. Librarian's archiver moves rows
  * between operational stores and parquet; this face moves documents
  * between parquet and the crawl-native record format.
  *
  * Framing (written against the published ISO 28500 grammar, not any
  * implementation): a record is `WARC/1.0\r\n`, named fields
  * (`Name: value\r\n` each), a blank `\r\n`, `Content-Length` payload
  * bytes, then `\r\n\r\n`. Records concatenate back to back; a `.warc.gz`
  * file is one gzip MEMBER PER RECORD, concatenated (the Common Crawl
  * convention — lets a reader seek to a member and decompress one record
  * without touching the rest of the file).
  *
  * Determinism: all generated metadata is pinned (`WARC-Date` epoch,
  * fixed field order), so equal inputs produce byte-identical plain
  * shards — framing arithmetic is oracle-checkable. Gzip shards are
  * deterministic only per JVM deflate implementation, so correctness
  * there is proven by round-trip, not bytes.
  *
  * 100 TB shape: the writer is one `mapPartitions` pass (same contract as
  * [[graft.ops.WebDataset.writeShards]] — deterministic shard paths,
  * retry-safe, driver only sees the manifest). The reader streams each
  * file through a constant-memory incremental parser — a multi-GB shard
  * is never materialized; per-record gzip members force file-granular
  * splits (exactly how Common Crawl is processed), so parallelism comes
  * from file count, which the writer's sharding controls.
  */
object Warc {

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** `sha1:<base32>` content label for `WARC-Block-Digest` — the
    * labelled-digest form the spec defines and Common Crawl ships
    * (RFC 4648 base32, no padding needed: sha1 is 160 bits = 32 chars).
    */
  def blockDigest(payload: Array[Byte]): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(payload)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var bits = 0
    var acc = 0L
    var i = 0
    while (i < sha.length) {
      acc = (acc << 8) | (sha(i) & 0xffL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet(((acc >> bits) & 0x1f).toInt))
      }
      i += 1
    }
    "sha1:" + sb.toString
  }

  /** One WARC/1.0 record: returns bytes written. Field order and
    * generated values are pinned so equal inputs frame identically.
    */
  def writeRecord(out: OutputStream, recordId: String, payload: Array[Byte],
      contentType: String = "text/plain",
      extraHeaders: Seq[(String, String)] = Nil): Long = {
    require(recordId != null && recordId.nonEmpty, "empty WARC record id")
    require(payload != null, s"null payload for WARC record $recordId")
    (recordId +: extraHeaders.flatMap { case (k, v) => Seq(k, v) }).foreach {
      s =>
        require(!s.exists(c => c == '\r' || c == '\n'),
          s"CR/LF in WARC header material: $s")
    }
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: resource\r\n")
    sb.append(s"WARC-Record-ID: <urn:graft:$recordId>\r\n")
    sb.append("WARC-Date: 1970-01-01T00:00:00Z\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append(s"WARC-Block-Digest: ${blockDigest(payload)}\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    out.write(head)
    out.write(payload)
    out.write(CRLF); out.write(CRLF)
    head.length.toLong + payload.length + 4
  }

  /** One parsed record. `headers` keys are lower-cased (WARC field names
    * are case-insensitive per spec); values keep their bytes verbatim.
    */
  final case class WarcRecord(recordId: String, warcType: String,
      contentType: String, headers: Map[String, String],
      payload: Array[Byte])

  /** Stream records off a WARC byte stream — constant memory, raises on
    * any framing violation (bad version line, missing Content-Length,
    * truncated payload, missing record separator), never fabricates.
    * With `verifyDigests` (the default), any record carrying a
    * `WARC-Block-Digest: sha1:...` label has its payload re-hashed and
    * compared — a flipped payload byte anywhere between writer and
    * reader is a loud failure, not silent corruption in the corpus.
    * Digest-less records pass through (foreign archives stay readable).
    */
  def readRecords(in: InputStream,
      verifyDigests: Boolean = true): Iterator[WarcRecord] = {
    // Buffered scanner: header lines are found by scanning the internal
    // buffer for CRLF (no per-byte virtual calls — at crawl volume the
    // header parse is the read path's hot loop), payloads are copied
    // buffer-first then bulk-read.
    val bufSize = 1 << 16
    val buf = new Array[Byte](bufSize)
    var pos = 0
    var limit = 0
    def fill(): Boolean = {
      if (pos < limit) return true
      pos = 0
      limit = 0
      val n = in.read(buf, 0, bufSize)
      if (n <= 0) return false
      limit = n
      true
    }
    // Header bytes decode as UTF-8 (WARC 1.0 header charset per ISO
    // 28500) with a byte-lossless ISO-8859-1 FALLBACK when the bytes
    // are not valid UTF-8 — pre-1.0 / sloppy third-party archives carry
    // raw Latin-1 in URIs, and a silent U+FFFD substitution there would
    // corrupt URI-keyed dedup keys. The CRLF scan stays byte-safe
    // either way (UTF-8 continuation bytes never collide with
    // 0x0A/0x0D).
    def decodeHeader(b: Array[Byte], off: Int, len: Int): String = {
      val dec = UTF_8.newDecoder() // REPORTs malformed input by default
      try dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString
      catch {
        case _: java.nio.charset.CharacterCodingException =>
          new String(b, off, len, java.nio.charset.StandardCharsets.ISO_8859_1)
      }
    }
    // CRLF-terminated header line; returns null on clean EOF at a
    // record boundary.
    def readLine(atBoundary: Boolean): String = {
      if (!fill()) {
        if (atBoundary) return null
        throw new EOFException("WARC stream truncated mid-line")
      }
      var pending: java.io.ByteArrayOutputStream = null
      while (true) {
        var i = pos
        // find LF in the buffered window; CR must directly precede it
        while (i < limit && buf(i) != '\n') i += 1
        if (i < limit) {
          val lineEnd = i // points at \n
          if (pending == null) {
            if (lineEnd - 1 < pos || buf(lineEnd - 1) != '\r')
              throw new EOFException("WARC header line not CRLF-terminated")
            val s = decodeHeader(buf, pos, lineEnd - 1 - pos)
            pos = lineEnd + 1
            return s
          } else {
            pending.write(buf, pos, lineEnd - pos)
            pos = lineEnd + 1
            val b = pending.toByteArray
            if (b.length < 1 || b(b.length - 1) != '\r')
              throw new EOFException("WARC header line not CRLF-terminated")
            return decodeHeader(b, 0, b.length - 1)
          }
        }
        // line straddles the buffer: stash and refill
        if (pending == null) pending = new java.io.ByteArrayOutputStream(128)
        pending.write(buf, pos, limit - pos)
        pos = limit
        if (!fill()) throw new EOFException("WARC stream truncated mid-line")
      }
      throw new IllegalStateException("unreachable")
    }
    def readFullyBuf(dst: Array[Byte]): Unit = {
      var off = 0
      while (off < dst.length) {
        if (!fill()) throw new EOFException(
          s"WARC stream truncated: needed ${dst.length} payload bytes, got $off")
        val n = math.min(limit - pos, dst.length - off)
        System.arraycopy(buf, pos, dst, off, n)
        pos += n
        off += n
      }
    }
    new Iterator[WarcRecord] {
      private var nextR: WarcRecord = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextR != null) return
        val version = readLine(atBoundary = true)
        if (version == null) { done = true; return }
        require(version.startsWith("WARC/"),
          s"not a WARC version line: '$version'")
        val hs = Map.newBuilder[String, String]
        var line = readLine(atBoundary = false)
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          require(i > 0, s"malformed WARC header line: '$line'")
          hs += (line.substring(0, i).trim.toLowerCase ->
            line.substring(i + 1).trim)
          line = readLine(atBoundary = false)
        }
        val headers = hs.result()
        val len = headers.getOrElse("content-length",
          sys.error("WARC record missing Content-Length")).toLong
        require(len >= 0 && len <= Int.MaxValue, s"bad Content-Length $len")
        val payload = new Array[Byte](len.toInt)
        readFullyBuf(payload)
        val sep = new Array[Byte](4)
        readFullyBuf(sep)
        require(java.util.Arrays.equals(sep, Array[Byte]('\r', '\n', '\r', '\n')),
          "WARC record not followed by CRLF CRLF")
        if (verifyDigests) headers.get("warc-block-digest").foreach { d =>
          if (d.startsWith("sha1:"))
            require(blockDigest(payload) == d,
              s"WARC block digest mismatch for record " +
                s"${headers.getOrElse("warc-record-id", "?")}")
        }
        val rawId = headers.getOrElse("warc-record-id", "")
        val id = // unwrap the <urn:...> angle form if present
          if (rawId.startsWith("<") && rawId.endsWith(">"))
            rawId.substring(1, rawId.length - 1)
          else rawId
        nextR = WarcRecord(id, headers.getOrElse("warc-type", ""),
          headers.getOrElse("content-type", ""), headers, payload)
      }
      override def hasNext: Boolean = { advance(); !done && nextR != null }
      override def next(): WarcRecord = {
        advance()
        if (nextR == null) throw new NoSuchElementException
        val r = nextR; nextR = null; r
      }
    }
  }

  /** Export `df` as WARC shards of at most `recordsPerShard` records,
    * named `part-<partition>-<shard>.warc[.gz]`. `keyCol` becomes the
    * record id (`<urn:graft:key>`), `payloadCol` (binary) the content
    * block, and each of `metaCols` a `X-Graft-<col>` named field so
    * row metadata survives the round trip. Returns the manifest
    * (path, n_records, n_bytes). Gzip = one member per record.
    */
  def writeShards(df: DataFrame, keyCol: String, payloadCol: String,
      outDir: String, recordsPerShard: Int = 4096, gzip: Boolean = false,
      metaCols: Seq[String] = Nil): DataFrame = {
    require(recordsPerShard > 0, "recordsPerShard must be positive")
    val spark = df.sparkSession
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val ext = if (gzip) "warc.gz" else "warc"
    val metaHeaderNames = metaCols.map(c => s"X-Graft-$c")
    val manifest = df.select(col(keyCol).cast("string").as("__key") +:
        col(payloadCol).cast("binary").as("__payload") +:
        metaCols.map(c => col(c).cast("string")): _*)
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(hadoopConf.value)
        fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
        val out = Seq.newBuilder[(String, Long, Long)]
        var shard = -1
        var inShard = 0
        var nRecords = 0L
        var stream: org.apache.hadoop.fs.FSDataOutputStream = null
        var path: String = null
        def closeShard(): Unit = if (stream != null) {
          stream.close()
          // gzip byte size only known post-close: ask the filesystem
          val sz = fs.getFileStatus(new org.apache.hadoop.fs.Path(path)).getLen
          out += ((path, nRecords, sz))
        }
        def roll(): Unit = {
          closeShard()
          shard += 1
          path = s"$outDir/part-$pid-$shard.$ext"
          stream = fs.create(new org.apache.hadoop.fs.Path(path), true)
          inShard = 0
          nRecords = 0L
        }
        try {
          rows.foreach { r: Row =>
            if (stream == null || inShard >= recordsPerShard) roll()
            val key = r.getString(0)
            require(key != null, "null record key in WARC export")
            val payload = r.getAs[Array[Byte]](1)
            val extra = metaHeaderNames.zipWithIndex.flatMap { case (h, i) =>
              Option(r.getString(i + 2)).map(h -> _)
            }
            if (gzip) {
              val gz = new GZIPOutputStream(
                new java.io.FilterOutputStream(stream) {
                  override def close(): Unit = flush() // keep shard open
                }, 8192)
              writeRecord(gz, key, payload, extraHeaders = extra)
              gz.close() // finishes THIS member; next record = next member
            } else {
              writeRecord(stream, key, payload, extraHeaders = extra)
            }
            inShard += 1
            nRecords += 1
          }
          closeShard()
        } catch {
          case t: Throwable =>
            if (stream != null) { try stream.close() catch { case _: Exception => } }
            throw t
        }
        out.result().iterator
      }
      .toDF("path", "n_records", "n_bytes")
    // eager pin — the writes ride a lazy mapPartitions (see WebDataset)
    manifest.localCheckpoint(eager = true)
  }

  val readSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("headers", MapType(StringType, StringType), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Streaming ingestion face: tail `dir` for newly landed WARC shards
    * (the crawl-drop pattern — a fetcher deposits shards, the pipeline
    * picks each up exactly once via the file-source checkpoint) and emit
    * parsed records with the same schema as [[read]]. Plain and `.gz`
    * shards both work; parsing is the identical [[readRecords]] kernel,
    * so batch and streaming agree record for record.
    *
    * File-source contract: each shard's bytes surface as one `content`
    * value, so shard size (the WRITER's `recordsPerShard`) bounds
    * per-task memory — size shards accordingly (the batch reader has no
    * such bound; its parser streams from the open file).
    */
  def readStream(spark: SparkSession, dir: String,
      globFilter: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    // the binaryFile source's fixed schema, which the STREAMING reader
    // requires spelled out
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val parsed = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .schema(binaryFileSchema)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val raw: InputStream = new java.io.ByteArrayInputStream(bytes)
        val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
        readRecords(in).map(r =>
          (file, r.recordId, r.warcType, r.contentType, r.headers, r.payload))
      }
    parsed.toDF("path", "record_id", "warc_type", "content_type",
      "headers", "payload")
  }

  /** Read WARC shards under `pathGlob` (plain or `.gz`) into a DataFrame
    * of (path, record_id, warc_type, content_type, headers, payload).
    * One task per file (gzip members block mid-file splits — the crawl
    * format's own constraint); each task streams, never materializes.
    */
  def read(spark: SparkSession, pathGlob: String,
      minPartitions: Int = 0): DataFrame = {
    val minP = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(pathGlob, minP)
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val in: InputStream =
          if (file.endsWith(".gz"))
            // java.util.zip handles concatenated members natively
            new GZIPInputStream(new java.io.BufferedInputStream(raw, 1 << 16))
          else raw // the record parser does its own 64K buffering
        // tasks that stop early (limit/take, kill) never reach the
        // drained-iterator close below — the completion listener is the
        // backstop that keeps per-task file handles from leaking
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        val it = readRecords(in)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close() // fast path: free the handle at drain time
            h
          }
          override def next(): Row = {
            val r = it.next()
            Row(file, r.recordId, r.warcType, r.contentType, r.headers,
              r.payload)
          }
        }
      }
    spark.createDataFrame(rows, readSchema)
  }
}
