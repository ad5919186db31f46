package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** TFRecord shard output — the standard training-shard container
  * (public TensorFlow format spec: little-endian u64 length + masked
  * CRC32C of the length + payload + masked CRC32C of the payload per
  * record). A curated corpus leaves the engine as size-bounded binary
  * shards plus a manifest, ready for a training loader; no TensorFlow
  * library is involved, the framing is written against the published
  * spec (and is therefore also verifiable offline by any independent
  * reader).
  *
  * 100 TB shape: [[writeShards]] is one `mapPartitions` pass — every
  * partition streams its rows straight into `ceil(rows/recordsPerShard)`
  * shard files on the target filesystem (local/HDFS/S3A via the Hadoop
  * FS API Spark already carries) and emits one manifest row per shard.
  * No driver involvement beyond collecting the manifest (one row per
  * shard file, not per record); re-sharding afterwards never touches
  * payload bytes.
  */
object TfRecords {

  private val MaskDelta = 0xa282ead8

  /** The spec's masked CRC: rotate right by 15, add the mask constant. */
  def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  def maskedCrc32c(bytes: Array[Byte]): Int = maskedCrc32c(bytes, 0, bytes.length)

  /** One framed record: u64le length, u32le masked len-CRC, payload,
    * u32le masked payload-CRC.
    */
  def encodeRecord(payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    buf.put(lenBytes)
    buf.putInt(maskedCrc32c(lenBytes))
    buf.put(payload)
    buf.putInt(maskedCrc32c(payload))
    buf.array()
  }

  def writeRecord(out: OutputStream, payload: Array[Byte]): Unit =
    out.write(encodeRecord(payload))

  /** Iterate records off a stream, CRC-verifying every frame; raises on
    * truncation or corruption, never fabricates (the wire-codec
    * invariant).
    */
  def readRecords(in: InputStream): Iterator[Array[Byte]] = {
    val din = new DataInputStream(in)
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        val lenBytes = new Array[Byte](8)
        val first = din.read(lenBytes, 0, 1)
        if (first < 0) { done = true; return } // clean EOF between records
        din.readFully(lenBytes, 1, 7)
        val lenCrc = readIntLe(din)
        require(lenCrc == maskedCrc32c(lenBytes), "length CRC mismatch")
        val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong
        require(len >= 0 && len <= Int.MaxValue - 16, s"bad record length $len")
        val payload = new Array[Byte](len.toInt)
        din.readFully(payload)
        val payloadCrc = readIntLe(din)
        require(payloadCrc == maskedCrc32c(payload), "payload CRC mismatch")
        nextRec = payload
      }
      override def hasNext: Boolean = { advance(); !done && nextRec != null }
      override def next(): Array[Byte] = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  private def readIntLe(din: DataInputStream): Int = {
    val b = new Array[Byte](4)
    try din.readFully(b)
    catch { case _: EOFException => throw new IllegalStateException("truncated record") }
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }

  /** Write `payloadCol` (binary) as TFRecord shards of at most
    * `recordsPerShard` records each, named
    * `part-<partition>-<shard>.tfrecord`. Returns the manifest: one row
    * per shard with (path, n_records, n_bytes).
    *
    * Task RETRIES are safe (deterministic partition contents rewrite the
    * same paths with overwrite=true); SPECULATIVE duplicate attempts are
    * not — two attempts would interleave writes to one file. Run with
    * `spark.speculation=false` (the default) or point `outDir` at an
    * attempt-scoped staging dir and commit by rename.
    */
  def writeShards(df: DataFrame, payloadCol: String, outDir: String,
      recordsPerShard: Int = 8192): DataFrame = {
    require(recordsPerShard > 0, "recordsPerShard must be positive")
    val spark = df.sparkSession
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val manifest = df.select(col(payloadCol).cast("binary"))
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(hadoopConf.value)
        fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
        val out = Seq.newBuilder[(String, Long, Long)]
        var shard = -1
        var inShard = 0
        var nBytes = 0L
        var stream: org.apache.hadoop.fs.FSDataOutputStream = null
        var path: String = null
        def roll(): Unit = {
          if (stream != null) {
            stream.close()
            out += ((path, inShard.toLong, nBytes))
          }
          shard += 1
          path = s"$outDir/part-$pid-$shard.tfrecord"
          stream = fs.create(new org.apache.hadoop.fs.Path(path), true)
          inShard = 0
          nBytes = 0L
        }
        // close the open stream on ANY failure — a leaked HDFS lease
        // blocks the task retry's create() on the same path until expiry
        try {
          rows.foreach { r: Row =>
            if (stream == null || inShard >= recordsPerShard) roll()
            val payload = r.getAs[Array[Byte]](0)
            require(payload != null, "null payload row in TFRecord export")
            val rec = encodeRecord(payload)
            stream.write(rec)
            inShard += 1
            nBytes += rec.length
          }
          if (stream != null) {
            stream.close()
            out += ((path, inShard.toLong, nBytes))
          }
        } catch {
          case t: Throwable =>
            if (stream != null) { try stream.close() catch { case _: Exception => } }
            throw t
        }
        out.result().iterator
      }
      .toDF("path", "n_records", "n_bytes")
    // Eagerly pin the manifest: the writes above live inside a lazy
    // mapPartitions, so any SECOND action on the returned frame (count
    // then collect, an AQE re-plan) would silently rewrite the shards
    // and re-emit manifest rows. One materialization, served from the
    // checkpoint thereafter.
    manifest.localCheckpoint(eager = true)
  }
}
