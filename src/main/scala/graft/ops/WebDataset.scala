package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import java.io.{DataInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** WebDataset-style tar shard export — the standard multimodal training
  * interchange (a plain POSIX ustar archive whose members are grouped by
  * sample key: `<key>.<ext>` files laid out consecutively, so a loader
  * streams samples sequentially with no index). The multimodal
  * counterpart of [[TfRecords]]: same one-`mapPartitions` shape, same
  * manifest contract, but each row contributes one MEMBER PER COLUMN
  * (e.g. `000123.jpg` + `000123.json`) instead of one framed record.
  *
  * The tar framing is written against the published ustar layout (POSIX
  * 1003.1; 512-byte headers, octal size, space-initialized checksum,
  * `ustar` magic, two zero blocks at end) with all metadata fields
  * pinned (mtime 0, mode 0644, uid/gid 0) — equal inputs produce
  * BYTE-IDENTICAL shards, so export determinism is testable and any
  * independent tar reader can consume them.
  *
  * 100 TB shape: one `mapPartitions` pass; every partition streams its
  * rows into `ceil(rows/samplesPerShard)` shard files on the target
  * filesystem and emits one manifest row per shard. Shard assignment is
  * deterministic in the input partitioning (`part-<partition>-<shard>
  * .tar`), and the driver only ever sees the manifest.
  */
object WebDataset {

  private val BlockSize = 512

  private def putOctal(h: Array[Byte], off: Int, len: Int, value: Long): Unit = {
    require(value >= 0, s"tar numeric field must be non-negative: $value")
    val s = java.lang.Long.toOctalString(value)
    require(s.length <= len - 1, s"value $value overflows $len-byte tar field")
    val pad = len - 1 - s.length
    var i = 0
    while (i < pad) { h(off + i) = '0'; i += 1 }
    val sb = s.getBytes(UTF_8)
    System.arraycopy(sb, 0, h, off + pad, sb.length)
    h(off + len - 1) = 0 // NUL terminator
  }

  /** One 512-byte ustar header for a regular file member. */
  def memberHeader(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"tar member name must be 1..100 bytes, got ${nameBytes.length} ($name)")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    putOctal(h, 100, 8, 0x1a4) // mode 0644
    putOctal(h, 108, 8, 0) // uid
    putOctal(h, 116, 8, 0) // gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0) // mtime pinned: byte-identical re-exports
    // checksum field is 8 spaces while summing
    var i = 148
    while (i < 156) { h(i) = ' '; i += 1 }
    h(156) = '0' // typeflag: regular file
    // POSIX magic: "ustar" NUL at 257, version "00" at 263
    val magic = "ustar".getBytes(UTF_8)
    System.arraycopy(magic, 0, h, 257, magic.length)
    h(263) = '0'; h(264) = '0'
    var sum = 0L
    i = 0
    while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
    // checksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = 6 - cs.length
    i = 0
    while (i < csPad) { h(148 + i) = '0'; i += 1 }
    System.arraycopy(cs.getBytes(UTF_8), 0, h, 148 + csPad, cs.length)
    h(154) = 0
    h(155) = ' '
    h
  }

  def writeMember(out: OutputStream, name: String, data: Array[Byte]): Long = {
    out.write(memberHeader(name, data.length.toLong))
    out.write(data)
    val padding = (BlockSize - (data.length % BlockSize)) % BlockSize
    if (padding > 0) out.write(new Array[Byte](padding))
    BlockSize.toLong + data.length + padding
  }

  /** Archive trailer: two zero blocks. */
  def writeTrailer(out: OutputStream): Long = {
    out.write(new Array[Byte](2 * BlockSize))
    2L * BlockSize
  }

  /** Iterate (memberName, bytes) off a tar stream, verifying the header
    * checksum and magic of every member; raises on corruption, never
    * fabricates. Stops at the zero trailer block (or clean EOF).
    */
  def readMembers(in: InputStream): Iterator[(String, Array[Byte])] = {
    val din = new DataInputStream(in)
    new Iterator[(String, Array[Byte])] {
      private var nextM: (String, Array[Byte]) = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextM != null) return
        val h = new Array[Byte](BlockSize)
        val first = din.read(h, 0, 1)
        if (first < 0) { done = true; return }
        din.readFully(h, 1, BlockSize - 1)
        if (h.forall(_ == 0)) { done = true; return } // trailer
        val stored = new String(h, 148, 8, UTF_8)
          .takeWhile(c => c >= '0' && c <= '7')
        var i = 148
        while (i < 156) { h(i) = ' '; i += 1 }
        var sum = 0L
        i = 0
        while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
        require(java.lang.Long.parseLong(stored, 8) == sum,
          "tar header checksum mismatch")
        require(new String(h, 257, 5, UTF_8) == "ustar",
          "not a ustar header")
        val nameLen = h.indexWhere(_ == 0)
        val name = new String(h, 0, math.min(nameLen, 100), UTF_8)
        val sizeStr = new String(h, 124, 12, UTF_8)
          .takeWhile(c => c >= '0' && c <= '7')
        val size = java.lang.Long.parseLong(sizeStr, 8)
        require(size >= 0 && size <= Int.MaxValue - BlockSize,
          s"bad member size $size")
        val data = new Array[Byte](size.toInt)
        din.readFully(data)
        val padding = ((BlockSize - (size % BlockSize)) % BlockSize).toInt
        if (padding > 0) din.skipNBytes(padding.toLong)
        nextM = (name, data)
      }
      override def hasNext: Boolean = { advance(); !done && nextM != null }
      override def next(): (String, Array[Byte]) = {
        advance()
        if (nextM == null) throw new NoSuchElementException
        val m = nextM; nextM = null; m
      }
    }
  }

  /** Write each row as one WebDataset sample — a member `<key>.<ext>`
    * per entry of `members` (extension -> binary column), laid out
    * consecutively in the listed order — into tar shards of at most
    * `samplesPerShard` samples, named `part-<partition>-<shard>.tar`.
    * Returns the manifest: one row per shard with
    * (path, n_samples, n_bytes).
    *
    * Same retry contract as [[TfRecords.writeShards]]: task retries
    * rewrite the same paths deterministically; speculative duplicate
    * attempts must stay off (Spark's default).
    */
  def writeShards(df: DataFrame, keyCol: String,
      members: Seq[(String, String)], outDir: String,
      samplesPerShard: Int = 4096): DataFrame = {
    require(members.nonEmpty, "members must be non-empty")
    require(samplesPerShard > 0, "samplesPerShard must be positive")
    val spark = df.sparkSession
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val exts = members.map(_._1)
    require(exts.distinct.length == exts.length,
      s"duplicate member extensions: $exts")
    import spark.implicits._
    val manifest = df.select(col(keyCol).cast("string").as("__key") +:
        members.map { case (_, c) => col(c).cast("binary") }: _*)
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
        def closeShard(): Unit = if (stream != null) {
          nBytes += writeTrailer(stream)
          stream.close()
          out += ((path, inShard.toLong, nBytes))
        }
        def roll(): Unit = {
          closeShard()
          shard += 1
          path = s"$outDir/part-$pid-$shard.tar"
          stream = fs.create(new org.apache.hadoop.fs.Path(path), true)
          inShard = 0
          nBytes = 0L
        }
        // close the open stream on ANY failure — a leaked lease blocks
        // the task retry's create() on the same path until expiry
        try {
          rows.foreach { r: Row =>
            if (stream == null || inShard >= samplesPerShard) roll()
            val key = r.getString(0)
            require(key != null, "null sample key in WebDataset export")
            var i = 0
            while (i < exts.length) {
              val data = r.getAs[Array[Byte]](i + 1)
              require(data != null,
                s"null member '${exts(i)}' for sample key $key")
              nBytes += writeMember(stream, s"$key.${exts(i)}", data)
              i += 1
            }
            inShard += 1
          }
          closeShard()
        } catch {
          case t: Throwable =>
            if (stream != null) { try stream.close() catch { case _: Exception => } }
            throw t
        }
        out.result().iterator
      }
      .toDF("path", "n_samples", "n_bytes")
    // eager pin: the writes ride a lazy mapPartitions — a second action
    // would re-export (see TfRecords.writeShards)
    manifest.localCheckpoint(eager = true)
  }
}
