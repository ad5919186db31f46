package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Fake blobs: document text bytes standing in for image payloads. */
  private lazy val blobs = spark.read
    .parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    .limit(50)
    .select(col("doc_id"), col("text").cast("binary").as("content"))

  test("extractFeatures: schema, determinism, and null safety") {
    val f1 = Multimodal.extractFeatures(blobs, "doc_id", "content", dim = 16)
    assert(f1.schema.fieldNames.toSeq == Seq("id", "meta", "features"))
    val rows = f1.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getSeq[Float](2).length == 16)
      val meta = r.getStruct(1)
      assert(meta.getString(0) == "stub/rgb")
      assert(meta.getLong(4) > 0)
    }
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(blobs, "doc_id", "content", dim = 16)
      .collect().map(r => r.get(0) -> r.getSeq[Float](2)).toMap
    rows.foreach(r => assert(again(r.get(0)) == r.getSeq[Float](2)))

    // null payloads survive
    val withNull = Seq((99L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    val nr = Multimodal.extractFeatures(withNull, "doc_id", "content").head
    assert(nr.isNullAt(1) && nr.isNullAt(2))
  }

  test("sampleFrames explodes chunks with the declared shape") {
    val frames = Multimodal.sampleFrames(blobs, "doc_id", "content",
      frameBytes = 64, everyK = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) % 2 == 0, "only every 2nd frame sampled")
      assert(r.getAs[Array[Byte]](2).length <= 64)
    }
    // a 441-char doc at 64B frames -> ceil at least 3 sampled frames (0,2,4)
    val big = rows.groupBy(_.get(0)).map(_._2.length).max
    assert(big >= 2)
  }

  test("describe is a cheap metadata pass (no decode)") {
    val d = Multimodal.describe(blobs, "doc_id", "content").collect()
    assert(d.length == 50)
    d.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getAs[Array[Byte]](2).length <= 4)
    }
  }

  test("resize rewrites meta to target dims and shrinks payloads") {
    val out = Multimodal.resize(blobs, "doc_id", "content", 8, 8).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val meta = r.getStruct(1)
      assert(meta.getInt(1) == 8 && meta.getInt(2) == 8)
      assert(r.getAs[Array[Byte]](2).length <= 256)
    }
  }

  // ------------------------------------------------ real image decode —

  /** Render a w x h image with per-pixel RGB from `px` and encode it with
    * the JDK (the same codecs the engine decodes with, but through the
    * public write API — no shared code path with the decoder internals).
    */
  private def makeImage(w: Int, h: Int, fmt: String)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real decode: PNG/BMP magic bytes -> true dims + luminance features") {
    val white = makeImage(32, 16, "png")((_, _) => 0xFFFFFF)
    val black = makeImage(8, 8, "bmp")((_, _) => 0x000000)
    // left half black, right half white
    val split = makeImage(40, 40, "png")((x, _) => if (x < 20) 0x000000 else 0xFFFFFF)

    val df = Seq((1L, white), (2L, black), (3L, split))
      .toDF("doc_id", "content")
    val rows = Multimodal.extractFeatures(df, "doc_id", "content", dim = 16)
      .collect().map(r => r.getLong(0) -> r).toMap

    val wMeta = rows(1L).getStruct(1)
    assert(wMeta.getString(0) == "image/png")
    assert(wMeta.getInt(1) == 32 && wMeta.getInt(2) == 16)
    assert(rows(1L).getSeq[Float](2).forall(f => math.abs(f - 1.0f) < 1e-3))

    val bMeta = rows(2L).getStruct(1)
    assert(bMeta.getString(0) == "image/bmp")
    assert(rows(2L).getSeq[Float](2).forall(f => f < 1e-3))

    // the 4x4 grid sees the left two columns dark, right two bright
    val feats = rows(3L).getSeq[Float](2)
    for (cy <- 0 until 4) {
      assert(feats(cy * 4 + 0) < 0.01f && feats(cy * 4 + 1) < 0.01f)
      assert(feats(cy * 4 + 2) > 0.99f && feats(cy * 4 + 3) > 0.99f)
    }
  }

  test("real decode: corrupt image payloads fall back to the stub, not a crash") {
    val broken = "BM not actually a bitmap".getBytes
    val df = Seq((1L, broken)).toDF("doc_id", "content")
    val r = Multimodal.extractFeatures(df, "doc_id", "content", dim = 16).head
    assert(r.getStruct(1).getString(0) == "stub/rgb")
    assert(r.getSeq[Float](2).length == 16)
  }

  test("real resize: resampled PNG round-trips at the target dims") {
    val grad = makeImage(64, 64, "png")((x, y) => {
      val v = (x * 4) & 0xFF; (v << 16) | (v << 8) | v
    })
    val df = Seq((1L, grad)).toDF("doc_id", "content")
    val out = Multimodal.resize(df, "doc_id", "content", 16, 16).head
    val meta = out.getStruct(1)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == 16 && meta.getInt(2) == 16)
    // the payload is a REAL png decodable to the target size
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](2)))
    assert(back.getWidth == 16 && back.getHeight == 16)
    // resample preserved the left-to-right gradient
    val lum = (x: Int) => back.getRGB(x, 8) & 0xFF
    assert(lum(0) < lum(8) && lum(8) < lum(15))
  }

  test("real audio decode: WAV meta + RMS features separate silence from tone") {
    // 8 kHz mono 16-bit PCM, 1 s: first half silence, second half 440 Hz
    val rate = 8000
    val pcm = new Array[Byte](rate * 2)
    for (i <- rate / 2 until rate) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 20000).toShort
      pcm(i * 2) = (s & 0xFF).toByte          // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, rate.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val df = Seq((1L, wav)).toDF("doc_id", "content")
    val r = Multimodal.extractFeatures(df, "doc_id", "content", dim = 16).head
    val meta = r.getStruct(1)
    assert(meta.getString(0) == "audio/wav")
    assert(meta.getInt(1) == 8000)    // sample rate rides the width field
    assert(meta.getInt(2) == 1)       // channels ride the height field
    assert(meta.getInt(3) == 8000)    // PCM frames
    val feats = r.getSeq[Float](2)
    assert(feats.take(8).forall(_ < 0.01f), "first half is silence")
    // sine RMS = amplitude/sqrt(2) ~ 0.43 at 20000/32768
    assert(feats.drop(8).forall(f => f > 0.35f && f < 0.5f), "second half is tone")
  }

  test("features feed directly into the similarity ops (integration seam)") {
    val feats = Multimodal.extractFeatures(blobs, "doc_id", "content", dim = 16)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val q = feats.head.getSeq[Float](1)
    val top = Similarity.topK(feats, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("dHash: bit layout over a hand-built grid, strict-greater semantics") {
    import spark.implicits._
    // g=2 grid, cells row-major [0.1, 0.2, 0.3, 0.3]: row 0 ascends (bit 0
    // set), row 1 is flat (strict > leaves bit 1 clear)
    val df = Seq(Seq(0.1f, 0.2f, 0.3f, 0.3f)).toDF("features")
    val h = df.select(Multimodal.dHash(col("features"), 2).as("h"))
      .head.getLong(0)
    assert(h == 1L)
    assertThrows[IllegalArgumentException](Multimodal.dHash(col("features"), 9))
  }

  test("dHash: real decode path matches pixel arithmetic; id mod 256 collides") {
    import spark.implicits._
    // id=5 starts at 61 (ascends through all 16 cells -> all bits set);
    // id=1 starts at 217, so the +7 ramp wraps past 255 inside row 1 and
    // clears the bit at the wrap — a genuinely different hash
    val ids = Seq(5L, 5L + 256, 1L).toDF("doc_id")
    val hashes = Multimodal.extractFeatures(
        Multimodal.patternImages(ids, "doc_id", side = 4), "id", "content", dim = 16)
      .select(col("id"), Multimodal.dHash(col("features"), 4).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected bits from the pattern formula (id*31 + c)*7 mod 256 —
    // luminance order == pixel-value order, one pixel per grid cell
    def expected(id: Long): Long =
      (for { y <- 0 until 4; x <- 0 until 3 } yield {
        val c = y * 4 + x
        if ((id * 31 + c + 1) * 7 % 256 > (id * 31 + c) * 7 % 256)
          1L << (y * 3 + x) else 0L
      }).sum
    assert(hashes(5L) == expected(5L))
    assert(hashes(1L) == expected(1L))
    assert(hashes(5L) == hashes(5L + 256), "pattern repeats with id mod 256")
    assert(hashes(5L) != hashes(1L), "distinct patterns hash apart")
  }

  test("Mp4 parse recovers every pattern field from real box bytes") {
    for (seed <- Seq(0L, 1L, 2L, 7L, 123L)) {
      val (codec, w, h, durMs, frames) = Mp4.patternParams(seed)
      val bytes = Mp4.patternMp4(seed)
      assert(Mp4.isMp4(bytes))
      val m = Mp4.parse(bytes).get
      assert(m.brand == "isom" && m.codec == codec && m.width == w &&
        m.height == h && m.nFrames == frames.toInt &&
        m.durationMs == durMs && m.nTracks == 1,
        s"seed=$seed parsed $m, expected ($codec, $w, $h, $frames, $durMs)")
    }
  }

  test("Mp4 parse survives truncation and rejects non-MP4 payloads") {
    val bytes = Mp4.patternMp4(42L)
    // truncating inside moov loses boxes but must not throw
    Mp4.parse(java.util.Arrays.copyOf(bytes, bytes.length / 3))
    assert(Mp4.parse("plain text payload, not a container".getBytes).isEmpty)
    assert(Mp4.parse(Multimodal.patternBmp(1L, 4)).isEmpty)
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
  }

  test("Mp4 parse handles 64-bit largesize and version-1 mvhd") {
    // handcraft: ftyp + moov(size==1 largesize) { mvhd v1 (64-bit times) }
    val ftyp = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("ftypisom".getBytes).putInt(0x200).array()
    val mvhdPayload = java.nio.ByteBuffer.allocate(112)
      .put(Array[Byte](1, 0, 0, 0)) // version 1
      .putLong(0L).putLong(0L) // creation, modification (64-bit)
      .putInt(1000) // timescale
      .putLong(2500L) // duration -> 2500 ms
      .array()
    val mvhd = java.nio.ByteBuffer.allocate(8 + 112)
      .putInt(120).put("mvhd".getBytes).put(mvhdPayload).array()
    val moov = java.nio.ByteBuffer.allocate(16 + mvhd.length)
      .putInt(1).put("moov".getBytes).putLong(16L + mvhd.length)
      .put(mvhd).array()
    val m = Mp4.parse(ftyp ++ moov).get
    assert(m.durationMs == 2500L, s"v1 mvhd must decode 64-bit duration: $m")
  }

  test("decode dispatch: MP4 payloads surface real container meta") {
    import spark.implicits._
    val vids = Multimodal.patternVideos(Seq(3L, 4L).toDF("doc_id"), "doc_id")
    val out = Multimodal.extractFeatures(vids, "id", "content", dim = 16)
      .select(col("id"), col("meta.format"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val (c3, w3, h3, _, f3) = Mp4.patternParams(3L)
    assert(out(3L) == ((s"video/mp4;codec=$c3", w3, h3, f3.toInt)))
    assert(out(4L)._1.startsWith("video/mp4;codec="), s"got ${out(4L)}")
  }

  test("frame sampling reads the parsed stsz table, both stsz forms") {
    import spark.implicits._
    // per-entry form from the pattern generator: sizes are seeded
    // arithmetic, every 6th entry selected
    val seed = 7L
    val meta = Mp4.parse(Mp4.patternMp4(seed)).get
    val (_, _, _, _, frames) = Mp4.patternParams(seed)
    assert(meta.sampleSizes.length == frames.toInt)
    meta.sampleSizes.zipWithIndex.foreach { case (sz, i) =>
      assert(sz == 600 + (seed * 31 + i) * 7 % 900)
    }
    val vids = Multimodal.patternVideos(Seq(seed).toDF("doc_id"), "doc_id")
    val rows = Multimodal.frameSampleTable(vids, "id", "content", everyK = 6)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0 until frames.toInt by 6))
    rows.foreach { case (i, sz) =>
      assert(sz == 600 + (seed * 31 + i) * 7 % 900)
    }
    // constant-size form (sample_size != 0): hand-built minimal
    // container, independent of the pattern writer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1"))
        .put(payload)
      b.array()
    }
    val stszConst = box("stsz", {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0) // fullbox version+flags
      b.putInt(2048).putInt(5) // constant size, count
      b.array()
    })
    val handMp4 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", box("trak", box("mdia",
        box("minf", box("stbl", stszConst)))))
    val constMeta = Mp4.parse(handMp4).get
    assert(constMeta.nFrames == 5)
    // constant-size tracks are carried compactly — one long, no
    // expansion — and read through the shape-agnostic accessors
    assert(constMeta.sampleSizes.isEmpty)
    assert(constMeta.constSampleSize == 2048L)
    assert(constMeta.sampleCount == 5)
    assert((0 until constMeta.sampleCount)
      .forall(constMeta.sampleSizeAt(_) == 2048L))
  }

  test("huge constant-size tracks are not silently dropped (no 1M-frame cap)") {
    val stszConst = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0)
      b.putInt(4096).putInt(50000000) // 50M frames, constant 4 KiB
      b.array()
    }
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(t.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    val mp4 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", box("trak", box("mdia",
        box("minf", box("stbl", box("stsz", stszConst))))))
    val m = Mp4.parse(mp4).get
    assert(m.sampleCount == 50000000)
    assert(m.sampleSizeAt(49999999) == 4096L)
    assert(m.sampleSizes.isEmpty) // and it cost one long, not 400 MB
  }
}
