package graft.ops

import java.nio.ByteBuffer

/** MP4 / ISO-BMFF container metadata, parsed from the published box
  * grammar (ISO/IEC 14496-12: every box = 32-bit big-endian size + fourcc,
  * size==1 -> 64-bit largesize follows, size==0 -> box runs to EOF;
  * containers nest child boxes in their payload). Written against the
  * public spec the way the PG/Kafka/Mongo wire codecs were — no codec
  * library involved. This recovers the REAL container metadata a
  * training-data pipeline catalogs (duration, track dimensions, codec
  * fourcc, sample count); frame/pixel DECODE stays out of scope (no video
  * codec ships with the JDK) and is handled by the documented stub path
  * in [[Multimodal]].
  */
object Mp4 {

  /** What a video-track catalog pass needs from the container.
    * `sampleSizes` is the video track's per-entry stsz byte-size table;
    * a CONSTANT-size track (stsz sample_size != 0) is carried as
    * `constSampleSize` instead — never expanded, so a billion-frame
    * track costs one long, not an allocation (read through
    * [[sampleCount]]/[[sampleSizeAt]], which cover both shapes).
    */
  case class VideoMeta(brand: String, codec: String, width: Int, height: Int,
      nFrames: Int, durationMs: Long, nTracks: Int,
      sampleSizes: Array[Long] = Array.empty,
      constSampleSize: Long = 0) {

    /** Entries in the (possibly constant/RLE) sample table; 0 = no
      * parseable table (distinct from a present-but-constant one).
      */
    def sampleCount: Int =
      if (sampleSizes.nonEmpty) sampleSizes.length
      else if (constSampleSize > 0) math.max(0, nFrames)
      else 0

    def sampleSizeAt(i: Int): Long =
      if (sampleSizes.nonEmpty) sampleSizes(i) else constSampleSize
  }

  /** ISO-BMFF sniff: every MP4 starts with an ftyp box (size + 'ftyp'). */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk the child boxes of [from, to), bounds-checked; malformed sizes
    * end the walk instead of throwing (a truncated tail loses its boxes,
    * never the ones already parsed).
    */
  private def walkChildren(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      var size = u32(b, o)
      val typ = fourcc(b, o + 4)
      var hdr = 8
      if (size == 1 && o + 16 <= to) { size = u64(b, o + 8); hdr = 16 }
      else if (size == 0) size = (to - o).toLong
      if (size < hdr || o + size > to) return
      f(typ, o + hdr, o + size.toInt)
      o += size.toInt
    }
  }

  private final class Track {
    var handler = ""
    var w = 0
    var h = 0
    var codec = ""
    var frames = 0L
    var sampleSizes: Array[Long] = null // per-entry stsz table, if present
    var constSize = 0L // stsz constant sample_size, if non-zero
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int): Track = {
    val t = new Track
    walkChildren(b, from, to) {
      case ("tkhd", s, e) if e - s >= 8 =>
        // width/height are the LAST two 16.16 fixed-point fields of tkhd
        // in both box versions — offset from the end sidesteps the
        // version-dependent timestamp widths
        t.w = (u32(b, e - 8) >> 16).toInt
        t.h = (u32(b, e - 4) >> 16).toInt
      case ("mdia", s, e) => walkChildren(b, s, e) {
        case ("hdlr", hs, he) if he - hs >= 12 =>
          t.handler = fourcc(b, hs + 8)
        case ("minf", ms, me) => walkChildren(b, ms, me) {
          case ("stbl", ss, se) => walkChildren(b, ss, se) {
            case ("stsd", ds, de) if de - ds >= 16 =>
              // fullbox(4) + entry_count(4), then entry size(4) + fourcc
              t.codec = fourcc(b, ds + 12)
            case ("stsz", zs, ze) if ze - zs >= 12 =>
              t.frames = u32(b, zs + 8) // after fullbox + sample_size
              val constSize = u32(b, zs + 4)
              if (constSize == 0) {
                // per-entry table (ISO 14496-12 §8.7.3.2): bounded by
                // both the declared count and the box payload
                val n = math.min(t.frames, (ze - zs - 12L) / 4).toInt
                val sizes = new Array[Long](n)
                var i = 0
                while (i < n) { sizes(i) = u32(b, zs + 12 + i * 4); i += 1 }
                t.sampleSizes = sizes
              } else {
                // constant-size track: carry the ONE size, never expand
                // (a large frame count would otherwise either allocate
                // count longs or be silently dropped)
                t.constSize = constSize
              }
            case _ =>
          }
          case _ =>
        }
        case _ =>
      }
      case _ =>
    }
    t
  }

  /** Parse container metadata; None for non-MP4 or unparseable payloads.
    * Track fields come from the first video ('vide' handler) track, or
    * the first track carrying dimensions when no handler says video.
    */
  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isMp4(bytes)) return None
    try {
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var video: Track = null
      walkChildren(bytes, 0, bytes.length) {
        case ("ftyp", s, e) if e - s >= 4 => brand = fourcc(bytes, s)
        case ("moov", s, e) => walkChildren(bytes, s, e) {
          case ("mvhd", ms, me) if me - ms >= 20 =>
            val ver = bytes(ms) & 0xFF
            if (ver == 1 && me - ms >= 32) {
              timescale = u32(bytes, ms + 20); duration = u64(bytes, ms + 24)
            } else if (ver == 0) {
              timescale = u32(bytes, ms + 12); duration = u32(bytes, ms + 16)
            }
            // truncated v1 box: keep zeros (the malformed-input policy
            // everywhere else) rather than decode timestamp bytes as a
            // timescale
          case ("trak", ts, te) =>
            nTracks += 1
            val t = parseTrak(bytes, ts, te)
            if (video == null || (video.handler != "vide" &&
                (t.handler == "vide" || (video.w == 0 && t.w > 0))))
              video = t
          case _ =>
        }
        case _ =>
      }
      if (brand.isEmpty) None
      else {
        val t = if (video == null) new Track else video
        val durMs = if (timescale > 0) duration * 1000 / timescale else 0L
        // u32 frame counts >= 2^31 SATURATE rather than wrap negative —
        // a wrapped count would read as "no sample table" downstream
        Some(VideoMeta(brand, t.codec, t.w, t.h,
          math.min(t.frames, Int.MaxValue.toLong).toInt, durMs,
          nTracks,
          if (t.sampleSizes == null) Array.empty else t.sampleSizes,
          t.constSize))
      }
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------- writer —
  // Deterministic test-pattern MP4 headers, emitted through the same box
  // grammar the parser reads: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd,
  // hdlr, minf(stbl(stsd, stsz))))) + a stub mdat. Every metadata field
  // derives from the seed by plain arithmetic, so a DuckDB oracle can
  // reproduce the parse output without touching bytes (the
  // patternBmp/patternWav device, q59/q60).

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val buf = ByteBuffer.allocate(n)
    buf.putInt(n)
    buf.put(typ.getBytes("ISO-8859-1"))
    payload.foreach(buf.put)
    buf.array()
  }

  private def fullBox(typ: String, version: Int, payload: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](version.toByte, 0, 0, 0), payload)

  private val unityMatrix: Array[Byte] = {
    val buf = ByteBuffer.allocate(36)
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.array()
  }

  /** The seed-derived parameters — shared arithmetic with the q92 oracle:
    * codec cycles avc1/hev1/vp09, dims step in 16-px increments, duration
    * steps in 500 ms at 24 fps (so frame counts stay integral).
    */
  def patternParams(seed: Long): (String, Int, Int, Long, Long) = {
    val codec = Seq("avc1", "hev1", "vp09")(math.floorMod(seed, 3).toInt)
    val width = 160 + math.floorMod(seed, 8).toInt * 16
    val height = 96 + math.floorMod(seed, 5).toInt * 16
    val durMs = 1000L + math.floorMod(seed, 10) * 500
    val frames = durMs * 24 / 1000
    (codec, width, height, durMs, frames)
  }

  def patternMp4(seed: Long): Array[Byte] = {
    val (codec, width, height, durMs, frames) = patternParams(seed)
    val timescale = 600L
    val durUnits = durMs * timescale / 1000

    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes("ISO-8859-1")).putInt(0x200)
      b.put("isom".getBytes("ISO-8859-1")).put("iso2".getBytes("ISO-8859-1"))
      b.array()
    })
    val mvhd = fullBox("mvhd", 0, {
      val b = ByteBuffer.allocate(96)
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale.toInt).putInt(durUnits.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
      b.put(new Array[Byte](10)) // reserved
      b.put(unityMatrix)
      b.put(new Array[Byte](24)) // pre_defined
      b.putInt(2) // next_track_ID
      b.array()
    })
    val tkhd = fullBox("tkhd", 0, {
      val b = ByteBuffer.allocate(80)
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(1).putInt(0) // track_ID, reserved
      b.putInt(durUnits.toInt)
      b.put(new Array[Byte](8)) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/resv
      b.put(unityMatrix)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      b.array()
    })
    val mdhd = fullBox("mdhd", 0, {
      val b = ByteBuffer.allocate(20)
      b.putInt(0).putInt(0)
      b.putInt(timescale.toInt).putInt(durUnits.toInt)
      b.putShort(0x55C4.toShort).putShort(0) // language 'und', pre_defined
      b.array()
    })
    val hdlr = fullBox("hdlr", 0, {
      val b = ByteBuffer.allocate(21)
      b.putInt(0) // pre_defined
      b.put("vide".getBytes("ISO-8859-1"))
      b.put(new Array[Byte](12)) // reserved
      b.put(0.toByte) // empty nul-terminated name
      b.array()
    })
    val sampleEntry = {
      val b = ByteBuffer.allocate(86)
      b.putInt(86).put(codec.getBytes("ISO-8859-1"))
      b.put(new Array[Byte](6)).putShort(1) // reserved, data_ref_index
      b.put(new Array[Byte](16)) // pre_defined/reserved block
      b.putShort(width.toShort).putShort(height.toShort)
      b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      b.putInt(0).putShort(1) // reserved, frame_count
      b.put(new Array[Byte](32)) // compressorname
      b.putShort(0x0018).putShort(-1) // depth, pre_defined
      b.array()
    }
    val stsd = fullBox("stsd", 0, {
      val b = ByteBuffer.allocate(4 + sampleEntry.length)
      b.putInt(1).put(sampleEntry)
      b.array()
    })
    // per-entry sample-size table (sample_size = 0 signals the entry
    // list per ISO 14496-12): sizes are seeded arithmetic so an external
    // oracle can recompute every one
    val stsz = fullBox("stsz", 0, {
      val b = ByteBuffer.allocate(8 + frames.toInt * 4)
      b.putInt(0).putInt(frames.toInt)
      var i = 0
      while (i < frames.toInt) {
        b.putInt((600 + (seed * 31 + i) * 7 % 900).toInt)
        i += 1
      }
      b.array()
    })
    val moov = box("moov", mvhd,
      box("trak", tkhd,
        box("mdia", mdhd, hdlr,
          box("minf", box("stbl", stsd, stsz)))))
    // stub payload: the catalog pass never reads mdat contents
    val mdat = box("mdat", Array.tabulate[Byte](64)(i =>
      (((seed * 31 + i) * 7) % 256).toByte))
    ftyp ++ moov ++ mdat
  }
}
