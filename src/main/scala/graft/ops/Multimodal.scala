package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side architecture here is real and tested — schema contracts,
  * `mapPartitions` batch shape (decode cost amortized across a batch, no
  * per-row JVM<->native churn), partition sizing — while the actual
  * codec work is STUBBED (this container has no image/audio libraries):
  * `decodeStub` derives deterministic pseudo-pixels from the bytes, where a
  * real deployment would call JavaCV/TwelveMonkeys/ffmpeg inside the same
  * partition loop. Swap `decodeStub` for a real codec and nothing else
  * changes — that seam is the point.
  */
object Multimodal {

  /** Metadata struct carried next to every blob. */
  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("size_bytes", LongType)))

  /** Output schema of [[extractFeatures]]. */
  def featureSchema(idType: DataType): StructType = StructType(Seq(
    StructField("id", idType),
    StructField("meta", metaType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  // ---------------------------------------------------------------- STUB —
  /** Deterministic fake decode: bytes -> (meta, "pixel" floats). A real
    * implementation replaces ONLY this function with a codec call.
    */
  private[ops] def decodeStub(bytes: Array[Byte], dim: Int): (Row, Array[Float]) = {
    // fake meta: pretend square RGB derived from payload size
    val side = math.max(1, math.sqrt(bytes.length / 3.0).toInt)
    val meta = Row("stub/rgb", side, side, 1, bytes.length.toLong)
    // fake features: FNV over byte windows, folded into [-1, 1]
    val feats = new Array[Float](dim)
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL); h *= 0x100000001B3L
      feats(i % dim) = ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      i += 1
    }
    (meta, feats)
  }
  // ----------------------------------------------------------------------

  /** Batch feature extraction over a binary column: one pass per
    * partition, rows processed in order, constant memory. `idCol` rides
    * along for joining features back.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 64): DataFrame = {
    val idType = df.schema(idCol).dataType
    val outSchema = featureSchema(idType)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row(r.get(idIdx), null, null)
        else {
          val (meta, feats) = decodeStub(bytes, dim)
          Row(r.get(idIdx), meta, feats)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** "Video" frame sampling: pick every k-th fixed-size chunk of the blob
    * (stub for ffmpeg frame extraction — the exploded one-row-per-frame
    * shape and even partition spread are the real contract).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 1024, everyK: Int = 10): DataFrame = {
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(Seq(
      StructField("id", idType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else {
          val nFrames = math.max(1, bytes.length / frameBytes)
          (0 until nFrames by everyK).iterator.map { f =>
            val from = f * frameBytes
            val until = math.min(bytes.length, from + frameBytes)
            Row(r.get(idIdx), f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** "Resize": re-encode each blob to a target pixel budget. STUB: the
    * deterministic stand-in scales the byte payload by the area ratio
    * (a real impl decodes, resamples, re-encodes inside the same
    * partition loop). The contract — per-row binary->binary with updated
    * meta, batch shape preserved — is the real part.
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(Seq(
      StructField("id", idType),
      StructField("meta", metaType),
      StructField("content", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row(r.get(idIdx), null, null)
        else {
          // meta depends only on length — no need to run the decode hash
          val side = math.max(1, math.sqrt(bytes.length / 3.0).toInt)
          val ratio = (targetW.toLong * targetH).toDouble /
            math.max(1L, side.toLong * side)
          // scales BOTH ways: downscale truncates, upscale zero-pads, so
          // meta dims and payload size stay consistent
          val newLen = math.max(1, (bytes.length * ratio).toInt)
          val out = java.util.Arrays.copyOf(bytes, newLen)
          Row(r.get(idIdx),
            Row("stub/rgb", targetW, targetH, 1, out.length.toLong), out)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Typed metadata without decoding payloads (cheap catalog pass). */
  def describe(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).cast(LongType).as("size_bytes"),
      substring(col(binCol), 1, 4).as("magic"))
}
