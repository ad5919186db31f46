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

  test("features feed directly into the similarity ops (integration seam)") {
    val feats = Multimodal.extractFeatures(blobs, "doc_id", "content", dim = 16)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val q = feats.head.getSeq[Float](1)
    val top = Similarity.topK(feats, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }
}
