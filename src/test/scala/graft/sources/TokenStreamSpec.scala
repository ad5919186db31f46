package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class TokenStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rec(op: String, id: Int): WalRecord =
    WalRecord(0L, "appdb", "", "users", op, 5000L + id,
      null, Map("_id" -> id.toString), 0L)

  private def startQuery(streamId: String, out: String, ckpt: String) =
    spark.readStream
      .format("graft.sources.TokenStreamProvider")
      .option("stream.client", "graft.sources.InMemoryTokenClient")
      .option("stream.id", streamId)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50)).start()

  test("opaque resume tokens drive micro-batches and survive restart") {
    val sid = "tok-1"
    InMemoryTokenLog.clear(sid)
    (1 to 3).foreach(i => InMemoryTokenLog.append(sid, rec("c", i)))

    val out = Files.createTempDirectory("tok-out").toString
    val ckpt = Files.createTempDirectory("tok-ckpt").toString
    val q1 = startQuery(sid, out, ckpt)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 3)

    // events while the stream is down; resume must deliver exactly these
    (4 to 7).foreach(i => InMemoryTokenLog.append(sid, rec("u", i)))
    val q2 = startQuery(sid, out, ckpt)
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 7)
      val ops = rows.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ops == Map("c" -> 3L, "u" -> 4L))
    } finally q2.stop()
  }

  test("empty stream plans no partitions (no busy work before first token)") {
    val sid = "tok-empty"
    InMemoryTokenLog.clear(sid)
    val out = Files.createTempDirectory("tok-out2").toString
    val ckpt = Files.createTempDirectory("tok-ckpt2").toString
    val q = startQuery(sid, out, ckpt)
    try {
      q.processAllAvailable()
      // no rows delivered (an empty part file from the 0-partition batch
      // is fine), no crash
      if (new java.io.File(out).listFiles().exists(_.getName.endsWith(".parquet")))
        assert(spark.read.parquet(out).count() == 0)
      InMemoryTokenLog.append(sid, rec("c", 1))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 1)
    } finally q.stop()
  }
}
