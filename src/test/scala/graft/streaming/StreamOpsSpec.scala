package graft.streaming

import graft.SparkTestSession
import graft.streaming.StreamOps.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamOpsSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window emits closed windows, drops late data") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamOps.windowedEventStats(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        EventRow(1, ts(5), 1, "click", 10.0),
        EventRow(2, ts(20), 1, "click", 5.0),
        EventRow(3, ts(40), 2, "view", 1.0))
      q.processAllAvailable()
      // advance event time past 11:00 + watermark -> closes the 10:00 window
      input.addData(EventRow(4, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // late event for the already-closed 10:00 window: must be dropped
      input.addData(EventRow(5, ts(1), 9, "click", 99.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM win_out ORDER BY window_start, event_type").collect()
      val clicks = rows.filter(_.getString(1) == "click")
      assert(clicks.length == 1)
      assert(clicks.head.getLong(2) == 2) // two on-time clicks, late one dropped
      assert(clicks.head.getDecimal(3).doubleValue() == 15.0)
      val views = rows.filter(_.getString(1) == "view")
      assert(views.length == 1 && views.head.getLong(2) == 1)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions after the gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamOps.sessionize(input.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two bursts separated by > 5 min; user 2: one burst
      input.addData(
        EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(2), 1, "click", 2.0),
        EventRow(3, ts(20), 1, "click", 3.0),
        EventRow(4, ts(21), 2, "view", 4.0))
      q.processAllAvailable()
      // push watermark far forward so the open sessions time out
      input.addData(EventRow(9, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 0.0))
      q.processAllAvailable()
      input.addData(EventRow(10, Timestamp.valueOf("2024-01-01 13:00:00"), 3, "click", 0.0))
      q.processAllAvailable()

      val sess = spark.sql("SELECT * FROM sess_out ORDER BY user_id, start_ts").collect()
      val u1 = sess.filter(_.getLong(0) == 1)
      assert(u1.length == 2, s"user 1 should have 2 sessions, got ${sess.mkString(";")}")
      assert(u1(0).getLong(3) == 2 && u1(0).getDouble(4) == 3.0) // first burst: 2 events
      assert(u1(1).getLong(3) == 1 && u1(1).getDouble(4) == 3.0) // second burst
      val u2 = sess.filter(_.getLong(0) == 2)
      assert(u2.length == 1 && u2.head.getLong(3) == 1)
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates, state stays bounded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamOps.streamingDedup(input.toDF(), Seq("user_id", "event_type"),
      "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(1), 1, "click", 2.0),  // dup key within watermark
        EventRow(3, ts(2), 2, "view", 3.0))
      q.processAllAvailable()
      input.addData(EventRow(4, ts(3), 1, "click", 4.0)) // still a dup
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup_out").head.getLong(0) == 2)

      // once the watermark passes the old key's window, the SAME key is
      // new again — exactly the bounded-state semantics
      input.addData(EventRow(5, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "x", 0.0))
      q.processAllAvailable() // advance watermark far past 10:xx
      input.addData(EventRow(6, Timestamp.valueOf("2024-01-01 12:01:00"), 1, "click", 5.0))
      q.processAllAvailable()
      val users = spark.sql(
        "SELECT user_id, count(*) FROM dedup_out GROUP BY 1 ORDER BY 1").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(users(1L) == 2, "re-arrival after watermark expiry is a new row")
      assert(users(2L) == 1 && users(9L) == 1)
    } finally q.stop()
  }
}
