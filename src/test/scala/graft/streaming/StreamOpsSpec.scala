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

  test("streaming anomaly score flags against the batch baseline") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // baseline: clicks run med=3/mad=1 per hour; views have MAD 0
    val baseline = Seq(("click", 3.0, 1.0), ("view", 5.0, 0.0))
      .toDF("key", "med", "mad")
    val q = StreamOps.streamingAnomalyScore(input.toDF(), baseline,
        "event_type", "ts", watermark = "10 minutes",
        windowLen = "1 hour", threshold = 3.5)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append).start()
    try {
      // 10:00 window: 10 clicks (z = .6745*7 = 4.7 -> anomaly),
      // 3 views (MAD 0 -> null z, no flag)
      input.addData((1 to 10).map(i =>
        EventRow(i.toLong, ts(i), 1, "click", 1.0)) ++
        (11 to 13).map(i => EventRow(i.toLong, ts(i), 1, "view", 1.0)): _*)
      q.processAllAvailable()
      input.addData(EventRow(99, Timestamp.valueOf("2024-01-01 12:30:00"),
        1, "error", 1.0)) // close the 10:00 window
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, n, robust_z, is_anomaly FROM anom_out ORDER BY key")
        .collect()
      val click = rows.filter(_.getString(0) == "click").head
      assert(click.getLong(1) == 10L)
      assert(math.abs(click.getDouble(2) - 4.7215) < 1e-6)
      assert(click.getBoolean(3))
      val view = rows.filter(_.getString(0) == "view").head
      assert(view.isNullAt(2) && !view.getBoolean(3))
    } finally q.stop()
  }

  test("streaming EWMA chart matches batch ewmaChart across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // key A daily counts on the 2024-01-01 spine: 4, 0, 8, 4 ->
    // mu = 4, population sigma = sqrt(8) (exact in double AND in the
    // batch face's decimal-quantized fold — integer deviations)
    val baseline = Seq(("A", 4.0, math.sqrt(8.0))).toDF("key", "mu", "sigma")
    val q = StreamOps.streamingEwmaChart(input.toDF(), "event_type", "ts",
        baseline, startDay = "2024-01-01", lambda = 0.5, limitL = 3.0)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append).start()
    def at(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-0$day $hour%02d:00:00")
    try {
      // day 1's four events split across TWO micro-batches: state merges
      input.addData((1 to 2).map(i =>
        EventRow(i.toLong, at(1, i), 1, "A", 1.0)) :+
        EventRow(99, at(1, 3), 1, "unmonitored", 1.0): _*)
      q.processAllAvailable()
      input.addData((3 to 4).map(i =>
        EventRow(i.toLong, at(1, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      // day 3: 8 events; day 4: 4 events (day 2 is a zero-day)
      input.addData((1 to 8).map(i =>
        EventRow(10 + i.toLong, at(3, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      input.addData((1 to 4).map(i =>
        EventRow(20 + i.toLong, at(4, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      // sentinel far ahead: watermark passes day 4's end, closing 0..3
      input.addData(EventRow(999, at(7, 12), 1, "A", 1.0))
      q.processAllAvailable()
      val stream = spark.sql(
        "SELECT * FROM ewma_out WHERE day_idx < 4 ORDER BY day_idx")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      // batch face on the identical event set (sentinel excluded by the
      // 4-day spine)
      val batchEvents = ((1 to 4).map(i => ("A", at(1, i))) ++
        (1 to 8).map(i => ("A", at(3, i))) ++
        (1 to 4).map(i => ("A", at(4, i)))).toDF("k", "ts")
      val batch = graft.ops.Events.ewmaChart(batchEvents, "k", "ts",
          startDay = "2024-01-01", numDays = 4, lambda = 0.5,
          limitL = 3.0)
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      assert(stream.length == 4, s"got ${stream.length} chart rows")
      assert(stream.toSeq == batch.toSeq)
      // the unmonitored key emitted nothing
      assert(spark.sql(
        "SELECT count(*) FROM ewma_out WHERE key = 'unmonitored'")
        .collect()(0).getLong(0) == 0L)
    } finally q.stop()
  }

  test("streaming CUSUM monitor matches batch cusumMonitor") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // same series as the EWMA twin: counts 4, 0, 8, 4 -> mu 4, sigma √8
    val baseline = Seq(("A", 4.0, math.sqrt(8.0))).toDF("key", "mu", "sigma")
    val q = StreamOps.streamingCusumMonitor(input.toDF(), "event_type",
        "ts", baseline, startDay = "2024-01-01", k = 0.5, h = 0.8)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append).start()
    def at(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-0$day $hour%02d:00:00")
    try {
      input.addData((1 to 4).map(i =>
        EventRow(i.toLong, at(1, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      input.addData((1 to 8).map(i =>
        EventRow(10 + i.toLong, at(3, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      input.addData((1 to 4).map(i =>
        EventRow(20 + i.toLong, at(4, i), 1, "A", 1.0)): _*)
      q.processAllAvailable()
      input.addData(EventRow(999, at(7, 12), 1, "A", 1.0))
      q.processAllAvailable()
      val stream = spark.sql(
        "SELECT * FROM cusum_out WHERE day_idx < 4 ORDER BY day_idx")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      val batchEvents = ((1 to 4).map(i => ("A", at(1, i))) ++
        (1 to 8).map(i => ("A", at(3, i))) ++
        (1 to 4).map(i => ("A", at(4, i)))).toDF("k", "ts")
      val batch = graft.ops.Events.cusumMonitor(batchEvents, "k", "ts",
          startDay = "2024-01-01", numDays = 4, k = 0.5, h = 0.8)
        .collect()
        .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      assert(stream.length == 4, s"got ${stream.length} rows")
      assert(stream.toSeq == batch.toSeq)
      assert(stream.exists(_._7)) // the day-3 spike alarms at h=0.8
    } finally q.stop()
  }

  test("streaming KS drift matches batch ksTest across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val refVals = (1 to 50).map(i => (i % 10).toDouble)
    val ref = refVals.toDF("v")
    val q = StreamOps.streamingKsDrift(input.toDF(), "value", "ts", ref,
        "v", windowLen = "1 hour", watermark = "10 minutes",
        pThreshold = 0.5)
      .writeStream.format("memory").queryName("ks_out")
      .outputMode(OutputMode.Append).start()
    val batch1 = (1 to 12).map(i => (i % 5 + 5).toDouble)
    val batch2 = (13 to 20).map(i => (i % 3 + 7).toDouble)
    try {
      // the same 10:00 window fills across TWO micro-batches — the
      // grain state must merge, not reset
      input.addData(batch1.zipWithIndex.map { case (v, i) =>
        EventRow(i.toLong, ts(i % 50), 1, "e", v) }: _*)
      q.processAllAvailable()
      input.addData(batch2.zipWithIndex.map { case (v, i) =>
        EventRow(100 + i.toLong, ts((i + 20) % 50), 1, "e", v) }: _*)
      q.processAllAvailable()
      // advance the watermark past 11:00 -> the window times out
      input.addData(EventRow(999,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ks_out").collect()
      assert(rows.length == 1, s"got ${rows.length} drift rows")
      val r = rows(0)
      assert(r.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(r.getLong(1) == 20L)
      // batch parity: the SAME live values vs the SAME reference
      // through Profile.ksTest must give the identical D and p
      val both = ((batch1 ++ batch2).map(("live", _)) ++
        refVals.map(("ref", _))).toDF("g", "v")
      val b = graft.ops.Profile.ksTest(both, "g", "v").collect()(0)
      assert(r.getDouble(2) == b.getDouble(2),
        s"d_stat ${r.getDouble(2)} vs batch ${b.getDouble(2)}")
      assert(r.getDouble(3) == b.getDouble(3),
        s"p ${r.getDouble(3)} vs batch ${b.getDouble(3)}")
      assert(r.getBoolean(4) == (b.getDouble(3) < 0.5))
    } finally q.stop()
  }

  test("streaming PSI drift matches batch distributionDrift") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // reference mix: click-heavy with a category the live window lacks
    val refKeys = Seq.fill(20)("click") ++ Seq.fill(10)("view") ++
      Seq.fill(5)("error")
    val ref = refKeys.toDF("k")
    val q = StreamOps.streamingPsiDrift(input.toDF(), "event_type", "ts",
        ref, "k", windowLen = "1 hour", watermark = "10 minutes",
        psiThreshold = 0.25)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode(OutputMode.Append).start()
    // live mix shifts toward purchase (absent from ref) across TWO
    // micro-batches of the same window
    val live1 = Seq.fill(6)("click") ++ Seq.fill(8)("purchase")
    val live2 = Seq.fill(4)("view") ++ Seq.fill(2)("purchase")
    try {
      input.addData(live1.zipWithIndex.map { case (k, i) =>
        EventRow(i.toLong, ts(i % 50), 1, k, 1.0) }: _*)
      q.processAllAvailable()
      input.addData(live2.zipWithIndex.map { case (k, i) =>
        EventRow(100 + i.toLong, ts((i + 20) % 50), 1, k, 1.0) }: _*)
      q.processAllAvailable()
      input.addData(EventRow(999,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM psi_out").collect()
      assert(rows.length == 1, s"got ${rows.length} drift rows")
      val r = rows(0)
      assert(r.getLong(1) == 20L)
      // batch parity: identical ref/live through distributionDrift
      val b = graft.ops.Profile.distributionDrift(ref,
        (live1 ++ live2).toDF("k"), "k").collect().head
      assert(r.getDouble(2) == b.getDouble(7),
        s"psi ${r.getDouble(2)} vs batch ${b.getDouble(7)}")
      assert(r.getDouble(3) == b.getDouble(8),
        s"jsd ${r.getDouble(3)} vs batch ${b.getDouble(8)}")
      assert(r.getBoolean(4) == (b.getDouble(7) >= 0.25))
    } finally q.stop()
  }

  test("streaming conformal coverage flags the breached window") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // q-hat calibrated offline at 3.0, alpha 0.2 -> breach below 0.8.
    // value plays the residual-bearing actual; pred rides as 0 via a
    // projected constant column
    val q = StreamOps.streamingConformalCoverage(
        input.toDF().withColumn("pred",
          org.apache.spark.sql.functions.lit(0.0)),
        "pred", "value", "ts", qHat = 3.0, alpha = 0.2,
        windowLen = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("conf_out")
      .outputMode(OutputMode.Append).start()
    try {
      // 10:00 window: residuals 1,2,3,9,9 -> coverage 0.6 < 0.8 breach
      input.addData(Seq(1.0, 2.0, 3.0, 9.0, 9.0).zipWithIndex.map {
        case (v, i) => EventRow(i.toLong, ts(i), 1, "e", v) }: _*)
      q.processAllAvailable()
      // 11:00 window: residuals 1,1,2,3 -> coverage 1.0, no breach
      input.addData(Seq(1.0, 1.0, 2.0, 3.0).zipWithIndex.map {
        case (v, i) => EventRow(10 + i.toLong,
          Timestamp.valueOf("2024-01-01 11:05:00"), 1, "e", v) }: _*)
      q.processAllAvailable()
      input.addData(EventRow(99,
        Timestamp.valueOf("2024-01-01 13:00:00"), 1, "e", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM conf_out ORDER BY window_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 5L && rows(0).getLong(2) == 3L)
      assert(rows(0).getDouble(3) == 0.6 && rows(0).getBoolean(4))
      assert(rows(1).getDouble(3) == 1.0 && !rows(1).getBoolean(4))
    } finally q.stop()
  }

  test("streaming KS drift: matching distribution reads no drift") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val ref = (1 to 40).map(i => (i % 4).toDouble).toDF("v")
    val q = StreamOps.streamingKsDrift(input.toDF(), "value", "ts", ref,
        "v", windowLen = "1 hour", watermark = "10 minutes",
        pThreshold = 0.05)
      .writeStream.format("memory").queryName("ks_same")
      .outputMode(OutputMode.Append).start()
    try {
      // live window drawn from the SAME uniform {0,1,2,3} grain
      input.addData((1 to 40).map(i =>
        EventRow(i.toLong, ts(i % 50), 1, "e", (i % 4).toDouble)): _*)
      q.processAllAvailable()
      input.addData(EventRow(99,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 0.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM ks_same").collect()(0)
      assert(r.getDouble(2) == 0.0) // identical CDFs -> D = 0
      assert(r.getDouble(3) == 1.0) // λ < 0.05 short-circuit
      assert(!r.getBoolean(4))
    } finally q.stop()
  }

  test("streaming MW drift matches batch mannWhitney across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val refVals = (1 to 60).map(i => (i % 12).toDouble)
    val ref = refVals.toDF("v")
    val q = StreamOps.streamingMwDrift(input.toDF(), "value", "ts", ref,
        "v", windowLen = "1 hour", watermark = "10 minutes",
        pThreshold = 0.5)
      .writeStream.format("memory").queryName("mw_out")
      .outputMode(OutputMode.Append).start()
    // shifted-up live sample split across two micro-batches (with ties
    // against the reference grain, so the correction path runs)
    val batch1 = (1 to 15).map(i => (i % 8 + 4).toDouble)
    val batch2 = (16 to 25).map(i => (i % 6 + 6).toDouble)
    try {
      input.addData(batch1.zipWithIndex.map { case (v, i) =>
        EventRow(i.toLong, ts(i % 50), 1, "e", v) }: _*)
      q.processAllAvailable()
      input.addData(batch2.zipWithIndex.map { case (v, i) =>
        EventRow(100 + i.toLong, ts((i + 20) % 50), 1, "e", v) }: _*)
      q.processAllAvailable()
      input.addData(EventRow(999,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM mw_out").collect()
      assert(rows.length == 1, s"got ${rows.length} drift rows")
      val r = rows(0)
      assert(r.getLong(1) == 25L)
      // batch parity: 'live' < 'ref' lexicographically, so the batch
      // kernel's group a IS the live sample — u/z/p must be identical
      val both = ((batch1 ++ batch2).map(("live", _)) ++
        refVals.map(("ref", _))).toDF("g", "v")
      val b = graft.ops.Profile.mannWhitney(both, "g", "v").collect()(0)
      assert(r.getDouble(2) == b.getDouble(2),
        s"u_live ${r.getDouble(2)} vs batch u_a ${b.getDouble(2)}")
      assert(r.getDouble(3) == b.getDouble(3))
      assert(r.getDouble(4) == b.getDouble(4),
        s"z ${r.getDouble(4)} vs batch ${b.getDouble(4)}")
      assert(r.getDouble(5) == b.getDouble(5))
      assert(r.getBoolean(6) == (b.getDouble(5) < 0.5))
    } finally q.stop()
  }

  test("streaming MW drift: all-tied window yields null z/p, no flag") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val ref = Seq.fill(20)(5.0).toDF("v")
    val q = StreamOps.streamingMwDrift(input.toDF(), "value", "ts", ref,
        "v", windowLen = "1 hour", watermark = "10 minutes")
      .writeStream.format("memory").queryName("mw_tied")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1 to 10).map(i =>
        EventRow(i.toLong, ts(i), 1, "e", 5.0)): _*)
      q.processAllAvailable()
      input.addData(EventRow(99,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 5.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM mw_tied").collect()(0)
      assert(r.isNullAt(4) && r.isNullAt(5) && !r.getBoolean(6))
    } finally q.stop()
  }

  test("streaming heavy hitters: exact at large k across micro-batches, " +
    "MG bound at small k") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // k = 16 > distinct items: nothing evicts -> estimates are EXACT
    val q = StreamOps.streamingWindowedHeavyHitters(input.toDF(),
        "event_type", "ts", k = 16, windowLen = "1 hour",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1 to 9).map(i => EventRow(i.toLong, ts(i), 1,
        if (i % 3 == 0) "view" else "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData((10 to 15).map(i => EventRow(i.toLong, ts(i), 1,
        if (i % 2 == 0) "click" else "error", 1.0)): _*)
      q.processAllAvailable()
      input.addData(EventRow(99,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT item, est, n FROM hh_out ORDER BY item").collect()
      // batch truth: clicks 6+3=9, views 3, errors 3 (ids 10..15: even
      // -> click x3, odd -> error x3)
      val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("click" -> 9L, "error" -> 3L, "view" -> 3L),
        s"got $got")
      assert(rows.forall(_.getLong(2) == 15L))
    } finally q.stop()

    // small k: the sketch evicts, but the published bound holds per item
    val input2 = MemoryStream[EventRow]
    val q2 = StreamOps.streamingWindowedHeavyHitters(input2.toDF(),
        "event_type", "ts", k = 2, windowLen = "1 hour",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh_small")
      .outputMode(OutputMode.Append).start()
    try {
      val tys = (1 to 30).map(i =>
        if (i % 5 == 0) s"t${i % 3}" else "dominant")
      input2.addData(tys.zipWithIndex.map { case (t, i) =>
        EventRow(i.toLong, ts(i + 1), 1, t, 1.0) }: _*)
      q2.processAllAvailable()
      input2.addData(EventRow(99,
        Timestamp.valueOf("2024-01-01 12:30:00"), 1, "e", 1.0))
      q2.processAllAvailable()
      val truth = tys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rows = spark.sql("SELECT item, est, n, max_err FROM hh_small")
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val t = truth(r.getString(0))
        assert(r.getLong(1) <= t, s"${r.getString(0)} overcounted")
        assert(r.getLong(1) + r.getDouble(3) >= t,
          s"${r.getString(0)} est ${r.getLong(1)} + err ${r.getDouble(3)} < $t")
      }
      // the dominant item must survive a k=2 sketch of this stream
      assert(rows.exists(_.getString(0) == "dominant"))
    } finally q2.stop()
  }

  test("streaming mSPRT matches the batch test cumulatively and tracks " +
    "the running-min p") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, String, Double)]
    val q = StreamOps.streamingMsprt(
        input.toDF().toDF("exp", "arm", "y"), "exp", "arm", "y",
        controlLabel = "ctl", treatmentLabel = "trt", tau = 1.0,
        pThreshold = 0.05)
      .writeStream.format("memory").queryName("msprt_out")
      .outputMode(OutputMode.Append).start()
    val b1 = Seq(("e1", "ctl", 1.0), ("e1", "ctl", 2.0),
      ("e1", "trt", 4.0), ("e1", "trt", 5.0), ("e1", "junk", 99.0))
    val b2 = Seq(("e1", "ctl", 3.0), ("e1", "trt", 6.0))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM msprt_out ORDER BY n_a, n_b").collect()
      assert(rows.length == 2) // one reading per micro-batch
      val last = rows.last
      assert(last.getLong(1) == 3L && last.getLong(2) == 3L)
      // cumulative parity with the batch face ('junk' arm dropped)
      val batchDf = (b1 ++ b2).filter(r => r._2 != "junk")
        .map(r => (if (r._2 == "ctl") "a_ctl" else "b_trt", r._3))
        .toDF("g", "y")
      val b = graft.ops.Profile.msprtTest(batchDf, "g", "y", 1.0)
        .collect()(0)
      assert(last.getDouble(3) == b.getDouble(4), "diff")   // diff
      assert(last.getDouble(4) == b.getDouble(5), "v")      // v
      assert(last.getDouble(5) == b.getDouble(6), "lambda")
      assert(last.getDouble(6) == b.getDouble(7), "p")
      // running min over both looks, and the alarm at the threshold
      val p1 = rows.head.getDouble(6)
      assert(last.getDouble(7) == math.min(p1, last.getDouble(6)))
      assert(last.getBoolean(8) == (last.getDouble(7) < 0.05))
    } finally q.stop()
  }

  test("streaming probBest matches the batch grid bit-for-bit on the " +
    "cumulative counts") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Boolean)]
    val q = StreamOps.streamingProbBest(
        input.toDF().toDF("exp", "arm", "ok"), "exp", "arm", "ok",
        labelA = "A", labelB = "B")
      .writeStream.format("memory").queryName("pb_out")
      .outputMode(OutputMode.Append).start()
    val b1 = Seq(("e1", "A", true), ("e1", "A", false),
      ("e1", "B", true), ("e1", "junk", true))
    val b2 = Seq(("e1", "A", true), ("e1", "B", true),
      ("e1", "B", false), ("e1", "B", true))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM pb_out ORDER BY n_a, n_b")
        .collect()
      assert(rows.length == 2) // one reading per micro-batch
      val last = rows.last
      assert(last.getLong(1) == 3L && last.getLong(3) == 4L)
      // cumulative parity with the batch face ('junk' arm dropped)
      import org.apache.spark.sql.functions.{col => c}
      val batch = graft.ops.Profile.probBest(
        (b1 ++ b2).filter(_._2 != "junk").toDF("g0", "arm", "ok")
          .select(c("arm"), c("ok")), "arm", c("ok"))
        .collect()(0)
      assert(last.getDouble(5) == batch.getDouble(8), "prob")
      assert(last.getDouble(6) == batch.getDouble(9), "exp_loss_a")
      assert(last.getDouble(7) == batch.getDouble(10), "exp_loss_b")
      // the first look (only batch-1 counts) is a DIFFERENT posterior
      assert(rows.head.getDouble(5) != last.getDouble(5))
    } finally q.stop()
  }

  test("streaming probBestK matches the batch K-arm race bit-for-bit " +
    "on the cumulative counts") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String, Boolean)]
    val q = StreamOps.streamingProbBestK(
        input.toDF().toDF("exp", "arm", "ok"), "exp", "arm", "ok",
        labels = Seq("A", "B", "C"))
      .writeStream.format("memory").queryName("pbk_out")
      .outputMode(OutputMode.Append).start()
    // batch 1 misses arm C entirely -> null readings for every arm
    val b1 = Seq(("e1", "A", true), ("e1", "A", false),
      ("e1", "B", true), ("e1", "junk", true))
    val b2 = Seq(("e1", "C", true), ("e1", "C", false),
      ("e1", "B", false), ("e1", "A", true))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT * FROM pbk_out ORDER BY (prob_best IS NOT NULL), arm")
        .collect()
      assert(rows.length == 6) // 3 arms x 2 micro-batches
      val first = rows.take(3)
      assert(first.forall(_.isNullAt(4)), first.mkString(";"))
      val last = rows.drop(3)
      assert(last.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
      assert(last.map(_.getLong(2)).toSeq == Seq(3L, 2L, 2L))
      // cumulative parity with the batch face ('junk' arm dropped)
      import org.apache.spark.sql.functions.{col => c}
      val batch = graft.ops.Profile.probBestK(
        (b1 ++ b2).filter(_._2 != "junk").toDF("g0", "arm", "ok")
          .select(c("arm"), c("ok")), "arm", c("ok"))
        .collect()
      last.zip(batch).foreach { case (s, b) =>
        assert(s.getDouble(4) == b.getDouble(4), s"prob: $s vs $b")
        assert(s.getDouble(5) == b.getDouble(5), s"loss: $s vs $b")
      }
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

  case class DocRow(doc_id: Long, ts: Timestamp, text: String)

  test("streaming decontamination flags docs sharing grams with the static benchmark") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode}
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val bench = Seq(benchText).toDF("text")
      .select(explode(graft.functions.word_shingle_hashes(
        graft.ops.TextAnalysis.tokens(col("text")), 8)).as("g"))
    val input = MemoryStream[DocRow]
    val q = StreamOps.streamingContaminated(input.toDF(), "doc_id", "text",
      "ts", bench, n = 8)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), "prefix words " + benchText + " suffix words"), // contaminated
        DocRow(2, ts(1), "an entirely benign document about spark shuffle partitioning and exchange reuse strategies"),
        DocRow(3, ts(2), "short doc")) // < 8 tokens, cannot be contaminated
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM contam_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L), s"only doc 1 shares an 8-gram: got $ids")
      // one row per contaminated doc, not one per matching gram
      assert(spark.sql("SELECT count(*) FROM contam_out").head.getLong(0) == 1)
    } finally q.stop()
  }

  test("streaming contamination: join-fallback path matches the probe default") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode}
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val bench = Seq(benchText).toDF("text")
      .select(explode(graft.functions.word_shingle_hashes(
        graft.ops.TextAnalysis.tokens(col("text")), 8)).as("g"))
    val input = MemoryStream[DocRow]
    // maxDriverBenchGrams = 0 forces the stream-static semi-join fallback
    val q = StreamOps.streamingContaminated(input.toDF(), "doc_id", "text",
      "ts", bench, n = 8, maxDriverBenchGrams = 0L)
      .writeStream.format("memory").queryName("contam_join_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), "prefix words " + benchText + " suffix words"),
        DocRow(2, ts(1), "an entirely benign document about spark shuffle partitioning and exchange reuse strategies"),
        DocRow(3, ts(2), "short doc"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM contam_join_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L), s"only doc 1 shares an 8-gram: got $ids")
      assert(spark.sql("SELECT count(*) FROM contam_join_out").head.getLong(0) == 1)
    } finally q.stop()
  }

  test("streaming dedup against a persisted reference index flags only ref near-dups") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val refText = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden"
    val ref = Seq((100L, refText)).toDF("doc_id", "text")
    val refBands = graft.ops.Dedup.lshBands(ref, "doc_id", "text")
    val input = MemoryStream[DocRow]
    val q = StreamOps.streamingDedupAgainstReference(input.toDF(), "doc_id",
      "text", "ts", refBands)
      .writeStream.format("memory").queryName("refdedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), refText),                          // exact ref dup
        DocRow(2, ts(1), refText.replace("warm", "cold")),  // near ref dup
        DocRow(3, ts(2), "unrelated content on columnar storage compaction policies and file layout planning"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM refdedup_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L), s"expected ref candidates {1,2}: got $ids")
      // one candidate row per doc despite multiple matching bands
      assert(spark.sql("SELECT count(*) FROM refdedup_out").head.getLong(0) == 2)
    } finally q.stop()
  }

  test("streaming ref dedup: join-fallback path (ref too big for driver) matches probe path") {
    implicit val ctx = spark.sqlContext
    val refText = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden"
    val ref = Seq((100L, refText)).toDF("doc_id", "text")
    val refBands = graft.ops.Dedup.lshBands(ref, "doc_id", "text")
    val input = MemoryStream[DocRow]
    // maxDriverRefBuckets = 0 forces the stream-static semi-join fallback
    // (the 100 TB-reference shape); output must be identical to the
    // driver-probe path the previous test exercises
    val q = StreamOps.streamingDedupAgainstReference(input.toDF(), "doc_id",
      "text", "ts", refBands, maxDriverRefBuckets = 0L)
      .writeStream.format("memory").queryName("refdedup_join_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), refText),
        DocRow(2, ts(1), refText.replace("warm", "cold")),
        DocRow(3, ts(2), "unrelated content on columnar storage compaction policies and file layout planning"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM refdedup_join_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L), s"expected ref candidates {1,2}: got $ids")
      assert(spark.sql("SELECT count(*) FROM refdedup_join_out").head.getLong(0) == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches only rows inside the interval") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val views = MemoryStream[EventRow]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")),
      views.toDF().select($"user_id".as("v_user"), $"ts".as("view_ts"), $"event_id".as("view_id"))
        .withColumnRenamed("v_user", "user_id"),
      key = "user_id", leftTs = "click_ts", rightTs = "view_ts",
      lowerMs = 5 * 60 * 1000, upperMs = 0)
    val q = joined
      .select($"l.user_id", $"click_id", $"view_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append).start()
    try {
      // view 2 min before the click: inside [click-5min, click]; view 20
      // min before: outside; view AFTER the click: outside (upper 0)
      clicks.addData(EventRow(100, ts(30), 1, "click", 0.0))
      views.addData(
        EventRow(200, ts(28), 1, "view", 0.0), // in window
        EventRow(201, ts(10), 1, "view", 0.0), // too old
        EventRow(202, ts(31), 1, "view", 0.0), // after the click
        EventRow(203, ts(29), 2, "view", 0.0)) // other user
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((100L, 200L)), s"got $rows")
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

  test("streaming LSH near-dup surfaces cross-batch candidates, skips unrelated docs") {
    implicit val ctx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the band plays on and the crowd cheers loudly tonight"
    val nearDup = base + " extra"
    val unrelated = "completely different words about spark catalyst tungsten " +
      "codegen shuffle partitions broadcast joins and watermarks in streams"
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.streamingNearDupCandidates(
        input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
        shingle = 3, numPerm = 128, bands = 32)
      .writeStream.format("memory").queryName("lsh_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts(1), base))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM lsh_out").isEmpty,
        "a lone first doc seeds buckets, emits nothing")
      input.addData((2L, ts(2), nearDup), (3L, ts(2), unrelated))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM lsh_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), "near-identical doc pairs with the rep")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        "unrelated doc shares no bucket")
      // a third near-dup arriving later pairs with the SAME representative
      input.addData((4L, ts(3), base + " more"))
      q.processAllAvailable()
      val pairs2 = spark.sql("SELECT DISTINCT id_a, id_b FROM lsh_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs2.contains((1L, 4L)), "later arrivals link to the bucket rep")
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded state, exact below capacity, MG bounds above") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val q = StreamOps.streamingHeavyHitters(
      input.toDF().toDF("g", "w"), "g", "w", k = 4, emitTop = 4)(spark)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: small cardinality (< k) -> exact counts
      input.addData(Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")): _*)
      q.processAllAvailable()
      val snap1 = spark.sql(
        "SELECT item, est, n FROM hh_out WHERE group = 'a' ORDER BY est DESC, item")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(snap1 == Seq(("x", 2L, 3L), ("y", 1L, 3L)))
      // batch 2: same group accumulates across batches; a heavy item
      // among > k distinct stays within the deterministic MG bound
      val heavy = Seq.fill(30)(("a", "x"))
      val noise = (0 until 20).map(i => ("a", s"n$i"))
      input.addData(heavy ++ noise: _*)
      q.processAllAvailable()
      val rows2 = spark.sql(
        "SELECT item, est, n FROM hh_out WHERE group = 'a' AND n = 53")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows2.nonEmpty && rows2.size <= 4, s"state/emit not bounded: $rows2")
      val xEst = rows2.find(_._1 == "x").map(_._2)
      // true count of x = 32; n = 53, slack = n/(k+1) = 10.6
      assert(xEst.exists(e => e <= 32L && e >= 32L - 11L),
        s"x estimate $xEst outside deterministic MG bound")
      // group b untouched by batch 2
      val bRows = spark.sql("SELECT item, est FROM hh_out WHERE group = 'b'")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(bRows == Seq(("z", 1L)))
    } finally q.stop()
  }

  test("streaming distinct: exact below capacity, sketch above, batch-agreeing hashes") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val q = StreamOps.streamingDistinct(
      input.toDF().toDF("g", "w"), "g", "w", k = 64)(spark)
      .writeStream.format("memory").queryName("dist_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: duplicates collapse, below capacity -> exact
      input.addData(Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")): _*)
      q.processAllAvailable()
      val snap1 = spark.sql(
        "SELECT estimate, exact, n FROM dist_out WHERE group = 'a'")
        .collect().map(r => (r.getDouble(0), r.getBoolean(1), r.getLong(2)))
      assert(snap1.toSeq == Seq((2.0, true, 3L)))
      // batch 2: same group crosses capacity; estimate within 5x RSE of
      // the true 2 + 200 distinct, exact flag drops
      input.addData((0 until 200).map(i => ("a", s"v$i")): _*)
      q.processAllAvailable()
      val snap2 = spark.sql(
        "SELECT estimate, exact FROM dist_out WHERE group = 'a' AND n = 203")
        .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
      assert(snap2.length == 1 && !snap2(0)._2)
      assert(math.abs(snap2(0)._1 - 202) / 202.0 < 5.0 / math.sqrt(62.0),
        s"estimate ${snap2(0)._1} vs 202")
      // streaming state equals the batch aggregate on the same input
      // (same hash chain): compare against theta_sketch over the union
      val batchEst = (Seq(("a", "x"), ("a", "x"), ("a", "y")) ++
        (0 until 200).map(i => ("a", s"v$i")))
        .toDF("g", "w").groupBy($"g")
        .agg(graft.functions.theta_estimate(
          graft.functions.theta_sketch($"w", 64)).as("e"))
        .select("e").as[Double].head()
      assert(batchEst == snap2(0)._1,
        s"streaming $snap2 != batch $batchEst on identical input")
      // group b untouched
      val b = spark.sql("SELECT estimate FROM dist_out WHERE group = 'b'")
        .collect().map(_.getDouble(0)).toSeq
      assert(b == Seq(1.0))
    } finally q.stop()
  }

  test("stream-static interval overlap matches batch operator, stateless") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val staticIv = Seq(
      (10L, 100L, 200L), (20L, 150L, 250L), (30L, 1000L, 1100L))
      .toDF("t_id", "t_s", "t_e")
    val streamed = Seq(
      (1L, 180L, 220L),  // overlaps 10 (touch at 200? 180<=200) and 20
      (2L, 240L, 260L),  // overlaps 20 only (touching 250 inclusive)
      (3L, 300L, 900L),  // long interval spanning many bins, overlaps none
      (4L, 950L, 1205L), // multi-bin cover, overlaps 30
      (5L, 260L, 140L))  // empty interval (start > end): overlaps nothing
    val input = MemoryStream[(Long, Long, Long)]
    val s = input.toDF().toDF("s_id", "s_s", "s_e")
    val q = StreamOps.streamingIntervalOverlap(s, "s_s", "s_e",
        staticIv, "t_s", "t_e", binWidth = 100L)
      .writeStream.format("memory").queryName("ovl_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(streamed: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT s_id, t_id FROM ovl_out ORDER BY s_id, t_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // parity: the batch operator on the same frames is the oracle
      val expected = graft.ops.RangeJoin.intervalOverlap(
          streamed.toDF("s_id", "s_s", "s_e"), "s_s", "s_e",
          staticIv, "t_s", "t_e", binWidth = 100L)
        .select("s_id", "t_id").orderBy("s_id", "t_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected)
      assert(got == Seq((1L, 10L), (1L, 20L), (2L, 20L), (4L, 30L)))
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty),
        "overlap join must not register stateful operators")
    } finally q.stop()
  }

  test("stream-static range join tags points with containing intervals, stateless") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val intervals = Seq(
      (10L, 100L, 200L), (20L, 150L, 250L), (30L, 1000L, 1100L))
      .toDF("iv_id", "win_s", "win_e")
    val input = MemoryStream[(Long, Long)]
    val pts = input.toDF().toDF("p_id", "p")
    val q = StreamOps.streamingPointInInterval(pts, "p",
        intervals, "win_s", "win_e", binWidth = 100L)
      .writeStream.format("memory").queryName("rj_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, 175L), (2L, 100L), (3L, 999L))
      q.processAllAvailable()
      // 175 is inside BOTH overlapping windows; 100 hits only iv 10's
      // inclusive start; 999 matches nothing
      val rows1 = spark.sql("SELECT iv_id, p_id FROM rj_out ORDER BY iv_id, p_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows1 == Seq((10L, 1L), (10L, 2L), (20L, 1L)))
      // second batch: stateless join keeps answering (no watermark, no
      // state store growth), multi-bin interval still matches once
      input.addData((4L, 1100L))
      q.processAllAvailable()
      val rows2 = spark.sql("SELECT iv_id, p_id FROM rj_out WHERE p_id = 4")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows2 == Seq((30L, 4L)))
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty),
        "range join must not register stateful operators")
    } finally q.stop()
  }

  test("streaming quantiles: exact below capacity, accumulates across batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Double)]
    val q = StreamOps.streamingQuantiles(
      input.toDF().toDF("g", "v"), "g", "v", k = 200, qs = Seq(0.5, 0.9))(spark)
      .writeStream.format("memory").queryName("kllq_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: 1..100 in group a -> n below capacity, estimates exact
      input.addData((1 to 100).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      val snap1 = spark.sql(
        "SELECT q, est, n FROM kllq_out WHERE group = 'a'")
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
      assert(snap1 == Set((0.5, 50.0, 100L), (0.9, 90.0, 100L)))
      // batch 2: 101..200 arrive -> the SAME group's state accumulates;
      // median of 1..200 at ceil-rank 100 is 100.0, p90 is 180.0
      input.addData((101 to 200).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      val snap2 = spark.sql(
        "SELECT q, est FROM kllq_out WHERE group = 'a' AND n = 200")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(snap2 == Set((0.5, 100.0), (0.9, 180.0)))
      // a second group is independent state
      input.addData(("b", 7.0))
      q.processAllAvailable()
      val bRow = spark.sql(
        "SELECT est FROM kllq_out WHERE group = 'b' AND q = 0.5")
        .collect().map(_.getDouble(0)).toSeq
      assert(bRow == Seq(7.0))
    } finally q.stop()
  }

  test("streaming KN scoring matches the batch reference-model face") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val ref = Seq((100L, "a b a"), (101L, "a b")).toDF("doc_id", "text")
    val input = MemoryStream[DocRow]
    val q = StreamOps.streamingKnScore(input.toDF(), "doc_id", "text", "ts",
      ref, "text")
      .writeStream.format("memory").queryName("knscore_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), "a b"),     // seen bigram
        DocRow(2, ts(1), "z a"),     // unseen context -> pure Pcont
        DocRow(3, ts(2), "solo"))    // < 2 tokens: no row
      q.processAllAvailable()
      // advance the watermark far past 10:0x so the append-mode
      // aggregate emits the closed groups
      input.addData(DocRow(99, ts(50), "a b"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_ngrams, n_unseen, nll FROM knscore_out " +
          "WHERE doc_id < 10 ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      // batch face on the same rows is the oracle
      val batch = graft.ops.Retrieval.knBigramNllAgainst(
        Seq((1L, "a b"), (2L, "z a"), (3L, "solo")).toDF("doc_id", "text"),
        "doc_id", "text", ref, "text")
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.toSeq == batch.toSeq)
      assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 emits nothing
    } finally q.stop()
  }

  test("streaming KN scoring at order 3 from a PERSISTED model matches the batch face") {
    implicit val ctx = spark.sqlContext
    val ref = Seq((100L, "a b c a b"), (101L, "b c a")).toDF("doc_id", "text")
    // save -> load -> stream: a stream restart never repays the
    // reference pass; parquet-backed frames serve the static side
    val mdir = java.nio.file.Files.createTempDirectory("knstream").toString
    graft.ops.Retrieval.saveKnModel(
      graft.ops.Retrieval.knModel(ref, "text", order = 3), mdir)
    val loaded = graft.ops.Retrieval.loadKnModel(spark, mdir)
    val input = MemoryStream[DocRow]
    val q = StreamOps.streamingKnScoreWith(input.toDF(), "doc_id", "text", "ts",
      loaded)
      .writeStream.format("memory").queryName("kn3_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), "a b c"),   // seen trigram
        DocRow(2, ts(1), "z b c"),   // unseen (z,b) context -> order-2
        DocRow(3, ts(2), "a b"))     // < 3 tokens: no row
      q.processAllAvailable()
      input.addData(DocRow(99, ts(50), "a b c"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_ngrams, n_unseen, nll FROM kn3_out " +
          "WHERE doc_id < 10 ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      val batch = graft.ops.Retrieval.knNgramNllAgainst(
        Seq((1L, "a b c"), (2L, "z b c"), (3L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", ref, "text", order = 3)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.toSeq == batch.toSeq)
      assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 emits nothing
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(mdir))
    }
  }

  test("streaming MODIFIED-KN scoring matches the batch modified face (persisted model)") {
    implicit val ctx = spark.sqlContext
    // class-spread counts so the three discounts differ and apply
    val ref = Seq((100L, "a b c a b c a b c"), (101L, "b c a b c a"),
      (102L, "a b d e f")).toDF("doc_id", "text")
    val mdir = java.nio.file.Files.createTempDirectory("knmodstream").toString
    graft.ops.Retrieval.saveKnModel(
      graft.ops.Retrieval.knModel(ref, "text", order = 3), mdir)
    val loaded = graft.ops.Retrieval.loadKnModel(spark, mdir)
    val input = MemoryStream[DocRow]
    val q = StreamOps.streamingKnScoreWith(input.toDF(), "doc_id", "text", "ts",
      loaded, modified = true)
      .writeStream.format("memory").queryName("knmod_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DocRow(1, ts(0), "a b c"),   // count-3+ class
        DocRow(2, ts(1), "a b d"),   // count-1 class
        DocRow(3, ts(2), "z b c"))   // unseen context backoff
      q.processAllAvailable()
      input.addData(DocRow(99, ts(50), "a b c")) // advance the watermark
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_ngrams, n_unseen, nll FROM knmod_out " +
          "WHERE doc_id < 10 ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "z b c"))
        .toDF("doc_id", "text")
      val batch = graft.ops.Retrieval.knNgramNllModAgainstModel(
        docs, "doc_id", "text", loaded)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.toSeq == batch.toSeq)
      // and the single-discount face disagrees somewhere (the flag bites)
      val single = graft.ops.Retrieval.knNgramNllAgainstModel(
        docs, "doc_id", "text", loaded)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(got.exists(t => single(t._1) != t._4))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(mdir))
    }
  }

  private def dayTs(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  test("streaming DAU and rolling actives equal the batch face across two batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // one query per face — each is its own chained-agg pipeline
    val qd = StreamOps.streamingDau(input.toDF(), "user_id", "ts",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("dau_out")
      .outputMode(OutputMode.Append).start()
    val qr = StreamOps.streamingRollingActive(input.toDF(), "user_id", "ts",
        windowDays = 3, watermark = "1 hour")
      .writeStream.format("memory").queryName("roll_out")
      .outputMode(OutputMode.Append).start()
    val batch1 = Seq(
      EventRow(1, dayTs(1, 9), 1, "click", 0), // day 1: users 1,2
      EventRow(2, dayTs(1, 10), 2, "click", 0),
      EventRow(3, dayTs(1, 11), 1, "view", 0), // same-day dup of user 1
      EventRow(4, dayTs(2, 9), 1, "click", 0)) // day 2: user 1
    val batch2 = Seq(
      EventRow(5, dayTs(2, 10), 3, "click", 0), // day 2: +user 3
      EventRow(6, dayTs(4, 9), 2, "click", 0)) // day 4: user 2 (gap day 3)
    try {
      input.addData(batch1: _*)
      qd.processAllAvailable(); qr.processAllAvailable()
      input.addData(batch2: _*)
      qd.processAllAvailable(); qr.processAllAvailable()
      // close every window: watermark far past day 4 + 3-day slide tail
      input.addData(EventRow(9, dayTs(20, 0), 9, "click", 0))
      qd.processAllAvailable(); qr.processAllAvailable()
      input.addData(EventRow(10, dayTs(25, 0), 9, "click", 0))
      qd.processAllAvailable(); qr.processAllAvailable()

      val events = (batch1 ++ batch2)
        .map(e => (e.user_id, e.ts)).toDF("user_id", "ts")
      val expected = graft.ops.Events.rollingActiveUsers(
          events, "user_id", "ts", windowDays = 3)
        .collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
        .toMap
      // spine days 1..4: dau 2,2,0,1; trailing-3 actives 2,3,3,3
      assert(expected("2024-03-01") == ((2L, 2L)))
      assert(expected("2024-03-03") == ((0L, 3L)))
      val gotDau = spark.sql("SELECT * FROM dau_out")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val gotRoll = spark.sql("SELECT * FROM roll_out")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      expected.foreach { case (day, (dau, roll)) =>
        // streaming emits no row for zero-activity days (the batch
        // spine manufactures them); every emitted row must agree
        assert(gotDau.getOrElse(day, 0L) == dau,
          s"dau($day): got ${gotDau.get(day)}, want $dau")
        assert(gotRoll.getOrElse(day, 0L) == roll,
          s"rolling($day): got ${gotRoll.get(day)}, want $roll")
      }
    } finally { qd.stop(); qr.stop() }
  }

  test("streaming retention marks reproduce the batch cohort matrix") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamOps.streamingRetention(input.toDF(), "user_id", "ts",
        ttlMs = 24 * 3600 * 1000, watermark = "15 days")
      .writeStream.format("memory").queryName("ret_out")
      .outputMode(OutputMode.Append).start()
    def wk(day: Int, hour: Int = 12): Timestamp =
      Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")
    // weeks (Mondays): 2024-03-04, 03-11, 03-18. user 1 active wk0+wk1,
    // user 2 wk0 only, user 3 wk0+wk2, user 4 first seen wk1 — and user
    // 3's WEEK-0 event arrives in batch 2 AFTER its week-2 event (the
    // cohort-moving late arrival the expiry emission exists for)
    val batch1 = Seq(
      EventRow(1, wk(5), 1, "click", 0), EventRow(2, wk(12), 1, "view", 0),
      EventRow(3, wk(6), 2, "click", 0),
      EventRow(4, wk(19), 3, "click", 0),
      EventRow(5, wk(13), 4, "click", 0))
    val batch2 = Seq(
      EventRow(6, wk(7), 3, "view", 0), // user 3's true cohort week
      EventRow(7, wk(5, 18), 2, "view", 0)) // same-week dup, no new mark
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // expire every user: two watermark pushes well past last + ttl
      input.addData(EventRow(20, Timestamp.valueOf("2024-05-01 00:00:00"),
        9, "click", 0))
      q.processAllAvailable()
      input.addData(EventRow(21, Timestamp.valueOf("2024-06-01 00:00:00"),
        9, "click", 0))
      q.processAllAvailable()

      val marks = spark.sql(
        "SELECT cohort_week, week_offset FROM ret_out WHERE user_id < 9")
        .collect().map(r => (r.getTimestamp(0).toString, r.getInt(1)))
      val gotMatrix = marks.groupBy(identity).map { case (k, v) =>
        (k._1, k._2, v.length.toLong) }.toSet
      val batch = graft.ops.Events.cohortRetention(
          (batch1 ++ batch2).map(e => (e.user_id, e.ts)).toDF("user_id", "ts"),
          "user_id", "ts")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2)))
        .toSet
      assert(gotMatrix == batch,
        s"streaming $gotMatrix vs batch $batch")
      // sanity on the hand case: wk0 cohort = users 1,2,3; offsets
      // 0 -> 3 users, 1 -> 1 (user 1), 2 -> 1 (user 3); wk1 cohort = user 4
      assert(batch.exists { case (w, o, n) => o == 0 && n == 3 })
      assert(batch.exists { case (w, o, n) => o == 2 && n == 1 })
    } finally q.stop()
  }

  test("streaming funnel equals the batch chain, out-of-order across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val steps = Seq("view", "cart", "buy")
    val q = StreamOps.streamingFunnel(input.toDS(), steps,
        ttlMs = 60 * 60 * 1000, watermark = "2 hours")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    // user 1 completes all three; user 2 stalls after view; user 3's
    // cart PRECEDES its view (greedy chain: reached stops at view);
    // user 4's view arrives LATE (batch 2) with an EARLIER ts than the
    // cart seen in batch 1 — the recompute-from-state case
    val batch1 = Seq(
      EventRow(1, ts(0), 1, "view", 0), EventRow(2, ts(5), 1, "cart", 0),
      EventRow(3, ts(9), 1, "buy", 0),
      EventRow(4, ts(1), 2, "view", 0),
      EventRow(5, ts(0), 3, "cart", 0), EventRow(6, ts(6), 3, "view", 0),
      EventRow(7, ts(8), 4, "cart", 0))
    val batch2 = Seq(
      EventRow(8, ts(3), 4, "view", 0), // late but inside the watermark
      EventRow(9, ts(10), 4, "buy", 0))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // advance watermark past last event + ttl so every user expires
      input.addData(EventRow(20, Timestamp.valueOf("2024-01-02 10:00:00"),
        9, "view", 0))
      q.processAllAvailable()
      input.addData(EventRow(21, Timestamp.valueOf("2024-01-03 10:00:00"),
        9, "view", 0))
      q.processAllAvailable()

      val got = spark.sql("SELECT user_id, reached FROM funnel_out WHERE user_id < 9")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batchTimes = graft.ops.Events.funnelTimes(
          (batch1 ++ batch2).map(e => (e.user_id, e.event_type, e.ts))
            .toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .collect()
        .map(r => r.getLong(0) -> (1 to 3).count(i => !r.isNullAt(i)))
        .toMap
      assert(batchTimes == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 3))
      assert(got == batchTimes, s"streaming $got vs batch $batchTimes")
      // the completed user's chain carries the batch times themselves
      val u1 = spark.sql("SELECT step_ts FROM funnel_out WHERE user_id = 1")
        .collect()(0).getSeq[Long](0)
      assert(u1 == Seq(ts(0).getTime, ts(5).getTime, ts(9).getTime))
    } finally q.stop()
  }
}
