package graft.sources

import graft.cdc.{KafkaWire, KafkaWireProducer, ScriptedKafkaBroker}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** The wire-protocol Kafka batch source against the scripted broker's
  * in-memory log: planning pins one Spark task per Kafka partition, the
  * read returns exactly the produced records.
  */
class KafkaWireSourceSpec extends AnyFunSuite {

  test("batch read distributes one task per Kafka partition and round-trips") {
    val spark = graft.SparkTestSession.spark
    val broker = new ScriptedKafkaBroker("events", numPartitions = 3)
    try {
      val records = (0 until 30).map(i =>
        (s"key-$i".getBytes(StandardCharsets.UTF_8),
          s"""{"n":$i}""".getBytes(StandardCharsets.UTF_8),
          1700000000000L + i))
      val producer = new KafkaWireProducer("127.0.0.1", broker.port)
      try producer.send("events", 3, records) finally producer.close()

      val df = KafkaWireSource.read(spark, "127.0.0.1", broker.port, "events")
      // one input partition per Kafka partition — the scale contract
      assert(df.rdd.getNumPartitions == 3)

      val rows = df.selectExpr("partition", "offset",
        "cast(key as string) as key", "cast(value as string) as value",
        "timestamp_ms").collect()
      assert(rows.length == 30)

      // every record on the partition its key hashes to, payload intact
      val byKey = rows.map(r => r.getString(2) ->
        ((r.getInt(0), r.getString(3), r.getLong(4)))).toMap
      records.foreach { case (k, v, ts) =>
        val key = new String(k, StandardCharsets.UTF_8)
        val (p, value, gotTs) = byKey(key)
        assert(p == KafkaWire.partitionFor(k, 3), s"$key on wrong partition")
        assert(value == new String(v, StandardCharsets.UTF_8))
        assert(gotTs == ts)
      }

      // offsets gapless per partition from the broker's log start (100+p)
      rows.groupBy(_.getInt(0)).foreach { case (p, rs) =>
        val offsets = rs.map(_.getLong(1)).sorted
        assert(offsets.head == 100L + p, s"partition $p starts at ${offsets.head}")
        assert(offsets.toSeq == (offsets.head to offsets.last),
          s"partition $p offsets have gaps")
      }

      // the scan is a plain projectable source: column pruning applies
      val keysOnly = df.select(col("key")).count()
      assert(keysOnly == 30)
      assert(broker.failure == null, s"broker-side failure: ${broker.failure}")
    } finally broker.stop()
  }

  test("an empty topic plans empty slices and returns zero rows") {
    val spark = graft.SparkTestSession.spark
    val broker = new ScriptedKafkaBroker("empty", numPartitions = 2)
    try {
      val df = KafkaWireSource.read(spark, "127.0.0.1", broker.port, "empty")
      assert(df.count() == 0)
      assert(broker.failure == null, s"broker-side failure: ${broker.failure}")
    } finally broker.stop()
  }
}
