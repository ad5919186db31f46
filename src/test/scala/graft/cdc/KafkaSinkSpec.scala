package graft.cdc

import graft.SparkTestSession
import graft.replicate.ReplicatorStats
import graft.sources.{InMemoryWal, WalRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, BinaryType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** The Kafka egress shape, exercised without a broker (none offline):
  * the producer tuning the reference configures
  * (`internal/integrations/kafka/repository.go:49-60`) must land in the
  * sink options, the frame must carry the key/value contract, and the
  * delivery-report parity path (`:100-119`) must surface per-batch write
  * failures.
  */
class KafkaSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def walFrame(walId: String): DataFrame = {
    InMemoryWal.clear(walId)
    InMemoryWal.append(walId, WalRecord(1L, "appdb", "public", "users", "c",
      1000L, null, Map("id" -> "1"), 1L))
    spark.readStream
      .format("graft.sources.CdcSourceProvider")
      .option("wal.client", "graft.sources.InMemoryWalClient")
      .option("wal.id", walId)
      .load()
  }

  test("producer options carry the reference's tuned defaults") {
    val opts = ReplicatePipeline.kafkaProducerOptions("broker:9092", "cdc.events")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("topic") == "cdc.events")
    // internal/integrations/kafka/repository.go:49-60
    assert(opts("kafka.acks") == "1")
    assert(opts("kafka.retries") == "3")
    assert(opts("kafka.batch.size") == "16384")
    assert(opts("kafka.linger.ms") == "5")
    assert(opts("kafka.compression.type") == "snappy")
    assert(opts("kafka.max.in.flight.requests.per.connection") == "5")
    assert(opts("kafka.request.timeout.ms") == "5000")
    assert(opts("kafka.delivery.timeout.ms") == "10000")
  }

  test("URL-param-style overrides win over defaults (repository.go:62-81)") {
    val opts = ReplicatePipeline.kafkaProducerOptions("b:9092", "t",
      overrides = Map("acks" -> "all", "kafka.linger.ms" -> "50"))
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.linger.ms") == "50")
    assert(opts("kafka.batch.size") == "16384") // untouched default
  }

  test("kafka writer builds on the envelope frame with the key/value contract") {
    val frame = Envelope.toKafkaFrame(walFrame("kafka-shape"), "postgres", "r1")
    // the Kafka sink contract: exactly (key, value), both string/binary
    assert(frame.schema.fieldNames.toSeq == Seq("key", "value"))
    assert(frame.schema.fields.forall(f =>
      f.dataType == StringType || f.dataType == BinaryType))
    // writer construction applies the tuned options without needing a broker
    val ckpt = Files.createTempDirectory("kafka-ckpt").toString
    val w = ReplicatePipeline.kafkaWriter(frame, "broker:9092", "cdc.events", ckpt)
    assert(w != null) // options validated via kafkaProducerOptions above
  }

  test("delivery-report hook fires per failed batch, counts write errors, keeps at-least-once") {
    val stats = new ReplicatorStats
    val failures = new AtomicInteger(0)
    val okBatches = new AtomicInteger(0)
    val out = Files.createTempDirectory("dr-out").toString
    val ckpt = Files.createTempDirectory("dr-ckpt").toString

    val frame = Envelope.toKafkaFrame(walFrame("kafka-dlq"), "postgres", "r2")
    val q = ReplicatePipeline.startWithDeliveryReports(
      frame,
      writeBatch = (df, _) => {
        // first delivery attempt of a non-empty batch fails (broker-down
        // stand-in); the retry succeeds
        if (df.count() > 0 && failures.get == 0) {
          failures.incrementAndGet()
          throw new RuntimeException("delivery failed: broker unreachable")
        }
        df.write.mode("append").parquet(out)
        okBatches.incrementAndGet()
      },
      onError = (batchId, e) => stats.recordWriteError(batchId, e),
      checkpointDir = ckpt)
    try {
      // first attempt fails the query; error is reported
      intercept[Exception](q.processAllAvailable())
    } finally q.stop()

    assert(failures.get == 1)
    assert(stats.writeErrors.get == 1)
    assert(stats.lastError.get.contains("broker unreachable"))
    assert(stats.toJson("streaming", healthy = true)
      .contains(""""write_error_count":1"""))

    // restart from the same checkpoint: the failed batch is redelivered
    // (at-least-once), not skipped
    val q2 = ReplicatePipeline.startWithDeliveryReports(
      Envelope.toKafkaFrame(walFrame("kafka-dlq"), "postgres", "r2"),
      writeBatch = (df, _) => {
        df.write.mode("append").parquet(out)
        okBatches.incrementAndGet()
      },
      onError = (batchId, e) => stats.recordWriteError(batchId, e),
      checkpointDir = ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out)
    assert(rows.count() == 1, "exactly the redelivered event")
    assert(rows.head.getString(0) == "appdb.public.users")
    assert(stats.writeErrors.get == 1, "successful redelivery adds no errors")
  }
}
