package graft.sources

import graft.cdc.{KafkaWire, KafkaWireConsumer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Collections => JCollections}
import scala.jdk.CollectionConverters._

/** Batch DataSource v2 reading a Kafka topic through the wire-protocol
  * consumer ([[graft.cdc.KafkaWireConsumer]]) — no client jar. The scan
  * plans ONE input partition per Kafka partition, resolved to its leader
  * broker and an offset range at planning time, so the read distributes
  * exactly like the stock Kafka connector: every executor task owns one
  * partition's slice and pages fetches against that partition's leader.
  *
  * {{{
  * spark.read.format("graft.sources.KafkaWireSourceProvider")
  *   .option("host", "broker1").option("port", "9092")
  *   .option("topic", "changes")
  *   .load()   // topic, partition, offset, key, value, timestamp_ms
  * }}}
  */
object KafkaWireSource {

  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false)))

  def read(spark: SparkSession, host: String, port: Int, topic: String,
      clientId: String = "graft"): DataFrame =
    spark.read.format(classOf[KafkaWireSourceProvider].getName)
      .option("host", host).option("port", port.toString)
      .option("topic", topic).option("client.id", clientId)
      .load()

  /** Streaming read: each micro-batch is the per-partition offset range
    * accrued since the last one; `checkpointLocation` resumes it.
    */
  def readStream(spark: SparkSession, host: String, port: Int, topic: String,
      startPosition: String = "earliest", clientId: String = "graft"): DataFrame =
    spark.readStream.format(classOf[KafkaWireSourceProvider].getName)
      .option("host", host).option("port", port.toString)
      .option("topic", topic).option("client.id", clientId)
      .option("start.position", startPosition)
      .load()

  /** Driver-side planning: bootstrap metadata for the leader table, then
    * earliest/latest per partition FROM ITS LEADER (one connection per
    * leader — offsets served by a non-leader would be stale).
    */
  private[sources] def planSlices(host: String, port: Int, topic: String,
      clientId: String): Seq[KafkaWireInputPartition] = {
    val bootstrap = new KafkaWireConsumer(host, port, clientId)
    try {
      val (cluster, t) = bootstrap.topicMeta(topic)
      val brokerById = cluster.brokers.map(b => b.nodeId -> ((b.host, b.port))).toMap
      val byLeader = t.partitions.groupBy(p => brokerById.getOrElse(p.leader,
        throw new IllegalStateException(
          s"partition ${p.partition} leader ${p.leader} not in broker table")))
      byLeader.toSeq.flatMap { case ((lHost, lPort), parts) =>
        val leader =
          if ((lHost, lPort) == ((host, port))) bootstrap
          else new KafkaWireConsumer(lHost, lPort, clientId)
        try {
          parts.map { p =>
            KafkaWireInputPartition(topic, p.partition, lHost, lPort,
              leader.earliestOffset(topic, p.partition),
              leader.latestOffset(topic, p.partition), clientId)
          }
        } finally if (leader ne bootstrap) leader.close()
      }.sortBy(_.partition)
    } finally bootstrap.close()
  }
}

class KafkaWireSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWireSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KafkaWireTable(properties.asScala.toMap)
}

class KafkaWireTable(options: Map[String, String]) extends Table with SupportsRead {
  private def required(key: String): String = options.getOrElse(key,
    throw new IllegalArgumentException(s"graft-kafka needs option $key"))

  override def name(): String = s"graft-kafka(${options.getOrElse("topic", "?")})"
  override def schema(): StructType = KafkaWireSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaWireSource.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            KafkaWireSource.planSlices(required("host"), required("port").toInt,
              required("topic"), options.getOrElse("client.id", "graft"))
              .toArray[InputPartition]
          override def createReaderFactory(): PartitionReaderFactory =
            KafkaWireReaderFactory
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaWireMicroBatchStream(required("host"), required("port").toInt,
            required("topic"), options.getOrElse("client.id", "graft"),
            options.getOrElse("start.position", "earliest"))
      }
    }
}

object KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaWirePartitionReader(partition.asInstanceOf[KafkaWireInputPartition])
}

/** Per-partition offset positions in Spark's offset log — restart picks
  * up exactly where the last committed micro-batch ended (the same
  * contract as [[LsnOffset]] for the CDC source).
  */
case class KafkaPartitionOffsets(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaPartitionOffsets {
  def fromJson(json: String): KafkaPartitionOffsets = {
    val inner = json.trim.stripPrefix("{").stripSuffix("}").trim
    val map =
      if (inner.isEmpty) Map.empty[Int, Long]
      else inner.split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
      }.toMap
    KafkaPartitionOffsets(map)
  }
}

/** Micro-batch stream over the wire consumer: each trigger reads
  * (lastCommitted, logEnd] per partition, one input partition per Kafka
  * partition (same readers as the batch scan). The leader table is
  * resolved once at stream start — a leadership move fails the task and
  * Spark's retry replans; offsets in the checkpoint make that replay
  * exactly the uncommitted range.
  */
class KafkaWireMicroBatchStream(host: String, port: Int, topic: String,
    clientId: String, startPosition: String) extends MicroBatchStream {

  private val slices = KafkaWireSource.planSlices(host, port, topic, clientId)
  private val leaders =
    scala.collection.mutable.Map.empty[(String, Int), KafkaWireConsumer]
  private def leaderAt(h: String, p: Int): KafkaWireConsumer =
    leaders.getOrElseUpdate((h, p), new KafkaWireConsumer(h, p, clientId))

  override def initialOffset(): Offset = KafkaPartitionOffsets(
    startPosition match {
      case "earliest" => slices.map(s => s.partition -> s.fromOffset).toMap
      case "latest" => slices.map(s => s.partition -> s.untilOffset).toMap
      case other => throw new IllegalArgumentException(
        s"start.position must be earliest|latest, got '$other'")
    })

  override def latestOffset(): Offset = KafkaPartitionOffsets(
    slices.map(s =>
      s.partition -> leaderAt(s.host, s.port).latestOffset(topic, s.partition))
      .toMap)

  override def deserializeOffset(json: String): Offset =
    KafkaPartitionOffsets.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[KafkaPartitionOffsets].offsets
    val until = end.asInstanceOf[KafkaPartitionOffsets].offsets
    slices.flatMap { s =>
      val a = from.getOrElse(s.partition, s.fromOffset)
      val b = until.getOrElse(s.partition, a)
      if (b > a) Some(KafkaWireInputPartition(topic, s.partition,
        s.host, s.port, a, b, clientId))
      else None
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = KafkaWireReaderFactory

  override def stop(): Unit = {
    leaders.values.foreach(c => try c.close() catch { case _: Exception => })
    leaders.clear()
  }
}

/** One Kafka partition's offset slice, pinned to its leader broker. */
case class KafkaWireInputPartition(topic: String, partition: Int,
    host: String, port: Int, fromOffset: Long, untilOffset: Long,
    clientId: String) extends InputPartition

/** Executor-side reader: its own consumer connection, paging fetches so
  * memory holds one fetch response at a time — a partition's slice never
  * materializes whole.
  */
class KafkaWirePartitionReader(p: KafkaWireInputPartition)
  extends PartitionReader[InternalRow] {

  private val consumer = new KafkaWireConsumer(p.host, p.port, p.clientId)
  private var pos = p.fromOffset
  private var stalls = 0
  private var buffer: Iterator[KafkaWire.FetchedRecord] = Iterator.empty
  private var current: KafkaWire.FetchedRecord = _

  override def next(): Boolean = {
    while (!buffer.hasNext && pos < p.untilOffset) {
      val res = consumer.fetch(p.topic, p.partition, pos)
      if (res.records.nonEmpty) {
        pos = res.records.map(_.offset).max + 1
        stalls = 0
        buffer = res.records.filter(_.offset < p.untilOffset).iterator
      } else {
        stalls += 1
        require(stalls < 100,
          s"fetch stalled at ${p.topic}/${p.partition} offset $pos " +
            s"(hw ${res.highWatermark}, slice end ${p.untilOffset})")
      }
    }
    if (buffer.hasNext) { current = buffer.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow(
      UTF8String.fromString(p.topic), p.partition, current.offset,
      current.record.key.orNull, current.record.value,
      current.record.timestampMs)

  override def close(): Unit = consumer.close()
}
