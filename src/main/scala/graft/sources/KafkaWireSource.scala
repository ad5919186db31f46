package graft.sources

import graft.cdc.{KafkaWire, KafkaWireConsumer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    JCollections.singleton(TableCapability.BATCH_READ)
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
            new PartitionReaderFactory {
              override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
                new KafkaWirePartitionReader(
                  partition.asInstanceOf[KafkaWireInputPartition])
            }
        }
      }
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
