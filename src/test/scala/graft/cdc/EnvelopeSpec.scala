package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnvelopeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import spark.implicits._

  private def rawChanges = {
    val rows = Seq(
      ("appdb", "public", "users", "c", 1000L,
        null.asInstanceOf[Map[String, String]],
        Map("id" -> "1", "name" -> "alice"), 100L, 7L),
      ("appdb", "public", "users", "u", 2000L,
        Map("id" -> "1", "name" -> "alice"),
        Map("id" -> "1", "name" -> "bob"), 101L, 8L),
      ("appdb", "public", "users", "d", 3000L,
        Map("id" -> "1", "name" -> "bob"),
        null.asInstanceOf[Map[String, String]], 102L, 9L))
    rows.toDF("db", "schema", "table", "op", "ts_ms", "before", "after", "lsn", "txId")
  }

  test("kafka key is db.schema.table (kafka/repository.go:152-157)") {
    val out = Envelope.toKafkaFrame(rawChanges, "postgres", "test").collect()
    assert(out.forall(_.getString(0) == "appdb.public.users"))
  }

  test("envelope JSON has Debezium payload shape (event.go:30-37)") {
    val out = Envelope.toKafkaFrame(rawChanges, "postgres", "repl-1")
      .select(col("value")).as[String].collect()

    val insert = out(0)
    assert(insert.contains(""""after":{"id":"1","name":"alice"}"""))
    assert(!insert.contains(""""before":"""), "insert has no before image")
    assert(insert.contains(""""op":"c""""))
    assert(insert.contains(""""connector":"postgres""""))
    assert(insert.contains(""""name":"repl-1""""))
    assert(insert.contains(""""ts_ms":1000"""))
    assert(insert.contains(""""lsn":100"""))

    val update = out(1)
    assert(update.contains(""""before":{"id":"1","name":"alice"}"""))
    assert(update.contains(""""after":{"id":"1","name":"bob"}"""))
    assert(update.contains(""""op":"u""""))

    val delete = out(2)
    assert(delete.contains(""""before":{"id":"1","name":"bob"}"""))
    assert(!delete.contains(""""after":"""), "delete has no after image")
    assert(delete.contains(""""op":"d""""))
  }

  test("transaction is always null, like the reference (postgres/source.go:261)") {
    val out = Envelope.toKafkaFrame(rawChanges, "postgres", "t")
      .select(col("value")).as[String].collect()
    assert(out.forall(!_.contains(""""transaction":""")),
      "to_json drops null transaction struct")
  }

  test("mongo op mapping: insert->c update/replace->u delete->d default r (mongo/source.go:189-200)") {
    val ops = Seq("insert", "update", "replace", "delete", "invalidate")
      .toDF("operationType")
      .select(Envelope.mongoOpCode(col("operationType")).as("op"))
      .as[String].collect().toSeq
    assert(ops == Seq("c", "u", "u", "d", "r"))
  }
}
