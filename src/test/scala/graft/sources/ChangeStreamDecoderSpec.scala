package graft.sources

import graft.SparkTestSession
import graft.sources.ChangeStreamDecoder._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ChangeStreamDecoderSpec extends AnyFunSuite {

  private def event(token: String, opType: String, coll: String = "users",
      full: String = null, before: String = null, t: Long = 1700000000L): String = {
    val fd = Option(full).map(f => s""","fullDocument":$f""").getOrElse("")
    val bd = Option(before).map(b => s""","fullDocumentBeforeChange":$b""").getOrElse("")
    s"""{"_id":{"_data":"$token"},"operationType":"$opType",
       |"clusterTime":{"$$timestamp":{"t":$t,"i":1}},
       |"ns":{"db":"appdb","coll":"$coll"},
       |"documentKey":{"_id":{"$$oid":"64a1"}}$fd$bd}""".stripMargin.replace("\n", "")
  }

  test("op mapping matches the reference (source.go:189-200)") {
    assert(opCode("insert") == "c")
    assert(opCode("update") == "u")
    assert(opCode("replace") == "u")
    assert(opCode("delete") == "d")
    assert(opCode("drop") == "r")
    assert(opCode("invalidate") == "r")
  }

  test("insert decodes: token, ns, clusterTime, after image") {
    val ev = decode(event("82AA01", "insert",
      full = """{"_id":{"$oid":"64a1"},"name":"ada","n":{"$numberLong":"42"},
                 "tags":["x","y"],"addr":{"city":"b"}}""".replaceAll("\\s+", "")))
    assert(ev.resumeToken == "82AA01")
    assert(ev.op == "c" && ev.db == "appdb" && ev.coll == "users")
    assert(ev.clusterTimeMillis == 1700000000000L)
    assert(ev.before == null)
    assert(ev.after("name") == "ada")
    assert(ev.after("_id") == "64a1")       // $oid unwrapped
    assert(ev.after("n") == "42")           // $numberLong unwrapped
    assert(ev.after("tags") == """["x","y"]""")        // arrays stay JSON
    assert(ev.after("addr") == """{"city":"b"}""")     // nested docs stay JSON
  }

  test("update carries before image only when pre-images are enabled") {
    val withPre = decode(event("82AA02", "update",
      full = """{"name":"ada2"}""", before = """{"name":"ada"}"""))
    assert(withPre.op == "u")
    assert(withPre.before("name") == "ada" && withPre.after("name") == "ada2")

    val noPre = decode(event("82AA03", "update", full = """{"name":"ada2"}"""))
    assert(noPre.before == null)
  }

  test("delete has no after image; missing token raises") {
    val d = decode(event("82AA04", "delete", before = """{"name":"ada"}"""))
    assert(d.op == "d" && d.after == null && d.before("name") == "ada")
    intercept[IllegalArgumentException](
      decode("""{"operationType":"insert","ns":{"db":"d","coll":"c"}}"""))
  }

  test("end-to-end: change-stream docs -> token DSv2 stream -> raw rows, resume included") {
    val spark = SparkTestSession.spark
    val cid = "mongo-e2e"
    ChangeStreamRegistry.clear(cid)
    ChangeStreamRegistry.register(cid, new ScriptedChangeStream(Seq(
      event("T1", "insert", full = """{"_id":{"$oid":"a1"},"v":"1"}"""),
      event("T2", "update", full = """{"_id":{"$oid":"a1"},"v":"2"}""",
        before = """{"_id":{"$oid":"a1"},"v":"1"}"""),
      event("T3", "delete", before = """{"_id":{"$oid":"a1"},"v":"2"}"""))))

    val out = Files.createTempDirectory("cs-out").toString
    val ckpt = Files.createTempDirectory("cs-ckpt").toString
    def start() = spark.readStream
      .format("graft.sources.TokenStreamProvider")
      .option("stream.client", "graft.sources.ChangeStreamTokenClient")
      .option("stream.cursor.id", cid)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50))
      .start()

    val q = start()
    try q.processAllAvailable() finally q.stop()
    // commit trims the buffer down to the resume token itself (Spark may
    // defer the final commit callback, so exercise the contract directly)
    locally {
      val client = new ChangeStreamTokenClient
      client.configure(Map("stream.cursor.id" -> cid))
      client.commitToken("T3")
      val left = ChangeStreamRegistry.state(cid).events
      assert(left.size == 1 && left.head.resumeToken == "T3",
        s"buffer should keep only the committed token, got ${left.map(_.resumeToken)}")
    }
    val rows = spark.read.parquet(out).orderBy("ts_ms", "op").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("op")).sorted.toSeq == Seq("c", "d", "u"))
    assert(rows.forall(_.getAs[String]("db") == "appdb"))
    assert(rows.forall(_.getAs[String]("table") == "users"))
    val upd = rows.find(_.getAs[String]("op") == "u").get
    assert(upd.getAs[Map[String, String]]("before")("v") == "1")
    assert(upd.getAs[Map[String, String]]("after")("v") == "2")

    // restart from checkpoint: new events only (resume-after semantics)
    ChangeStreamRegistry.state(cid) // still registered
    val more = new ScriptedChangeStream(Seq(
      event("T4", "insert", full = """{"_id":{"$oid":"a2"},"v":"9"}""")))
    // swap a fresh cursor feeding one more event into the same buffer
    ChangeStreamRegistry.clear(cid)
    ChangeStreamRegistry.register(cid, more)
    // re-drain into a NEW state: simulate resume by replaying the old
    // tokens first (a live cursor with SetResumeAfter(T3) serves only T4;
    // the scripted stand-in needs the history to resolve the offsets)
    ChangeStreamRegistry.clear(cid)
    ChangeStreamRegistry.register(cid, new ScriptedChangeStream(Seq(
      event("T1", "insert", full = """{"_id":{"$oid":"a1"},"v":"1"}"""),
      event("T2", "update", full = """{"_id":{"$oid":"a1"},"v":"2"}""",
        before = """{"_id":{"$oid":"a1"},"v":"1"}"""),
      event("T3", "delete", before = """{"_id":{"$oid":"a1"},"v":"2"}"""),
      event("T4", "insert", full = """{"_id":{"$oid":"a2"},"v":"9"}"""))))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val after = spark.read.parquet(out)
    assert(after.count() == 4, "resume delivers exactly the one new event")
  }
}
