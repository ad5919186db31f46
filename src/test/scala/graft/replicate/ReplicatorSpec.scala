package graft.replicate

import graft.SparkTestSession
import graft.cdc.{FileChangeSource, ReplicatePipeline}
import graft.control.StatsServer
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}

class ReplicatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeChangeFile(dir: Path, name: String, rows: Seq[String]): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  private def changeLine(op: String, id: Int, ts: Long, lsn: Long): String =
    s"""{"db":"appdb","schema":"public","table":"users","op":"$op","ts_ms":$ts,
       |"after":{"id":"$id"},"lsn":$lsn,"txId":1}""".stripMargin.replace("\n", "")

  test("replicate pipeline: file change source -> envelope -> sink, with pause/resume") {
    val in = Files.createTempDirectory("graft-cdc-in")
    val out = Files.createTempDirectory("graft-cdc-out").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString

    writeChangeFile(in, "batch1.json", (1 to 5).map(i => changeLine("c", i, 1000L + i, i)))

    val repl = new Replicator("r1", spark, s =>
      ReplicatePipeline.startToParquet(
        FileChangeSource(in.toString), s, "postgres", "r1", out, ckpt))
    ReplicatorRegistry.register(repl)

    repl.start()
    assert(repl.fsm.state == FsmState.Streaming)
    repl.processAllAvailable()
    val firstCount = spark.read.parquet(out).count()
    assert(firstCount == 5)

    // pause = graceful stop; state visible; no query running
    repl.pause()
    assert(repl.fsm.state == FsmState.Paused)
    assert(repl.activeQuery.isEmpty)

    // new data lands while paused
    writeChangeFile(in, "batch2.json", (6 to 8).map(i => changeLine("u", i, 2000L + i, 100 + i)))

    // resume restarts from checkpoint: only the new file is processed, no replay
    repl.resume()
    assert(repl.fsm.state == FsmState.Streaming)
    repl.processAllAvailable()
    val total = spark.read.parquet(out).count()
    assert(total == 8, s"expected 8 (no duplicates after resume), got $total")

    // envelope content survived the full pipeline
    val values = spark.read.parquet(out).selectExpr("value").collect().map(_.getString(0))
    assert(values.forall(_.contains(""""connector":"postgres"""")))
    assert(values.count(_.contains(""""op":"u"""")) == 3)

    repl.stop()
    assert(repl.fsm.state == FsmState.Stopped)
    assert(repl.stats.totalEvents.get == 8)
  }

  test("stats server exposes state and drives signals (server.go:64-77)") {
    val in = Files.createTempDirectory("graft-http-in")
    val out = Files.createTempDirectory("graft-http-out").toString
    val ckpt = Files.createTempDirectory("graft-http-ckpt").toString
    writeChangeFile(in, "b1.json", Seq(changeLine("c", 1, 1L, 1L)))

    val repl = new Replicator("web1", spark, s =>
      ReplicatePipeline.startToParquet(
        FileChangeSource(in.toString), s, "postgres", "web1", out, ckpt))
    ReplicatorRegistry.register(repl)
    repl.start()
    repl.processAllAvailable()

    val server = new StatsServer(0)
    val port = server.start()
    val client = HttpClient.newHttpClient()
    def get(path: String) = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())
    def post(path: String) = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())

    try {
      // bare liveness probe (reference handlers.go): 200, empty body, no JSON
      val health = get("/health")
      assert(health.statusCode() == 200)
      assert(health.body().isEmpty)
      // Go's ServeMux matches "/health" exactly — prefix strays are 404
      assert(get("/healthz").statusCode() == 404)
      // HEAD probes (common liveness config) answer 200 like Go
      val headReq = client.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/health"))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(headReq.statusCode() == 200)

      val list = get("/api/v1/replicators")
      assert(list.statusCode() == 200)
      assert(list.body().contains(""""id":"web1""""))
      assert(list.body().contains(""""state":"streaming""""))

      val one = get("/api/v1/replicators/web1")
      assert(one.statusCode() == 200)
      assert(one.body().contains(""""total_events":1"""))

      assert(get("/api/v1/replicators/ghost").statusCode() == 404)

      val paused = post("/api/v1/replicators/web1/pause")
      assert(paused.statusCode() == 200)
      assert(paused.body().contains(""""state":"paused""""))

      // illegal transition surfaces as 409, not a silent no-op
      val badPause = post("/api/v1/replicators/web1/pause")
      assert(badPause.statusCode() == 409)

      val resumed = post("/api/v1/replicators/web1/resume")
      assert(resumed.body().contains(""""state":"streaming""""))

      val stopped = post("/api/v1/replicators/web1/stop")
      assert(stopped.body().contains(""""state":"stopped""""))

      assert(post("/api/v1/replicators/web1/flip").statusCode() == 400)
    } finally {
      server.stop()
      if (repl.fsm.state != FsmState.Stopped) repl.stop()
    }
  }
}
