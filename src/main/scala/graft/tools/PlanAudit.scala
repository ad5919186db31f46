package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Physical-plan audit over every SparkEntry query: counts the markers
  * that decide 100 TB behavior — shuffles (Exchange), broadcast joins,
  * cartesian/nested-loop joins, parquet filter pushdown, and
  * whole-stage-codegen coverage — so a plan regression (lost broadcast,
  * new shuffle, unpushed filter) is visible as a diff, not a hunch.
  *
  * Coverage is via a [[QueryExecutionListener]], not the returned
  * frame's plan alone: driver-action operators (the Newton/bootstrap/
  * grid families) do their real work in INTERNAL actions and return a
  * small literal frame — auditing only the returned plan read them as
  * exch=0 wscg=0 (the r17 q211/q216/q310 blind spot). The listener
  * captures every executed plan during the query (each internal
  * collect/head/checkpoint action included), and the per-query row
  * aggregates across all of them; `plans=` says how many executions the
  * row summarizes. Listener delivery is asynchronous (the shared
  * listener bus), so each query waits for the capture count to go
  * quiescent before reading it.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir] [queryName...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = graft.GraftSession.create("local[4]", Some(8))
    spark.sparkContext.setLogLevel("ERROR")

    val captured = new ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString())
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    // bounded quiescence wait: the listener bus drains asynchronously;
    // consider the capture complete once its size holds still
    def awaitQuiescent(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        val now = captured.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(100)
      }
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        captured.clear()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE on THIS df (count() would plan a different query)
        awaitQuiescent()
        import scala.jdk.CollectionConverters._
        val plans = captured.asScala.toVector
        def count(marker: String) = plans.map(p =>
          marker.r.findAllIn(p).size).sum
        val exchanges = count("Exchange (hashpartitioning|rangepartitioning|SinglePartition)")
        val bhj = count("BroadcastHashJoin")
        val bnlj = count("BroadcastNestedLoopJoin")
        val cartesian = count("CartesianProduct")
        val smj = count("SortMergeJoin")
        val pushed = count("PushedFilters: \\[[^\\]]*Is|PushedFilters: \\[[^\\]]*(Less|Greater|Equal)")
        // codegen stages render as "*(n) Op" prefixes; distinct ids are
        // per plan (they restart at 1 each execution), so sum per-plan
        val codegen = plans.map(p =>
          "\\*\\(\\d+\\)".r.findAllIn(p).toSet.size).sum
        println(f"$name%-28s exch=$exchanges%-3d bhj=$bhj%-2d smj=$smj%-2d " +
          f"bnlj=$bnlj%-2d cart=$cartesian%-2d pushedScan=$pushed%-2d " +
          f"wscg=$codegen%-3d plans=${plans.size}%-3d")
      } catch {
        case e: Exception =>
          println(f"$name%-28s AUDIT FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
