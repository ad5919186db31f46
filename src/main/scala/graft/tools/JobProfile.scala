package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Count scheduler work per query: jobs, stages, tasks and summed task
  * time. The iterative operators' local cost is stage-floor × count —
  * this tool measures the count directly (the SQL plan alone cannot:
  * each localCheckpoint / convergence probe is its own job), so a
  * "fewer jobs per iteration" claim is checkable as an event-count
  * diff, not a hunch.
  *
  * Methodology: one untimed warm run (JIT + footers), then ONE counted
  * run — scheduler event counts are deterministic for a fixed plan, so
  * min-of-two is unnecessary; wall time is reported for orientation
  * only.
  *
  * {{{ sbt "runMain graft.tools.JobProfile /root/testdata/sf0.1 q115_pagerank" }}}
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <queryName>...")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-jobprofile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
    })
    // listener delivery is async: wait for the bus to go quiescent
    // before reading the counters (the PlanAudit device)
    def drain(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = (-1, -1)
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        val now = (jobs.get(), stages.get())
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(100)
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      fn(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      drain()
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[jobs] $name%-28s jobs=${jobs.get()}%-4d " +
        f"stages=${stages.get()}%-4d tasks=${tasks.get()}%-5d " +
        f"taskTime=${taskMs.get() / 1000.0}%8.2f s  wall=$wall%7.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
