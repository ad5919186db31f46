package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time a subset of SparkEntry queries (Bench methodology: warmup pass,
  * then two timed passes, min). For iterating on one query's plan
  * without paying for the whole bench.
  *
  * {{{ sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 q62_dedup_clusters" }}}
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName>...")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val picked = names.map(n => n -> SparkEntry.queries.getOrElse(n,
      throw new IllegalArgumentException(s"unknown query $n")))
    picked.foreach { case (_, fn) => fn(spark, sfDir).count() } // warmup
    System.gc()
    def pass(): Map[String, Double] = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = pass(); System.gc(); val p2 = pass()
    picked.foreach { case (name, _) =>
      println(f"[time] $name%-28s ${math.min(p1(name), p2(name))}%.3f s")
    }
    spark.stop()
  }
}
