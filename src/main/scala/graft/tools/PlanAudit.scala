package graft.tools

/** Physical-plan audit over every SparkEntry query: counts the markers
  * that decide 100 TB behavior — shuffles (Exchange), broadcast joins,
  * cartesian/nested-loop joins, parquet filter pushdown, and
  * whole-stage-codegen coverage — so a plan regression (lost broadcast,
  * new shuffle, unpushed filter) is visible as a diff, not a hunch.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir] [queryName...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = graft.GraftSession.create("local[4]", Some(8))
    spark.sparkContext.setLogLevel("ERROR")

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE on THIS df (count() would plan a different query)
        val plan = df.queryExecution.executedPlan.toString()
        def count(marker: String) = marker.r.findAllIn(plan).size
        val exchanges = count("Exchange (hashpartitioning|rangepartitioning|SinglePartition)")
        val bhj = count("BroadcastHashJoin")
        val bnlj = count("BroadcastNestedLoopJoin")
        val cartesian = count("CartesianProduct")
        val smj = count("SortMergeJoin")
        val pushed = count("PushedFilters: \\[[^\\]]*Is|PushedFilters: \\[[^\\]]*(Less|Greater|Equal)")
        // codegen stages render as "*(n) Op" prefixes in the plan string
        val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        println(f"$name%-28s exch=$exchanges%-3d bhj=$bhj%-2d smj=$smj%-2d " +
          f"bnlj=$bnlj%-2d cart=$cartesian%-2d pushedScan=$pushed%-2d wscg=$codegen%-2d")
      } catch {
        case e: Exception =>
          println(f"$name%-28s AUDIT FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
