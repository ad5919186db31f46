package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Link-graph analytics for corpus curation. PageRank is the classic
  * source-quality signal (rank hosts by who links to them — the
  * CommonCrawl-style prior that feeds domain mixture weights, q69) and
  * the repo's representative ITERATIVE graph operator next to the
  * one-shot pointer-jumping of connected components (ops/Dedup.scala).
  *
  * 100 TB shape: the edge list is the big frame and it is touched once
  * per iteration by an equi-join on `src` — edges repartition by src
  * ONCE up front (and pin), so every iteration reuses the same
  * partitioning and only the node-sized rank frame shuffles. The
  * transpose aggregation (sum contributions by dst) is the unavoidable
  * per-iteration shuffle, sized by nodes, not edges, after partial
  * aggregation. Rank lineage is cut with an eager localCheckpoint every
  * `checkpointEvery` iterations — the standard guard against the
  * exponential-plan blowup of iterative DataFrame algorithms. Dangling
  * mass (nodes with no out-edges) redistributes uniformly, so total
  * rank stays exactly 1 and fixed-iteration results are comparable
  * across engines.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * @param edges  one row per directed edge; multi-edges count once if
    *               the caller dedups (this operator takes the frame
    *               as-is so weighted variants stay possible)
    * @return (node, pr) for every node appearing as src or dst;
    *         sum(pr) == 1 up to float addition
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      checkpointEvery: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      "pageRank: iterations must be in [1,100]")
    require(damping > 0 && damping < 1, "pageRank: damping must be in (0,1)")

    // edge frame partitioned by src once; every iteration's rank join
    // reuses this layout
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .localCheckpoint(true)
    // node count as a 1-row broadcast frame — in-plan, no driver count
    val meta = nodes.agg(count(lit(1)).cast("double").as("n"))
      .localCheckpoint(true)

    var pr = nodes.crossJoin(broadcast(meta))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
    var i = 1
    while (i <= iterations) {
      val contrib = e.join(pr, e("src") === pr("node"))
        .join(deg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("outdeg")).as("c"))
      val dangling = pr.join(deg, pr("node") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(meta))
        .select(col("node"),
          ((lit(1.0) - damping) / col("n") +
            lit(damping) * (coalesce(col("c"), lit(0.0)) +
              col("dm") / col("n"))).as("pr"))
      pr = if (i % checkpointEvery == 0 && i < iterations)
        next.localCheckpoint(true) else next
      i += 1
    }
    pr
  }
}
