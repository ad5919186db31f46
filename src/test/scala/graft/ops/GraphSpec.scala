package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the fixed point: 0.5 each at any iteration") {
    val pr = ranks(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(math.abs(pr(1L) - 0.5) < 1e-12)
    assert(math.abs(pr(2L) - 0.5) < 1e-12)
  }

  test("dangling sink: hand-computed one iteration (mass conserved)") {
    // a -> b; b dangles. pr0 = (.5, .5); dangling mass .5 spreads /2
    // pr1(a) = .15/2 + .85*(0 + .25) = .2875
    // pr1(b) = .15/2 + .85*(.5 + .25) = .7125
    val pr = ranks(Seq((1L, 2L)), iters = 1)
    assert(math.abs(pr(1L) - 0.2875) < 1e-12)
    assert(math.abs(pr(2L) - 0.7125) < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("star: the hub out-ranks every leaf and total mass stays 1") {
    val leaves = (2L to 9L)
    val pr = ranks(leaves.map(_ -> 1L), iters = 5)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    leaves.foreach(l => assert(pr(1L) > pr(l)))
    // symmetric leaves tie exactly
    assert(leaves.map(pr).toSet.size == 1)
  }

  test("rank flows through chains: closer-to-sink accumulates more") {
    val pr = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L)), iters = 10)
    assert(pr(4L) > pr(3L) && pr(3L) > pr(2L) && pr(2L) > pr(1L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("checkpointed and un-checkpointed schedules agree") {
    val edges = (0L until 200L).map(i => (i, (i * 7 + 3) % 50))
    val a = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 6, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 6, checkpointEvery = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }
}
