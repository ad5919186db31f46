package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pointPairs(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
      binWidth: Long): Set[(Long, Long)] = {
    val pts = points.toDF("p_id", "p")
    val iv = ivs.toDF("iv_id", "s", "e")
    RangeJoin.pointInInterval(pts, "p", iv, "s", "e", binWidth)
      .select("iv_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def naivePoint(points: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for ((ivId, s, e) <- ivs; (pId, p) <- points if p >= s && p <= e)
      yield (ivId, pId)).toSet

  test("hand case: inclusive boundaries on both ends") {
    val ivs = Seq((1L, 10L, 20L))
    val pts = Seq((1L, 9L), (2L, 10L), (3L, 15L), (4L, 20L), (5L, 21L))
    assert(pointPairs(pts, ivs, 7L) == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("each qualifying pair emitted exactly once (no bin dedup needed)") {
    // interval spans many bins; the point sits mid-span
    val ivs = Seq((1L, 0L, 100L))
    val pts = Seq((1L, 50L))
    val out = RangeJoin.pointInInterval(
      pts.toDF("p_id", "p"), "p", ivs.toDF("iv_id", "s", "e"), "s", "e", 5L)
    assert(out.count() == 1L)
  }

  test("property: point-in-interval equals the naive theta join") {
    val rnd = new Random(7)
    for (trial <- 0 until 5) {
      val ivs = (0 until 60).map { i =>
        val s = rnd.nextInt(1000).toLong - 500
        (i.toLong, s, s + rnd.nextInt(80))
      }
      val pts = (0 until 200).map(i => (i.toLong, rnd.nextInt(1200).toLong - 600))
      for (w <- Seq(1L, 13L, 64L, 1000L))
        assert(pointPairs(pts, ivs, w) == naivePoint(pts, ivs),
          s"trial=$trial binWidth=$w")
    }
  }

  private def overlapPairs(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
      binWidth: Long): Set[(Long, Long)] = {
    val ad = a.toDF("a_id", "a_s", "a_e")
    val bd = b.toDF("b_id", "b_s", "b_e")
    RangeJoin.intervalOverlap(ad, "a_s", "a_e", bd, "b_s", "b_e", binWidth)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def naiveOverlap(a: Seq[(Long, Long, Long)],
      b: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for ((ai, as_, ae) <- a; (bi, bs, be) <- b if as_ <= be && bs <= ae)
      yield (ai, bi)).toSet

  test("hand case: touching endpoints overlap; disjoint do not") {
    val a = Seq((1L, 0L, 10L))
    val b = Seq((1L, 10L, 20L), (2L, 11L, 20L), (3L, -5L, 0L))
    assert(overlapPairs(a, b, 4L) == Set((1L, 1L), (1L, 3L)))
  }

  test("overlap pairs emitted exactly once across multi-bin covers") {
    val a = Seq((1L, 0L, 100L))
    val b = Seq((1L, 40L, 60L))
    val out = RangeJoin.intervalOverlap(
      a.toDF("a_id", "a_s", "a_e"), "a_s", "a_e",
      b.toDF("b_id", "b_s", "b_e"), "b_s", "b_e", 7L)
    assert(out.count() == 1L)
  }

  test("property: interval overlap equals the naive theta join") {
    val rnd = new Random(11)
    for (trial <- 0 until 5) {
      def gen(n: Int) = (0 until n).map { i =>
        val s = rnd.nextInt(800).toLong - 400
        (i.toLong, s, s + rnd.nextInt(60))
      }
      val a = gen(50)
      val b = gen(70)
      for (w <- Seq(1L, 17L, 128L))
        assert(overlapPairs(a, b, w) == naiveOverlap(a, b),
          s"trial=$trial binWidth=$w")
    }
  }

  test("empty intervals (start > end) match nothing in either variant") {
    // point: [20, 10] is an empty set even though 15 sits "between" ends
    assert(pointPairs(Seq((1L, 15L)), Seq((1L, 20L, 10L)), 4L) == Set())
    // overlap: [10, 5] must not pair with [0, 20] despite the naive
    // predicate (aS <= bE && bS <= aE) holding
    assert(overlapPairs(Seq((1L, 10L, 5L)), Seq((1L, 0L, 20L)), 4L) == Set())
    assert(overlapPairs(Seq((1L, 0L, 20L)), Seq((1L, 10L, 5L)), 4L) == Set())
  }

  test("plan shape: bin equi-join, not a nested-loop cross product") {
    val ivs = (0 until 100).map(i => (i.toLong, i * 10L, i * 10L + 25L))
    val pts = (0 until 500).map(i => (i.toLong, i * 2L))
    val out = RangeJoin.pointInInterval(
      pts.toDF("p_id", "p"), "p", ivs.toDF("iv_id", "s", "e"), "s", "e", 25L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
