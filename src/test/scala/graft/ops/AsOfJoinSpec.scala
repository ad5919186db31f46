package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left time, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 55.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:06:00")), // -> 101.0 (10:05)
      (11L, 1L, ts("2024-01-01 10:05:00")), // inclusive -> 101.0
      (12L, 1L, ts("2024-01-01 09:59:00")), // before any quote -> null
      (13L, 2L, ts("2024-01-01 11:00:00")), // -> 55.0
      (14L, 3L, ts("2024-01-01 10:00:00")) // unknown key -> null
    ).toDF("trade_id", "sym", "tts")

    val got = AsOfJoin.asOf(trades, "sym", "tts", quotes, "sym", "qts", Seq("price"))
      .orderBy("trade_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    assert(got(10L).contains(101.0))
    assert(got(11L).contains(101.0), "as-of is inclusive at equal timestamps")
    assert(got(12L).isEmpty, "no quote before the trade")
    assert(got(13L).contains(55.0))
    assert(got(14L).isEmpty, "unmatched key stays null")
  }

  test("multiple payload columns travel together") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 5L, "x"))
      .toDF("k", "t", "v1", "v2")
    val left = Seq((1L, ts("2024-01-02 00:00:00")))
      .toDF("k", "lt")
    val r = AsOfJoin.asOf(left, "k", "lt", right, "k", "t", Seq("v1", "v2")).head
    assert(r.getLong(2) == 5L && r.getString(3) == "x")
  }

  test("plan has exactly one shuffle (no range explosion)") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 5L)).toDF("k", "t", "v")
    val left = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("k", "lt")
    val plan = AsOfJoin.asOf(left, "k", "lt", right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not plan a nested loop:\n$plan")
    assert(plan.contains("Window"), "expected the window-based composition")
  }
}
