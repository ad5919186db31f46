package graft.ops

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def day(d: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d $hour%02d:00:00")

  private def runFunnel(rows: Seq[(Long, String, Timestamp)]) =
    Events.funnel(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))

  test("ordering is enforced: a purchase BEFORE the click does not convert") {
    val rows = Seq(
      // u1 completes the funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // u2 purchases before clicking: steps 1-2 only
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(5)),
      // u3 views only
      (3L, "view", ts(3)),
      // u4 clicks and purchases but never views: counts nowhere
      (4L, "click", ts(1)), (4L, "purchase", ts(2)))
    val out = runFunnel(rows)
    assert(out.toSeq == Seq(
      (1, "view", 3L, 1.0, 1.0),
      (2, "click", 2L, round6(2.0 / 3), round6(2.0 / 3)),
      (3, "purchase", 1L, round6(1.0 / 3), 0.5)))
  }

  test("strictly-after: same-timestamp step does not complete the next stage") {
    val rows = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(0)), // tie: click NOT after view
      (2L, "view", ts(0)), (2L, "click", ts(1)))
    val out = runFunnel(rows)
    assert(out(0)._3 == 2L, "both users viewed")
    assert(out(1)._3 == 1L, "only u2's click is strictly after its view")
  }

  test("earliest-completion: a later re-view cannot resurrect an early click") {
    // u1: click at t1 sits after the FIRST view (t0) — converts, even
    // though another view happens later at t9
    val rows = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "view", ts(9)),
      (1L, "purchase", ts(2)))
    val out = runFunnel(rows)
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 1L))
  }

  test("empty funnel head yields all-zero counts and 0.0 percentages") {
    val rows = Seq((1L, "click", ts(1)), (2L, "purchase", ts(2)))
    val out = runFunnel(rows)
    assert(out.toSeq == Seq(
      (1, "view", 0L, 0.0, 0.0),
      (2, "click", 0L, 0.0, 0.0),
      (3, "purchase", 0L, 0.0, 0.0)))
  }

  private def round6(x: Double) = math.rint(x * 1e6) / 1e6

  test("cohort retention: hand-computed two-cohort matrix") {
    // week of 2024-01-01 (Mon) and week of 2024-01-08
    val rows = Seq(
      // cohort A: u1, u2 first seen in week 1
      (1L, day(1)), (1L, day(9)),            // u1 active weeks 0 and 1
      (2L, day(3)), (2L, day(16)),           // u2 active weeks 0 and 2
      // cohort B: u3 first seen in week 2
      (3L, day(10)), (3L, day(17)))          // active weeks 0 and 1
    val out = Events.cohortRetention(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString.substring(0, 10), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 2, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 1, 1L, 1L, 1.0)))
  }

  test("markov transitions: hand-computed matrix with terminal state") {
    val rows = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(1)), (1L, 3L, "view", ts(2)),
      (2L, 4L, "view", ts(0)), (2L, 5L, "view", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.markovTransitions(rows, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // u1: view->click, click->view, view->__end; u2: view->view, view->__end
    assert(out.toSeq == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "__end", 2L, 0.5),
      ("view", "click", 1L, 0.25),
      ("view", "view", 1L, 0.25)))
  }

  test("markov transitions: same-timestamp ties break on the tie column") {
    val rows = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(0)), (1L, 12L, "c", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.markovTransitions(rows, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c"), ("c", "__end")))
  }

  test("decayed score: half-life arithmetic and partition invariance") {
    // events 0 and 7 days before the max: weights 1.0 and 0.5
    val rows = Seq(
      (1L, day(1), 10.0), (1L, day(8), 10.0), // 0.5*10 + 1*10 = 15
      (2L, day(8), 4.0))                      // 1*4 = 4
      .toDF("user_id", "ts", "value")
    def run(parts: Int) =
      Events.decayedScore(rows.repartition(parts), "user_id", "ts", "value", 7.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run(1) == Seq((1L, 15.0, 2L), (2L, 4.0, 1L)))
    assert(run(7) == run(1))
  }

  test("ab test: counts, rates, and z against a hand computation") {
    // pick users on both sides of the md5 split deterministically
    def variant(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes).map("%02x".format(_)).mkString
      if (h.charAt(0) < '8') "A" else "B"
    }
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      // every user views; users divisible by 3 purchase
      Seq((u, "view")) ++ (if (u % 3 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val out = Events.abTest(rows, "user_id",
      col("event_type") === "purchase").collect()(0)
    val nA = users.count(variant(_) == "A")
    val cA = users.count(u => variant(u) == "A" && u % 3 == 0)
    val nB = users.size - nA
    val cB = users.count(_ % 3 == 0) - cA
    assert((out.getLong(0), out.getLong(1), out.getLong(3), out.getLong(4)) ==
      ((nA.toLong, cA.toLong, nB.toLong, cB.toLong)))
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (cA.toDouble / nA - cB.toDouble / nB) /
      math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(out.getDouble(6) - z) < 1e-6)
  }

  test("ab test: degenerate experiment (everyone converts) yields NULL z") {
    val rows = (1L to 20L).map(u => (u, "purchase")).toDF("user_id", "event_type")
    val out = Events.abTest(rows, "user_id",
      col("event_type") === "purchase").collect()(0)
    assert(out.isNullAt(6))
    assert(out.getDouble(2) == 1.0 && out.getDouble(5) == 1.0)
  }

  test("funnel latencies: hand-computed quantiles over completing users") {
    val rows = Seq(
      // u1: view->click 60s, click->purchase 240s
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(5)),
      // u2: view->click 180s, no purchase
      (2L, "view", ts(0)), (2L, "click", ts(3)),
      // u3: view only — contributes to no latency
      (3L, "view", ts(0)))
    val out = Events.funnelLatencies(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
        Seq(0.5))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, "view", "click", 0.5, 120.0), // median of {60, 180}
      (2, "click", "purchase", 0.5, 240.0)))
  }

  test("rolling active users: silent days appear, window counts distinct") {
    val rows = Seq(
      (1L, day(1)), (2L, day(1)),   // day 1: u1, u2
      (1L, day(2)),                 // day 2: u1
      // day 3 silent
      (3L, day(4)), (1L, day(4)))   // day 4: u3, u1
      .toDF("user_id", "ts")
    val out = Events.rollingActiveUsers(rows, "user_id", "ts", 3)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 2L),           // window {1}: u1,u2
      ("2024-01-02", 1L, 2L),           // window {1,2}: u1,u2
      ("2024-01-03", 0L, 2L),           // window {1,2,3}: u1,u2
      ("2024-01-04", 2L, 2L)))          // window {2,3,4}: u1,u3
  }

  test("churn labels: post-window silence flags churned, late users excluded") {
    // max ts = day 20; horizon 7 -> cutoff = day 13
    val rows = Seq(
      (1L, day(1)), (1L, day(10)), (1L, day(18)), // active after cutoff: not churned
      (2L, day(2)), (2L, day(11)),                // silent after cutoff: churned
      (3L, day(15)), (3L, day(20)))               // first seen post-cutoff: excluded
      .toDF("user_id", "ts")
    val out = Events.churnLabels(rows, "user_id", "ts", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3, false),  // last obs day 10, cutoff day 13
      (2L, 2L, 2, true)))
  }

  test("cohort retention: multiple events in one week count once") {
    val rows = Seq(
      (1L, day(1, 1)), (1L, day(2, 2)), (1L, day(4)), // all week 0
      (1L, day(8)))
    val out = Events.cohortRetention(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((0, 1L), (1, 1L)))
  }

  test("KM survival: hand-computed curve with censoring") {
    // all anchor at day 1 00:00; unit = 1 day
    // u1 converts day 2 (t=1), u2 converts day 2 (t=1), u3 converts
    // day 4 (t=3), u4 never converts -> censored at max ts = day 5 (t=4)
    // KM: t=1: n=4 d=2 -> S=0.5; t=3: n=2 d=1 -> S=0.25; t=4: censored
    val rows = Seq(
      (1L, "signup", day(1)), (1L, "purchase", day(2)),
      (2L, "signup", day(1)), (2L, "purchase", day(2)),
      (3L, "signup", day(1)), (3L, "purchase", day(4)),
      (4L, "signup", day(1)), (4L, "view", day(5)))
      .toDF("user_id", "event_type", "ts")
    val out = Events.timeToEventSurvival(rows, "user_id", "ts",
        "event_type", "signup", "purchase", unitMillis = 86400000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, 0L, 0.5),
      (3L, 2L, 1L, 0L, 0.25),
      (4L, 1L, 0L, 1L, 0.25)))
  }

  test("KM survival: pre-anchor conversions don't count; d=n pins 0") {
    // u1's purchase BEFORE signup is ignored; the one after counts.
    // u2 converts too -> last time point has d = n -> survival exactly 0
    val rows = Seq(
      (1L, "purchase", day(1)), (1L, "signup", day(2)),
      (1L, "purchase", day(4)),                          // t=2
      (2L, "signup", day(2)), (2L, "purchase", day(3)))
      .toDF("user_id", "event_type", "ts")
    val out = Events.timeToEventSurvival(rows, "user_id", "ts",
        "event_type", "signup", "purchase", unitMillis = 86400000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 1L, 0.0)))
  }

  test("anomalous days: a spike day flags against its own key only") {
    // key A: 9 quiet days of 10 + one day of 100; key B constant
    val rows =
      (1 to 9).map(d => ("A", day(d), 10)) ++ Seq(("A", day(10), 100)) ++
        (1 to 10).map(d => ("B", day(d), 7))
    val expanded = rows.flatMap { case (k, dy, n) =>
      Seq.fill(n)((k, dy)) }
    val out = Events.anomalousDays(expanded.toDF("k", "ts"), "k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), Option(r.get(5)).map(_ => r.getDouble(5)),
        r.getBoolean(6)))
    val aSpike = out.filter(t => t._1 == "A" && t._2 == 100L)
    // A: median 10, MAD 0 over {10x9,100}? deviations {0x9, 90} -> MAD 0
    // -> robust_z null, not flagged (documented degenerate)
    assert(aSpike.length == 1 && aSpike(0)._5.isEmpty && !aSpike(0)._6)
    assert(out.filter(_._1 == "B").forall(t => t._5.isEmpty && !t._6))
  }

  test("anomalous days: varying baseline yields a real MAD and a flag") {
    // counts 8..12 alternating (median 10, MAD 1) + one 30-count day
    val counts = Seq(8, 12, 9, 11, 10, 8, 12, 9, 11, 30)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(("A", day(i + 1))) }
    val out = Events.anomalousDays(rows.toDF("k", "ts"), "k", "ts")
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))
    val spike = out.filter(_._1 == 30L).head
    // median of {8,8,9,9,10,11,11,12,12,30} = 10.5; deviations
    // {2.5,2.5,1.5,1.5,0.5,0.5,0.5,1.5,1.5,19.5} -> MAD 1.5
    // z = .6745*19.5/1.5 = 8.7685
    assert(spike._2 == 10.5 && spike._3 == 1.5)
    assert(math.abs(spike._4 - 0.6745 * 19.5 / 1.5) < 1e-6 && spike._5)
    assert(out.count(_._5) == 1)
  }

  test("seasonality: weekday index against a hand-built fortnight") {
    // key A: Mondays get 9 events, other days 3, across 2 weeks
    // Jan 2024: the 1st is a Monday
    val rows = (1 to 14).flatMap { d =>
      val n = if ((d - 1) % 7 == 0) 9 else 3
      Seq.fill(n)(("A", day(d)))
    }
    val out = Events.seasonalityProfile(rows.toDF("k", "ts"), "k", "ts")
      .collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // overall mean = (2*9 + 12*3)/14 = 54/14; Monday dow = 2 (1=Sun)
    val overall = 54.0 / 14
    assert(out(2)._1 == 2L && out(2)._2 == 9.0)
    assert(math.abs(out(2)._3 - math.rint(9.0 / overall * 1e6) / 1e6) < 1e-9)
    assert(out(3)._2 == 3.0) // Tuesdays at baseline 3
    assert(out.size == 7)
  }

  test("cusum: a planted level shift is found at the shift day") {
    // key A: 10 days at 5, then 10 days at 15 -> mean 10; CUSUM dips
    // to -50 at day 10 (the true changepoint), recovers to 0
    val rows = (1 to 20).flatMap { d =>
      Seq.fill(if (d <= 10) 5 else 15)(("A", day(d)))
    }
    val out = Events.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts")
      .collect()(0)
    assert(out.getDate(1).toString == "2024-01-10")
    assert(out.getDouble(2) == 50.0)
    assert(out.getDouble(3) == 5.0 && out.getDouble(4) == 15.0)
  }

  test("cusum: tie-break to earliest day; single-day series nulls mean_after") {
    val rows = (1 to 5).flatMap(d => Seq.fill(d)(("A", day(d))))
    val out = Events.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts")
      .collect()(0)
    // counts 1..5, mean 3, cusum: -2,-3,-3,-2,0 -> peak |-3| ties at
    // days 2 and 3; earliest wins
    assert(out.getDate(1).toString == "2024-01-02")
    assert(out.getDouble(2) == 3.0)
    val single = Seq.fill(4)(("B", day(1)))
    val out2 = Events.cusumChangepoint(single.toDF("k", "ts"), "k", "ts")
      .collect()(0)
    assert(out2.getDate(1).toString == "2024-01-01")
    assert(out2.getDouble(2) == 0.0 && out2.isNullAt(4))
  }

  test("theil-sen: robust to the outlier that wrecks OLS") {
    // key A: perfect slope 2 line over 9 days plus one wild day
    // (y = 500 at day 10): median pairwise slope stays 2
    val clean = (1 to 9).flatMap(d => Seq.fill(2 * d)(("A", day(d))))
    val wild = Seq.fill(500)(("A", day(10)))
    val out = Events.theilSenTrend((clean ++ wild).toDF("k", "ts"),
      "k", "ts").collect()(0)
    assert(out.getLong(1) == 10L)
    assert(out.getDouble(2) == 2.0, s"slope ${out.getDouble(2)}")
    // x counts from the first day (x = d - 1), so clean points are
    // y = 2x + 2: residual 2 everywhere clean, 482 wild -> median 2
    assert(out.getDouble(3) == 2.0)
  }

  test("theil-sen: single-day keys are omitted") {
    val rows = Seq(("A", day(1)), ("A", day(2)), ("B", day(1)))
    val out = Events.theilSenTrend(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("A"))
  }

  test("attribution: first/last touch with lookback and direct bucket") {
    // u1: view@10:01, click@10:05, purchase@10:10 -> first=view last=click
    // u2: purchase@10:10 with no touch -> (direct)
    // u3: view@10:01, purchase far outside lookback -> (direct)
    val rows = Seq(
      (1L, 101L, "view", ts(1)), (1L, 102L, "click", ts(5)),
      (1L, 103L, "purchase", ts(10)),
      (2L, 201L, "purchase", ts(10)),
      (3L, 301L, "view", ts(1)), (3L, 302L, "purchase", ts(59)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.attribution(rows, "user_id", "event_type", "ts",
        "event_id", col("event_type") === "purchase",
        lookbackMillis = 30L * 60000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("(direct)", 2L, 2L), ("click", 0L, 1L), ("view", 1L, 0L)))
  }

  test("funnelWithin: a step outside the window doesn't count") {
    // u1 clicks 10 min after view (in window), u2 clicks 40 min after
    // (outside a 30-min window), u3 completes all three in time
    val rows = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)),
      (2L, "view", ts(0)), (2L, "click", ts(40)),
      (3L, "view", ts(0)), (3L, "click", ts(5)), (3L, "purchase", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnelWithin(rows, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinMillis = 30L * 60000L)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq == Seq((1, 3L), (2, 2L), (3, 1L)))
    // sanity: the unconstrained funnel counts u2's click
    val free = Events.funnel(rows, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(free.toSeq == Seq((1, 3L), (2, 3L), (3, 1L)))
  }

  test("topPaths: deterministic order inside paths, topK by count") {
    // two users share view>click>purchase; one diverges; path cut at 3
    val rows = Seq(
      (1L, 1L, "view", ts(1)), (1L, 2L, "click", ts(2)),
      (1L, 3L, "purchase", ts(3)), (1L, 4L, "error", ts(4)),
      (2L, 5L, "view", ts(1)), (2L, 6L, "click", ts(2)),
      (2L, 7L, "purchase", ts(3)),
      (3L, 8L, "signup", ts(1)), (3L, 9L, "view", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.topPaths(rows, "user_id", "event_type", "ts",
        "event_id", pathLen = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // u3's simultaneous events order by event_id: signup(8) then view(9)
    assert(out.toSeq == Seq(("view>click>purchase", 2L), ("signup>view", 1L)))
  }

  test("linear attribution: equal shares sum to the conversion count") {
    // conv A: touches view, click (1/2 each); conv B: view only (1);
    // conv C: no touch -> (direct) 1
    val rows = Seq(
      (1L, 11L, "view", ts(1)), (1L, 12L, "click", ts(2)),
      (1L, 13L, "purchase", ts(3)),
      (2L, 21L, "view", ts(1)), (2L, 22L, "purchase", ts(2)),
      (3L, 31L, "purchase", ts(5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.attributionLinear(rows, "user_id", "event_type",
        "ts", "event_id", col("event_type") === "purchase", 3600000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("(direct)", 1L, 1.0), ("click", 1L, 0.5), ("view", 2L, 1.5)))
    assert(out.map(_._3).sum == 3.0) // one credit per conversion, exact
  }

  test("coxPh: a planted 2x hazard recovers coef ~ ln 2") {
    // deterministic exponential grids: treated (x=1) hazard 2, control 1
    val n = 300
    def times(h: Double) = (1 to n).map(i =>
      -math.log(1.0 - (i - 0.5) / n) / h)
    val rows = times(2.0).map(t => (t, 1L, 1.0)) ++
      times(1.0).map(t => (t, 1L, 0.0))
    val df = rows.toDF("t", "e", "x")
    val r = Events.coxPh(df, "t", "e", Seq("x")).collect()(0)
    assert(r.getLong(2) == 600L && r.getLong(3) == 600L)
    assert(math.abs(r.getDouble(4) - math.log(2.0)) < 0.08,
      s"coef=${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 2.0) < 0.2) // hazard ratio ~ 2
    assert(r.getDouble(7) > 5.0)                 // clearly significant
  }

  test("coxPh: a null covariate reads ~zero and partition-invariant") {
    val rows = (1 to 200).map(i =>
      ((i % 37 + 1).toDouble, 1L, (i % 2).toDouble, (i % 5).toDouble))
    val df = rows.toDF("t", "e", "junk", "real")
    def run(parts: Int) =
      Events.coxPh(df.repartition(parts), "t", "e",
        Seq("junk", "real")).collect().map(_.toSeq).toSeq
    val a = run(1)
    assert(a == run(13)) // decimal-quantized end to end
    val junk = a.head
    assert(math.abs(junk(4).asInstanceOf[Double]) < 0.15)
  }

  test("coxPhStratified: one stratum is bit-identical to coxPh, " +
    "confounded strata recover the true effect") {
    val n = 300
    def times(h: Double, m: Int = n) = (1 to m).map(i =>
      -math.log(1.0 - (i - 0.5) / m) / h)
    // 1-stratum parity: partitioning the suffix windows by a constant
    // key moves nothing (decimal-quantized end to end) — the Newton
    // trajectory must be BIT-identical to coxPh's
    val flat = (times(2.0).map(t => (t, 1L, "all", 1.0)) ++
      times(1.0).map(t => (t, 1L, "all", 0.0))).toDF("t", "e", "s", "x")
    val strat1 = Events.coxPhStratified(flat, "t", "e", Seq("x"), "s")
      .collect()(0)
    val plain = Events.coxPh(flat, "t", "e", Seq("x")).collect()(0)
    assert(strat1.getLong(4) == 1L)
    assert((strat1.getDouble(5), strat1.getDouble(6), strat1.getDouble(7),
      strat1.getDouble(8)) == ((plain.getDouble(4), plain.getDouble(5),
      plain.getDouble(6), plain.getDouble(7))))
    // stratum-confounded treatment: s0 is a slow clinic (baseline 1,
    // 20% treated), s1 a fast one (baseline 20, 80% treated); within
    // EACH stratum the treated hazard is exactly 2x. The pooled fit
    // confounds clinic speed with treatment and overshoots ln 2 badly;
    // per-stratum risk sets remove the clinic baseline and recover it
    val rows =
      times(1.0, 160).map(t => (t, 1L, "s0", 0.0)) ++
        times(2.0, 40).map(t => (t, 1L, "s0", 1.0)) ++
        times(20.0, 40).map(t => (t, 1L, "s1", 0.0)) ++
        times(40.0, 160).map(t => (t, 1L, "s1", 1.0))
    val df = rows.toDF("t", "e", "s", "x")
    val strat = Events.coxPhStratified(df, "t", "e", Seq("x"), "s")
      .collect()(0)
    val pooled = Events.coxPh(df.select(col("t"), col("e"), col("x")),
      "t", "e", Seq("x")).collect()(0)
    assert(strat.getLong(4) == 2L)
    assert(math.abs(strat.getDouble(5) - math.log(2.0)) < 0.15,
      s"stratified coef=${strat.getDouble(5)}")
    assert(pooled.getDouble(4) - math.log(2.0) > 0.4,
      s"pooled coef=${pooled.getDouble(4)} not confounded as planted")
    // partition invariance (decimal-quantized end to end)
    def run(parts: Int) = Events.coxPhStratified(df.repartition(parts),
      "t", "e", Seq("x"), "s").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
    // guards
    intercept[IllegalArgumentException] {
      Events.coxPhStratified(df, "t", "e", Seq("s", "x"), "s")
    }
    intercept[IllegalArgumentException] {
      Events.coxPhStratified(df, "t", "e", Seq.empty, "s")
    }
  }

  test("coxPhTest: planted time-varying effect flagged, proportional " +
    "fixture passes") {
    // proportional: exact exponential grids, hazard ratio 2 at every
    // time — Schoenfeld residuals are trendless
    val n = 300
    def times(h: Double) = (1 to n).map(i =>
      -math.log(1.0 - (i - 0.5) / n) / h)
    val prop = (times(2.0).map(t => (t, 1L, 1.0)) ++
      times(1.0).map(t => (t, 1L, 0.0))).toDF("t", "e", "x")
    val rp = Events.coxPhTest(prop, "t", "e", Seq("x")).collect()(0)
    assert(!rp.isNullAt(6) && math.abs(rp.getDouble(6)) < 2.0,
      s"proportional fixture flagged: $rp")
    // time-varying with OVERLAP (separation would diverge the fit and
    // flatten the residuals): treated deaths on the sqrt grid are
    // LATE-loaded (t = 100·sqrt(u) exceeds the uniform grid), so the
    // treated hazard RISES relative to control — early deaths skew
    // x=0, late ones x=1, a positive residual-vs-rank trend
    val tv = ((1 to 200).map(i =>
        (100.0 * math.sqrt((i - 0.5) / 200.0), 1L, 1.0)) ++
      (1 to 200).map(i =>
        (100.0 * (i - 0.5) / 200.0, 1L, 0.0))).toDF("t", "e", "x")
    val rt = Events.coxPhTest(tv, "t", "e", Seq("x")).collect()(0)
    assert(!rt.isNullAt(6) && math.abs(rt.getDouble(6)) > 2.0,
      s"time-varying effect not flagged: $rt")
    assert(rt.getDouble(5) > 0.0, s"trend sign: $rt")
    // coef matches coxPh's fit (same base, same Newton trajectory)
    val fit = Events.coxPh(prop, "t", "e", Seq("x")).collect()(0)
    assert(rp.getDouble(3) == fit.getDouble(4), s"$rp vs $fit")
    // partition invariance (decimal-quantized end to end)
    def run(parts: Int) = Events.coxPhTest(prop.repartition(parts),
      "t", "e", Seq("x")).collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
    intercept[IllegalArgumentException] {
      Events.coxPhTest(prop, "t", "e", Seq.empty)
    }
  }

  test("burstiness: constant traffic reads fano 0, a burst reads huge") {
    // span days 1..10; A: 5/day steady, B: all 50 on day 1
    val rows = (1 to 10).flatMap(d => Seq.fill(5)(("A", day(d)))) ++
      Seq.fill(50)(("B", day(1)))
    val out = Events.burstiness(rows.toDF("k", "ts"), "k", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(5),
          r.getBoolean(6))).toMap
    assert(out("A") == (10L, 5.0, 0.0, false))
    // B: mean 5, var = ((50-5)^2 + 9*25)/10 = 225 -> fano 45
    assert(out("B")._2 == 5.0 && out("B")._3 == 45.0 && out("B")._4)
  }

  test("eventStudy: pre/post means with zero-days free via the sums") {
    // key A: 14 events before (1/day), 28 after (2/day); key B only
    // before -> post 0, pct -1
    val rows = (1 to 14).map(d => ("A", day(d))) ++
      (15 to 28).flatMap(d => Seq(("A", day(d)), ("A", day(d)))) ++
      (1 to 14).map(d => ("B", day(d)))
    val out = Events.eventStudy(rows.toDF("k", "ts"), "k", "ts",
        interventionDay = "2024-01-15", windowDays = 14)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(out("A") == (1.0, 2.0, 1.0))   // +100% lift
    assert(out("B") == (1.0, 0.0, -1.0))  // vanished
  }

  test("retentionHalfLife: a planted geometric decay recovers its rate") {
    // one cohort of 64 users; user u stays active for floor(log2-ish)
    // weeks: retention halves weekly -> slope ln(1/2), half-life 1
    val rows = (1 to 64).flatMap { u =>
      val weeks = (0 to 3).takeWhile(w => u <= 64 / (1 << w))
      weeks.map(w => (u.toLong, day(w * 7 + 1)))
    }.toDF("user_id", "ts")
    val r = Events.retentionHalfLife(rows, "user_id", "ts").collect()(0)
    assert(math.abs(r.getDouble(1) - math.log(0.5)) < 1e-6)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6) // one-week half-life
    assert(r.getDouble(3) > 0.999)                // exact geometric: r2~1
  }

  test("sessionizeBatch: gaps split, ties order by id, stats per session") {
    // u1: events at 0 and 10 min (one session), then 50 min (new);
    // u2: one event
    val rows = Seq(
      (1L, 11L, ts(0)), (1L, 12L, ts(10)), (1L, 13L, ts(50)),
      (2L, 21L, ts(5)))
      .toDF("user_id", "event_id", "ts")
    val out = Events.sessionizeBatch(rows, "user_id", "ts", "event_id",
        gapMillis = 30L * 60000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 600000L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("cohortLtv: spine, horizon cap, and per-user accumulation") {
    // week1 cohort: u1 (buys 10 in wk1, 20 in wk2), u2 (never buys);
    // week2 cohort: u3 buys 5. day(1)=Mon 2024-01-01, day(8)=next week
    val rows = Seq(
      (1L, day(1), "purchase", 10.0), (1L, day(9), "purchase", 20.0),
      (2L, day(2), "view", 0.0),
      (3L, day(8), "purchase", 5.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Events.cohortLtv(rows, "user_id", "ts", "value",
        col("event_type") === "purchase", maxWeeks = 12)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // cohort 1 (2 users): offset 0 rev 10 -> 5/user; offset 1 rev 20
    // -> cumulative 15/user. cohort 2 (1 user): offset 0 only (horizon)
    assert(out.toSeq == Seq(
      (0, 2L, 1L, 10.0, 5.0), (1, 2L, 1L, 20.0, 15.0),
      (0, 1L, 1L, 5.0, 5.0)))
  }

  test("markov attribution: removal effects match the hand-solved chain") {
    // u1: a -> conv; u2: b -> (null); u3: a -> b -> conv
    // P(conv) = 2/3; remove a -> 1/6 (RE 3/4); remove b -> 1/3 (RE 1/2)
    val rows = Seq(
      (1L, 11L, "a", ts(1)), (1L, 12L, "purchase", ts(2)),
      (2L, 21L, "b", ts(1)),
      (3L, 31L, "a", ts(1)), (3L, 32L, "b", ts(2)),
      (3L, 33L, "purchase", ts(3)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.markovAttribution(rows, "user_id", "event_type",
        "ts", "event_id", col("event_type") === "purchase")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(out("a")._1 - 1.0 / 6) < 1e-5)
    assert(math.abs(out("a")._2 - 0.75) < 1e-5)
    assert(math.abs(out("b")._2 - 0.5) < 1e-5)
    // credits split 2 conversions 0.6/0.4
    assert(math.abs(out("a")._3 - 1.2) < 1e-4)
    assert(math.abs(out("b")._3 - 0.8) < 1e-4)
  }

  test("markov attribution: touches after the first conversion are cut") {
    val rows = Seq(
      (1L, 11L, "a", ts(1)), (1L, 12L, "purchase", ts(2)),
      (1L, 13L, "b", ts(3)), // post-conversion: must not enter the chain
      (2L, 21L, "a", ts(1)), (2L, 22L, "purchase", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.markovAttribution(rows, "user_id", "event_type",
        "ts", "event_id", col("event_type") === "purchase")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a")) // b never appears
    assert(out(0).getDouble(2) == 1.0) // removing a kills every path
  }

  test("time-decay attribution: halved weight per whole half-life") {
    // conv A at t=3min, half-life 1min: view@1 (age 2, w=.25),
    // click@2 (age 1, w=.5) -> shares 1/3 and 2/3;
    // conv B: view@1 sole touch -> 1; conv C: no touch -> (direct) 1
    val rows = Seq(
      (1L, 11L, "view", ts(1)), (1L, 12L, "click", ts(2)),
      (1L, 13L, "purchase", ts(3)),
      (2L, 21L, "view", ts(1)), (2L, 22L, "purchase", ts(2)),
      (3L, 31L, "purchase", ts(5)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.attributionTimeDecay(rows, "user_id", "event_type",
        "ts", "event_id", col("event_type") === "purchase",
        lookbackMillis = 600000L, halfLifeMillis = 60000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("(direct)", 1L, 1.0), ("click", 1L, 0.666667),
      ("view", 2L, 1.333333)))
    // credit still sums to the conversion count at the 6-dp readout
    assert(math.abs(out.map(_._3).sum - 3.0) < 2e-6)
  }

  test("time-decay attribution: rejects a lookback past 30 half-lives") {
    val rows = Seq((1L, 1L, "purchase", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Events.attributionTimeDecay(rows, "user_id", "event_type", "ts",
        "event_id", col("event_type") === "purchase",
        lookbackMillis = 31L * 60000L, halfLifeMillis = 60000L)
    }
  }

  test("arFit: order-1 and order-2 match the closed-form Yule-Walker") {
    // periodic daily counts -> strong, known autocorrelation structure
    val rows = (1 to 28).flatMap(d =>
      Seq.fill(10 + 3 * (d % 3))(("A", day(d))))
    val df = rows.toDF("k", "ts")
    val acf = Events.acf(df, "k", "ts", maxLag = 2).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val (r1, r2) = (acf(1), acf(2))
    val p1 = Events.arFit(df, "k", "ts", p = 1).collect()
    assert(p1.length == 1)
    assert(math.abs(p1(0).getDouble(2) - r1) < 1e-6)
    assert(math.abs(p1(0).getDouble(3) - (1 - r1 * r1)) < 1e-6)
    val p2 = Events.arFit(df, "k", "ts", p = 2).collect()
    val den = 1 - r1 * r1
    assert(math.abs(p2(0).getDouble(2) - r1 * (1 - r2) / den) < 1e-5)
    assert(math.abs(p2(1).getDouble(2) - (r2 - r1 * r1) / den) < 1e-5)
  }

  test("arForecast: an alternating series forecasts the alternation") {
    // 10, 2, 10, 2, ... over 20 days: AR(1) phi ~ -1; the 1-step
    // forecast from a high day must swing low, the 2-step back high
    val rows = (1 to 20).flatMap(d =>
      Seq.fill(if (d % 2 == 1) 10 else 2)(("A", day(d))))
    val df = rows.toDF("k", "ts")
    val out = Events.arForecast(df, "k", "ts", p = 1, horizon = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val mean = 6.0 // (10+2)/2
    assert(out(1) > mean && out(2) < mean && out(3) > mean,
      s"$out") // day 20 was low -> h=1 swings high
    // manual recursion from arFit's own phi: exact agreement
    val phi = Events.arFit(df, "k", "ts", p = 1).collect()(0)
      .getDouble(2)
    val lastDev = 2.0 - mean
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1) == r6(mean + phi * lastDev))
    // |phi| < 1: the forecast decays toward the mean
    assert(math.abs(out(3) - mean) < math.abs(out(1) - mean))
  }

  test("arForecastInterval: bands bracket the shared point forecast, " +
    "widen with sqrt(h), and cover the in-sample residuals") {
    // 60-day mean-reverting pseudo-noise around 20 (deterministic)
    def dayN(d: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1).atStartOfDay())
    val rows = (1 to 60).flatMap(d =>
      Seq.fill(20 + (d * 7 % 5) - 2)(("A", dayN(d))))
    val df = rows.toDF("k", "ts")
    val out = Events.arForecastInterval(df, "k", "ts", p = 2,
        horizon = 3, ciAlpha = 0.05).collect()
      .map(r => r.getInt(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 3)
    // the point forecast IS arForecast's (shared phi/mean/recursion)
    val pf = Events.arForecast(df, "k", "ts", p = 2, horizon = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    (1 to 3).foreach { h =>
      val (f, lo, hi) = out(h)
      assert(f == pf(h), s"h=$h: $f vs ${pf(h)}")
      assert(lo <= f && f <= hi, s"h=$h band [$lo,$hi] vs $f")
    }
    // sqrt(h) widening: the h=3 band is strictly wider than h=1's
    assert(out(3)._3 - out(3)._2 > out(1)._3 - out(1)._2)
    // nominal coverage on the planted noise: the (2.5, 97.5)% band
    // around each one-step prediction covers >= 95% of the in-sample
    // days by the empirical-quantile construction
    val (_, lo1, hi1) = out(1)
    val (qlo, qhi) = (lo1 - pf(1), hi1 - pf(1)) // h=1: raw quantiles
    val daysN = (1 to 60).map(d => (20 + (d * 7 % 5) - 2).toDouble)
    val mu = daysN.sum / daysN.size
    val phi = Events.arFit(df, "k", "ts", p = 2).collect()
      .sortBy(_.getInt(1)).map(_.getDouble(2))
    val resids = (2 until 60).map { t =>
      (daysN(t) - mu) -
        (phi(0) * (daysN(t - 1) - mu) + phi(1) * (daysN(t - 2) - mu))
    }
    val covered = resids.count(r => r >= qlo - 1e-6 && r <= qhi + 1e-6)
    assert(covered.toDouble / resids.size >= 0.95,
      s"coverage ${covered.toDouble / resids.size}")
  }

  test("holtWintersInterval: constant series pins zero-width bands; " +
    "noisy series brackets the shared forecast") {
    val const = (0 until 14).flatMap(d => (1 to 3).map(i =>
      ("k", Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$i:00:00"))))
      .toDF("key", "ts")
    // perfectly predictable: every one-step error is 0, so the
    // empirical band collapses onto the forecast exactly
    val c = Events.holtWintersInterval(const, "key", "ts", "2024-01-01",
      numDays = 14, seasonLen = 7, alpha = 0.3, beta = 0.2,
      gamma = 0.1).collect()(0)
    assert(c.getInt(1) == 7)
    assert(c.getDouble(2) == 3.0 && c.getDouble(3) == 3.0 &&
      c.getDouble(4) == 3.0)
    // bumpy series: band brackets the q232-shape forecast, lo < hi
    val perDay = (0 until 28).map(d =>
      if (d == 5) 0 else 1 + (d * 5 + d % 7 * 3) % 6)
    val rows = perDay.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("k", Timestamp.valueOf(f"2024-01-${d + 1}%02d ${8 + i}%02d:30:00")))
    }
    val df = rows.toDF("key", "ts")
    val r = Events.holtWintersInterval(df, "key", "ts", "2024-01-01",
      numDays = 28, seasonLen = 7, alpha = 0.4, beta = 0.15,
      gamma = 0.25).collect()(0)
    val f = Events.holtWinters(df, "key", "ts", "2024-01-01",
      numDays = 28, seasonLen = 7, alpha = 0.4, beta = 0.15,
      gamma = 0.25).collect()(0)
    assert(r.getInt(1) == 21)
    assert(r.getDouble(2) == f.getDouble(5)) // shared forecast
    assert(r.getDouble(3) < r.getDouble(4))
    assert(r.getDouble(3) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(4))
  }

  test("arFit: a series shorter than p lags is omitted") {
    val rows = Seq(("B", day(1)), ("B", day(2)))
    assert(Events.arFit(rows.toDF("k", "ts"), "k", "ts", p = 3)
      .collect().isEmpty)
  }

  test("adfTest: mean-reverting series flags stationary, a trend does not") {
    // alternating 5,9,5,9... -> strongly mean-reverting differences
    val alt = (1 to 28).map(d =>
      (day(d), (if (d % 2 == 0) 5.0 else 9.0) + 0.3 * (d % 5)))
      .toDF("day", "v")
    val ra = Events.adfTest(alt, "day", "v", lags = 1).collect()(0)
    assert(ra.getDouble(3) < -2.86 && ra.getBoolean(4))
    // accelerating trend: nowhere near the stationarity critical value
    val trend = (1 to 28).map(d => (day(d), d * d + 0.5 * (d % 3)))
      .toDF("day", "v")
    val rt = Events.adfTest(trend, "day", "v", lags = 1).collect()(0)
    assert(!rt.getBoolean(4))
  }

  test("dmTest: a strictly better model reads negative and significant") {
    // model 1 errs ~0.1, model 2 errs ~2 + wobble
    val rows = (1 to 28).map(d =>
      (day(d), 0.1 * (d % 2), 2.0 + 0.3 * (d % 4))).toDF("o", "e1", "e2")
    val r = Events.dmTest(rows, "o", "e1", "e2", lags = 2).collect()(0)
    assert(r.getDouble(3) < 0 && r.getDouble(4) < 0.05)
    // identical errors: zero differential, zero LRV -> nulls
    val same = (1 to 20).map(d => (day(d), 1.0, 1.0)).toDF("o", "e1", "e2")
    val rs = Events.dmTest(same, "o", "e1", "e2", lags = 2).collect()(0)
    assert(rs.getDouble(2) == 0.0 && rs.isNullAt(3) && rs.isNullAt(4))
  }

  test("ccf: a planted 2-step lead peaks at lag +2") {
    val xs = (1 to 30).map(d => (d % 7 + 0.2 * (d % 3)).toDouble)
    val rows = (1 to 30).map { d =>
      val y = if (d >= 3) xs(d - 3) else 0.0 // y_t = x_{t-2}
      (day(d % 28 + 1, d / 28), xs(d - 1), y)
    }.toDF("o", "x", "y")
    val out = Events.ccf(rows, "o", "x", "y", maxLag = 4).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (-4 to 4).toSet)
    assert(out(2)._1 == 28L) // n - |k| pairs
    val peak = out.maxBy(_._2._2)
    assert(peak._1 == 2, s"peak at ${peak._1}: $out")
    // edge rows (y = 0 before the lead kicks in) dilute the magnitude
    assert(out(2)._2 > 0.6)
  }

  test("periodogram: a weekly cycle peaks at period 7") {
    val daily = (1 to 56).map(d =>
      (day(d % 28 + 1, d / 28), 10 + (if (d % 7 == 0) 12 else 0)))
      .toDF("day", "n")
    val out = Events.periodogram(daily, "day", "n",
      periods = Seq(3, 5, 7, 11)).collect()
    val peak = out.filter(_.getBoolean(2))
    assert(peak.length == 1 && peak(0).getInt(0) == 7,
      out.mkString(","))
  }

  test("kpssTest: mean-reverting series passes, a trend fails") {
    val alt = (1 to 28).map(d =>
      (day(d), (if (d % 2 == 0) 5.0 else 9.0) + 0.3 * (d % 5)))
      .toDF("day", "v")
    val ra = Events.kpssTest(alt, "day", "v", lags = 2).collect()(0)
    assert(ra.getBoolean(3), s"eta=${ra.getDouble(2)}")
    val trend = (1 to 28).map(d => (day(d), d * 2.0 + 0.1 * (d % 3)))
      .toDF("day", "v")
    val rt = Events.kpssTest(trend, "day", "v", lags = 2).collect()(0)
    assert(!rt.getBoolean(3) && rt.getDouble(2) > 0.463)
    // constant series: zero long-run variance -> null eta
    val const = (1 to 10).map(d => (day(d), 4.0)).toDF("day", "v")
    val rc = Events.kpssTest(const, "day", "v", lags = 2).collect()(0)
    assert(rc.isNullAt(2) && rc.isNullAt(3))
  }

  test("grangerTest: a lagged driver shows a large F, noise does not") {
    // y_t follows x_{t-1} with a wobble; x is a rich periodic signal
    val xs = (1 to 60).map(d => (d % 7 + 0.3 * (d % 4)).toDouble)
    val ys = (1 to 60).map(d =>
      (if (d >= 2) xs(d - 2) else 0.0) + 0.1 * (d % 3))
    val df = (1 to 60).map(d => (day(d % 28 + 1, d / 28), ys(d - 1),
      xs(d - 1))).toDF("o", "y", "x")
    val r = Events.grangerTest(df, "o", "y", "x", lags = 2).collect()(0)
    assert(r.getLong(0) == 58L && r.getInt(1) == 2)
    assert(r.getDouble(4) > 10.0, s"forward F=${r.getDouble(4)}")
    // reverse direction: x does not follow y -> much weaker F
    val rev = Events.grangerTest(df, "o", "x", "y", lags = 2).collect()(0)
    assert(rev.getDouble(4) < r.getDouble(4) / 3.0)
    // RSS nesting invariant: the restricted model can't fit better
    assert(r.getDouble(2) >= r.getDouble(3))
  }

  test("vif: a near-duplicate column inflates, an independent one doesn't") {
    val rows = (1 to 200).map { i =>
      val x = (i % 13).toDouble
      (x, x + 0.05 * (i % 5), (i % 7).toDouble)
    }.toDF("x", "x_dup", "z")
    val out = Events.vif(rows, Seq("x", "x_dup", "z")).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "x_dup", "z"))
    assert(out(0).getDouble(2) > 10.0 && out(1).getDouble(2) > 10.0)
    assert(out(2).getDouble(2) < 2.0)
    // k=2 closed form: VIF = 1/(1-r^2) for both columns
    val two = Events.vif(rows, Seq("x", "z")).collect()
    val r = graft.ops.Profile.correlationMatrix(rows, Seq("x", "z"))
      .collect()(0).getDouble(3)
    assert(math.abs(two(0).getDouble(2) - 1.0 / (1 - r * r)) < 1e-5)
    assert(two(0).getDouble(2) == two(1).getDouble(2))
  }

  test("ewma chart: recursion, zero-fill, and control limits") {
    // key A: 4 events day1, none day2 (zero-filled), 8 day3, 4 day4
    // mu = 4, sigma = sqrt(8); lambda=.5: z = 4, 2, 5, 4.5
    val rows = Seq.fill(4)(("A", day(1))) ++ Seq.fill(8)(("A", day(3))) ++
      Seq.fill(4)(("A", day(4)))
    val out = Events.ewmaChart(rows.toDF("k", "ts"), "k", "ts",
        startDay = "2024-01-01", numDays = 4, lambda = 0.5, limitL = 3.0)
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 0L, 8L, 4L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(4.0, 2.0, 5.0, 4.5))
    val sigma = math.sqrt(8.0)
    val hw1 = 3.0 * sigma * math.sqrt(0.5 / 1.5 * (1 - 0.25))
    assert(math.abs(out(0).getDouble(4) - (4.0 + hw1)) < 1e-6)
    assert(out.forall(!_.getBoolean(6))) // all in control here
  }

  test("ewma chart: a large spike trips the out-of-control flag") {
    val rows = (1 to 9).flatMap(d => Seq.fill(5)(("A", day(d)))) ++
      Seq.fill(50)(("A", day(10)))
    val out = Events.ewmaChart(rows.toDF("k", "ts"), "k", "ts",
        startDay = "2024-01-01", numDays = 10, lambda = 0.9, limitL = 2.0)
      .collect()
    assert(!out(8).getBoolean(6) && out(9).getBoolean(6))
  }

  test("cusum monitor: one-sided sums accumulate and reset at zero") {
    // counts 4, 0, 8, 4; mu 4, sigma sqrt(8); k=0.5 -> slack 1.414...
    val rows = Seq.fill(4)(("A", day(1))) ++ Seq.fill(8)(("A", day(3))) ++
      Seq.fill(4)(("A", day(4)))
    val out = Events.cusumMonitor(rows.toDF("k", "ts"), "k", "ts",
        startDay = "2024-01-01", numDays = 4, k = 0.5, h = 0.8)
      .collect()
    val slack = 0.5 * math.sqrt(8.0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // s_pos: 0, 0, 8-4-slack, then minus (4-4+slack)
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0,
      r6(4.0 - slack), r6(math.max(0.0, (4.0 - slack) + (0.0 - slack)))))
    // s_neg: 0, then 4-0-slack, then reset to 0 by the spike
    assert(out(1).getDouble(4) == r6(4.0 - slack))
    assert(out(2).getDouble(4) == 0.0)
    // the spike day alarms at h=0.8 (limit 0.8*sigma ≈ 2.26 < 2.586)
    assert(out(2).getBoolean(6) && !out(0).getBoolean(6))
  }

  test("ses forecast: closed form equals the recursive definition") {
    // key A days 1..4 with counts 4, 2, 8, 6; alpha = 0.5
    // s1=4; s2=3; s3=5.5; s4=5.75
    val rows = Seq.fill(4)(("A", day(1))) ++ Seq.fill(2)(("A", day(2))) ++
      Seq.fill(8)(("A", day(3))) ++ Seq.fill(6)(("A", day(4))) ++
      Seq.fill(7)(("B", day(2)))
    val out = Events.sesForecast(rows.toDF("k", "ts"), "k", "ts", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("A", 4L, 6L, 5.75), ("B", 1L, 7L, 7.0)))
  }

  test("ses forecast: partition invariance of the quantized dot product") {
    val rows = (1 to 200).flatMap(i =>
      Seq.fill(i % 7 + 1)(("K", day(i % 28 + 1, i % 24))))
    def run(parts: Int) =
      Events.sesForecast(rows.toDF("k", "ts").repartition(parts),
        "k", "ts", 0.3).collect().map(_.toSeq).toSeq
    assert(run(1) == run(19))
  }

  test("attribution: simultaneous touches break ties on the id column") {
    val rows = Seq(
      (1L, 11L, "view", ts(5)), (1L, 12L, "click", ts(5)),
      (1L, 13L, "purchase", ts(6)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.attribution(rows, "user_id", "event_type", "ts",
        "event_id", col("event_type") === "purchase", 60000L * 60)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // same ts: min id 11 (view) is first, max id 12 (click) is last
    assert(out == Seq(("click", 0L, 1L), ("view", 1L, 0L)))
  }

  test("cupedAdjust: theta and adjusted means match the hand formula") {
    // y perfectly predicted by x within variants, with a constant lift:
    // variant A users (x, y): (1,1),(2,2),(3,3); B: (1,2),(2,3),(3,4).
    // Pooled: n=6, theta = cov/var; hand-replay below.
    val users = Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 2.0), ("A", 3.0, 3.0),
      ("B", 1.0, 2.0), ("B", 2.0, 3.0), ("B", 3.0, 4.0))
      .toDF("variant", "y", "x")
    val r = Events.cupedAdjust(users, "variant", "y", "x").collect()(0)
    val xs = Seq(1.0, 2.0, 3.0, 2.0, 3.0, 4.0)
    val ys = Seq(1.0, 2.0, 3.0, 1.0, 2.0, 3.0)
    val n = 6.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0) // raw means tie
    val adjA = r6(2.0 - theta * (2.0 - xbar))
    val adjB = r6(2.0 - theta * (3.0 - xbar))
    assert(r.getDouble(4) == adjA, s"adj_a ${r.getDouble(4)} vs $adjA")
    assert(r.getDouble(5) == adjB)
    assert(r.getDouble(6) == r6(theta))
    // the covariate explains variance: reduction strictly in (0, 1]
    assert(r.getDouble(7) > 0 && r.getDouble(7) <= 1.0)
    // and the adjustment UNCOVERS the true lift the raw means hid:
    // B does better per engagement (same y at x+1), raw means tie,
    // adjusted B < adjusted A by exactly theta
    assert(math.abs((r.getDouble(4) - r.getDouble(5)) - theta) < 2e-6) // 6-dp rounded outputs
  }

  test("cupedAdjust: zero-variance covariate degrades to the raw readout") {
    val users = Seq(("A", 1.0, 5.0), ("A", 0.0, 5.0),
      ("B", 1.0, 5.0), ("B", 1.0, 5.0)).toDF("variant", "y", "x")
    val r = Events.cupedAdjust(users, "variant", "y", "x").collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7)) // theta, var_reduction null
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.0) // adj = raw
  }

  test("diffInDiff: hand-computed effect, SE, degenerate guards") {
    import spark.implicits._
    // A: pre {1,2} -> post {2,3} (diff +1); B: pre {1,3} -> post {4,6}
    // (diff +3) -> effect = 2; cell vars 0.5/0.5/2/2 -> se = sqrt(2.5)
    val units = Seq(
      ("A", "pre", 1.0), ("A", "pre", 2.0),
      ("A", "post", 2.0), ("A", "post", 3.0),
      ("B", "pre", 1.0), ("B", "pre", 3.0),
      ("B", "post", 4.0), ("B", "post", 6.0))
      .toDF("g", "per", "y")
    // NB: "post" < "pre" lexicographically — rename so pre sorts first
    val relabeled = units.withColumn("per",
      org.apache.spark.sql.functions.when(col("per") === "pre", "0pre")
        .otherwise("1post"))
    val r = Events.diffInDiff(relabeled, "g", "per", "y").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 &&
      r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 3.0)
    assert(r.getDouble(6) == 2.0)
    val se = math.sqrt(2.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(7) == r6(se))
    assert(r.getDouble(8) == r6(2.0 / se))
    // all-constant outcomes: se = 0 -> null t, effect still defined
    val flat = Seq(("A", "0", 5.0), ("A", "0", 5.0), ("A", "1", 5.0),
      ("A", "1", 5.0), ("B", "0", 5.0), ("B", "0", 5.0),
      ("B", "1", 5.0), ("B", "1", 5.0)).toDF("g", "per", "y")
    val rf = Events.diffInDiff(flat, "g", "per", "y").collect()(0)
    assert(rf.getDouble(6) == 0.0 && rf.isNullAt(8))
    // a 1-row cell has no variance: loud failure
    intercept[IllegalArgumentException] {
      Events.diffInDiff(Seq(("A", "0", 1.0), ("A", "1", 1.0),
        ("A", "1", 2.0), ("B", "0", 1.0), ("B", "0", 2.0),
        ("B", "1", 1.0), ("B", "1", 2.0)).toDF("g", "per", "y"),
        "g", "per", "y")
    }
    // wrong shape: loud failure
    intercept[IllegalArgumentException] {
      Events.diffInDiff(
        Seq(("A", "0", 1.0), ("B", "1", 2.0), ("C", "0", 3.0))
          .toDF("g", "per", "y"), "g", "per", "y")
    }
  }

  test("covariateBalance: hand SMD, balanced and constant covariates") {
    import spark.implicits._
    val units = Seq(
      ("A", 1.0, 10.0, 5.0), ("A", 3.0, 20.0, 5.0),
      ("B", 5.0, 10.0, 5.0), ("B", 9.0, 20.0, 5.0))
      .toDF("g", "shifted", "balanced", "const")
    val out = Events.covariateBalance(units, "g",
        Seq("shifted", "balanced", "const"))
      .collect().map(r => r.getString(0) -> r).toMap
    // shifted: means 2 vs 7, vars 2 and 8 -> smd = -5/sqrt(5)
    val s = out("shifted")
    assert(s.getDouble(3) == 2.0 && s.getDouble(4) == 7.0)
    def r6(x: Double) = -math.floor(-x * 1e6 + 0.5) / 1e6
    assert(s.getDouble(5) == r6(-5.0 / math.sqrt(5.0)))
    assert(s.getBoolean(6))
    // balanced: identical distributions -> smd 0, no flag
    val b = out("balanced")
    assert(b.getDouble(5) == 0.0 && !b.getBoolean(6))
    // constant: zero pooled variance -> null smd, null flag
    val c = out("const")
    assert(c.isNullAt(5) && c.isNullAt(6))
    // contracts: 2 groups, n >= 2 per group
    intercept[IllegalArgumentException] {
      Events.covariateBalance(
        Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)).toDF("g", "x"),
        "g", Seq("x")).collect()
    }
    intercept[IllegalArgumentException] {
      Events.covariateBalance(
        Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("g", "x"),
        "g", Seq("x")).collect()
    }
  }

  test("cupedAdjust: rejects experiments without exactly two variants") {
    val users = Seq(("A", 1.0, 1.0), ("B", 0.0, 2.0), ("C", 1.0, 3.0))
      .toDF("variant", "y", "x")
    intercept[IllegalArgumentException] {
      Events.cupedAdjust(users, "variant", "y", "x").collect()
    }
  }

  test("olsAdjust: exact linear data recovers coefficients, se 0, r2 1") {
    // y = 2 + 3*T + 0.5*x0 - 1.25*x1 with zero noise: the solve must
    // return the generating coefficients, zero residual -> se = 0,
    // t null, r2 = 1
    val pts = Seq( // (variant, x0, x1)
      ("A", 1.0, 2.0), ("A", 2.0, 7.0), ("A", 4.0, 1.0), ("A", 8.0, 3.0),
      ("B", 1.5, 5.0), ("B", 3.0, 2.0), ("B", 6.0, 6.0), ("B", 9.0, 4.0))
    val users = pts.map { case (v, x0, x1) =>
      val t = if (v == "B") 1.0 else 0.0
      (v, 2.0 + 3.0 * t + 0.5 * x0 - 1.25 * x1, x0, x1)
    }.toDF("variant", "y", "x0", "x1")
    val out = Events.olsAdjust(users, "variant", "y", Seq("x0", "x1"))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out.keySet == Set("intercept", "treatment", "x0", "x1"))
    assert(out("intercept").getDouble(3) == 2.0)
    assert(out("treatment").getDouble(3) == 3.0)
    assert(out("x0").getDouble(3) == 0.5)
    assert(out("x1").getDouble(3) == -1.25)
    out.values.foreach { r =>
      assert(r.getLong(2) == 8L)
      assert(r.getDouble(4) == 0.0) // se
      assert(r.isNullAt(5))         // t_stat null at zero se
      assert(r.getDouble(6) == 1.0) // r2
    }
  }

  test("olsAdjust: agrees with an independent pivoted solve and with " +
    "cupedAdjust when the covariate is balanced") {
    // deterministic "noisy" data: y = 1 + 2T + 0.8x0 - 0.3x1 + wiggle
    val rows = (0 until 40).map { i =>
      val v = if (i % 2 == 0) "A" else "B"
      val t = if (v == "B") 1.0 else 0.0
      val x0 = (i * 7 % 13).toDouble
      val x1 = (i * 11 % 17).toDouble
      val wiggle = ((i * 37 % 19) - 9) * 0.21
      (v, 1.0 + 2.0 * t + 0.8 * x0 - 0.3 * x1 + wiggle, x0, x1)
    }
    val out = Events.olsAdjust(rows.toDF("variant", "y", "x0", "x1"),
        "variant", "y", Seq("x0", "x1"))
      .collect().map(r => r.getString(1) -> r).toMap
    // independent reference: normal equations solved by Gaussian
    // elimination WITH partial pivoting (different algorithmic path)
    val xs = rows.map { case (v, _, x0, x1) =>
      Array(1.0, if (v == "B") 1.0 else 0.0, x0, x1) }
    val ys = rows.map(_._2)
    val p = 4
    val m = Array.tabulate(p, p + 1) { (a, b) =>
      if (b < p) xs.map(x => x(a) * x(b)).sum
      else xs.zip(ys).map { case (x, y) => x(a) * y }.sum
    }
    for (c <- 0 until p) {
      val pivRow = (c until p).maxBy(r => math.abs(m(r)(c)))
      val tmp = m(c); m(c) = m(pivRow); m(pivRow) = tmp
      for (r <- 0 until p if r != c) {
        val f = m(r)(c) / m(c)(c)
        for (j <- c to p) m(r)(j) -= f * m(c)(j)
      }
    }
    val ref = Array.tabulate(p)(i => m(i)(p) / m(i)(i))
    val got = Seq("intercept", "treatment", "x0", "x1")
      .map(t => out(t).getDouble(3))
    got.zip(ref).foreach { case (g, r) =>
      assert(math.abs(g - r) < 1e-6, s"coef $g vs reference $r") }
    assert(out("treatment").getDouble(6) > 0.85) // strong fit, r2 high
    assert(!out("treatment").isNullAt(5))       // se > 0 -> t present

    // cupedAdjust equivalence at k = 1 under a BALANCED covariate
    // (x-group-means equal -> pooled theta = within slope -> CUPED
    // adjusted diff = ANCOVA treatment coefficient)
    val bal = Seq(
      ("A", 3.0, 1.0), ("A", 5.2, 2.0), ("A", 7.1, 3.0), ("A", 8.8, 4.0),
      ("B", 4.9, 1.0), ("B", 7.2, 2.0), ("B", 9.0, 3.0), ("B", 11.1, 4.0))
      .toDF("variant", "y", "x")
    val cuped = Events.cupedAdjust(bal, "variant", "y", "x").collect()(0)
    val cupedDiff = cuped.getDouble(5) - cuped.getDouble(4) // adjB - adjA
    val ols = Events.olsAdjust(bal, "variant", "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(math.abs(ols("treatment").getDouble(3) - cupedDiff) < 2e-6)
  }

  test("olsFit/didAdjusted: saturated DiD equals the 4-cell estimator, " +
    "covariate recovers the exact effect") {
    import spark.implicits._
    // 2x2 cells with >=2 units each, noisy y
    val units = Seq(
      ("A", "pre", 1.0), ("A", "pre", 2.0), ("A", "post", 2.5),
      ("A", "post", 3.5), ("B", "pre", 2.0), ("B", "pre", 4.0),
      ("B", "post", 7.0), ("B", "post", 9.0))
      .toDF("g", "per", "y")
      .withColumn("per2", org.apache.spark.sql.functions
        .when(col("per") === "pre", "p0").otherwise("p1"))
    // saturated regression (no covariates) reproduces the 4-cell DiD
    // point estimate exactly
    val cell = Events.diffInDiff(units, "g", "per2", "y").collect()(0)
    val reg = Events.didAdjusted(units, "g", "per2", "y", Seq.empty)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(reg("did_effect").getDouble(3) == cell.getDouble(6),
      s"regression ${reg("did_effect").getDouble(3)} vs cell ${cell.getDouble(6)}")
    // exact generating process: y = 1 + 2T + 0.5P + 3TP + 0.25x ->
    // with x in the design, did_effect = 3 exactly and the fit is exact
    val exact = (0 until 24).map { i =>
      val t = if (i % 2 == 0) 0.0 else 1.0
      val p = if ((i / 2) % 2 == 0) 0.0 else 1.0
      val x = (i * 7 % 11).toDouble
      (if (t == 1.0) "B" else "A", if (p == 1.0) "p1" else "p0",
        1.0 + 2.0 * t + 0.5 * p + 3.0 * t * p + 0.25 * x, x)
    }.toDF("g", "per", "y", "x")
    val adj = Events.didAdjusted(exact, "g", "per", "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(adj("did_effect").getDouble(3) == 3.0)
    assert(adj("treated").getDouble(3) == 2.0)
    assert(adj("post").getDouble(3) == 0.5)
    assert(adj("x").getDouble(3) == 0.25)
    assert(adj("did_effect").getDouble(4) == 0.0) // exact fit, se 0
    // constant covariate is collinear with the intercept: loud failure
    val e = intercept[IllegalArgumentException] {
      Events.didAdjusted(exact.withColumn("c",
        org.apache.spark.sql.functions.lit(1.0)),
        "g", "per", "y", Seq("c")).collect()
    }
    assert(e.getMessage.contains("singular"))
    // olsFit standalone: straight line y = 4 - 2x recovered exactly
    val line = (1 to 12).map(i => (4.0 - 2.0 * i, i.toDouble))
      .toDF("y", "x")
    val fit = Events.olsFit(line, "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(fit("intercept") == 4.0 && fit("x") == -2.0)
  }

  test("holtWinters: constant series is a fixed point; naive-reference " +
    "parity with zero-filled gaps") {
    // constant 3 events/day for 14 days: level 3, trend 0, seasons 0
    val const = (0 until 14).flatMap(d => (1 to 3).map(i =>
      ("k", Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$i:00:00"))))
      .toDF("key", "ts")
    val c = Events.holtWinters(const, "key", "ts", "2024-01-01",
      numDays = 14, seasonLen = 7, alpha = 0.3, beta = 0.2, gamma = 0.1)
      .collect()(0)
    assert(c.getInt(1) == 14)
    assert(c.getDouble(2) == 3.0 && c.getDouble(3) == 0.0 &&
      c.getDouble(4) == 0.0 && c.getDouble(5) == 3.0)

    // deterministic bumpy series over 21 days with day 5 EMPTY (the
    // zero-fill contract) — compare against an independent sequential
    // reference implementation of the same recursion
    val perDay = (0 until 21).map(d =>
      if (d == 5) 0 else 1 + (d * 5 + d % 7 * 3) % 6)
    val rows = perDay.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("k", Timestamp.valueOf(f"2024-01-${d + 1}%02d ${8 + i}%02d:30:00")))
    }
    val out = Events.holtWinters(rows.toDF("key", "ts"), "key", "ts",
      "2024-01-01", numDays = 21, seasonLen = 7,
      alpha = 0.4, beta = 0.15, gamma = 0.25).collect()(0)
    // naive reference: straight loop, same init convention
    val xsv = perDay.map(_.toDouble)
    val mm = 7
    var l = xsv.take(mm).sum / mm
    var b = (xsv.slice(mm, 2 * mm).sum / mm - l) / mm
    var s = xsv.take(mm).map(_ - l).toVector
    for (t <- mm until 21) {
      val sUsed = s.head
      val lN = 0.4 * (xsv(t) - sUsed) + 0.6 * (l + b)
      val bN = 0.15 * (lN - l) + 0.85 * b
      val sN = 0.25 * (xsv(t) - l - b) + 0.75 * sUsed
      l = lN; b = bN; s = s.tail :+ sN
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    assert(math.abs(out.getDouble(2) - l) < 1e-6, s"level ${out.getDouble(2)} vs $l")
    assert(math.abs(out.getDouble(3) - b) < 1e-6)
    assert(math.abs(out.getDouble(4) - s.head) < 1e-6)
    assert(math.abs(out.getDouble(5) - (l + b + s.head)) < 2e-6)
    // contracts
    intercept[IllegalArgumentException] {
      Events.holtWinters(const, "key", "ts", "2024-01-01",
        numDays = 13, seasonLen = 7, alpha = 0.3, beta = 0.2, gamma = 0.1)
    }
    intercept[IllegalArgumentException] {
      Events.holtWinters(const, "key", "ts", "2024-01-01",
        numDays = 14, seasonLen = 7, alpha = 1.0, beta = 0.2, gamma = 0.1)
    }

    // backtest: a constant series forecasts itself exactly -> all
    // errors 0, and MAPE's nonzero-count is every step
    val bt = Events.holtWintersBacktest(const, "key", "ts", "2024-01-01",
      numDays = 14, seasonLen = 7, alpha = 0.3, beta = 0.2, gamma = 0.1)
      .collect()(0)
    assert(bt.getInt(1) == 7)
    assert(bt.getDouble(2) == 0.0 && bt.getDouble(3) == 0.0 &&
      bt.getDouble(4) == 0.0)
    // backtest parity with the same naive reference loop (errors
    // scored pre-update, the one-step-ahead definition)
    var l2 = xsv.take(mm).sum / mm
    var b2 = (xsv.slice(mm, 2 * mm).sum / mm - l2) / mm
    var s2 = xsv.take(mm).map(_ - l2).toVector
    var sae = 0.0; var sse = 0.0; var sape = 0.0; var nzc = 0
    for (t <- mm until 21) {
      val err = xsv(t) - (l2 + b2 + s2.head)
      sae += math.abs(err); sse += err * err
      if (xsv(t) != 0.0) { sape += math.abs(err) / math.abs(xsv(t)); nzc += 1 }
      val lN = 0.4 * (xsv(t) - s2.head) + 0.6 * (l2 + b2)
      val bN = 0.15 * (lN - l2) + 0.85 * b2
      val sN = 0.25 * (xsv(t) - l2 - b2) + 0.75 * s2.head
      l2 = lN; b2 = bN; s2 = s2.tail :+ sN
    }
    val btn = Events.holtWintersBacktest(rows.toDF("key", "ts"), "key",
      "ts", "2024-01-01", numDays = 21, seasonLen = 7,
      alpha = 0.4, beta = 0.15, gamma = 0.25).collect()(0)
    assert(btn.getInt(1) == 14)
    assert(math.abs(btn.getDouble(2) - sae / 14.0) < 1e-6)
    assert(math.abs(btn.getDouble(3) - math.sqrt(sse / 14.0)) < 1e-6)
    assert(math.abs(btn.getDouble(4) - sape / nzc) < 1e-6)
  }

  test("olsAdjust: listwise null deletion and loud degenerate failures") {
    val users = Seq(
      (Some("A"), Some(1.0), Some(1.0)), (Some("A"), Some(2.0), Some(2.0)),
      (Some("A"), Some(4.0), Some(3.0)), (Some("B"), Some(3.0), Some(1.0)),
      (Some("B"), Some(5.0), Some(2.0)), (Some("B"), Some(6.0), Some(3.0)),
      (None, Some(9.0), Some(9.0)), (Some("A"), None, Some(9.0)),
      (Some("B"), Some(9.0), None))
      .toDF("variant", "y", "x")
    val out = Events.olsAdjust(users, "variant", "y", Seq("x"))
      .collect()
    assert(out.head.getLong(2) == 6L) // the three null rows dropped
    // collinear design (x duplicated) -> singular Gram, loud require
    val dup = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0), ("A", 4.0, 3.0),
      ("B", 3.0, 1.0), ("B", 5.0, 2.0), ("B", 6.0, 3.0))
      .toDF("variant", "y", "x")
      .withColumn("x2", col("x"))
    val e = intercept[IllegalArgumentException] {
      Events.olsAdjust(dup, "variant", "y", Seq("x", "x2")).collect()
    }
    assert(e.getMessage.contains("singular"))
    // three variants -> loud require
    intercept[IllegalArgumentException] {
      Events.olsAdjust(
        Seq(("A", 1.0, 1.0), ("B", 2.0, 2.0), ("C", 3.0, 3.0),
          ("A", 2.0, 4.0), ("B", 1.0, 5.0), ("C", 2.0, 6.0))
          .toDF("variant", "y", "x"), "variant", "y", Seq("x")).collect()
    }
  }

  test("logisticFit: balanced design recovers logit(p) with zero slope") {
    import spark.implicits._
    // x distribution identical inside both classes -> MLE slope is
    // exactly 0 and intercept is exactly logit(p-hat) = ln(30/70)
    val rows = (0 until 30).map(i => (1.0, (i % 5 + 1).toDouble)) ++
      (0 until 70).map(i => (0.0, (i % 5 + 1).toDouble))
    val out = Events.logisticFit(rows.toDF("y", "x"), "y", Seq("x"))
      .collect()
    val byTerm = out.map(r => r.getString(1) ->
      (r.getDouble(3), r.getDouble(4))).toMap
    assert(math.abs(byTerm("intercept")._1 - math.log(30.0 / 70.0)) < 1e-6)
    assert(math.abs(byTerm("x")._1) < 1e-6)
    assert(out.forall(_.getLong(2) == 100L))
    // a monotone signal fits a positive slope with a confident z
    val sig = (1 to 200).map { i =>
      val x = (i % 20).toDouble
      (if (x + (i % 7) > 14) 1.0 else 0.0, x)
    }
    val s2 = Events.logisticFit(sig.toDF("y", "x"), "y", Seq("x"))
      .collect().find(_.getString(1) == "x").get
    assert(s2.getDouble(3) > 0 && s2.getDouble(5) > 2)
    // partition invariance
    def run(parts: Int) = Events.logisticFit(
      sig.toDF("y", "x").repartition(parts), "y", Seq("x"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("matchedAte: exact ATT on flat outcomes, caliper, invariance") {
    import spark.implicits._
    // outcomes constant within arm: whichever control each treated
    // matches, the pair difference is exactly 5
    val flat = (1 to 40).map(i =>
      (i.toLong, 1.0, 12.0, (i % 4 + 1).toDouble)) ++
      (41 to 100).map(i => (i.toLong, 0.0, 7.0, (i % 4 + 1).toDouble))
    val r = Events.matchedAte(flat.toDF("id", "t", "y", "x"), "id",
      "t", "y", Seq("x")).collect()(0)
    assert(r.getLong(0) == 40L && r.getLong(1) == 60L)
    assert(r.getLong(2) == 40L && r.getDouble(3) == 5.0)
    // overlap region matches at distance ~0; off-support treated fall
    // outside a tiny caliper instead of silently matching far away
    val sep = (1 to 30).map { i =>
      val x = (i % 15 + 6).toDouble // treated x in 6..20
      (i.toLong, 1.0, 1.0, x)
    } ++ (31 to 90).map { i =>
      val x = (i % 15 + 1).toDouble // control x in 1..15
      (i.toLong, 0.0, 0.0, x)
    }
    val wide = Events.matchedAte(sep.toDF("id", "t", "y", "x"), "id",
      "t", "y", Seq("x"), caliper = 1.0).collect()(0)
    assert(wide.getLong(2) == wide.getLong(0)) // everyone matched
    val tight = Events.matchedAte(sep.toDF("id", "t", "y", "x"), "id",
      "t", "y", Seq("x"), caliper = 1e-9).collect()(0)
    assert(tight.getLong(2) > 0 && tight.getLong(2) < tight.getLong(0))
    // partition invariance: the boundary-carry must reproduce the
    // single-partition match exactly
    def run(parts: Int) = Events.matchedAte(
      sep.toDF("id", "t", "y", "x").repartition(parts), "id", "t", "y",
      Seq("x"), caliper = 0.5).collect()(0).toSeq
    assert(run(1) == run(13))
    intercept[IllegalArgumentException] {
      Events.matchedAte(flat.filter(_._2 == 1.0).toDF("id", "t", "y", "x"),
        "id", "t", "y", Seq("x")).collect()
    }
  }

  test("huberFit: outlier resistance, zero-MAD OLS fallback") {
    import spark.implicits._
    // clean law y = 2 + 3x with jitter, plus ONE wild point
    val clean = (1 to 60).map { i =>
      val x = (i % 12).toDouble
      (2.0 + 3.0 * x + (i % 5 - 2) * 0.1, x)
    }
    val dirty = clean :+ (500.0, 1.0)
    val hub = Events.huberFit(dirty.toDF("y", "x"), "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    val ols = Events.olsFit(dirty.toDF("y", "x"), "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    // the single outlier drags OLS; Huber stays near the law (the
    // preliminary-scale variant keeps a sliver of influence, so the
    // gate is "close AND far better than OLS", not exact)
    assert(math.abs(hub("x") - 3.0) < 0.2,
      s"huber slope ${hub("x")}")
    assert(math.abs(ols("x") - 3.0) > 0.5,
      s"ols should be dragged, got ${ols("x")}")
    assert(math.abs(hub("x") - 3.0) < math.abs(ols("x") - 3.0) / 3)
    val down = Events.huberFit(dirty.toDF("y", "x"), "y", Seq("x"))
      .collect()(0)
    assert(down.getLong(5) >= 1L) // the outlier is downweighted
    // exact fit: zero MAD -> scale 0, the OLS coefficients verbatim
    val exact = (1 to 20).map(i => (2.0 + 3.0 * i, i.toDouble))
    val e = Events.huberFit(exact.toDF("y", "x"), "y", Seq("x"))
      .collect()
    assert(e(0).getDouble(4) == 0.0 && e(0).getLong(5) == 0L)
    assert(e.map(r => r.getString(1) -> r.getDouble(3)).toMap
      .apply("x") == 3.0)
    // partition invariance
    def run(parts: Int) = Events.huberFit(
      dirty.toDF("y", "x").repartition(parts), "y", Seq("x"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(11))
  }

  test("poissonFit: binary covariate recovers exact log group means") {
    import spark.implicits._
    // saturated binary design: MLE fitted means = group means, so
    // intercept = ln(2) and slope = ln(6/2) = ln(3) exactly
    val rows = (0 until 50).map(i => (if (i % 2 == 0) 1.0 else 3.0, 0.0)) ++
      (0 until 50).map(i => (if (i % 2 == 0) 5.0 else 7.0, 1.0))
    val out = Events.poissonFit(rows.toDF("y", "x"), "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(math.abs(out("intercept") - math.log(2.0)) < 1e-6)
    assert(math.abs(out("x") - math.log(3.0)) < 1e-6)
    // partition invariance
    def run(parts: Int) = Events.poissonFit(
      rows.toDF("y", "x").repartition(parts), "y", Seq("x"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("ipwAte: constant propensity reduces to the naive difference") {
    import spark.implicits._
    // x balanced inside both arms -> e(x) is flat -> Hajek weights
    // cancel and ATE = naive mean difference = the true effect 5
    val rows = (0 until 40).map(i =>
      (1.0, (i % 4 + 1).toDouble + 5.0, (i % 4 + 1).toDouble)) ++
      (0 until 60).map(i =>
        (0.0, (i % 4 + 1).toDouble, (i % 4 + 1).toDouble))
    val r = Events.ipwAte(rows.toDF("t", "y", "x"), "t", "y", Seq("x"))
      .collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 40L)
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 7.5) < 1e-6) // mean(y|t=1)
    assert(math.abs(r.getDouble(3) - 2.5) < 1e-6)
    // one-arm input fails loudly
    intercept[IllegalArgumentException] {
      Events.ipwAte(rows.filter(_._1 == 1.0).toDF("t", "y", "x"),
        "t", "y", Seq("x")).collect()
    }
  }

  test("aipwAte: exact linear outcome recovers the effect exactly") {
    import spark.implicits._
    // y = x + 5*t exactly linear in x -> each arm's OLS fit is exact,
    // every residual is 0, and the AIPW score is m1 - m0 = 5 for every
    // row whatever the propensity says: the doubly-robust property
    val rows = (0 until 40).map(i =>
      (1.0, (i % 4 + 1).toDouble + 5.0, (i % 4 + 1).toDouble)) ++
      (0 until 60).map(i =>
        (0.0, (i % 4 + 1).toDouble, (i % 4 + 1).toDouble))
    val r = Events.aipwAte(rows.toDF("t", "y", "x"), "t", "y", Seq("x"))
      .collect()(0)
    assert(r.getLong(0) == 100L && r.getLong(1) == 40L)
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-6)
    // partition invariance
    def run(parts: Int) = Events.aipwAte(
      rows.toDF("t", "y", "x").repartition(parts), "t", "y", Seq("x"))
      .collect()(0).toSeq
    assert(run(1) == run(11))
    intercept[IllegalArgumentException] {
      Events.aipwAte(rows.filter(_._1 == 1.0).toDF("t", "y", "x"),
        "t", "y", Seq("x")).collect()
    }
  }

  test("seasonalDecompose: MA trend, centered seasonal, identity") {
    import spark.implicits._
    // 21 days on key "a": counts t (1..21) so the centered 7-MA is
    // exactly t for interior days and the detrended series is 0
    val ramp = (1 to 21).flatMap(t => Seq.fill(t)(("a", day(t))))
    val out = Events.seasonalDecompose(ramp.toDF("k", "at"), "k", "at")
      .collect()
    val byDay = out.map(r => r.getDate(1).toString ->
      (r.getLong(2), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5)))).toMap
    // edges: first/last 3 days have no trend/remainder
    assert(byDay("2024-01-01")._2.isEmpty)
    assert(byDay("2024-01-21")._2.isEmpty)
    // interior: trend = the count itself, detrended 0 -> seasonal 0
    assert(byDay("2024-01-10") ==
      ((10L, Some(10.0), Some(0.0), Some(0.0))))
    // seasonal indices sum to ~0 across the week
    val seas = out.flatMap(r => Option(r.get(4)).map(_ => r.getDouble(4)))
    assert(math.abs(out.filter(!_.isNullAt(4)).map(_.getDouble(4))
      .distinct.sum) < 1e-4)
    // identity where all three parts exist
    out.filter(r => !r.isNullAt(3) && !r.isNullAt(5)).foreach { r =>
      val lhs = r.getLong(2).toDouble
      val rhs = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(lhs - rhs) < 1e-5, s"identity broke at $r")
    }
    // partition invariance
    def run(parts: Int) = Events.seasonalDecompose(
      ramp.toDF("k", "at").repartition(parts), "k", "at")
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(17))
  }

  test("kmCurves: per-arm KM + Nelson-Aalen hand values") {
    import spark.implicits._
    val df = Seq(("A", 1L, 1), ("A", 2L, 1), ("A", 3L, 0),
      ("B", 1L, 1), ("B", 4L, 1), ("B", 5L, 0)).toDF("g", "t", "e")
    val out = Events.kmCurves(df, "g", "t", "e").collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // arm A: risk 3 -> S 2/3 H 1/3; risk 2 -> S 1/3 H 5/6; censor row
    assert(out(("A", 1.0)) == ((3L, r6(2.0 / 3.0), r6(1.0 / 3.0))))
    assert(out(("A", 2.0))._2 == r6(1.0 / 3.0))
    assert(out(("A", 2.0))._3 == r6(1.0 / 3.0 + 0.5))
    assert(out(("A", 3.0)) == ((1L, r6(1.0 / 3.0), r6(1.0 / 3.0 + 0.5))))
    // arm B censors at 5: survival flat after t=4
    assert(out(("B", 4.0))._2 == r6(1.0 / 3.0))
    assert(out(("B", 5.0))._2 == r6(1.0 / 3.0))
    // everyone dies at the last time: survival pinned to exactly 0
    val all = Seq(("C", 1L, 1), ("C", 2L, 1)).toDF("g", "t", "e")
    val c = Events.kmCurves(all, "g", "t", "e").collect()
    assert(c.last.getDouble(5) == 0.0)
    // partition invariance
    val big = (1 to 4000).map(i => (if (i % 2 == 0) "A" else "B",
      (i * 7 % 97).toLong, i % 3 min 1))
    def run(parts: Int) =
      Events.kmCurves(big.toDF("g", "t", "e").repartition(parts),
        "g", "t", "e").collect().map(_.toSeq).toSeq
    assert(run(1) == run(23))
  }

  test("acf: hand linear-ramp autocorrelations, Ljung-Box, constant key") {
    import spark.implicits._
    // daily counts 1..8 on key "a" (t copies of an event on day t),
    // a constant series on key "c"
    val rows = (1 to 8).flatMap(t => Seq.fill(t)(("a", day(t)))) ++
      (1 to 5).map(t => ("c", day(t)))
    val out = Events.acf(rows.toDF("k", "at"), "k", "at", maxLag = 3)
      .collect()
    val a = out.filter(_.getString(0) == "a")
      .map(r => r.getInt(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    // devs of 1..8: den = 42; r1 = 26.25/42, r2 = 11.5/42, r3 = -1/42
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(a(1)._1 == r6(26.25 / 42.0))
    assert(a(2)._1 == r6(11.5 / 42.0))
    // Ljung-Box cumulative: n=8, Q_k = 80 * sum r_j^2/(8-j)
    val rs = Seq(26.25 / 42.0, 11.5 / 42.0)
    val q2 = 80.0 * (rs(0) * rs(0) / 7.0 + rs(1) * rs(1) / 6.0)
    assert(math.abs(a(2)._2 - q2) < 1e-5)
    assert(a(1)._2 < a(2)._2 && a(2)._2 < a(3)._2) // cumulative grows
    // constant series: zero variance -> null acf and lb_q
    val c = out.filter(_.getString(0) == "c")
    assert(c.nonEmpty && c.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    // lags beyond the series length emit no row
    val short = (1 to 3).map(t => ("s", day(t), t))
      .flatMap { case (k, d, n) => Seq.fill(n)((k, d)) }
    val so = Events.acf(short.toDF("k", "at"), "k", "at", maxLag = 5)
      .collect().filter(_.getString(0) == "s")
    assert(so.map(_.getInt(1)).max == 2)
  }

  test("ridgeFit: lambda=0 is OLS, shrinkage is monotone, lambda col") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val x0 = (i % 5).toDouble; val x1 = (i % 7).toDouble
      (3.0 + 2.0 * x0 - 1.5 * x1 + (i % 3 - 1) * 0.25, x0, x1)
    }
    val df = rows.toDF("y", "x0", "x1")
    def coefs(l: Double) = Events.ridgeFit(df, "y", Seq("x0", "x1"), l)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    val ols = Events.olsFit(df, "y", Seq("x0", "x1"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(coefs(0.0) == ols) // lambda = 0 IS the OLS solve
    // growing lambda shrinks slope magnitudes monotonically
    val c0 = coefs(0.0); val c1 = coefs(10.0); val c2 = coefs(1000.0)
    assert(math.abs(c1("x0")) < math.abs(c0("x0")))
    assert(math.abs(c2("x0")) < math.abs(c1("x0")))
    assert(math.abs(c2("x1")) < math.abs(c1("x1")))
    // lambda rides the output; partition invariance
    val out = Events.ridgeFit(df, "y", Seq("x0", "x1"), 10.0).collect()
    assert(out.forall(_.getDouble(3) == 10.0))
    def run(parts: Int) = Events.ridgeFit(
      df.repartition(parts), "y", Seq("x0", "x1"), 10.0)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
    intercept[IllegalArgumentException] {
      Events.ridgeFit(df, "y", Seq("x0", "x1"), -1.0)
    }
  }

  test("gammaFit: binary covariate recovers exact log group means, " +
      "zeros dropped") {
    import spark.implicits._
    // saturated binary design: fitted group means = sample means, so
    // intercept = ln(2), slope = ln(6/2) = ln(3) exactly (any V(mu))
    val rows = (0 until 50).map(i => (if (i % 2 == 0) 1.0 else 3.0, 0.0)) ++
      (0 until 50).map(i => (if (i % 2 == 0) 5.0 else 7.0, 1.0))
    val out = Events.gammaFit(rows.toDF("y", "x"), "y", Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(math.abs(out("intercept") - math.log(2.0)) < 1e-6)
    assert(math.abs(out("x") - math.log(3.0)) < 1e-6)
    // y <= 0 rows are dropped, not fitted
    val withZero = ((0.0, 0.0) +: rows).toDF("y", "x")
    val n = Events.gammaFit(withZero, "y", Seq("x"))
      .collect()(0).getLong(2)
    assert(n == 100L)
    // partition invariance
    def run(parts: Int) = Events.gammaFit(
      rows.toDF("y", "x").repartition(parts), "y", Seq("x"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("negBinFit: alpha=0 is Poisson, alpha>0 widens SEs only") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (if (i % 2 == 0) 1.0 else 3.0, 0.0)) ++
      (0 until 50).map(i => (if (i % 2 == 0) 5.0 else 7.0, 1.0))
    val df = rows.toDF("y", "x")
    def fit(a: Double) = Events.negBinFit(df, "y", Seq("x"), a)
      .collect().map(r => r.getString(1) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val pois = Events.poissonFit(df, "y", Seq("x"))
      .collect().map(r => r.getString(1) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val nb0 = fit(0.0)
    // alpha = 0: identical coefficients to Poisson (same seed-started
    // path converges to the same saturated MLE at 6 dp)
    assert(math.abs(nb0("intercept")._1 - pois("intercept")._1) < 1e-6)
    assert(math.abs(nb0("x")._1 - pois("x")._1) < 1e-6)
    // saturated design: coefficients stay the exact log group means
    // for ANY alpha; the SEs widen with alpha
    val nb5 = fit(0.5)
    assert(math.abs(nb5("intercept")._1 - math.log(2.0)) < 1e-6)
    assert(math.abs(nb5("x")._1 - math.log(3.0)) < 1e-6)
    assert(nb5("intercept")._2 > nb0("intercept")._2)
    assert(nb5("x")._2 > nb0("x")._2)
    intercept[IllegalArgumentException] {
      Events.negBinFit(df, "y", Seq("x"), -0.1)
    }
  }

  test("seasonalStrength: pure trend and pure season hit the poles") {
    import spark.implicits._
    // pure trend: counts 1..21 — interior remainder and seasonal are
    // exactly 0, so F_trend = 1 and Var(S+R) = 0 -> null F_seasonal
    val ramp = (1 to 21).flatMap(t => Seq.fill(t)(("a", day(t))))
    val tr = Events.seasonalStrength(ramp.toDF("k", "at"), "k", "at")
      .collect()
    assert(tr.length == 1)
    assert(tr(0).getLong(1) == 15L) // 21 days minus 3-day edges
    assert(tr(0).getDouble(2) == 1.0, s"trend strength: ${tr(0)}")
    assert(tr(0).isNullAt(3), s"flat S+R must yield null: ${tr(0)}")
    // pure season: a fixed weekly pattern, zero trend — every 7-day
    // mean is constant, remainder 0 -> F_seasonal = 1, null F_trend
    val pat = Seq(2, 3, 4, 5, 4, 3, 2)
    val season = (1 to 21).flatMap(t =>
      Seq.fill(pat((t - 1) % 7))(("a", day(t))))
    val se = Events.seasonalStrength(season.toDF("k", "at"), "k", "at")
      .collect()
    assert(se.length == 1)
    assert(se(0).isNullAt(2), s"flat T+R must yield null: ${se(0)}")
    assert(se(0).getDouble(3) == 1.0, s"seasonal strength: ${se(0)}")
    // noise on top of the ramp: both strengths defined, in [0, 1]
    val noisy = (1 to 21).flatMap(t =>
      Seq.fill(t + (t * 13 % 5))(("a", day(t))))
    val nz = Events.seasonalStrength(noisy.toDF("k", "at"), "k", "at")
      .collect()(0)
    assert(!nz.isNullAt(2) && !nz.isNullAt(3))
    assert(nz.getDouble(2) >= 0.0 && nz.getDouble(2) <= 1.0)
    assert(nz.getDouble(3) >= 0.0 && nz.getDouble(3) <= 1.0)
  }

  test("binarySegmentation: planted two-break series splits at both breaks") {
    import spark.implicits._
    // days 1-10 count 10, 11-20 count 20, 21-30 count 60: the level-1
    // CUSUM peaks at day 20 (|cusum| = 300), level-2 pre at day 10
    val rows = (1 to 30).flatMap { d =>
      val c = if (d <= 10) 10 else if (d <= 20) 20 else 60
      Seq.fill(c)(("a", day(d)))
    }
    val out = Events.binarySegmentation(rows.toDF("k", "at"), "k", "at")
      .collect()
      .map(r => (r.getInt(1), r.getString(2)) ->
        (r.getDate(3).toString, r.getDate(4).toString, r.getLong(5),
          r.getDate(6).toString, r.getDouble(7),
          Option(r.get(8)).map(_.asInstanceOf[Double]),
          Option(r.get(9)).map(_.asInstanceOf[Double]))).toMap
    assert(out.size == 3)
    assert(out((1, "all")) == (("2024-01-01", "2024-01-30", 30L,
      "2024-01-20", 300.0, Some(15.0), Some(60.0))))
    assert(out((2, "pre")) == (("2024-01-01", "2024-01-20", 20L,
      "2024-01-10", 50.0, Some(10.0), Some(20.0))))
    // post half is constant: all-zero CUSUM ties to the earliest day
    assert(out((2, "post")) == (("2024-01-21", "2024-01-30", 10L,
      "2024-01-21", 0.0, Some(60.0), Some(60.0))))
    // a single-day key has no interior: level-1 row only
    val one = Events.binarySegmentation(
      Seq(("b", day(5))).toDF("k", "at"), "k", "at").collect()
    assert(one.length == 1 && one(0).getInt(1) == 1)
    assert(one(0).getDouble(7) == 0.0 && one(0).isNullAt(9))
    // partition invariance
    def run(parts: Int) = Events.binarySegmentation(
      rows.toDF("k", "at").repartition(parts), "k", "at")
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(19))
  }

  test("frequentSequences: planted supports, greedy min-end, anti-monotone") {
    import spark.implicits._
    // u1: a b c | u2: a c b | u3: a b — supports at minSupport = 2:
    // L1 a:3 b:3 c:2; L2 a>b:3 a>c:2 (b>c, c>b at 1 are pruned); no L3
    val rows = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(1), 2L), (1L, "c", ts(2), 3L),
      (2L, "a", ts(0), 4L), (2L, "c", ts(1), 5L), (2L, "b", ts(2), 6L),
      (3L, "a", ts(0), 7L), (3L, "b", ts(1), 8L))
      .toDF("u", "et", "at", "id")
    val out = Events.frequentSequences(rows, "u", "et", "at", "id",
        minSupport = 2L, maxLen = 3)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "a" -> ((1, 3L)), "b" -> ((1, 3L)), "c" -> ((1, 2L)),
      "a>b" -> ((2, 3L)), "a>c" -> ((2, 2L))))
    // anti-monotone: an extension never out-supports its prefix or item
    out.keys.filter(_.contains(">")).foreach { pat =>
      val items = pat.split(">")
      val prefix = items.init.mkString(">")
      assert(out(pat)._2 <= out(prefix)._2, s"$pat vs prefix")
      assert(out(pat)._2 <= out(items.last)._2, s"$pat vs last item")
    }
    // greedy min-end, not first-occurrence: u = b a b c contains
    // a>b>c only via the SECOND b — carrying min(pos of b) globally
    // would miss it
    val tricky = Seq(
      (1L, "b", ts(0), 1L), (1L, "a", ts(1), 2L),
      (1L, "b", ts(2), 3L), (1L, "c", ts(3), 4L))
      .toDF("u", "et", "at", "id")
    val t3 = Events.frequentSequences(tricky, "u", "et", "at", "id",
        minSupport = 1L, maxLen = 3)
      .collect().map(_.getString(0)).toSet
    assert(t3.contains("a>b>c"), s"greedy growth missed a>b>c: $t3")
    // ordering ties break on the id column, not arrival order
    val tie = Seq((1L, "x", ts(0), 2L), (1L, "y", ts(0), 1L))
      .toDF("u", "et", "at", "id")
    val t2 = Events.frequentSequences(tie, "u", "et", "at", "id",
        minSupport = 1L, maxLen = 2)
      .collect().map(_.getString(0)).toSet
    assert(t2.contains("y>x") && !t2.contains("x>y"))
    intercept[IllegalArgumentException] {
      Events.frequentSequences(rows, "u", "et", "at", "id", 2L, 5)
    }
    // an item type containing the '>' delimiter would silently merge
    // state across genuinely different patterns — fail loudly instead
    val amb = Seq((1L, "a>b", ts(0), 1L), (1L, "c", ts(1), 2L))
      .toDF("u", "et", "at", "id")
    val e = intercept[IllegalArgumentException] {
      Events.frequentSequences(amb, "u", "et", "at", "id", 1L, 2)
    }
    assert(e.getMessage.contains("delimiter"), e.getMessage)
  }

  test("frequentSequences: gap constraints carry all feasible ends") {
    import spark.implicits._
    // a(1) a(2) b(3) at maxGapEvents = 1: the min-end 'a' (pos 1) is
    // 2 away from b, only the SECOND 'a' reaches it — min-end state
    // would miss the pattern, all-ends state finds it
    val plant = Seq((1L, "a", ts(0), 1L), (1L, "a", ts(1), 2L),
      (1L, "b", ts(2), 3L)).toDF("u", "et", "at", "id")
    val g1 = Events.frequentSequences(plant, "u", "et", "at", "id",
        1L, 2, maxGapEvents = Some(1L)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g1("a>b") == 1L, g1.toString)
    // the gap splits a planted pattern: at adjacent-only, a>c loses
    // u1 (distance 2) and drops below minSupport; a>b keeps u1+u3
    val rows = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(1), 2L), (1L, "c", ts(2), 3L),
      (2L, "a", ts(0), 4L), (2L, "c", ts(1), 5L), (2L, "b", ts(2), 6L),
      (3L, "a", ts(0), 7L), (3L, "b", ts(1), 8L))
      .toDF("u", "et", "at", "id")
    val tight = Events.frequentSequences(rows, "u", "et", "at", "id",
        2L, 3, maxGapEvents = Some(1L)).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(tight == Map(
      "a" -> ((1, 3L)), "b" -> ((1, 3L)), "c" -> ((1, 2L)),
      "a>b" -> ((2, 2L))), tight.toString)
    // a gap wider than any sequence reproduces the unconstrained
    // readout exactly (distinct-user support == min-end state count)
    val loose = Events.frequentSequences(rows, "u", "et", "at", "id",
        2L, 3, maxGapEvents = Some(1000L)).collect()
      .map(_.toSeq).toSet
    val base = Events.frequentSequences(rows, "u", "et", "at", "id",
        2L, 3).collect().map(_.toSeq).toSet
    assert(loose == base, s"$loose vs $base")
    // time gap: b at +10 min only matches within a generous window
    val tg = Seq((1L, "x", ts(0), 1L), (1L, "y", ts(10), 2L))
      .toDF("u", "et", "at", "id")
    def mined(ms: Long) = Events.frequentSequences(tg, "u", "et",
        "at", "id", 1L, 2, maxGapMs = Some(ms)).collect()
      .map(_.getString(0)).toSet
    assert(mined(60000L) == Set("x", "y"), "1 min excludes")
    assert(mined(3600000L) == Set("x", "y", "x>y"), "1 h includes")
    intercept[IllegalArgumentException] {
      Events.frequentSequences(rows, "u", "et", "at", "id", 1L, 2,
        maxGapEvents = Some(0L))
    }
  }

  test("sequenceRules: exact confidences, threshold, gap consistency") {
    import spark.implicits._
    // u1: a b c | u2: a c b | u3: a b — at minSupport 2 the frequent
    // patterns are a:3 b:3 c:2 a>b:3 a>c:2, so the rules read
    // a=>b conf 3/3 and a=>c conf 2/3
    val rows = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(1), 2L), (1L, "c", ts(2), 3L),
      (2L, "a", ts(0), 4L), (2L, "c", ts(1), 5L), (2L, "b", ts(2), 6L),
      (3L, "a", ts(0), 7L), (3L, "b", ts(1), 8L))
      .toDF("u", "et", "at", "id")
    val r = Events.sequenceRules(rows, "u", "et", "at", "id", 2L, 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r == Map(("a", "b") -> ((3L, 3L, 1.0)),
      ("a", "c") -> ((2L, 3L, 0.666667))), r.toString)
    // the confidence threshold cuts the weaker rule
    val hi = Events.sequenceRules(rows, "u", "et", "at", "id", 2L, 3,
        minConfidence = 0.9).collect()
    assert(hi.length == 1 && hi(0).getString(1) == "b", hi.mkString(";"))
    // under a gap the supports (and so the confidences) follow the
    // gapped mining: adjacent-only keeps a=>b at 2/3
    val g = Events.sequenceRules(rows, "u", "et", "at", "id", 2L, 3,
        maxGapEvents = Some(1L)).collect()
    assert(g.length == 1 && g(0).getString(1) == "b" &&
      g(0).getDouble(5) == 0.666667, g.mkString(";"))
    intercept[IllegalArgumentException] {
      Events.sequenceRules(rows, "u", "et", "at", "id", 2L, 3,
        minConfidence = 1.5)
    }
  }

  test("rmtl: exact step areas, the tau identity with rmst, absent cause") {
    import spark.implicits._
    // the ajIncidence hand fixture: CIF_a = 0.25 on [1,4), 0.75 on
    // [4,5); CIF_b = 0.25 on [2,5) — areas 1.5 and 0.75 at tau = 5
    val rows = Seq(("X", 1.0, Some("a")), ("X", 2.0, Some("b")),
      ("X", 3.0, None), ("X", 4.0, Some("a")))
      .toDF("g", "tt", "cz")
    val r = Events.rmtl(rows, "g", "tt", "cz", tauTime = 5.0)
      .collect().map(x => x.getString(1) ->
        (x.getDouble(3), x.getDouble(4))).toMap
    assert(r == Map("a" -> ((1.5, 0.75)), "b" -> ((0.75, 0.25))),
      r.toString)
    // S + sum CIF = 1 pointwise, so RMST + sum RMTL = tau exactly
    val rm = Events.rmst(rows
        .withColumn("e", org.apache.spark.sql.functions
          .when(col("cz").isNotNull, 1L).otherwise(0L)),
        "g", "tt", "e", tauTime = 5.0)
      .collect()(0).getDouble(2)
    assert(math.abs(rm + r.values.map(_._1).sum - 5.0) < 2e-6,
      s"identity: $rm + ${r.values.map(_._1).sum}")
    // a cause with no event by tau is absent (reads RMTL 0)
    val early = Events.rmtl(rows, "g", "tt", "cz", tauTime = 1.5)
      .collect()
    assert(early.length == 1 && early(0).getString(1) == "a" &&
      early(0).getDouble(3) == 0.125, early.mkString(";"))
    intercept[IllegalArgumentException] {
      Events.rmtl(rows, "g", "tt", "cz", tauTime = 0.0)
    }
  }

  test("upliftTLearner: exact per-arm lines and the k=0 mean-difference face") {
    import spark.implicits._
    // arm 0: y = 1 + 2x, arm 1: y = 2 + 5x, exact fits — segment s1
    // holds x in {0,1} (pooled mean 0.5), s2 holds {2,3} (mean 2.5)
    val rows = for {
      t <- Seq(0.0, 1.0); x <- Seq(0.0, 1.0, 2.0, 3.0)
    } yield (t, if (t == 0.0) 1.0 + 2.0 * x else 2.0 + 5.0 * x, x,
      if (x <= 1.0) "s1" else "s2")
    val df = rows.toDF("t", "y", "x", "seg")
    val out = Events.upliftTLearner(df, "t", "y", Seq("x"), "seg")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // mu0(s1) = 1 + 2*0.5 = 2, mu1(s1) = 2 + 5*0.5 = 4.5 -> uplift 2.5
    assert(out("s1") == ((4L, 2.0, 4.5, 2.5)))
    // mu0(s2) = 6, mu1(s2) = 14.5 -> uplift 8.5
    assert(out("s2") == ((4L, 6.0, 14.5, 8.5)))
    // k = 0: both models collapse to the arm means, so every segment's
    // uplift IS the two-arm mean difference (the olsAdjust cross-check)
    val out0 = Events.upliftTLearner(df, "t", "y", Seq(), "seg")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // arm means: mean(1,3,5,7) = 4, mean(2,7,12,17) = 9.5 -> 5.5
    assert(out0("s1") == 5.5 && out0("s2") == 5.5)
    // treatment levels must be exactly {0, 1}
    intercept[IllegalArgumentException] {
      Events.upliftTLearner(
        df.withColumn("t", col("t") + org.apache.spark.sql.functions
          .lit(1.0)), "t", "y", Seq("x"), "seg")
    }
    // null segments are listwise-deleted, not grouped
    val withNull = df.union(Seq((0.0, 9.0, 9.0, null: String))
      .toDF("t", "y", "x", "seg"))
    val outN = Events.upliftTLearner(withNull, "t", "y", Seq("x"), "seg")
      .collect()
    assert(outN.map(_.getString(0)).toSet == Set("s1", "s2"))
  }

  test("quantileFit: exact line, outlier resistance, tau ordering") {
    import spark.implicits._
    // exact linear data: zero residuals leave every pinball weight at
    // the same eps floor, so the weighted solve IS the OLS solve and
    // the line is recovered exactly at any tau
    val line = (1 to 20).map(i => (1.0 + 2.0 * i, i.toDouble))
      .toDF("y", "x")
    Seq(0.5, 0.9).foreach { tau =>
      val f = Events.quantileFit(line, "y", Seq("x"), tau)
        .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
      assert(f("intercept") == 1.0 && f("x") == 2.0, s"tau=$tau: $f")
    }
    // median regression shrugs off one wild row that drags OLS hard
    val dirty = ((1 to 20).map(i => (1.0 + 2.0 * i, i.toDouble)) :+
      (1000.0, 10.0)).toDF("y", "x")
    val med = Events.quantileFit(dirty, "y", Seq("x"), tau = 0.5,
        iters = 8)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(math.abs(med("x") - 2.0) < 1e-3, s"slope dragged: $med")
    assert(math.abs(med("intercept") - 1.0) < 1e-2, s"icept: $med")
    val ols = Events.olsFit(dirty, "y", Seq("x")).collect()
    assert(math.abs(ols(0).getDouble(3) - 1.0) > 5.0,
      "the fixture must actually drag OLS")
    // heteroskedastic two-level noise: the tau=0.9 line sits above the
    // tau=0.1 line (higher intercept), both slopes near the truth
    val het = (1 to 40).map(i =>
      (i.toDouble + (if (i % 2 == 0) 10.0 else 0.0), i.toDouble))
      .toDF("y", "x")
    def icept(tau: Double) = Events.quantileFit(het, "y", Seq("x"),
      tau, iters = 8).collect()(0).getDouble(4)
    assert(icept(0.9) > icept(0.1) + 5.0,
      s"tau ordering: ${icept(0.9)} vs ${icept(0.1)}")
    // loss echoes: zero on the exact fit, positive otherwise
    val lossExact = Events.quantileFit(line, "y", Seq("x"), 0.5)
      .collect()(0).getDouble(5)
    assert(lossExact == 0.0)
    intercept[IllegalArgumentException] {
      Events.quantileFit(line, "y", Seq("x"), tau = 1.0)
    }
    intercept[IllegalArgumentException] {
      Events.quantileFit(line, "y", Seq("x"), 0.5, iters = 0)
    }
    // bad regressors surface as quantileFit's own error, not the
    // shared base projection's 'logistic:' prefix
    val pfx = intercept[IllegalArgumentException] {
      Events.quantileFit(line, "y", Seq.empty, 0.5)
    }
    assert(pfx.getMessage.contains("quantileFit:"), pfx.getMessage)
  }

  test("ajIncidence: hand-computed CIFs, single-cause = 1 - KM, " +
    "additivity") {
    import spark.implicits._
    // 4 subjects, one group: t=1 cause a (nr=4, S->3/4), t=2 cause b
    // (nr=3, term = 0.75/3), t=3 censored, t=4 cause a (nr=1, last
    // subject dies -> survival pinned 0, term = S(2)=0.5)
    val rows = Seq(("X", 1.0, Some("a")), ("X", 2.0, Some("b")),
      ("X", 3.0, None), ("X", 4.0, Some("a")))
      .toDF("g", "tt", "cz")
    val r = Events.ajIncidence(rows, "g", "tt", "cz").collect()
    assert(r.length == 3)
    val byKey = r.map(x => (x.getString(2), x.getDouble(1)) -> x).toMap
    val a1 = byKey(("a", 1.0))
    assert(a1.getLong(3) == 4L && a1.getLong(4) == 1L)
    assert(a1.getDouble(5) == 0.75 && a1.getDouble(6) == 0.25, s"$a1")
    val b2 = byKey(("b", 2.0))
    assert(b2.getLong(3) == 3L && b2.getDouble(5) == 0.5 &&
      b2.getDouble(6) == 0.25, s"$b2")
    val a4 = byKey(("a", 4.0))
    assert(a4.getLong(3) == 1L && a4.getDouble(5) == 0.0 &&
      a4.getDouble(6) == 0.75, s"$a4")
    // additivity at the end: sum of final CIFs = 1 - final survival
    assert(math.abs((0.75 + 0.25) - (1.0 - 0.0)) < 1e-9)
    // single cause reduces to 1 - KM at every event time (telescoping)
    val mixed = (1 to 40).map { i =>
      val t = (i % 7 + 1).toDouble
      val e = if (i % 3 == 0) None else Some("e")
      ("G", t, e)
    }.toDF("g", "tt", "cz")
    val aj = Events.ajIncidence(mixed, "g", "tt", "cz")
      .collect().map(x => x.getDouble(1) -> x.getDouble(6)).toMap
    val km = Events.kmCurves(mixed
        .withColumn("ev",
          org.apache.spark.sql.functions.when(col("cz").isNotNull, 1L)
            .otherwise(0L)),
        "g", "tt", "ev")
      .collect().filter(_.getLong(3) > 0) // event rows only
      .map(x => x.getDouble(1) -> x.getDouble(5)).toMap
    assert(aj.keySet == km.keySet, s"$aj vs $km")
    aj.foreach { case (t, cif) =>
      assert(math.abs(cif - (1.0 - km(t))) < 2e-6, s"t=$t: $cif vs km")
    }
    // two causes at one time share S(t-) and n_at_risk
    val tie = Seq(("Y", 1.0, Some("a")), ("Y", 1.0, Some("b")),
      ("Y", 2.0, None)).toDF("g", "tt", "cz")
    val rt = Events.ajIncidence(tie, "g", "tt", "cz").collect()
    assert(rt.length == 2)
    rt.foreach { x =>
      assert(x.getLong(3) == 3L && math.abs(x.getDouble(6) - 1.0 / 3.0)
        < 1e-6, s"$x")
    }
  }

  test("rmst: exact step-function areas, truncation, empty-truncation spine") {
    import spark.implicits._
    // arm A: die at 1 (of 3), die at 2, censor at 3 -> S = 2/3, 1/3,
    // 1/3; arm C: everyone dies by 2 -> S = 0.5 then pinned 0
    val df = Seq(("A", 1L, 1), ("A", 2L, 1), ("A", 3L, 0),
      ("C", 1L, 1), ("C", 2L, 1)).toDF("g", "t", "e")
    val out = Events.rmst(df, "g", "t", "e", tauTime = 5.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // A: 1·1 + 0.666667·1 + 0.333333·1 + 0.333333·2 = 2.666666
    assert(out("A") == ((5.0, 2.666666, 0.333333)), s"${out("A")}")
    // C: 1·1 + 0.5·1 + 0·3 = 1.5, survival pinned to 0 at tau
    assert(out("C") == ((5.0, 1.5, 0.0)), s"${out("C")}")
    // tau before the first event: S ≡ 1 -> RMST = tau (the left-join
    // spine keeps the group even though the truncated curve is empty)
    val early = Events.rmst(df, "g", "t", "e", tauTime = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(early("A") == ((0.5, 1.0)) && early("C") == ((0.5, 1.0)))
    // mid-interval truncation integrates the partial step
    val mid = Events.rmst(df, "g", "t", "e", tauTime = 1.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(mid("A") - 4.0 / 3.0) < 1e-5, s"${mid("A")}")
    assert(math.abs(mid("C") - 1.25) < 1e-5, s"${mid("C")}")
    intercept[IllegalArgumentException] {
      Events.rmst(df, "g", "t", "e", tauTime = 0.0)
    }
    // partition invariance
    val big = (1 to 2000).map(i => (if (i % 2 == 0) "A" else "B",
      (i * 7 % 53).toLong + 1L, i % 3 min 1))
    def run(parts: Int) = Events.rmst(
      big.toDF("g", "t", "e").repartition(parts), "g", "t", "e", 30.0)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
