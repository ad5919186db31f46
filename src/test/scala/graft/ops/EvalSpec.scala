package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  private def metrics(pairs: Seq[(Long, Long, Double, Int)], k: Int) =
    Eval.rankingMetrics(
      pairs.toDF("qid", "cid", "score", "rel"), "qid", "cid", "score", "rel", k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  test("hand-computed recall/MRR/nDCG on a 5-candidate ranking") {
    // q1 ranking by score desc: c1(rel) c2 c3(rel) c4 c5(rel outside k=3)
    val pairs = Seq(
      (1L, 1L, 0.9, 1), (1L, 2L, 0.8, 0), (1L, 3L, 0.7, 1),
      (1L, 4L, 0.6, 0), (1L, 5L, 0.5, 1))
    val m = metrics(pairs, k = 3)
    val (nRel, recall, mrr, ndcg) = m(1L)
    assert(nRel == 3L)
    assert(math.abs(recall - 2.0 / 3.0) < 1e-12)
    assert(mrr == 1.0)
    val dcg = 1.0 / log2(2) + 1.0 / log2(4)
    val idcg = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(math.abs(ndcg - dcg / idcg) < 1e-12)
  }

  test("first relevant at rank 2 halves MRR; perfect prefix gives nDCG 1") {
    val m = metrics(Seq(
      (7L, 1L, 0.9, 0), (7L, 2L, 0.8, 1), (7L, 3L, 0.7, 0),
      (8L, 1L, 0.9, 1), (8L, 2L, 0.8, 1), (8L, 3L, 0.7, 0)), k = 3)
    assert(m(7L)._3 == 0.5)
    assert(math.abs(m(8L)._4 - 1.0) < 1e-12)
    assert(m(8L)._2 == 1.0 && m(8L)._3 == 1.0)
  }

  test("zero relevant candidates scores 0 everywhere, never null") {
    val m = metrics(Seq((3L, 1L, 0.9, 0), (3L, 2L, 0.8, 0)), k = 10)
    assert(m(3L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("ties broken by candidate id: lower id ranks first") {
    // both rel candidates share score; with k=1 only cid=1 is in the cut
    val m = metrics(Seq((5L, 2L, 0.8, 1), (5L, 1L, 0.8, 0)), k = 1)
    assert(m(5L)._3 == 0.0, "cid=1 (rel=0) must win the tie at rank 1")
  }

  test("macroAverage over per-query rows") {
    val per = Seq(
      (1L, 2L, 1.0, 1.0, 1.0), (2L, 2L, 0.5, 0.5, 0.5))
      .toDF("qid", "n_rel", "recall_at_k", "mrr_at_k", "ndcg_at_k")
    val r = Eval.macroAverage(per).head
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 0.75 && r.getDouble(2) == 0.75 &&
      r.getDouble(3) == 0.75)
  }

  test("labelRankingEval: recall@k is 1 when all same-label vectors lead") {
    // two tight clusters on orthogonal axes; label == cluster
    val rows = (0 until 20).map { i =>
      val c = i % 2
      val base = Array.fill(4)(0.001f * i)
      base(c) = 1.0f
      (i.toLong, base.toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Eval.labelRankingEval(emb, "vec_id", "embedding", "label",
      org.apache.spark.sql.functions.col("vec_id") < 4,
      org.apache.spark.sql.functions.col("vec_id") < 20, k = 9)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // each query has 9 same-label candidates (10 per cluster minus self)
    assert(out.size == 4)
    out.foreach { case (q, recall) =>
      assert(recall == 1.0, s"query $q recall $recall")
    }
  }

  test("binaryAuc: matches the naive pairwise definition with tie half-credit") {
    import spark.implicits._
    def naiveAuc(rows: Seq[(Double, Int)]): Double = {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      BigDecimal(wins / (pos.size * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // ties across and within classes, perfect + inverted regions
    val rows = Seq(
      (0.9, 1), (0.9, 0), (0.8, 1), (0.8, 1), (0.7, 0),
      (0.5, 1), (0.5, 0), (0.5, 0), (0.3, 0), (0.3, 1), (0.1, 0))
    val got = Eval.binaryAuc(rows.toDF("score", "label"), "score", "label")
      .head()
    assert(got.getLong(0) == 5L && got.getLong(1) == 6L)
    assert(got.getDouble(2) == naiveAuc(rows), s"got $got")
    // partition invariance (the prefix-sum offsets must not depend on
    // the layout)
    val got8 = Eval.binaryAuc(rows.toDF("score", "label").repartition(8),
      "score", "label").head()
    assert(got8.getDouble(2) == naiveAuc(rows))
    // perfect separation = 1.0; single-class input -> null
    assert(Eval.binaryAuc(Seq((0.9, 1), (0.1, 0)).toDF("score", "label"),
      "score", "label").head().getDouble(2) == 1.0)
    assert(Eval.binaryAuc(Seq((0.9, 1), (0.1, 1)).toDF("score", "label"),
      "score", "label").head().isNullAt(2))
  }

  test("prCurve: hand-computed thresholds, tie collapse, AP; partition invariance") {
    import spark.implicits._
    // scores desc: 0.9 (y=1), 0.8 (y=1, y=0 tied), 0.5 (y=0), 0.3 (y=1)
    val rows = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0), (0.3, 1))
    def runOn(df: org.apache.spark.sql.DataFrame) =
      Eval.prCurve(df, "score", "label").collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .sortBy(-_._1).toSeq
    val got = runOn(rows.toDF("score", "label"))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // thresholds: 0.9 -> tp1 fp0; 0.8 -> tp2 fp1 (tie collapsed);
    // 0.5 -> tp2 fp2; 0.3 -> tp3 fp2
    val exp = Seq(
      (0.9, 1L, 0L, 1.0, r6(1.0 / 3)),
      (0.8, 2L, 1L, r6(2.0 / 3), r6(2.0 / 3)),
      (0.5, 2L, 2L, 0.5, r6(2.0 / 3)),
      (0.3, 3L, 2L, 0.6, 1.0))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == exp, got.toString)
    // AP = (1/3)*1.0 + (1/3)*2/3 + 0*0.5 + (1/3)*0.6 (np per threshold:
    // 1,1,0,1), via the decimal fold on 6-dp precisions
    val ap = r6((1 * 1.0 + 1 * r6(2.0 / 3) + 0 * 0.5 + 1 * 0.6) / 3)
    assert(got.head._6 == ap, s"${got.head._6} vs $ap")
    // partition invariance of the prefix offsets
    assert(runOn(rows.toDF("score", "label").repartition(7)) == got)
    // no positives -> fail fast
    intercept[IllegalArgumentException] {
      Eval.prCurve(Seq((0.5, 0)).toDF("score", "label"), "score", "label")
    }
  }

  test("calibration: hand-computed bins, top-bin inclusion of 1.0, ECE fold") {
    import spark.implicits._
    val rows = Seq(
      (0.05, 0), (0.15, 0), (0.18, 1), // bins 0 and 1
      (0.95, 1), (1.0, 1))             // bin 9 (1.0 clamps in)
    val got = Eval.calibration(rows.toDF("p", "y"), "p", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == Set(0, 1, 9))
    assert(got(0) == (1L, 0.05, 0.0, got(0)._4))
    assert(got(1)._1 == 2L && got(1)._2 == 0.165 && got(1)._3 == 0.5)
    assert(got(9)._1 == 2L && got(9)._2 == 0.975 && got(9)._3 == 1.0)
    // ece = (1*|0-0.05| + 2*|0.5-0.165| + 2*|1-0.975|) / 5
    val ece = BigDecimal((1 * 0.05 + 2 * 0.335 + 2 * 0.025) / 5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._4 == ece, s"ece ${got(0)._4} != $ece")
  }

  test("confusionReport: hand-checked counts and statistics") {
    import spark.implicits._
    // threshold .5: tp=3 fp=1 tn=4 fn=2
    val rows = Seq(
      (0.9, 1), (0.8, 1), (0.6, 1), (0.7, 0),        // predicted positive
      (0.4, 0), (0.3, 0), (0.2, 0), (0.1, 0),        // true negatives
      (0.4, 1), (0.2, 1))                            // false negatives
      .toDF("score", "label")
    val r = Eval.confusionReport(rows, "score", "label", 0.5).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 1L, 4L, 2L)))
    assert(r.getDouble(5) == 0.75)            // precision 3/4
    assert(r.getDouble(6) == 0.6)             // recall 3/5
    val f1 = BigDecimal(2.0 * 0.75 * 0.6 / 1.35)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(7) == f1)
    assert(r.getDouble(8) == 0.7)             // accuracy 7/10
    val mcc = BigDecimal((3.0 * 4 - 1.0 * 2) /
        math.sqrt(4.0 * 5 * 5 * 6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(9) == mcc)
  }

  test("cohenKappa: hand-computed multiclass agreement") {
    import spark.implicits._
    // 2x2: a=b on 7 of 10; marginals A: {x:6, y:4}, B: {x:5, y:5}
    // po = 0.7; pe = (6*5 + 4*5)/100 = 0.5; kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(4)(("x", "x")) ++ Seq.fill(2)(("x", "y")) ++
      Seq.fill(1)(("y", "x")) ++ Seq.fill(3)(("y", "y"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
  }

  test("cohenKappa: perfect agreement is 1, degenerate marginals null") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, "a", "b").collect()(0)
      .getDouble(3) == 1.0)
    // both raters always say the same single class: pe = 1 -> null
    val degen = Seq.fill(5)(("x", "x")).toDF("a", "b")
    assert(Eval.cohenKappa(degen, "a", "b").collect()(0).isNullAt(3))
  }

  test("confusionReport: degenerate thresholds yield nulls, not fake zeros") {
    import spark.implicits._
    val rows = Seq((0.2, 1), (0.3, 0)).toDF("score", "label")
    // threshold above everything: no predicted positives
    val hi = Eval.confusionReport(rows, "score", "label", 0.9).collect()(0)
    assert(hi.isNullAt(5) && hi.getDouble(6) == 0.0 && hi.isNullAt(7))
    // single-class data: MCC denominator 0 -> null
    val one = Eval.confusionReport(
      Seq((0.9, 1), (0.1, 1)).toDF("score", "label"),
      "score", "label", 0.5).collect()(0)
    assert(one.isNullAt(9))
  }

  test("isotonicCalibration: equals naive PAV, monotone, identity on " +
    "already-monotone bins") {
    import spark.implicits._
    // bins 1,4,7 with frac_pos 0.8, 0.2, 0.6 (violations both ways)
    val rows =
      (1 to 10).map(i => (0.15, if (i <= 8) 1 else 0)) ++   // bin 1: 0.8
      (1 to 20).map(i => (0.45, if (i <= 4) 1 else 0)) ++   // bin 4: 0.2
      (1 to 10).map(i => (0.75, if (i <= 6) 1 else 0))      // bin 7: 0.6
    val out = Eval.isotonicCalibration(rows.toDF("p", "y"), "p", "y", 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1, 4, 7))
    // naive PAV reference: pool adjacent violators with weights,
    // re-expand each block's value to its member positions
    def pavPos(w: Seq[Long], v: Seq[Double]): Seq[Double] = {
      case class B(var w: Long, var v: Double, var cnt: Int)
      val bs = scala.collection.mutable.ArrayBuffer.empty[B]
      for ((wi, vi) <- w.zip(v)) {
        bs += B(wi, vi, 1)
        while (bs.length >= 2 && bs(bs.length - 2).v >= bs.last.v) {
          val b2 = bs.remove(bs.length - 1)
          val b1 = bs.remove(bs.length - 1)
          bs += B(b1.w + b2.w,
            (b1.w * b1.v + b2.w * b2.v) / (b1.w + b2.w),
            b1.cnt + b2.cnt)
        }
      }
      bs.toSeq.flatMap(b => Seq.fill(b.cnt)(b.v))
    }
    val expect = pavPos(Seq(10L, 20L, 10L), Seq(0.8, 0.2, 0.6))
    // bins 1 & 4 pool to (10*0.8+20*0.2)/30 = 0.4; bin 7 stays 0.6
    assert(math.abs(expect(0) - 0.4) < 1e-12)
    val got = Seq(out(1)._3, out(4)._3, out(7)._3)
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"$got vs $expect") }
    // monotone by construction
    assert(got == got.sorted)
    // already-monotone bins calibrate to themselves
    val mono = (1 to 10).map(i => (0.15, if (i <= 2) 1 else 0)) ++
      (1 to 10).map(i => (0.55, if (i <= 5) 1 else 0)) ++
      (1 to 10).map(i => (0.95, if (i <= 9) 1 else 0))
    val m = Eval.isotonicCalibration(mono.toDF("p", "y"), "p", "y", 10)
      .collect().map(r => r.getDouble(3) -> r.getDouble(4))
    m.foreach { case (fp, cal) => assert(fp == cal, s"$m") }
  }

  test("brierDecomposition: hand-computed Murphy terms, identity for " +
    "bucket-constant forecasts, degenerate base rate") {
    import spark.implicits._
    // bucket-constant forecasts: p in {0.25, 0.75} only -> within_var 0
    // bucket 2 (0.25): 4 rows, 1 positive; bucket 7 (0.75): 4 rows, 3 pos
    val rows = Seq((0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
      (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0))
    val r = Eval.brierDecomposition(rows.toDF("p", "y"), "p", "y", 10)
      .collect()(0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ybar = 4.0 / 8.0
    val rel = (4.0 * math.pow(0.25 - 0.25, 2) +
      4.0 * math.pow(0.75 - 0.75, 2)) / 8.0 // forecasts hit the rates
    val res = (4.0 * math.pow(0.25 - ybar, 2) +
      4.0 * math.pow(0.75 - ybar, 2)) / 8.0
    val brier = rows.map { case (p, y) => (p - y) * (p - y) }.sum / 8.0
    assert(r.getLong(0) == 8L && r.getInt(1) == 10)
    assert(r.getDouble(2) == r6(brier))
    assert(r.getDouble(3) == r6(rel) && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == r6(res))
    // bucket-constant + calibrated: brier = rel - res + unc exactly
    assert(r.getDouble(6) == 0.0, s"within_resid ${r.getDouble(6)}")
    assert(r.getDouble(5) == 0.25) // ybar = 0.5 -> unc 0.25
    // within-bucket forecast spread surfaces in the remainder (hand
    // value: brier 0.1691, rel 0.0625, res 0.0625, unc 0.1875 ->
    // -0.0184 — variance minus twice covariance, sign unrestricted)
    val spread = Seq((0.21, 0), (0.29, 1), (0.71, 1), (0.79, 1))
    val s = Eval.brierDecomposition(spread.toDF("p", "y"), "p", "y", 10)
      .collect()(0)
    assert(s.getDouble(6) == -0.0184, s"got ${s.getDouble(6)}")
    // all-negative labels: unc = 0, resolution 0
    val neg = Seq((0.2, 0), (0.4, 0), (0.6, 0)).toDF("p", "y")
    val n = Eval.brierDecomposition(neg, "p", "y", 10).collect()(0)
    assert(n.getDouble(5) == 0.0 && n.getDouble(4) == 0.0)
  }

  test("splitConformal: exact order statistic, guarantee, degenerate") {
    import spark.implicits._
    // residuals 1..10 at alpha=0.2: k = ceil(11*0.8) = 9 -> q_hat = 9
    val rows = (1 to 10).map(i => (0.0, i.toDouble))
    val r = Eval.splitConformal(rows.toDF("pred", "actual"), "pred",
      "actual", alpha = 0.2).collect()(0)
    assert(r.getLong(0) == 10L && r.getDouble(2) == 9.0)
    assert(r.getDouble(3) == 0.9) // coverage = 9/10 >= 0.8
    // not enough data to certify the level -> nulls, not a fake width
    val tiny = Eval.splitConformal(rows.take(5).toDF("pred", "actual"),
      "pred", "actual", alpha = 0.01).collect()(0)
    assert(tiny.isNullAt(2) && tiny.isNullAt(3))
    // the finite-sample guarantee holds on an arbitrary residual set
    val big = (1 to 3000).map(i => ((i * 37 % 211).toDouble,
      (i * 13 % 499).toDouble))
    val g = Eval.splitConformal(big.toDF("pred", "actual"), "pred",
      "actual", alpha = 0.1).collect()(0)
    assert(g.getDouble(3) >= 0.9)
    // partition invariance
    def run(parts: Int) = Eval.splitConformal(
      big.toDF("pred", "actual").repartition(parts), "pred", "actual",
      0.1).collect()(0).toSeq
    assert(run(1) == run(17))
  }

  test("liftChart: hand deciles, tie order by id, zero-positive nulls") {
    import spark.implicits._
    // 10 rows, descending score by id; positives at ids 1,2,3,7
    val rows = (1 to 10).map(i =>
      (i.toLong, (11 - i).toDouble, if (Set(1, 2, 3, 7)(i)) 1 else 0))
    val out = Eval.liftChart(rows.toDF("id", "s", "y"), "s", "y", "id",
      buckets = 5).collect()
    assert(out.map(_.getInt(0)).toSeq == (0 until 5))
    val b0 = out(0) // ids 1,2: both positive; base rate 0.4
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 2L)
    assert(b0.getDouble(3) == 1.0 && b0.getDouble(4) == 2.5)
    assert(b0.getDouble(5) == 0.5 && b0.getDouble(6) == 2.5)
    val b3 = out(3) // ids 7,8: one positive
    assert(b3.getLong(2) == 1L && b3.getDouble(3) == 0.5)
    assert(out(4).getDouble(5) == 1.0) // full capture at the last bucket
    // tied scores: bucket composition falls back to id order
    val tied = (1 to 10).map(i => (i.toLong, 1.0, if (i <= 5) 1 else 0))
    val t0 = Eval.liftChart(tied.toDF("id", "s", "y"), "s", "y", "id",
      buckets = 2).collect()
    assert(t0(0).getLong(2) == 5L && t0(1).getLong(2) == 0L)
    // no positives anywhere: lift columns null
    val none = (1 to 6).map(i => (i.toLong, i.toDouble, 0))
    val nn = Eval.liftChart(none.toDF("id", "s", "y"), "s", "y", "id",
      buckets = 3).collect()
    assert(nn.forall(r => r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)))
    // partition invariance
    val big = (1 to 5000).map(i =>
      (i.toLong, (i * 13 % 211).toDouble, i % 3 min 1))
    def run(parts: Int) = Eval.liftChart(
      big.toDF("id", "s", "y").repartition(parts), "s", "y", "id", 10)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(17))
  }
}
