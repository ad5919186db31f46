package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    ("a", "one two three", 10L),
    ("a", "four five", 20L),
    ("a", "six", 30L),
    ("b", "seven eight nine ten", 100L)
  ).toDF("source", "text", "n_chars")

  test("dataCard exact: counts, token volume, interpolated percentiles") {
    val card = Profile.dataCard(docs, "source", "text", "n_chars", exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // group a: lens 10,20,30 -> p50=20 (exact mid), p90 interpolates
    // between 20 and 30 at rank (3-1)*0.9=1.8 -> 28.0
    assert(card("a") == ((3L, 6L, 20.0, 20.0, 28.0)))
    assert(card("b") == ((1L, 4L, 100.0, 100.0, 100.0)))
  }

  test("dataCard approx agrees with exact on small groups") {
    val exact = Profile.dataCard(docs, "source", "text", "n_chars", exact = true)
    val approx = Profile.dataCard(docs, "source", "text", "n_chars", exact = false)
    // at n=3/1 per group the GK sketch holds every value: approx p50
    // returns an actual element; allow it to differ from the
    // interpolated exact value by at most the group's value spread
    val e = exact.collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val a = approx.collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(e.keySet == a.keySet)
    e.keySet.foreach { k => assert(math.abs(e(k) - a(k)) <= 10.0) }
  }

  test("dataCard matches a brute-force computation on fixture data") {
    val d = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val card = Profile.dataCard(d, "lang", "text", "n_chars", exact = true)
    val brute = d.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = card.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute)
    // p50 <= p90 everywhere, means positive
    card.collect().foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(5))
      assert(r.getDouble(3) > 0)
    }
  }

  test("sourceKl: corpus-identical groups score 0; drifted groups score > 0") {
    import spark.implicits._
    // s1 and s2 share the corpus distribution exactly (each is half of
    // every token's mass) -> KL = 0 for both
    val uniform = Seq(
      ("s1", "a a b"), ("s2", "a a b")).toDF("source", "text")
    val z = Profile.sourceKl(uniform, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(z("s1") == 0.0 && z("s2") == 0.0)

    // hand value: corpus a:3 b:3; s1 = {a:2, b:1}, tot_g=3, p(a)=p(b)=0.5
    val skewed = Seq(
      ("s1", "a a b"), ("s2", "a b b")).toDF("source", "text")
    val kl = Profile.sourceKl(skewed, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    val expect = BigDecimal(
      (2.0 / 3) * math.log((2.0 / 3) / 0.5) + (1.0 / 3) * math.log((1.0 / 3) / 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kl.map(_._2) == List(3L, 3L))
    assert(kl(0)._3 == expect)
    assert(kl(1)._3 == expect) // symmetric construction
  }

  test("columnProfile: nulls, exact distinct, typed min/max as strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 30),
      (3L, Some("a"), 10),
      (4L, Some("a"), 20)
    ).toDF("id", "tag", "v")
    val prof = Profile.columnProfile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(prof("id") == (4L, 0L, 4L, "1", "4"))
    assert(prof("tag") == (4L, 1L, 2L, "a", "b"))
    assert(prof("v") == (4L, 0L, 3L, "10", "30"))
    // one row per requested column, only requested columns
    assert(prof.keySet == Set("id", "tag", "v"))
  }

  test("keySkewProfile: ranks, shares, cumulative shares, tie determinism") {
    import org.apache.spark.sql.functions.col
    // key 'a' x5, 'b' x3, 'c' x3, 'd' x1 -> total 12; b/c tie breaks b first
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("k")
    val out = Profile.keySkewProfile(df, "k", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, "a", 5L, round6(5.0 / 12), round6(5.0 / 12)),
      (2, "b", 3L, 0.25, round6(8.0 / 12)),
      (3, "c", 3L, 0.25, round6(11.0 / 12))))
    // partition invariance
    val out16 = Profile.keySkewProfile(df.repartition(16), "k", 3)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out16 == out.map(t => (t._1, t._2)).toSeq)
  }

  test("giniLorenz: perfect equality gives gini 0, hand case checks out") {
    import spark.implicits._
    val eq = Profile.giniLorenz(Seq.fill(40)(5.0).toDF("x"), "x", 4)
      .collect()
    assert(eq.forall(_.getDouble(4) == 0.0))
    assert(eq.map(r => r.getDouble(3)).toSeq == Seq(0.25, 0.5, 0.75, 1.0))
    // x = 1..4: gini = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val g = Profile.giniLorenz(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"), "x", 2)
      .collect()
    assert(g.forall(_.getDouble(4) == 0.25))
    // buckets: {1,2} and {3,4} -> cum shares 0.3, 1.0
    assert(g.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))).toSeq ==
      Seq((0, 2L, 3.0, 0.3), (1, 2L, 7.0, 1.0)))
  }

  test("giniLorenz: total concentration approaches 1 - 1/n; partition-invariant") {
    import spark.implicits._
    // one holder of everything: gini = (n-1)/n
    val xs = Seq.fill(9)(0.0) :+ 100.0
    val out = Profile.giniLorenz(xs.toDF("x"), "x", 5).collect()
    assert(math.abs(out.head.getDouble(4) - 0.9) < 1e-9)
    val a = Profile.giniLorenz(xs.toDF("x").repartition(1), "x", 5)
      .collect().map(_.toSeq).toSeq
    val b = Profile.giniLorenz(xs.toDF("x").repartition(13), "x", 5)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("giniLorenz: tied values straddling a bucket boundary stay deterministic") {
    import spark.implicits._
    // 6 copies of 2.0 over 4 buckets: ties cross every boundary
    val out = Profile.giniLorenz(Seq.fill(6)(2.0).toDF("x"), "x", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(4)))
    assert(out.map(_._2).sum == 6L)
    assert(out.forall(_._3 == 0.0))
  }

  test("benford: digits come from the decimal string, spine fills gaps") {
    import spark.implicits._
    // powers of 10 must classify as digit 1 (the log10-floor trap)
    val vals = Seq(10.0, 100.0, 1000.0, 0.25, -5.0, 0.0, 923.11)
    val out = Profile.benford(vals.toDF("v"), "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 9)
    val byDigit = out.map(t => t._1 -> t._2).toMap
    // -5 and 0 dropped; 10,100,1000 -> 1; 0.25 -> 2; 923.11 -> 9
    assert(byDigit(1) == 3L && byDigit(2) == 1L && byDigit(9) == 1L)
    assert(byDigit(5) == 0L)
    assert(out.map(_._2).sum == 5L)
  }

  test("benford: conforming data yields a small chi2, uniform data a big one") {
    import spark.implicits._
    // geometric series spanning decades follows Benford closely
    val benfordish = (0 until 2000).map(i => math.pow(1.007, i))
    val chiGood = Profile.benford(benfordish.toDF("v"), "v")
      .collect().head.getDouble(4)
    // constant-first-digit data violates it maximally
    val flat = (0 until 2000).map(i => 900.0 + (i % 100))
    val chiBad = Profile.benford(flat.toDF("v"), "v")
      .collect().head.getDouble(4)
    assert(chiGood < 30.0, s"chiGood=$chiGood")
    assert(chiBad > 1000.0, s"chiBad=$chiBad")
  }

  test("joinSizeProbe: exact product counts and skew readout") {
    import spark.implicits._
    val l = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("k", "x")
    val r = (1 to 10).map(i => ("a", i)) ++ Seq(("b", 1), ("z", 1))
    val out = Profile.joinSizeProbe(l, "k", r.toDF("k2", "y"), "k2")
      .collect()(0)
    // shared keys: a (2*10=20), b (1*1=1) -> 21 rows; top = a at 20/21
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((3L, 3L, 2L, 21L)))
    assert(out.getString(4) == "a" && out.getLong(5) == 20L)
    assert(math.abs(out.getDouble(6) - round6(20.0 / 21)) < 1e-9)
    // probe prediction equals the actual join size
    assert(l.join(r.toDF("k2", "y"), l("k") === col("k2")).count() == 21L)
  }

  test("joinSizeProbe: disjoint keys keep the summary row, null top") {
    import spark.implicits._
    val out = Profile.joinSizeProbe(
      Seq(("a", 1)).toDF("k", "x"), "k",
      Seq(("z", 1)).toDF("k2", "y"), "k2").collect()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 0L && out(0).isNullAt(4))
  }

  test("percentileNormalize: within-group ranks, ties share a rank") {
    import spark.implicits._
    val df = Seq(("s1", 1L, 10), ("s1", 2L, 20), ("s1", 3L, 20),
      ("s1", 4L, 30), ("s2", 5L, 99)).toDF("src", "id", "v")
    val out = Curation.percentileNormalize(df, "src", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // s1 ranks over 4 rows: 10 -> 0, 20/20 -> 1/3 both, 30 -> 1
    assert(out(1L) == 0.0)
    assert(out(2L) == out(3L) && math.abs(out(2L) - round6(1.0 / 3)) < 1e-9)
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0) // single-row group: percent_rank 0
  }

  test("correlationMatrix: perfect, inverse, and null-pair handling") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, 5.0, Some(1.0)),
      (2.0, 4.0, 4.0, None),
      (3.0, 6.0, 3.0, Some(3.0)),
      (4.0, 8.0, 2.0, Some(7.0)))
      .toDF("a", "b", "c", "d")
    val out = Profile.correlationMatrix(df, Seq("a", "b", "c", "d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))
      .toMap
    assert(out(("a", "b")) == ((4L, Some(1.0))))   // y = 2x
    assert(out(("a", "c")) == ((4L, Some(-1.0))))  // inverse
    assert(out(("a", "d"))._1 == 3L)               // pairwise deletion
    assert(out(("a", "d"))._2.exists(r => r > 0.9))
    assert(out.size == 6)
  }

  test("correlationMatrix: constant column yields null r, invariance") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 5.0)).toDF("a", "b")
    val out = Profile.correlationMatrix(df, Seq("a", "b")).collect()(0)
    assert(out.isNullAt(3))
    val big = (1 to 5000).map(i =>
      ((i % 97).toDouble, (i % 89).toDouble)).toDF("a", "b")
    val r1 = Profile.correlationMatrix(big.repartition(1), Seq("a", "b"))
      .collect()(0).getDouble(3)
    val r2 = Profile.correlationMatrix(big.repartition(37), Seq("a", "b"))
      .collect()(0).getDouble(3)
    assert(r1 == r2)
  }

  test("chiSquareIndependence: independent grid scores ~0, dense zeros count") {
    import spark.implicits._
    // perfectly independent 2x2: chi2 exactly 0
    val ind = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(60)(("y", "v"))
    val o1 = Profile.chiSquareIndependence(ind.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert((o1.getLong(0), o1.getLong(1), o1.getLong(2), o1.getLong(3)) ==
      ((120L, 2L, 2L, 1L)))
    assert(o1.getDouble(4) == 0.0)
    // fully dependent 2x2 (diagonal): chi2 = N
    val dep = Seq.fill(25)(("x", "u")) ++ Seq.fill(25)(("y", "v"))
    val o2 = Profile.chiSquareIndependence(dep.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(o2.getDouble(4) == 50.0) // chi2 = N for a perfect 2x2 diagonal
  }

  test("abcClassify: hand-checked classes, boundary inclusive, ties stable") {
    import spark.implicits._
    // values 50,30,15,4,1 (total 100): cum .5 A, .8 A (<=), .95 B (<=),
    // .99 C, 1.0 C
    val df = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 4.0), (5L, 1.0))
      .toDF("e", "v")
    val out = Profile.abcClassify(df, "e", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 0.5, "A"), (2L, 0.8, "A"),
      (3L, 0.95, "B"), (4L, 0.99, "C"), (5L, 1.0, "C")))
  }

  test("abcClassify: partition invariance of the prefix-sum device") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i.toLong, ((i * 7919) % 500 + 1).toDouble))
    def run(parts: Int) =
      Profile.abcClassify(df.toDF("e", "v").repartition(parts), "e", "v")
        .collect().map(_.toSeq).toSeq
    val a = run(1); val b = run(29)
    assert(a == b)
    // classes are contiguous in rank order: A block, then B, then C
    val classes = a.map(_.last.asInstanceOf[String])
    assert(classes.mkString.matches("A+B+C+"))
    // cum_share is non-decreasing down the ranking
    val shares = a.map(_(2).asInstanceOf[Double])
    assert(shares.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("bootstrapCiMean: brackets the mean, exact on constants, deterministic") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    val r = Profile.bootstrapCiMean(df, "id", "v", replicas = 50)
      .collect()(0)
    assert(r.getLong(0) == 2000L)
    assert(r.getDouble(2) < r.getDouble(1) && r.getDouble(1) < r.getDouble(3),
      s"CI [${r.getDouble(2)}, ${r.getDouble(3)}] must bracket ${r.getDouble(1)}")
    // a constant column has a zero-width interval at the constant
    val const = (1 to 500).map(i => (i.toLong, 7.5)).toDF("id", "v")
    val c = Profile.bootstrapCiMean(const, "id", "v", replicas = 20)
      .collect()(0)
    assert(c.getDouble(1) == 7.5 && c.getDouble(2) == 7.5 &&
      c.getDouble(3) == 7.5)
    // hash-deterministic: same interval at any partitioning
    val a = Profile.bootstrapCiMean(df.repartition(3), "id", "v", 50)
      .collect()(0).toSeq
    val b = Profile.bootstrapCiMean(df.repartition(17), "id", "v", 50)
      .collect()(0).toSeq
    assert(a == b)
    // odd replica count: the phantom replica from the 2-per-digest
    // fan-out is dropped, not averaged in
    val odd = Profile.bootstrapCiMean(df, "id", "v", replicas = 11)
      .collect()(0)
    assert(odd.getInt(4) == 11)
    assert(odd.getDouble(2) <= odd.getDouble(1) &&
      odd.getDouble(1) <= odd.getDouble(3))
  }

  test("bootstrapCiMeanDiff: brackets the true lift, paired zero on " +
    "identical arms, deterministic") {
    import spark.implicits._
    // A: 0..99 repeated (mean 49.5); B: A + exactly 10 -> diff 10
    val rows = (0 until 1000).map { i =>
      (i.toLong, "A", (i % 100).toDouble) } ++
      (0 until 1000).map { i =>
        ((i + 1000).toLong, "B", (i % 100).toDouble + 10.0) }
    val df = rows.toDF("id", "g", "v")
    val r = Profile.bootstrapCiMeanDiff(df, "id", "g", "v", replicas = 50)
      .collect()(0)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 1000L)
    assert(r.getDouble(2) == 49.5 && r.getDouble(3) == 59.5)
    assert(r.getDouble(4) == 10.0)
    assert(r.getDouble(5) < 10.0 && 10.0 < r.getDouble(6),
      s"CI [${r.getDouble(5)}, ${r.getDouble(6)}] must bracket 10")
    assert(r.getInt(7) == 50)
    // both arms CONSTANT at the same value: every replica's diff is
    // exactly 0 -> zero-width interval at 0
    val same = ((1 to 300).map(i => (i.toLong, "A", 3.25)) ++
      (301 to 600).map(i => (i.toLong, "B", 3.25))).toDF("id", "g", "v")
    val s = Profile.bootstrapCiMeanDiff(same, "id", "g", "v", 20)
      .collect()(0)
    assert(s.getDouble(4) == 0.0 && s.getDouble(5) == 0.0 &&
      s.getDouble(6) == 0.0)
    // hash-deterministic across partitionings
    val a = Profile.bootstrapCiMeanDiff(df.repartition(3), "id", "g", "v",
      50).collect()(0).toSeq
    val b = Profile.bootstrapCiMeanDiff(df.repartition(17), "id", "g", "v",
      50).collect()(0).toSeq
    assert(a == b)
    // contract: exactly two groups
    intercept[IllegalArgumentException] {
      Profile.bootstrapCiMeanDiff(
        Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "C", 3.0))
          .toDF("id", "g", "v"), "id", "g", "v", 10)
    }
  }

  test("chiSqUpperTail: textbook 5% critical values at df 1..5") {
    // (critical value, df) pairs with P(chi2_df > x) = 0.05
    val crit = Seq((3.841459, 1), (5.991465, 2), (7.814728, 3),
      (9.487729, 4), (11.070498, 5))
    crit.foreach { case (x, df) =>
      val p = Profile.chiSqUpperTail(x, df)
      assert(math.abs(p - 0.05) < 1e-4, s"df=$df: $p")
    }
    assert(Profile.chiSqUpperTail(0.0, 3) == 1.0)
    assert(Profile.chiSqUpperTail(1000.0, 2) < 1e-12)
  }

  test("kruskalWallis: naive-rank parity with ties, and k=2 H equals " +
    "mannWhitney z-squared") {
    import spark.implicits._
    val data = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
      ("b", 2.0), ("b", 3.0), ("b", 6.0), ("b", 6.0), ("b", 9.0),
      ("c", 4.0), ("c", 6.0), ("c", 7.0), ("c", 8.0))
    val out = Profile.kruskalWallis(data.toDF("g", "v"), "g", "v")
      .collect()
    assert(out.length == 3)
    // naive: pool, sort, average tied ranks, H with tie correction
    val sorted = data.map(_._2).sorted
    def rank(x: Double): Double = {
      val lo = sorted.indexOf(x)
      val hi = sorted.lastIndexOf(x)
      (lo + 1 + hi + 1) / 2.0
    }
    val byG = data.groupBy(_._1).view.mapValues(_.map(t => rank(t._2)))
    val n = data.size.toDouble
    val sumR2n = byG.toSeq.sortBy(_._1)
      .foldLeft(0.0) { case (acc, (_, rks)) =>
        acc + rks.sum * rks.sum / rks.size }
    val hRaw = 12.0 / (n * (n + 1.0)) * sumR2n - 3.0 * (n + 1.0)
    val ties = sorted.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val h = hRaw / (1.0 - ties / (n * n * n - n))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.head.getDouble(4) == r6(h), s"${out.head.getDouble(4)} vs $h")
    assert(out.head.getInt(5) == 2)
    assert(out.head.getDouble(6) == r6(Profile.chiSqUpperTail(h, 2)))
    // per-group rank sums match the naive pooled ranks
    val rsMap = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    byG.foreach { case (g, rks) => assert(rsMap(g) == r6(rks.sum)) }
    // identity: with k = 2 groups, tie-corrected H = mannWhitney z²
    val two = data.filter(t => t._1 != "c").toDF("g", "v")
    val kw = Profile.kruskalWallis(two, "g", "v").collect().head
    val mw = Profile.mannWhitney(two, "g", "v").collect().head
    val z = mw.getDouble(4)
    assert(math.abs(kw.getDouble(4) - z * z) < 1e-5,
      s"H=${kw.getDouble(4)} vs z²=${z * z}")
    // degenerate: all values tied -> null h/p/eta
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0)).toDF("g", "v")
    val fr = Profile.kruskalWallis(flat, "g", "v").collect().head
    assert(fr.isNullAt(4) && fr.isNullAt(6) && fr.isNullAt(7))
    // partition invariance
    val p3 = Profile.kruskalWallis(data.toDF("g", "v").repartition(3),
      "g", "v").collect().map(_.toSeq)
    val p17 = Profile.kruskalWallis(data.toDF("g", "v").repartition(17),
      "g", "v").collect().map(_.toSeq)
    assert(p3.toSeq == p17.toSeq)
  }

  test("bootstrap zero-weight replicas: tiny frames drop degenerate " +
    "replicas instead of dividing by zero") {
    import spark.implicits._
    // two-row constant frame: P(a replica zeroes BOTH weights) = e^(-2)
    // ≈ 0.135, so of 100 replicas ~13 resample to zero total weight —
    // before the guard each threw DIVIDE_BY_ZERO under ANSI; now they
    // drop and every surviving replica's mean IS the constant
    val tiny = Seq((1L, 42.5), (2L, 42.5)).toDF("id", "v")
    val r = Profile.bootstrapCiMean(tiny, "id", "v", replicas = 100)
      .collect()(0)
    assert(r.getDouble(1) == 42.5 && r.getDouble(2) == 42.5 &&
      r.getDouble(3) == 42.5)
    // diff face: 5 constant rows per arm — a replica zeroing either arm
    // (P ≈ 2e^(-5)) drops; survivors all read the same constant diff
    val rows = (1 to 5).map(i => (i.toLong, "A", 10.0)) ++
      (6 to 10).map(i => (i.toLong, "B", 14.0))
    val d = Profile.bootstrapCiMeanDiff(rows.toDF("id", "g", "v"),
      "id", "g", "v", replicas = 100).collect()(0)
    assert(d.getDouble(4) == 4.0 && d.getDouble(5) == 4.0 &&
      d.getDouble(6) == 4.0)
  }

  test("msprtTest: hand algebra, null-effect calm, strong-effect alarm, " +
    "degenerate arms") {
    import spark.implicits._
    // hand-checkable: A = {1,2,3}, B = {4,5,6}, tau = 1
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("g", "y")
    val r = Profile.msprtTest(df, "g", "y", tau = 1.0).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 3.0)
    val v = 1.0 / 3.0 + 1.0 / 3.0 // sample var 1 per arm, n 3
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(5) == r6(v))
    val lam = math.sqrt(v / (v + 1.0)) *
      math.exp((9.0 * 1.0) / ((2.0 * v) * (v + 1.0)))
    assert(r.getDouble(6) == r6(lam))
    assert(r.getDouble(7) == r6(math.min(1.0, 1.0 / lam)))
    assert(r.getDouble(7) < 0.05) // a 3-sigma-ish effect alarms
    // identical arms: lambda < 1 -> p clamps to 1 (no evidence)
    val same = ((1 to 50).map(i => ("A", (i % 7).toDouble)) ++
      (1 to 50).map(i => ("B", (i % 7).toDouble))).toDF("g", "y")
    val s = Profile.msprtTest(same, "g", "y", tau = 1.0).collect()(0)
    assert(s.getDouble(4) == 0.0 && s.getDouble(7) == 1.0)
    // constant arms: V = 0 -> null v/lambda/p
    val const = Seq(("A", 2.0), ("A", 2.0), ("B", 3.0), ("B", 3.0))
      .toDF("g", "y")
    val c = Profile.msprtTest(const, "g", "y", tau = 1.0).collect()(0)
    assert(c.isNullAt(5) && c.isNullAt(6) && c.isNullAt(7))
    intercept[IllegalArgumentException] {
      Profile.msprtTest(Seq(("A", 1.0), ("B", 2.0), ("B", 3.0))
        .toDF("g", "y"), "g", "y", 1.0) // n_a = 1
    }
  }

  test("ksTest: identical, disjoint, and hand-computed gap cases") {
    import spark.implicits._
    // identical samples: D = 0, lambda = 0 -> the small-lambda guard
    // must report p = 1 (the raw 100-term series would read 0)
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val rs = Profile.ksTest(same, "g", "v").collect()(0)
    assert(rs.getDouble(2) == 0.0 && rs.getDouble(3) == 1.0)
    // disjoint supports: D = 1
    val far = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0))
      .toDF("g", "v")
    val rf = Profile.ksTest(far, "g", "v").collect()(0)
    assert(rf.getDouble(2) == 1.0)
    assert(rf.getDouble(3) < 0.4) // tiny n: asymptotic p is loose, not 0
    // hand case with ties across groups: a = {1,2,2,4}, b = {2,3}
    // CDF gaps at x=1: |1/4 - 0|   = 0.25
    //             x=2: |3/4 - 1/2| = 0.25
    //             x=3: |3/4 - 1|   = 0.25
    //             x=4: |1 - 1|     = 0
    val hand = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0),
      ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val rh = Profile.ksTest(hand, "g", "v").collect()(0)
    assert(rh.getLong(0) == 4L && rh.getLong(1) == 2L)
    assert(rh.getDouble(2) == 0.25)
    // partition invariance of the prefix-sum device
    val big = (1 to 4000).map(i =>
      (if (i % 3 == 0) "a" else "b", (i * 37 % 97).toDouble))
    def run(parts: Int) =
      Profile.ksTest(big.toDF("g", "v").repartition(parts), "g", "v")
        .collect()(0).toSeq
    assert(run(1) == run(23))
    // not exactly two groups: loud failure
    intercept[IllegalArgumentException] {
      Profile.ksTest(Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("g", "v"),
        "g", "v").collect()
    }
  }

  test("mannWhitney: matches a naive rank-sum, ties, degenerate input") {
    import spark.implicits._
    val a = Seq(3.0, 5.0, 5.0, 8.0, 12.0)
    val b = Seq(1.0, 5.0, 9.0, 10.0, 11.0, 15.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val r = Profile.mannWhitney(df, "g", "v").collect()(0)
    // naive: mid-ranks over the pooled sorted sample
    val pooled = (a.map((_, "a")) ++ b.map((_, "b"))).sortBy(_._1)
    val ranks = pooled.zipWithIndex.groupBy(_._1._1).toSeq.flatMap {
      case (_, grp) =>
        val mid = grp.map(_._2 + 1).sum.toDouble / grp.size
        grp.map(g => (g._1._2, mid))
    }
    val raNaive = ranks.filter(_._1 == "a").map(_._2).sum
    val (na, nb) = (a.size.toDouble, b.size.toDouble)
    val uaNaive = raNaive - na * (na + 1) / 2.0
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == uaNaive)
    assert(r.getDouble(3) == na * nb - uaNaive) // u_a + u_b = n_a*n_b
    // z sign: group a's values sit lower -> u_a below the mean -> z < 0
    assert(r.getDouble(4) < 0)
    assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
    // tie-corrected sigma: recompute naive z and compare at 6 dp
    val bign = na + nb
    val tieRuns = (a ++ b).groupBy(identity).values.map(_.size)
    val ties = tieRuns.map(t => t.toLong * t * t - t).sum.toDouble
    val sigma2 = na * nb / 12.0 * (bign + 1.0 - ties / (bign * (bign - 1.0)))
    val zNaive = (uaNaive - na * nb / 2.0) / math.sqrt(sigma2)
    assert(math.abs(r.getDouble(4) - zNaive) < 1e-6)
    // all-tied input: zero variance -> null z and p, U still defined
    val flat = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0)).toDF("g", "v")
    val rf = Profile.mannWhitney(flat, "g", "v").collect()(0)
    assert(rf.isNullAt(4) && rf.isNullAt(5))
    assert(rf.getDouble(2) == 1.0) // all mid-ranks 2: ra=4, ua=4-3=1
    // partition invariance
    val big = (1 to 3000).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 13 % 211).toDouble))
    def run(parts: Int) =
      Profile.mannWhitney(big.toDF("g", "v").repartition(parts), "g", "v")
        .collect()(0).toSeq
    assert(run(1) == run(17))
    intercept[IllegalArgumentException] {
      Profile.mannWhitney(Seq(("a", 1.0)).toDF("g", "v"), "g", "v")
        .collect()
    }
  }

  test("distributionDrift: hand PSI/JSD, missing category, identity") {
    import spark.implicits._
    val ref = Seq("a", "a", "b", "b").toDF("k")
    val live = Seq("a", "b", "b", "c").toDF("k")
    val out = Profile.distributionDrift(ref, live, "k").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    def psiT(p: Double, q: Double) = {
      val (pc, qc) = (math.max(p, 1e-6), math.max(q, 1e-6))
      (pc - qc) * math.log(pc / qc)
    }
    def jsdT(p: Double, q: Double) = {
      val m = (p + q) / 2.0
      ((if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)) / 2.0
    }
    val expPsi = psiT(0.5, 0.25) + psiT(0.5, 0.5) + psiT(0.0, 0.25)
    val expJsd = jsdT(0.5, 0.25) + jsdT(0.5, 0.5) + jsdT(0.0, 0.25)
    val row = out.head
    assert(math.abs(row.getDouble(7) - expPsi) < 1e-5)
    assert(math.abs(row.getDouble(8) - expJsd) < 1e-5)
    // category absent from ref: n_ref = 0, p_ref = 0
    val cRow = out.find(_.getString(0) == "c").get
    assert(cRow.getLong(1) == 0L && cRow.getDouble(3) == 0.0)
    // identical inputs: psi and jsd both 0
    val same = Profile.distributionDrift(ref, ref, "k").collect().head
    assert(same.getDouble(7) == 0.0 && same.getDouble(8) == 0.0)
    // partition invariance
    val bigR = (1 to 3000).map(i => s"k${i % 7}").toDF("k")
    val bigL = (1 to 3000).map(i => s"k${i % 5}").toDF("k")
    def run(parts: Int) = Profile.distributionDrift(
      bigR.repartition(parts), bigL.repartition(parts), "k")
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(19))
  }

  test("quantileTreatmentEffects: exact per-tau shifts") {
    import spark.implicits._
    // arm a = 1..100, arm b = a + 10 at the bottom half only: the QTE
    // curve reads 10 at tau<=0.25 and ~0 at tau>=0.75
    val a = (1 to 100).map(i => ("a", i.toDouble))
    val b = (1 to 100).map(i =>
      ("b", if (i <= 50) i + 10.0 else i.toDouble))
    val out = Profile.quantileTreatmentEffects(
      (a ++ b).toDF("g", "v"), "g", "v", Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(out(0.1) == 10.0)
    assert(out(0.9) == 0.0)
    // pure location shift: every tau reads exactly the shift
    val shift = Profile.quantileTreatmentEffects(
      (a ++ a.map { case (_, v) => ("b", v + 7.0) }).toDF("g", "v"),
      "g", "v", Seq(0.25, 0.5, 0.75)).collect()
    assert(shift.forall(_.getDouble(3) == 7.0))
    intercept[IllegalArgumentException] {
      Profile.quantileTreatmentEffects(a.toDF("g", "v"), "g", "v")
        .collect()
    }
  }

  test("kendallTauB: brute-force parity with and without ties") {
    import spark.implicits._
    def brute(pairs: Seq[(Double, Double)]): (Long, Long, Double) = {
      var c = 0L; var d = 0L
      var tx = 0L; var ty = 0L
      for (i <- pairs.indices; j <- (i + 1) until pairs.size) {
        val s = (pairs(i)._1 - pairs(j)._1) * (pairs(i)._2 - pairs(j)._2)
        if (s > 0) c += 1 else if (s < 0) d += 1
        if (pairs(i)._1 == pairs(j)._1) tx += 1
        if (pairs(i)._2 == pairs(j)._2) ty += 1
      }
      val n = pairs.size.toLong
      val t = n * (n - 1) / 2
      (c, d, (c - d).toDouble /
        (math.sqrt((t - tx).toDouble) * math.sqrt((t - ty).toDouble)))
    }
    def run(pairs: Seq[(Double, Double)]) =
      Profile.kendallTauB(pairs.toDF("x", "y"), "x", "y").collect()(0)
    // no ties
    val p1 = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0),
      (5.0, 5.0))
    val (c1, d1, t1) = brute(p1)
    val r1 = run(p1)
    assert(r1.getDouble(3) == c1.toDouble && r1.getDouble(4) == d1.toDouble)
    assert(math.abs(r1.getDouble(5) - t1) < 1e-6)
    // heavy ties on both axes
    val p2 = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0),
      (2.0, 2.0), (3.0, 1.0), (3.0, 3.0))
    val (c2, d2, t2) = brute(p2)
    val r2 = run(p2)
    assert(r2.getDouble(3) == c2.toDouble && r2.getDouble(4) == d2.toDouble)
    assert(math.abs(r2.getDouble(5) - t2) < 1e-6)
    // perfect agreement / reversal
    val mono = (1 to 30).map(i => (i.toDouble, i * 2.0))
    assert(run(mono).getDouble(5) == 1.0)
    assert(run(mono.map { case (a, b) => (a, -b) }).getDouble(5) == -1.0)
    // constant axis: null tau
    val flat = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0))
    assert(run(flat).isNullAt(5))
    // partition invariance
    val big = (1 to 4000).map(i =>
      ((i * 13 % 37).toDouble, (i * 7 % 23).toDouble))
    def runp(parts: Int) =
      Profile.kendallTauB(big.toDF("x", "y").repartition(parts), "x", "y")
        .collect()(0).toSeq
    assert(runp(1) == runp(19))
    // grid parity on the big case too
    val (cb, db, tb) = brute(big)
    val rb = run(big)
    assert(rb.getDouble(3) == cb.toDouble && rb.getDouble(4) == db.toDouble)
    assert(math.abs(rb.getDouble(5) - tb) < 1e-6)
  }

  test("logRankTest: hand-computed O/E/V with censoring and ties") {
    import spark.implicits._
    // A: events at 1,2, censored at 3; B: events at 1,4, censored at 5
    val df = Seq(("A", 1L, 1), ("A", 2L, 1), ("A", 3L, 0),
      ("B", 1L, 1), ("B", 4L, 1), ("B", 5L, 0)).toDF("g", "t", "e")
    val r = Profile.logRankTest(df, "g", "t", "e").collect()(0)
    // t=1: n=6, na=3, d=2 -> E += 1,   V += 2*.25*(4/5) = .4
    // t=2: n=4, na=2, d=1 -> E += .5,  V += .25*(3/3)   = .25
    // t=3: censor only; t=4: n=2, na=0 -> fa=0, terms 0; t=5: censor
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L && r.getLong(4) == 2L) // o_a, o_b
    assert(r.getDouble(3) == 1.5 && r.getDouble(5) == 2.5) // e_a, e_b
    assert(math.abs(r.getDouble(6) - 0.25 / 0.65) < 1e-6) // chi2
    assert(r.getDouble(7) > 0 && r.getDouble(7) <= 1.0)
    // identical arms at one time, everyone dies: V = 0 -> null chi2/p
    val flat = Seq(("A", 1L, 1), ("B", 1L, 1)).toDF("g", "t", "e")
    val rf = Profile.logRankTest(flat, "g", "t", "e").collect()(0)
    assert(rf.isNullAt(6) && rf.isNullAt(7))
    assert(rf.getDouble(3) == 1.0) // e_a = d*(na/n) = 2*(1/2)
    // partition invariance
    val big = (1 to 4000).map(i => (if (i % 2 == 0) "A" else "B",
      (i * 7 % 97).toLong, i % 3 min 1))
    def run(parts: Int) =
      Profile.logRankTest(big.toDF("g", "t", "e").repartition(parts),
        "g", "t", "e").collect()(0).toSeq
    assert(run(1) == run(23))
    intercept[IllegalArgumentException] {
      Profile.logRankTest(Seq(("A", 1L, 1)).toDF("g", "t", "e"),
        "g", "t", "e").collect()
    }
  }

  test("spearmanCorr: perfect monotone, hand ties case, degenerate axis") {
    import spark.implicits._
    // any monotone transform of x gives rho = 1 exactly
    val mono = (1 to 50).map(i => (i.toDouble, math.exp(i / 7.0)))
    val r1 = Profile.spearmanCorr(mono.toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(r1.getLong(0) == 50L && r1.getDouble(1) == 1.0)
    // reversed: rho = -1
    val rev = (1 to 50).map(i => (i.toDouble, -i * 3.0))
    assert(Profile.spearmanCorr(rev.toDF("x", "y"), "x", "y")
      .collect()(0).getDouble(1) == -1.0)
    // hand case with ties: x = (1,2,2,3), y = (10,20,20,15)
    // rx = (1, 2.5, 2.5, 4), ry = (1, 3.5, 3.5, 2); sum rxry = 26.5,
    // num = 4*26.5 - 100 = 6, dx = dy = 4*29.5 - 100 = 18 -> rho = 1/3
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 15.0))
    val rt = Profile.spearmanCorr(tied.toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(math.abs(rt.getDouble(1) - 1.0 / 3.0) < 1e-6)
    // constant axis: no rank variance -> nulls
    val flat = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val rf = Profile.spearmanCorr(flat, "x", "y").collect()(0)
    assert(rf.isNullAt(1) && rf.isNullAt(2) && rf.isNullAt(3))
    // partition invariance
    val big = (1 to 5000).map(i => ((i * 13 % 211).toDouble,
      (i * 7 % 97).toDouble))
    def run(parts: Int) =
      Profile.spearmanCorr(big.toDF("x", "y").repartition(parts), "x", "y")
        .collect()(0).toSeq
    assert(run(1) == run(29))
  }

  test("bhAdjust: hand q-values, ties share q, monotone, nulls pass through") {
    import spark.implicits._
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.02), ("d", 0.04),
      ("e", 0.5)).toDF("id", "p")
    val out = Profile.bhAdjust(df, "p")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // n=5; ranks (last-tie): .01->1, .02->3, .04->4, .5->5
    // raw: .05, .0333.., .05, .5; suffix-min: .0333.., .0333.., .05, .5
    val q02 = 0.02 * 5 / 3
    assert(out("a") == q02 && out("b") == q02 && out("c") == q02)
    assert(out("d") == 0.04 * 5 / 4)
    assert(out("e") == 0.5)
    // q monotone non-decreasing in p, always >= p, clamped at 1
    val many = (1 to 500).map(i => (i.toLong, (i * i % 997) / 996.0))
      .toDF("id", "p")
    val qs = Profile.bhAdjust(many, "p")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    qs.sliding(2).foreach(w => assert(w(0)._2 <= w(1)._2))
    qs.foreach { case (p, q) => assert(q >= p - 1e-15 && q <= 1.0) }
    // null p -> null q, other rows unaffected
    val withNull = Seq(("a", Some(0.3)), ("b", None))
      .toDF("id", "p")
    val rn = Profile.bhAdjust(withNull, "p").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None
        else Some(r.getDouble(2)))).toMap
    assert(rn("b").isEmpty && rn("a").contains(0.3))
    // partition invariance of the two-pass device
    def run(parts: Int) =
      Profile.bhAdjust(many.repartition(parts), "p")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(19))
  }

  test("cmhTest: naive replication, degenerate margins, tiny strata drop") {
    import spark.implicits._
    // two strata with opposite base rates (the Simpson setup)
    val rows =
      Seq.fill(8)(("s1", "A", 1)) ++ Seq.fill(2)(("s1", "A", 0)) ++
      Seq.fill(6)(("s1", "B", 1)) ++ Seq.fill(4)(("s1", "B", 0)) ++
      Seq.fill(2)(("s2", "A", 1)) ++ Seq.fill(8)(("s2", "A", 0)) ++
      Seq.fill(1)(("s2", "B", 1)) ++ Seq.fill(9)(("s2", "B", 0))
    val r = Profile.cmhTest(rows.toDF("s", "g", "y"), "s", "g", "y")
      .collect()(0)
    // naive replication of the statistic
    val tables = Seq((8.0, 2.0, 6.0, 4.0), (2.0, 8.0, 1.0, 9.0))
    val sa = tables.map(_._1).sum
    val se = tables.map { case (a, b, c, d) =>
      val n = a + b + c + d; (a + b) * (a + c) / n }.sum
    val sv = tables.map { case (a, b, c, d) =>
      val n = a + b + c + d
      (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)) }.sum
    val x = (sa - se) * (sa - se) / sv
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 2L && r.getLong(1) == 40L && r.getLong(2) == 10L)
    assert(math.abs(r.getDouble(3) - x) < 1e-6)
    val orMh = tables.map { case (a, b, c, d) => a * d / (a + b + c + d) }.sum /
      tables.map { case (a, b, c, d) => b * c / (a + b + c + d) }.sum
    assert(r.getDouble(5) == r6(orMh))
    assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
    // all-converted: degenerate margins -> null chi2/p/or
    val flat = Seq(("s1", "A", 1), ("s1", "A", 1), ("s1", "B", 1),
      ("s1", "B", 1)).toDF("s", "g", "y")
    val rf = Profile.cmhTest(flat, "s", "g", "y").collect()(0)
    assert(rf.isNullAt(3) && rf.isNullAt(4) && rf.isNullAt(5))
    // a 1-unit stratum is dropped, the rest still counts
    val tiny = (Seq(("lone", "A", 1)) ++ rows).toDF("s", "g", "y")
    val rt = Profile.cmhTest(tiny, "s", "g", "y").collect()(0)
    assert(rt.getLong(0) == 2L && rt.getLong(1) == 40L)
    intercept[IllegalArgumentException] {
      Profile.cmhTest(Seq(("s", "A", 1), ("s", "B", 0), ("s", "C", 1))
        .toDF("s", "g", "y"), "s", "g", "y").collect()
    }
  }

  test("mutualInformation: naive replication, independence, identity") {
    import spark.implicits._
    val rows = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q"),
      ("y", "q"), ("y", "p"), ("x", "p"), ("y", "q"))
    val r = Profile.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    // naive entropies from the 2x2 table
    val n = rows.size.toDouble
    def h(ps: Seq[Double]) = -ps.map(p => p * math.log(p)).sum
    val ha = h(Seq(4 / n, 4 / n))
    val hb = h(Seq(4 / n, 4 / n))
    val hab = h(Seq(3 / n, 1 / n, 1 / n, 3 / n))
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - ha) < 1e-6)
    assert(math.abs(r.getDouble(5) - hab) < 1e-6)
    val mi = ha + hb - hab
    assert(math.abs(r.getDouble(6) - mi) < 1e-6)
    assert(math.abs(r.getDouble(7) - mi / math.sqrt(ha * hb)) < 1e-6)
    // independent columns -> MI ~ 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q") }
      yield Seq.fill(5)((a, b))).flatten.toDF("a", "b")
    val ri = Profile.mutualInformation(ind, "a", "b").collect()(0)
    assert(math.abs(ri.getDouble(6)) < 1e-9)
    // identical columns -> NMI = 1
    val same = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
      .toDF("a", "b")
    val rs = Profile.mutualInformation(same, "a", "b").collect()(0)
    assert(math.abs(rs.getDouble(7) - 1.0) < 1e-9)
    // degenerate axis -> null NMI, zero MI
    val one = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val ro = Profile.mutualInformation(one, "a", "b").collect()(0)
    assert(ro.isNullAt(7) && math.abs(ro.getDouble(6)) < 1e-9)
  }

  test("srmCheck: on-design vs broken allocation, zero-count arm") {
    import spark.implicits._
    // exactly on the 2:1:1 design -> chi2 = 0, p = 1
    val good = (Seq.fill(50)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(25)("c")).toDF("arm")
    val g = Profile.srmCheck(good, "arm",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(5),
          r.getInt(6), r.getDouble(7))).toMap
    assert(g("a")._1 == 50L && g("b")._1 == 25L && g("c")._1 == 25L)
    assert(g("a")._2 == 0.5 && g("a")._3 == 0.5)
    assert(g.values.forall(v => v._4 == 0.0 && v._5 == 2))
    assert(g("a")._6 > 0.99) // chi2 = 0 -> p ~ 1
    // a badly broken 50/50 (designed) vs 90/10 (realized) -> tiny p
    val bad = (Seq.fill(900)("a") ++ Seq.fill(100)("b")).toDF("arm")
    val b = Profile.srmCheck(bad, "arm", Map("a" -> 1.0, "b" -> 1.0))
      .collect()(0)
    assert(b.getDouble(5) == 640.0) // (900-500)^2/500 * 2
    assert(b.getDouble(7) < 1e-6)
    // undeclared arms are ignored; a declared-but-absent arm counts 0
    val partial = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(3)("zz")).toDF("arm")
    val p = Profile.srmCheck(partial, "arm",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == Map("a" -> 10L, "b" -> 10L, "c" -> 0L))
    intercept[IllegalArgumentException] {
      Profile.srmCheck(good, "arm", Map("a" -> 1.0))
    }
  }

  test("cochranArmitage: naive replication, direction, degenerate") {
    import spark.implicits._
    // conversion falls with dose 1..3: 8/10, 5/10, 2/10
    val rows = (Seq.fill(8)((1.0, 1.0)) ++ Seq.fill(2)((1.0, 0.0)) ++
      Seq.fill(5)((2.0, 1.0)) ++ Seq.fill(5)((2.0, 0.0)) ++
      Seq.fill(2)((3.0, 1.0)) ++ Seq.fill(8)((3.0, 0.0)))
    val df = rows.toDF("s", "y")
    val r = Profile.cochranArmitage(df, "s", "y").collect()(0)
    // naive per-row replication
    val n = rows.size.toDouble
    val sy = rows.map(_._2).sum
    val ss = rows.map(_._1).sum
    val sss = rows.map(t => t._1 * t._1).sum
    val ssy = rows.map(t => t._1 * t._2).sum
    val z = (n * ssy - sy * ss) /
      math.sqrt((sy / n) * (1 - sy / n) * (n * sss - ss * ss))
    assert(r.getLong(0) == 30L && r.getLong(1) == 15L &&
      r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - z) < 1e-6)
    assert(r.getDouble(3) < 0) // falling trend -> negative z
    assert(r.getDouble(4) < 0.05) // clearly significant
    // rising trend flips the sign
    val up = df.withColumn("s", lit(4.0) - col("s"))
    assert(Profile.cochranArmitage(up, "s", "y").collect()(0)
      .getDouble(3) > 0)
    // single exposure level -> null z/p
    val flat = Seq((1.0, 1.0), (1.0, 0.0), (1.0, 1.0)).toDF("s", "y")
    val rf = Profile.cochranArmitage(flat, "s", "y").collect()(0)
    assert(rf.isNullAt(3) && rf.isNullAt(4))
  }

  test("hill tail: recovers a pure Pareto exponent") {
    // exact Pareto(alpha) quantiles: x_i = (i/n)^(-1/alpha) over a
    // uniform grid — the Hill estimate over any top-k is close to alpha
    val alpha = 2.0
    val xs = (1 to 5000).map(i => math.pow(i / 5000.0, -1.0 / alpha))
    val r = Profile.hillTail(xs.toDF("x"), "x", k = 200).collect()(0)
    assert(r.getLong(0) == 5000L && r.getLong(1) == 200L)
    assert(math.abs(r.getDouble(4) - alpha) < 0.05,
      s"alpha_hat=${r.getDouble(4)}")
    // gamma is the reciprocal
    assert(math.abs(r.getDouble(3) * r.getDouble(4) - 1.0) < 1e-4)
  }

  test("hill tail: all-equal top yields gamma 0 and a null alpha") {
    val xs = Seq.fill(50)(7.0) ++ Seq(1.0, 2.0)
    val r = Profile.hillTail(xs.toDF("x"), "x", k = 10).collect()(0)
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("robustLocation: outliers move the mean, not the robust faces") {
    // 1..99 symmetric body + one absurd outlier
    val xs = (1 to 99).map(_.toDouble) :+ 100000.0
    val r = Profile.robustLocation(xs.toDF("x"), "x", trim = 0.05)
      .collect()(0)
    val mean = r.getDouble(1)
    assert(mean > 1000) // dragged by the outlier
    assert(r.getDouble(2) < 60 && r.getDouble(2) > 40) // trimmed ~50
    assert(r.getDouble(3) < mean)                       // winsor < mean
    assert(r.getDouble(4) == 50.5)                      // type-7 median
    // MAD of ~uniform 1..99 around 50.5: ~25
    assert(math.abs(r.getDouble(5) - 25.0) < 2.0)
    intercept[IllegalArgumentException] {
      Profile.robustLocation(xs.toDF("x"), "x", trim = 0.5)
    }
  }

  test("captureRecapture: Chapman estimate on a known population") {
    // population 1..100; sample A = 1..50, B = 26..75 -> m = 25
    // Chapman: 51*51/26 - 1 = 99.04
    val a = (1 to 50).map(_.toLong).toDF("id")
    val b = (26 to 75).map(_.toLong).toDF("id")
    val r = Profile.captureRecapture(a, b, "id").collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L &&
      r.getLong(2) == 25L)
    assert(math.abs(r.getDouble(3) - (51.0 * 51.0 / 26.0 - 1.0)) < 1e-6)
    // the true population sits inside the CI
    assert(r.getDouble(5) < 100.0 && r.getDouble(6) > 100.0)
    // duplicates in a sample don't inflate the counts
    val aDup = (a.union(a))
    val rd = Profile.captureRecapture(aDup, b, "id").collect()(0)
    assert(rd.getLong(0) == 50L)
  }

  test("twoProportionTest: pooled z, CI, and degenerate pool") {
    // A: 2/10, B: 8/10 -> diff 0.6, clearly significant
    val rows = (1 to 10).map(i => ("A", i <= 2)) ++
      (1 to 10).map(i => ("B", i <= 8))
    val r = Profile.twoProportionTest(rows.toDF("g", "s"), "g",
      col("s")).collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L &&
      r.getLong(3) == 8L)
    assert(r.getDouble(6) == 0.6)
    val pool = 0.5
    val z = 0.6 / math.sqrt(pool * 0.5 * (0.1 + 0.1))
    assert(math.abs(r.getDouble(7) - z) < 1e-6)
    assert(r.getDouble(8) < 0.05)      // significant
    assert(r.getDouble(9) > 0)         // CI excludes zero
    // all-success pool -> null z/p, CI still reported
    val deg = Seq(("A", true), ("B", true)).toDF("g", "s")
    val rd = Profile.twoProportionTest(deg, "g", col("s")).collect()(0)
    assert(rd.isNullAt(7) && rd.isNullAt(8) && rd.getDouble(9) == 0.0)
  }

  test("hbos: a planted far-corner outlier tops the score") {
    // dense mass near (0,0); one point alone at (100,100)
    val rows = (1 to 200).map(i =>
      (i.toLong, (i % 10).toDouble, (i % 7).toDouble)) :+
      (999L, 100.0, 100.0)
    val out = Profile.hbos(rows.toDF("id", "x", "y"), "id",
      Seq("x", "y"), bins = 10, topK = 5).collect()
    assert(out.head.getLong(0) == 999L)
    // its bins are the clamped top bin on both axes
    assert(out.head.getInt(2) == 9 && out.head.getInt(3) == 9)
    assert(out.head.getDouble(1) > out(1).getDouble(1))
    intercept[IllegalArgumentException] {
      Profile.hbos(Seq((1L, 5.0), (2L, 5.0)).toDF("id", "x"), "id",
        Seq("x")).collect()
    }
  }

  test("ebShrinkRates: thin keys shrink hard, fat keys barely move") {
    // population of varied rates + one thin and one fat key at 0.5
    val bg = (1 to 10).flatMap { k =>
      val n = 20; val x = 2 * k // rates 0.1 .. 1.0
      (1 to n).map(i => (s"bg$k", i <= x))
    }
    val thin = Seq(("thin", true), ("thin", false))          // 1/2
    val fat = (1 to 100).map(i => ("fat", i <= 50))          // 50/100
    val df = (bg ++ thin ++ fat).toDF("k", "s")
    val out = Profile.ebShrinkRates(df, "k", col("s")).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val (rawT, shT) = out("thin"); val (rawF, shF) = out("fat")
    assert(rawT == 0.5 && rawF == 0.5)
    assert(math.abs(shF - 0.5) < math.abs(shT - 0.5),
      s"fat moved $shF, thin moved $shT")
    // all shrunk rates stay inside (0,1)
    assert(out.values.forall { case (_, s) => s > 0 && s < 1 })
  }

  test("gumbelFit: moments algebra and return-level ordering") {
    // blocks 1..4 with maxima 10, 12, 14, 16: mean 13, pop var 5
    val rows = Seq((1, 10.0), (1, 3.0), (2, 12.0), (3, 14.0), (4, 16.0))
      .toDF("b", "v")
    val r = Profile.gumbelFit(rows, col("b"), "v").collect()(0)
    assert(r.getLong(0) == 4L)
    val sd = math.sqrt(5.0)
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = 13.0 - 0.5772156649015329 * beta
    assert(math.abs(r.getDouble(1) - mu) < 1e-6)
    assert(math.abs(r.getDouble(2) - beta) < 1e-6)
    // rarer extremes sit further out
    assert(r.getDouble(4) > r.getDouble(3) && r.getDouble(3) > mu)
    intercept[IllegalArgumentException] {
      Profile.gumbelFit(Seq((1, 1.0)).toDF("b", "v"), col("b"), "v")
        .collect()
    }
  }

  test("concentration: HHI and CR match hand-computed shares") {
    // entity values 50, 30, 10, 5, 3, 2 -> total 100
    val rows = Seq(("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 5.0),
      ("e", 3.0), ("f", 2.0)).toDF("e", "v")
    val r = Profile.concentration(rows, "e", "v").collect()(0)
    assert(r.getLong(0) == 6L && r.getDouble(1) == 100.0)
    val hhi = 10000.0 * (0.25 + 0.09 + 0.01 + 0.0025 + 0.0009 + 0.0004)
    assert(math.abs(r.getDouble(2) - hhi) < 1e-6)
    assert(r.getDouble(3) == 0.95) // top-4 share
    assert(r.getDouble(4) == 1.0)  // only 6 entities: CR-8 = all
  }

  test("concentration: a monopoly reads 10000 HHI") {
    val rows = Seq(("a", 9.0), ("b", 0.0)).toDF("e", "v")
    val r = Profile.concentration(rows, "e", "v").collect()(0)
    assert(r.getDouble(2) == 10000.0 && r.getDouble(3) == 1.0)
  }

  private def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("probBest: closed form, symmetry, dominance, guards") {
    import spark.implicits._
    // A: 1 user 0 conv -> Beta(1,2); B: 1 user 1 conv -> Beta(2,1);
    // P(pB > pA) = 5/6 in closed form
    val tiny = Seq(("A", 0), ("B", 1)).toDF("g", "conv")
    val p0 = Profile.probBest(tiny, "g", col("conv") === 1)
      .collect()(0)
    assert(math.abs(p0.getDouble(8) - 5.0 / 6.0) < 5e-6, s"$p0")
    assert(p0.getString(0) == "A" && p0.getString(4) == "B")
    assert(p0.getLong(1) == 1L && p0.getLong(6) == 1L)
    // closed-form expected losses for Beta(1,2) vs Beta(2,1):
    // E[(pB-pA)+] = 11/30 (loss of shipping A), E[(pA-pB)+] = 1/30
    assert(math.abs(p0.getDouble(9) - 11.0 / 30.0) < 2e-5, s"$p0")
    assert(math.abs(p0.getDouble(10) - 1.0 / 30.0) < 2e-5, s"$p0")
    // identity: exp_loss_a - exp_loss_b = E[pB] - E[pA] (posterior
    // means (c+1)/(n+2) = 2/3 and 1/3)
    assert(math.abs((p0.getDouble(9) - p0.getDouble(10)) - 1.0 / 3.0)
      < 2e-5, s"$p0")
    // identical arms: exactly symmetric posterior race -> 0.5
    val sym = (1 to 50).flatMap(i =>
      Seq(("A", i % 5 == 0), ("B", i % 5 == 0)))
      .toDF("g", "c")
    val ps = Profile.probBest(sym, "g", col("c"))
      .collect()(0).getDouble(8)
    assert(math.abs(ps - 0.5) < 1e-5, s"symmetry: $ps")
    // a dominant arm saturates
    val dom = ((1 to 100).map(i => ("A", i <= 10)) ++
      (1 to 100).map(i => ("B", i <= 60))).toDF("g", "c")
    val pd = Profile.probBest(dom, "g", col("c"))
      .collect()(0).getDouble(8)
    assert(pd > 0.999, s"dominance: $pd")
    // guards: arm count and grid bounds
    intercept[IllegalArgumentException] {
      Profile.probBest(tiny.filter(col("g") === "A"), "g",
        col("conv") === 1)
    }
    intercept[IllegalArgumentException] {
      Profile.probBest(tiny, "g", col("conv") === 1, gridN = 10)
    }
    // the driver-side algebra (the streaming twin's kernel) is
    // bit-identical to the in-plan grid on the same counts
    val (p, ela, elb) = Profile.probBestAlgebra(1, 0, 1, 1)
    assert(p == p0.getDouble(8) && ela == p0.getDouble(9) &&
      elb == p0.getDouble(10), s"algebra drifted: ($p,$ela,$elb) vs $p0")
    val mixed = ((1 to 40).map(i => ("A", i % 3 == 0)) ++
      (1 to 37).map(i => ("B", i % 2 == 0))).toDF("g", "c")
    val bm = Profile.probBest(mixed, "g", col("c")).collect()(0)
    val (p2, ela2, elb2) =
      Profile.probBestAlgebra(40, 40 / 3, 37, 18)
    assert(p2 == bm.getDouble(8) && ela2 == bm.getDouble(9) &&
      elb2 == bm.getDouble(10), s"($p2,$ela2,$elb2) vs $bm")
  }

  test("probBestK: K=3 closed forms, K=2 reduction, algebra parity, " +
    "guards") {
    import spark.implicits._
    // A: 1 user 0 conv -> Beta(1,2); B: 1 user 1 conv -> Beta(2,1);
    // C: 2 users 1 conv -> Beta(2,2). Polynomial integrals in closed
    // form: P(A best) = 11/105, P(B best) = 67/105, P(C best) = 27/105
    // and E[(max others − arm)+] = 5/12, 1/12, 1/4.
    val tiny = Seq(("A", 0), ("B", 1), ("C", 1), ("C", 0))
      .toDF("g", "conv")
    val r = Profile.probBestK(tiny, "g", col("conv") === 1).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 1L, 2L))
    val pb = r.map(_.getDouble(4))
    val el = r.map(_.getDouble(5))
    assert(math.abs(pb(0) - 11.0 / 105.0) < 1e-5, pb.mkString(","))
    assert(math.abs(pb(1) - 67.0 / 105.0) < 1e-5, pb.mkString(","))
    assert(math.abs(pb(2) - 27.0 / 105.0) < 1e-5, pb.mkString(","))
    assert(math.abs(pb.sum - 1.0) < 2e-6, s"sum ${pb.sum}")
    assert(math.abs(el(0) - 5.0 / 12.0) < 5e-5, el.mkString(","))
    assert(math.abs(el(1) - 1.0 / 12.0) < 5e-5, el.mkString(","))
    assert(math.abs(el(2) - 1.0 / 4.0) < 5e-5, el.mkString(","))
    // the driver-side K-arm algebra (the streaming twin's kernel) is
    // bit-identical to the in-plan race on the same counts
    val alg = Profile.probBestKAlgebra(Seq((1L, 0L), (1L, 1L), (2L, 1L)))
    alg.zip(r).foreach { case ((ap, ae), row) =>
      assert(ap == row.getDouble(4) && ae == row.getDouble(5),
        s"algebra drifted: ($ap,$ae) vs $row")
    }
    // K = 2 reduction: the K-arm race reads exactly the 2-arm face
    val mixed = ((1 to 40).map(i => ("A", i % 3 == 0)) ++
      (1 to 37).map(i => ("B", i % 2 == 0))).toDF("g", "c")
    val two = Profile.probBestK(mixed, "g", col("c")).collect()
    val ref = Profile.probBest(mixed, "g", col("c")).collect()(0)
    assert(two(1).getDouble(4) == ref.getDouble(8),
      s"P(B best) ${two(1).getDouble(4)} vs ${ref.getDouble(8)}")
    assert(two(0).getDouble(5) == ref.getDouble(9),
      s"loss A ${two(0).getDouble(5)} vs ${ref.getDouble(9)}")
    assert(two(1).getDouble(5) == ref.getDouble(10),
      s"loss B ${two(1).getDouble(5)} vs ${ref.getDouble(10)}")
    // symmetric arms split evenly; a dominant arm's loss vanishes
    val sym = (1 to 30).flatMap(i =>
      Seq(("A", i % 5 == 0), ("B", i % 5 == 0), ("C", i % 5 == 0)))
      .toDF("g", "c")
    val ps = Profile.probBestK(sym, "g", col("c")).collect()
    ps.foreach(row => assert(math.abs(row.getDouble(4) - 1.0 / 3.0)
      < 1e-5, row.toString))
    val dom = ((1 to 100).map(i => ("A", i <= 10)) ++
      (1 to 100).map(i => ("B", i <= 60)) ++
      (1 to 100).map(i => ("C", i <= 15))).toDF("g", "c")
    val pd = Profile.probBestK(dom, "g", col("c")).collect()
    assert(pd(1).getDouble(4) > 0.999 && pd(1).getDouble(5) < 1e-4,
      pd.mkString(";"))
    // guards: arm count, grid bounds, the resolution rail
    intercept[IllegalArgumentException] {
      Profile.probBestK(tiny.filter(col("g") === "A"), "g",
        col("conv") === 1)
    }
    intercept[IllegalArgumentException] {
      Profile.probBestK(tiny, "g", col("conv") === 1, gridN = 10)
    }
    intercept[IllegalArgumentException] {
      Profile.probBestKAlgebra(Seq((100000000L, 50000000L), (100L, 50L)))
    }
    intercept[IllegalArgumentException] {
      Profile.probBestKAlgebra(Seq((10L, 5L)))
    }
  }

  test("probBest: grid-resolution rail + null-success contract") {
    import spark.implicits._
    // n = 10^8 at the default grid: posterior sd ~5e-5, far below the
    // 3-cell floor (3/4000) — the algebra fails loudly
    val e = intercept[IllegalArgumentException] {
      Profile.probBestAlgebra(100000000L, 50000000L, 100L, 50L)
    }
    assert(e.getMessage.contains("narrower than 3 grid cells"),
      e.getMessage)
    // batch face, same rail at a coarse grid: sd(300, 150) ≈ 0.029 <
    // 3/100 — and the failing arm is named
    val big = ((1 to 300).map(i => ("A", i % 2 == 0)) ++
      (1 to 50).map(i => ("B", i % 2 == 0))).toDF("g", "c")
    val eb = intercept[IllegalArgumentException] {
      Profile.probBest(big, "g", col("c"), gridN = 100)
    }
    assert(eb.getMessage.contains("arm A"), eb.getMessage)
    // well-resolved counts still pass at the same grid
    Profile.probBestAlgebra(50L, 25L, 50L, 30L, gridN = 100)
    // a null success value DROPS the row (the streaming twin's
    // contract), it is not a non-converting trial
    val withNull = Seq(("A", Some(true)), ("A", None),
      ("A", Some(false)), ("B", Some(true)), ("B", None),
      ("B", Some(false))).toDF("g", "c")
    val r = Profile.probBest(withNull, "g", col("c")).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(5) == 2L, s"$r")
    assert(r.getLong(2) == 1L && r.getLong(6) == 1L, s"$r")
  }
}
