package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val docs = spark.read
    .parquet(s"${SparkTestSession.sf0001}/documents.parquet")

  test("stratified sample caps every stratum at k, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 10)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 10))
    assert(counts("en") == 10, "dominant stratum must be capped exactly")
    // re-run = identical sample (pure function of the data)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("deterministic fraction sample is stable and roughly proportional") {
    val n = docs.count()
    val s = Sampling.deterministicSample(docs, "doc_id", 0.3)
    val c1 = s.count()
    assert(math.abs(c1.toDouble / n - 0.3) < 0.1, s"got ${c1.toDouble / n}")
    assert(s.count() == c1) // stable across runs
    // subset property: a smaller fraction is a subset of a larger one
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "hash sampling must nest by fraction")
  }

  test("temperature mixture matches the hand-computed n^tau weights") {
    import spark.implicits._
    val perDomain = Seq(("en", 1000L), ("de", 100L)).toDF("domain", "n_tokens")
    val out = Sampling.temperatureMixture(perDomain, "domain", "n_tokens",
      tau = 0.7, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val z = math.pow(1000, 0.7) + math.pow(100, 0.7)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out("en") == ((r6(math.pow(1000, 0.7) / z),
      r6(1000.0 * math.pow(1000, 0.7) / z / 1000))), s"en: ${out("en")}")
    assert(out("de") == ((r6(math.pow(100, 0.7) / z),
      r6(1000.0 * math.pow(100, 0.7) / z / 100))), s"de: ${out("de")}")
    // temperature < 1 upsamples the small domain relative to proportional
    assert(out("de")._1 > 100.0 / 1100.0, "tau<1 must upsample the tail domain")
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-5, "weights sum to 1")
  }

  test("temperature mixture: an empty domain gets weight 0 and epochs 0, not NaN") {
    import spark.implicits._
    val perDomain = Seq(("en", 1000L), ("empty", 0L)).toDF("domain", "n_tokens")
    val out = Sampling.temperatureMixture(perDomain, "domain", "n_tokens",
      tau = 0.7, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("empty") == ((0.0, 0.0)), s"got ${out("empty")}")
    assert(out("en")._1 == 1.0, s"got ${out("en")}")
  }

  test("temperature mixture at tau=1 is proportional sampling") {
    import spark.implicits._
    val perDomain = Seq(("a", 300L), ("b", 700L)).toDF("domain", "n_tokens")
    val out = Sampling.temperatureMixture(perDomain, "domain", "n_tokens",
      tau = 1.0, tokenBudget = 500L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a")._1 == 0.3 && out("b")._1 == 0.7, s"got $out")
    // proportional draw = every domain seen exactly budget/total epochs
    assert(out("a")._2 == 0.5 && out("b")._2 == 0.5, s"got $out")
  }

  test("weighted sample: deterministic, k rows, heavier weights win more") {
    val spark2 = spark
    import spark2.implicits._
    // two weight classes: ids 0-199 weight 1, ids 200-399 weight 20;
    // with u^(1/w) keys the heavy class should dominate the sample
    val df = (0L until 400L).map(i => (i, if (i < 200) 1.0 else 20.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 50)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(df, "id", "w", k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "re-run changed the sample")
    assert(s1.size == 50)
    val heavy = s1.count(_ >= 200)
    assert(heavy >= 40, s"heavy class won only $heavy of 50")
    // zero/negative/null weights never selected
    val withBad = df.union(Seq((900L, 0.0), (901L, -3.0)).toDF("id", "w"))
    val s3 = Sampling.weightedSample(withBad, "id", "w", k = 500)
      .collect().map(_.getLong(0)).toSet
    assert(!s3.contains(900L) && !s3.contains(901L))
    assert(s3.size == 400)
    // NaN weights pass a naive > 0 under Spark ordering and their NaN
    // keys would sort ABOVE every real key — they must never be drawn
    val withNan = df.union(Seq((902L, Double.NaN)).toDF("id", "w"))
    val s4 = Sampling.weightedSample(withNan, "id", "w", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(!s4.contains(902L) && s4.size == 5)
  }

  test("weighted sample: 9dp-rounded frontier has real margin at both fixture SFs") {
    // the oracle relies on Spark and DuckDB rounding pow() keys to the
    // same 9 dp; a frontier pair closer than 2e-9 would make that
    // fragile. The data is fixed, so a comfortable margin here is a
    // permanent property, not a per-run roll.
    for (sf <- Seq(SparkTestSession.sf001, "/root/testdata/sf0.1")) {
      val d = spark.read.parquet(s"$sf/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("n_chars") > 0)
      val keys = Sampling.weightedSample(d, "doc_id", "n_chars", k = 21)
        .collect().map(_.getAs[Double]("sample_key"))
      val frontierGap = keys(19) - keys(20)
      assert(frontierGap > 2e-9 || frontierGap == 0.0,
        s"$sf: frontier gap $frontierGap too tight for 9dp rounding")
      // gap 0 would mean a tie broken by doc_id — also engine-stable
    }
  }

  test("clusterSafeSplit: near-dup clusters never straddle a split boundary") {
    import spark.implicits._
    // docs 1-5; planted pair graph: {1,2,3} one component, {4,5} another
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Sampling.clusterSafeSplit(docs, "doc_id", pairs,
      "id_a", "id_b", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("group_key"), r.getAs[String]("split")))).toMap
    // a cluster shares its min-id group key, hence its split
    assert(Seq(1L, 2L, 3L).map(out).map(_._1).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out).map(_._2).distinct.size === 1)
    assert(Seq(4L, 5L).map(out).map(_._1).distinct === Seq(4L))
    assert(Seq(4L, 5L).map(out).map(_._2).distinct.size === 1)
    // unclustered docs split on their own id with the q56 md5 rule
    for (id <- Seq(6L, 7L)) {
      assert(out(id)._1 === id)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expected = if (hex < "80000000") "train" else "test"
      assert(out(id)._2 === expected)
    }
  }

  test("trainingOrder: full permutation, seed-dependent, engine-reproducible") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    def order(seed: Long): Seq[Long] =
      Sampling.trainingOrder(df, "id", seed)
        .orderBy(col("train_order")).select("id").as[Long].collect().toSeq
    val o7 = order(7L)
    assert(o7.sorted == (0L until 100L)) // a permutation, nothing lost
    assert(o7 != (0L until 100L).toSeq) // actually shuffled
    assert(order(7L) == o7)             // deterministic
    assert(order(8L) != o7)             // seed changes the permutation
    // reproducible outside Spark: replay the md5-prefix sort in JVM code
    val expected = (0L until 100L).sortBy { id =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), id)
    }
    assert(o7 == expected)
  }

  test("applyMixture: floor copies + reproducible fractional extras, rails") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i < 100) "a" else "b"))
      .toDF("doc_id", "dom")
    val epochs = Seq(("a", 2.0), ("b", 0.5)).toDF("d", "e")
    val out = Sampling.applyMixture(docs, "doc_id", "dom",
      epochs, "d", "e", seed = 3L)
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("a") == 200L) // exactly 2 epochs, no fractional draw
    // b: ~50% of 100 docs; deterministic given the seed — recompute
    val expB = (100L until 200L).count { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:3".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 32) < 0.5
    }
    assert(byDom("b") == expB)
    // copy indices are 0..copies-1 per doc
    val copies = out.filter(col("dom") === "a" && col("doc_id") === 0L)
      .select("copy").as[Int].collect().sorted.toSeq
    assert(copies == Seq(0, 1))
    // runaway-epoch rail
    val boom = Seq(("a", 100.0)).toDF("d", "e")
    intercept[Exception] {
      Sampling.applyMixture(docs, "doc_id", "dom", boom, "d", "e")
        .count()
    }
  }
}
