package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registerAll exposes the expressions to pure SQL") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .createOrReplaceTempView("ext_vecs")
    assert(spark.sql("SELECT vec_dot(a, b) AS d FROM ext_vecs").head.getDouble(0) == 14.0)
    assert(spark.sql("SELECT vec_cosine(a, b) AS c FROM ext_vecs").head.getDouble(0) == 1.0)
    assert(!spark.sql("SELECT simhash64(array('a','b')) AS h").head.isNullAt(0))
  }

  test("the full SQL function surface resolves (registerAll/extensions parity list)") {
    graft.functions.registerAll(spark)
    val names = Seq("vec_dot", "vec_cosine", "simhash64", "minhash_sig",
      "word_shingle_hashes", "word_shingle_hashes_all", "word_shingles",
      "hyperplane_sig", "vec_sum", "count_in_set", "count_matching",
      "sum_token_lengths", "sig_agreement", "char_shingles",
      "char_shingle_hashes", "remove_token_ranges",
      // rounds 10-11 kernels — extensions injects the same list
      "char_entropy", "deflate_size", "deflate_roundtrip_ok",
      "word_bucket", "char_ngram_buckets", "edit_similarity",
      "keyword_matches", "keyword_hit_total", "registrable_domain_psl",
      "cms_sketch", "cms_estimate", "theta_sketch", "theta_estimate",
      "theta_intersect_estimate", "theta_union_estimate")
    val reg = spark.sessionState.functionRegistry
    val missing = names.filterNot(n => reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
    assert(missing.isEmpty, s"unregistered SQL functions: $missing")
    // the positional kernel keeps duplicates and order
    val all = spark.sql(
      "SELECT word_shingle_hashes_all(array('a','b','a','b'), 2) AS h")
      .head.getSeq[Long](0)
    assert(all.length == 3 && all(0) == all(2))
    // the string-literal-arg faces work through pure SQL
    assert(spark.sql(
      "SELECT registrable_domain_psl('a.b.test.ck', 'ck\n*.ck\n!www.ck')")
      .head.getString(0) == "b.test.ck")
    assert(spark.sql("SELECT deflate_roundtrip_ok('hello world')")
      .head.getBoolean(0))
  }

  test("the extensions INJECTION path resolves and evaluates without registerAll") {
    // a FRESH session built with spark.sql.extensions — its function
    // registry is populated by GraftExtensions.apply alone (shared
    // table), never by registerAll, so a broken injection cannot hide
    // behind the temp-function path
    import org.apache.spark.sql.SparkSession
    val base = spark // materialize the shared session/context first
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // withExtensions, not .config: getOrCreate resolves the
    // spark.sql.extensions CONF from the (already-running) SparkContext,
    // so a builder-level config is ignored on a shared context — the
    // builder-level extensions object is honored either way, and still
    // goes through GraftExtensions.apply
    val s2 = SparkSession.builder()
      .withExtensions(e => new GraftExtensions().apply(e))
      .getOrCreate()
    try {
      assert(s2 ne base, "expected a distinct session for the injected path")
      val reg = s2.sessionState.functionRegistry
      val missing = graft.functions.sqlFunctionTable.map(_._1)
        .filterNot(n => reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
      assert(missing.isEmpty, s"extensions did not inject: $missing")
      // smoke the arg-parsed builders end-to-end on the injected session
      assert(s2.sql("SELECT vec_dot(array(1f,2f), array(3f,4f))")
        .head.getDouble(0) == 11.0)
      // smoke the depth/width arg plumbing; CMS guarantees true <= est
      val est = s2.sql(
        "SELECT cms_estimate(sk.table, 'a', 3, 64) FROM " +
          "(SELECT cms_sketch(x, 3, 64) AS sk " +
          "FROM (SELECT explode(array('a', 'a', 'b')) AS x))")
        .head.getLong(0)
      assert(est >= 2L && est <= 3L)
      assert(s2.sql("SELECT deflate_roundtrip_ok('abc', 9)").head.getBoolean(0))
      assert(s2.sql(
        "SELECT registrable_domain_psl('a.b.test.ck', 'ck\n*.ck\n!www.ck')")
        .head.getString(0) == "b.test.ck")
      assert(s2.sql("SELECT edit_similarity('kitten', 'sitting')")
        .head.getDouble(0) > 0.5)
      // 'he' hits twice (standalone + inside "hers") and 'hers' once —
      // byte-level substring semantics, keywords counted independently
      assert(s2.sql(
        "SELECT keyword_hit_total('he said hers', array('he','she','hers'))")
        .head.getLong(0) == 3L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("q46 approx aggregates are close to exact") {
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("parts"),
      expr("percentile(l_extendedprice, 0.5)").as("p50")).head
    val approx = SparkEntry.queries("q46_approx")(spark, SparkTestSession.sf0001).head
    val exactParts = exact.getLong(0)
    val approxParts = approx.getLong(0)
    assert(math.abs(approxParts - exactParts).toDouble / exactParts < 0.05,
      s"HLL off by >5%: $approxParts vs $exactParts")
    val p50 = approx.getDouble(2)
    assert(math.abs(p50 - exact.getDouble(1)) / exact.getDouble(1) < 0.05)
  }
}
