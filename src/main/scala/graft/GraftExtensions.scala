package graft

import graft.functions._
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions entry point — registers graft's custom
  * expressions at session build, so pure-SQL users get them without
  * touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (`graft.functions.registerAll(spark)` does the same on an existing
  * session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, numPerm) - MinHash signature array"),
      (es: Seq[Expression]) =>
        MinHashSignature(es(0), functions.intArg(es(1), "minhash_sig", "numPerm"))))
    e.injectFunction((FunctionIdentifier("word_shingle_hashes"),
      info("word_shingle_hashes",
        "word_shingle_hashes(tokens, n) - distinct 64-bit n-gram shingle hashes"),
      (es: Seq[Expression]) =>
        WordShingleHashes(es(0), functions.intArg(es(1), "word_shingle_hashes", "n"))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, n) - n-gram shingle strings"),
      (es: Seq[Expression]) =>
        WordShingles(es(0), functions.intArg(es(1), "word_shingles", "n"))))
    e.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig",
        "hyperplane_sig(vec, dim, bits, seed) - packed LSH sign bits"),
      (es: Seq[Expression]) => HyperplaneSignature(es(0),
        functions.intArg(es(1), "hyperplane_sig", "dim"),
        functions.intArg(es(2), "hyperplane_sig", "bits"),
        functions.longArg(es(3), "hyperplane_sig", "seed"))))
    e.injectFunction((FunctionIdentifier("vec_sum"),
      info("vec_sum", "vec_sum(vec) - element-wise sum aggregate over vectors"),
      (es: Seq[Expression]) => VectorSum(es.head).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("mg_sketch"),
      info("mg_sketch",
        "mg_sketch(item, k) - Misra-Gries heavy-hitters summary, mergeable"),
      (es: Seq[Expression]) => MisraGriesSketch(es(0),
        functions.intArg(es(1), "mg_sketch", "k")).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("kll_sketch"),
      info("kll_sketch",
        "kll_sketch(value, k) - KLL quantile summary (n, items, weights), mergeable"),
      (es: Seq[Expression]) => KllSketch(es(0),
        functions.intArg(es(1), "kll_sketch", "k")).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("kll_quantile"),
      info("kll_quantile",
        "kll_quantile(items, weights, q) - quantile estimate from a kll_sketch summary"),
      (es: Seq[Expression]) => KllQuantile(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("count_in_set"),
      info("count_in_set",
        "count_in_set(tokens, words[, distinct]) - tokens present in the word set"),
      (es: Seq[Expression]) =>
        CountInSet(es(0), functions.stringArrayArg(es(1), "count_in_set", "words"),
          distinct = es.length > 2 && es(2).eval(null) == true)))
    e.injectFunction((FunctionIdentifier("count_matching"),
      info("count_matching",
        "count_matching(tokens, regex) - tokens matching the regex"),
      (es: Seq[Expression]) =>
        CountMatching(es(0), functions.stringArg(es(1), "count_matching", "regex"))))
    e.injectFunction((FunctionIdentifier("word_shingle_hashes_all"),
      info("word_shingle_hashes_all",
        "word_shingle_hashes_all(tokens, n) - positional (non-distinct) n-gram shingle hashes"),
      (es: Seq[Expression]) =>
        WordShingleHashesAll(es(0), functions.intArg(es(1), "word_shingle_hashes_all", "n"))))
    e.injectFunction((FunctionIdentifier("sum_token_lengths"),
      info("sum_token_lengths",
        "sum_token_lengths(tokens) - total characters across a string array"),
      (es: Seq[Expression]) => SumTokenLengths(es.head)))
    e.injectFunction((FunctionIdentifier("remove_token_ranges"),
      info("remove_token_ranges",
        "remove_token_ranges(tokens, starts, ends) - drop inclusive index ranges, join survivors"),
      (es: Seq[Expression]) => RemoveTokenRanges(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("sig_agreement"),
      info("sig_agreement",
        "sig_agreement(a, b) - COUNT of agreeing minhash signature slots (divide by the signature length for the jaccard estimate)"),
      (es: Seq[Expression]) => SignatureAgreement(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("char_shingles"),
      info("char_shingles", "char_shingles(text, k) - character k-gram strings"),
      (es: Seq[Expression]) =>
        CharShingles(es(0), functions.intArg(es(1), "char_shingles", "k"))))
    e.injectFunction((FunctionIdentifier("char_shingle_hashes"),
      info("char_shingle_hashes",
        "char_shingle_hashes(text, k) - distinct 64-bit character k-gram hashes"),
      (es: Seq[Expression]) =>
        CharShingleHashes(es(0), functions.intArg(es(1), "char_shingle_hashes", "k"))))
    // ---- quality / sketch / matcher kernels (rounds 10-11) — keep the
    // pure-SQL path at parity with registerAll ----
    e.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(text) - Shannon bits/char over code points"),
      (es: Seq[Expression]) => CharEntropy(es.head)))
    e.injectFunction((FunctionIdentifier("deflate_size"),
      info("deflate_size", "deflate_size(text[, level]) - raw-DEFLATE byte length"),
      (es: Seq[Expression]) => DeflateSize(es(0),
        if (es.length > 1) functions.intArg(es(1), "deflate_size", "level") else 6)))
    e.injectFunction((FunctionIdentifier("deflate_roundtrip_ok"),
      info("deflate_roundtrip_ok",
        "deflate_roundtrip_ok(text[, level]) - inflate(deflate(text)) == text"),
      (es: Seq[Expression]) => DeflateRoundtripOk(es(0),
        if (es.length > 1) functions.intArg(es(1), "deflate_roundtrip_ok", "level")
        else 6)))
    e.injectFunction((FunctionIdentifier("word_bucket"),
      info("word_bucket", "word_bucket(w, buckets) - poly-31 hash bucket"),
      (es: Seq[Expression]) =>
        WordBucket(es(0), functions.intArg(es(1), "word_bucket", "buckets"))))
    e.injectFunction((FunctionIdentifier("char_ngram_buckets"),
      info("char_ngram_buckets",
        "char_ngram_buckets(text, n, buckets) - hashed char-n-gram buckets"),
      (es: Seq[Expression]) => CharNgramBuckets(es(0),
        functions.intArg(es(1), "char_ngram_buckets", "n"),
        functions.intArg(es(2), "char_ngram_buckets", "buckets"))))
    e.injectFunction((FunctionIdentifier("edit_similarity"),
      info("edit_similarity",
        "edit_similarity(a, b[, maxLen]) - 1 - dist/max(len) fused DP"),
      (es: Seq[Expression]) => EditSimilarity(es(0), es(1),
        if (es.length > 2) functions.intArg(es(2), "edit_similarity", "maxLen")
        else 20000)))
    e.injectFunction((FunctionIdentifier("keyword_matches"),
      info("keyword_matches",
        "keyword_matches(text, keywords) - per-keyword non-overlapping counts"),
      (es: Seq[Expression]) => KeywordMatches(es(0),
        functions.stringArrayArg(es(1), "keyword_matches", "keywords"))))
    e.injectFunction((FunctionIdentifier("keyword_hit_total"),
      info("keyword_hit_total",
        "keyword_hit_total(text, keywords) - total non-overlapping hits"),
      (es: Seq[Expression]) => KeywordHitTotal(es(0),
        functions.stringArrayArg(es(1), "keyword_hit_total", "keywords"))))
    e.injectFunction((FunctionIdentifier("registrable_domain_psl"),
      info("registrable_domain_psl",
        "registrable_domain_psl(host, pslText) - eTLD+1 under a Public Suffix List"),
      (es: Seq[Expression]) => RegistrableDomainPsl(es(0),
        functions.stringArg(es(1), "registrable_domain_psl", "pslText"))))
    e.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch", "cms_sketch(x, depth, width) - count-min sketch aggregate"),
      (es: Seq[Expression]) => CountMinSketch(es(0),
        functions.intArg(es(1), "cms_sketch", "depth"),
        functions.intArg(es(2), "cms_sketch", "width")).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("cms_estimate"),
      info("cms_estimate", "cms_estimate(sk, x, depth, width) - point estimate"),
      (es: Seq[Expression]) => CmsEstimate(es(0), es(1),
        functions.intArg(es(2), "cms_estimate", "depth"),
        functions.intArg(es(3), "cms_estimate", "width"))))
    e.injectFunction((FunctionIdentifier("theta_sketch"),
      info("theta_sketch", "theta_sketch(x, k) - KMV/theta distinct sketch aggregate"),
      (es: Seq[Expression]) => ThetaSketch(es(0),
        functions.intArg(es(1), "theta_sketch", "k")).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("theta_estimate"),
      info("theta_estimate", "theta_estimate(sk) - distinct-count estimate"),
      (es: Seq[Expression]) => ThetaEstimate(es.head)))
    e.injectFunction((FunctionIdentifier("theta_intersect_estimate"),
      info("theta_intersect_estimate",
        "theta_intersect_estimate(a, b) - |A intersect B| estimate"),
      (es: Seq[Expression]) => ThetaIntersectEstimate(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("theta_union_estimate"),
      info("theta_union_estimate", "theta_union_estimate(a, b) - |A union B| estimate"),
      (es: Seq[Expression]) => ThetaUnionEstimate(es(0), es(1))))
  }
}

/** Convenience builder: a session with graft extensions, UTC, sane local
  * shuffle partitions, AQE on.
  */
object GraftSession {
  def create(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions.getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    graft.functions.registerAll(spark) // cover getOrCreate of an existing session
    spark
  }
}
