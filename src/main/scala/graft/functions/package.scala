package graft

import org.apache.spark.sql.{Column, SparkSession}

/** Column-level API for graft's custom expressions + their SQL
  * registration. Usage:
  * {{{
  *   import graft.functions._
  *   emb.select(vec_cosine(col("embedding"), lit_vec(q)))
  *   // or, after registerAll(spark):  spark.sql("SELECT vec_cosine(a, b) ...")
  * }}}
  */
package object functions {

  private def toColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlShim.column(e)

  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlShim.expression(c)

  /** Single-pass fused dot product over two array<float> columns. */
  def vec_dot(a: Column, b: Column): Column = toColumn(DotProduct(exprOf(a), exprOf(b)))

  /** Single-pass fused cosine similarity over two array<float> columns. */
  def vec_cosine(a: Column, b: Column): Column = toColumn(CosineSimilarity(exprOf(a), exprOf(b)))

  /** A float-array literal column (e.g. a query vector for ANN). */
  def lit_vec(v: Seq[Float]): Column =
    org.apache.spark.sql.functions.lit(v.toArray)

  /** MinHash signature (array<long> of numPerm mins) over a shingle array. */
  def minhash_sig(shingles: Column, numPerm: Int): Column =
    toColumn(MinHashSignature(exprOf(shingles), numPerm))

  /** 64-bit SimHash over a token array. */
  def simhash64(tokens: Column): Column = toColumn(SimHash64(exprOf(tokens)))

  /** Distinct 64-bit hashes of word n-gram shingles (no string
    * materialization — the fast path for minhash/jaccard pipelines).
    */
  def word_shingle_hashes(tokens: Column, n: Int): Column =
    toColumn(WordShingleHashes(exprOf(tokens), n))

  /** POSITIONAL 64-bit shingle hashes: one per gram start, not deduped —
    * index == token position. Feeds duplicated-span reporting.
    */
  def word_shingle_hashes_all(tokens: Column, n: Int): Column =
    toColumn(WordShingleHashesAll(exprOf(tokens), n))

  /** Word n-gram shingle strings in one codegen'd pass (the fast form of
    * the transform+slice+concat_ws HOF composition).
    */
  def word_shingles(tokens: Column, n: Int): Column =
    toColumn(WordShingles(exprOf(tokens), n))

  /** Packed sign bits of dot(vec, plane_i) for seeded Gaussian planes. */
  def hyperplane_sig(vec: Column, dim: Int, bits: Int, seed: Long): Column =
    toColumn(HyperplaneSignature(exprOf(vec), dim, bits, seed))

  /** Element-wise sum aggregate over array<float|double> (one buffer row
    * per group — the scalable form of vector averaging).
    */
  def vec_sum(vec: Column): Column =
    toColumn(VectorSum(exprOf(vec)).toAggregateExpression())

  /** Single-pass covariance sufficient statistics over vectors:
    * flat [n, sums(d), upper-triangle Σx·xᵀ] per group.
    */
  def vec_moments(vec: Column): Column =
    toColumn(VectorMoments(exprOf(vec)).toAggregateExpression())

  /** y = C·(x − μ), optionally whitened — PCA projection under a
    * carried model ([[PcaKernel.Proj]]).
    */
  def pca_project(vec: Column, proj: PcaKernel.Proj): Column =
    toColumn(PcaProject(exprOf(vec), proj))

  /** Misra-Gries heavy-hitters aggregate: struct(n, counts map) with
    * the deterministic `true - n/(k+1) <= est <= true` guarantee,
    * merge-safe across partitions (Agarwal et al., PODS 2012).
    */
  def mg_sketch(item: Column, k: Int): Column =
    toColumn(MisraGriesSketch(exprOf(item), k).toAggregateExpression())

  /** Count-min sketch aggregate: struct(n, depth x width counter table)
    * with `true <= est <= true + 2n/width` (w.h.p. per row, min over
    * depth rows), merge-exact across partitions.
    */
  def cms_sketch(item: Column, depth: Int, width: Int): Column =
    toColumn(CountMinSketch(exprOf(item), depth, width).toAggregateExpression())

  /** Point-frequency query against a cms_sketch table (codegen'd);
    * depth/width must match the building sketch.
    */
  def cms_estimate(table: Column, item: Column, depth: Int, width: Int): Column =
    toColumn(CmsEstimate(exprOf(table), exprOf(item), depth, width))

  /** KLL quantile sketch aggregate: struct(n, items, weights) with
    * O(n/k) rank error, merge-safe across partitions (Karnin, Lang,
    * Liberty, FOCS 2016). sum(weights) == n exactly.
    */
  def kll_sketch(value: Column, k: Int): Column =
    toColumn(KllSketch(exprOf(value), k).toAggregateExpression())

  /** Quantile query against a kll_sketch summary (codegen'd
    * cumulative-weight walk; items sorted ascending).
    */
  def kll_quantile(items: Column, weights: Column, q: Column): Column =
    toColumn(KllQuantile(exprOf(items), exprOf(weights), exprOf(q)))

  /** Tokens present in a fixed word set — multiplicity-counting by
    * default, distinct token types with `distinct = true`. One codegen'd
    * pass; replaces interpreted `filter`/`array_intersect` HOF forms.
    */
  def count_in_set(tokens: Column, words: Seq[String],
      distinct: Boolean = false): Column =
    toColumn(CountInSet(exprOf(tokens), words, distinct))

  /** Tokens matching a regex (unanchored find), one codegen'd pass. */
  def count_matching(tokens: Column, regex: String): Column =
    toColumn(CountMatching(exprOf(tokens), regex))

  /** Total characters across a token array, one codegen'd pass (the fast
    * form of the aggregate-lambda sum feeding mean token length).
    */
  def sum_token_lengths(tokens: Column): Column =
    toColumn(SumTokenLengths(exprOf(tokens)))

  /** Token array with the inclusive 0-based index ranges removed,
    * survivors joined by ' ' (the duplicated-span ACT step).
    */
  def remove_token_ranges(tokens: Column, starts: Column, ends: Column): Column =
    toColumn(RemoveTokenRanges(exprOf(tokens), exprOf(starts), exprOf(ends)))

  /** Count of index-aligned equal slots of two long-array signatures (the
    * MinHash similarity estimate), one codegen'd pass.
    */
  def sig_agreement(a: Column, b: Column): Column =
    toColumn(SignatureAgreement(exprOf(a), exprOf(b)))

  /** Unicode NFC normalization (UAX #15 canonical compose), codegen'd. */
  def nfc_normalize(text: Column): Column = toColumn(NormalizeNfc(exprOf(text)))

  /** Viterbi-best unigram-LM piece ids for a word (codegen'd kernel;
    * vocab ships by reference). UNK chars emit `unkId`.
    */
  def unigram_token_ids(word: Column, vocab: Seq[(String, Double)],
      unkId: Int): Column =
    toColumn(UnigramTokenIds(exprOf(word), vocab, unkId))

  /** Unigram-LM trainer E-step: a word's log-marginal and per-piece
    * expected counts under the current scores (forward–backward over the
    * same lattice as `unigram_token_ids`; codegen'd, vocab by reference).
    */
  def unigram_expected_counts(word: Column,
      vocab: Seq[(String, Double)]): Column =
    toColumn(UnigramExpectedCounts(exprOf(word), vocab))

  /** Subword-regularization sample: one segmentation drawn from
    * `P(seg|word)^alpha` (forward-filter backward-sample; codegen'd,
    * vocab by reference). `seed` is a long COLUMN — per-occurrence seeds
    * give independent draws; equal (word, seed) always yields the same
    * sample.
    */
  def unigram_sample_ids(word: Column, seed: Column,
      vocab: Seq[(String, Double)], alpha: Double, unkId: Int): Column =
    toColumn(UnigramSampleIds(exprOf(word), exprOf(seed), vocab, alpha, unkId))

  /** SQ8 encode: dim bytes under per-dimension trained ranges. */
  def sq_code(vec: Column, vmin: Array[Float], vdiff: Array[Float]): Column =
    toColumn(SqCode(exprOf(vec), vmin, vdiff))

  /** SQ8 asymmetric score: c0 + sum(w_i * code_i), codes-only. */
  def sq_adc(code: Column, weights: Array[Float], c0: Double): Column =
    toColumn(SqAdc(exprOf(code), weights, c0))

  /** Subword segments of a word under a BPE merge table (array-based
    * Sennrich apply — one greedy scan per merge, never across segment
    * boundaries).
    */
  def bpe_segments(word: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeSegments(exprOf(word), merges))

  /** Subword vocab ids of a word in one kernel pass (segment + lookup);
    * merge table and vocab ship by reference, never as plan literals.
    */
  def bpe_token_ids(word: Column, merges: Seq[(String, String)],
      vocab: Seq[String], unkId: Int = -1): Column =
    toColumn(BpeTokenIds(exprOf(word), merges, vocab, unkId))

  /** Morton (Z-order) code of long columns, `bits` low bits each —
    * the multi-dimensional clustering key for layout rewrites
    * (codegen'd; n * bits must fit a long).
    */
  def z_value(dims: Seq[Column], bits: Int): Column =
    toColumn(ZValue(dims.map(exprOf), bits))

  /** Greedy longest-match WordPiece ids for a word (BERT subword step;
    * codegen'd kernel, vocab ships by reference). A word with any
    * unmatchable position emits `[unkId]` whole.
    */
  def wordpiece_ids(word: Column, vocab: Seq[String],
      unkId: Int = 0): Column =
    toColumn(WordPieceIds(exprOf(word), vocab, unkId))

  /** m-byte product-quantization code of a vector given its IVF cell
    * (centroids/codebooks are plan-time constants shipped by reference).
    */
  def pq_code(vec: Column, cell: Column, cents: Array[Float], dim: Int,
      books: Array[Float], m: Int, codes: Int): Column =
    toColumn(PqCode(exprOf(vec), exprOf(cell), cents, dim, books, m, codes))

  /** Asymmetric-distance cosine estimate of a prepared query against a
    * PQ code row — codes-only scoring, the raw vector is never read.
    */
  def pq_adc(code: Column, cell: Column, lut: Array[Float], codes: Int,
      cellDot: Array[Float]): Column =
    toColumn(PqAdc(exprOf(code), exprOf(cell), lut, codes, cellDot))

  /** Per-query ADC lookup table (m*codes floats) computed in-plan — the
    * batch k-NN join's per-row query state.
    */
  def pq_lut(vec: Column, books: Array[Float], dim: Int, m: Int,
      codes: Int): Column =
    toColumn(PqLut(exprOf(vec), books, dim, m, codes))

  /** Residual ADC sum with the lookup table riding as a column. */
  def pq_adc_lut(code: Column, lut: Column, codes: Int): Column =
    toColumn(PqAdcLut(exprOf(code), exprOf(lut), codes))

  /** Membership probe of a 64-bit hash column against a driver-built
    * bloom filter, inside whole-stage codegen (the decontamination
    * prefilter's hot path — a UDF here would break the scan pipeline).
    */
  def bloom_might_contain(hashes: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    toColumn(BloomMightContainLong(exprOf(hashes), bloom))

  /** Exact membership probe of a bigint against a driver-built sorted
    * long array (binary search in codegen) — the map-only equivalent of
    * a left-semi key join for sets that fit the driver. The set must
    * already ride a Spark broadcast (it is too big for per-task closure
    * shipping — see [[InSortedLongs]]).
    */
  def in_sorted_longs(key: Column,
      sorted: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    toColumn(InSortedLongs(exprOf(key), sorted))

  /** Char k-gram shingle strings of a string column, one codegen'd pass. */
  def char_shingles(text: Column, k: Int): Column =
    toColumn(CharShingles(exprOf(text), k))

  /** 64-bit FNV hashes of char k-gram shingles — no substring
    * materialization (the fingerprint/minhash fast path).
    */
  def char_shingle_hashes(text: Column, k: Int): Column =
    toColumn(CharShingleHashes(exprOf(text), k))

  /** Hashed char n-gram feature buckets (transparent poly-31 over code
    * points, mod `buckets`) — the langid / quality-classifier feature
    * extractor; oracle-re-derivable by plain SQL arithmetic.
    */
  def char_ngram_buckets(text: Column, n: Int, buckets: Int): Column =
    toColumn(CharNgramBuckets(exprOf(text), n, buckets))

  /** Hashed whole-word feature slot (transparent per-step poly-31 mod
    * `buckets`) — the hashing-trick feature map of the fastText-class
    * supervised classifier; oracle-re-derivable by a SQL list fold.
    */
  def word_bucket(word: Column, buckets: Int): Column =
    toColumn(WordBucket(exprOf(word), buckets))

  /** Per-keyword non-overlapping substring match counts via one
    * Aho-Corasick pass (blocklist filtering at any list size);
    * index-aligned with `keywords`.
    */
  def keyword_matches(text: Column, keywords: Seq[String]): Column =
    toColumn(KeywordMatches(exprOf(text), keywords))

  /** Total hits across all keywords, no per-keyword vector — the gate
    * shape for large blocklists.
    */
  def keyword_hit_total(text: Column, keywords: Seq[String]): Column =
    toColumn(KeywordHitTotal(exprOf(text), keywords))

  /** Fused normalized Levenshtein similarity (1 - lev/max, 6dp; null
    * above maxLen code points) — one primitive-array DP pass, ~50x the
    * built-in levenshtein's byte-decoding loop.
    */
  def edit_similarity(a: Column, b: Column, maxLen: Int = 20000): Column =
    toColumn(EditSimilarity(exprOf(a), exprOf(b), maxLen))

  /** LCS length over two string arrays (the ROUGE-L kernel); null
    * when either side exceeds `maxLen` tokens. */
  def token_lcs(a: Column, b: Column, maxLen: Int = 10000): Column =
    toColumn(TokenLcs(exprOf(a), exprOf(b), maxLen))

  /** Jaro-Winkler similarity (textbook/DuckDB semantics: 0.7 boost
    * threshold, prefix cap 4, empty → 0) — the record-linkage matcher.
    */
  def jaro_winkler(a: Column, b: Column): Column =
    toColumn(JaroWinkler(exprOf(a), exprOf(b)))

  /** Mergeable KMV/theta distinct sketch of a string column — the
    * distinct summary that supports SET OPERATIONS (intersection/union
    * estimates across corpora), which HLL cannot.
    */
  def theta_sketch(item: Column, k: Int): Column =
    toColumn(ThetaSketch(exprOf(item), k).toAggregateExpression())

  /** Distinct-count estimate off a theta sketch (exact below capacity). */
  def theta_estimate(sketch: Column): Column =
    toColumn(ThetaEstimate(exprOf(sketch)))

  /** |A ∩ B| estimate from two theta sketches. */
  def theta_intersect_estimate(a: Column, b: Column): Column =
    toColumn(ThetaIntersectEstimate(exprOf(a), exprOf(b)))

  /** |A ∪ B| estimate from two theta sketches. */
  def theta_union_estimate(a: Column, b: Column): Column =
    toColumn(ThetaUnionEstimate(exprOf(a), exprOf(b)))

  /** Shannon entropy (bits) of a string's code-point distribution — the
    * gibberish/boilerplate quality signal (pinned accumulation order, so
    * oracle-re-derivable by per-char group-by arithmetic).
    */
  def char_entropy(text: Column): Column =
    toColumn(CharEntropy(exprOf(text)))

  /** Raw-DEFLATE output length of a string's UTF-8 bytes — divide by
    * octet_length for the compression-ratio quality signal.
    */
  def deflate_size(text: Column, level: Int = 6): Column =
    toColumn(DeflateSize(exprOf(text), level))

  /** inflate(deflate(text)) == text, byte-exact — the in-plan proof
    * obligation for the deflate kernel (uniformly true, so the SQL
    * oracle side is literal TRUE).
    */
  def deflate_roundtrip_ok(text: Column, level: Int = 6): Column =
    toColumn(DeflateRoundtripOk(exprOf(text), level))

  /** eTLD+1 under a carried Public Suffix List text (full
    * `public_suffix_list.dat` grammar: wildcard + exception rules).
    */
  def registrable_domain_psl(host: Column, pslText: String): Column =
    toColumn(RegistrableDomainPsl(exprOf(host), pslText))

  /** robots.txt verdict for `path` under a fixed crawler user-agent
    * (RFC 9309 subset: group resolution, `*`/`$` patterns,
    * longest-match precedence, allow wins ties).
    */
  def robots_allowed(robotsText: Column, path: Column,
      userAgent: String): Column =
    toColumn(RobotsAllowed(exprOf(robotsText), exprOf(path), userAgent))

  /** Group-resolved Crawl-delay seconds for a fixed user-agent (null
    * when no binding group states one).
    */
  def robots_crawl_delay(robotsText: Column, userAgent: String): Column =
    toColumn(RobotsCrawlDelay(exprOf(robotsText), userAgent))

  /** Constant-folded integer argument (n/bits/seed parameters come into
    * SQL as literals).
    */
  private[graft] def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private[graft] def longArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Constant-folded string-array argument (word sets arrive from SQL as
    * `array('a','b',...)`, folded to an array literal).
    */
  private[graft] def stringArrayArg(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        a: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
      (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) null else a.getUTF8String(i).toString)
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.foldable) =>
      children.map(c => Option(c.eval(null)).map(_.toString).orNull)
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string-array literal, got $other")
  }

  private[graft] def stringArg(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  /** Register ALL custom expressions for SQL use (same surface the
    * GraftExtensions config-time injection provides).
    */
  private type FnBuilder =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression

  /** THE single SQL-function table — (name, usage, builder) — consumed
    * by BOTH registration paths: [[registerAll]] (temp functions on an
    * existing session) and `GraftExtensions` (session-build injection
    * for pure-SQL users). One list, so the Scala-API and pure-SQL
    * surfaces cannot drift; a kernel added here is live on both.
    */
  private[graft] val sqlFunctionTable: Seq[(String, String, FnBuilder)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two float arrays",
      es => DotProduct(es(0), es(1))),
    ("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays",
      es => CosineSimilarity(es(0), es(1))),
    ("simhash64", "simhash64(tokens) - 64-bit simhash of a string array",
      es => SimHash64(es.head)),
    ("minhash_sig", "minhash_sig(shingles, numPerm) - MinHash signature array",
      es => MinHashSignature(es(0), intArg(es(1), "minhash_sig", "numPerm"))),
    ("word_shingle_hashes",
      "word_shingle_hashes(tokens, n) - distinct 64-bit n-gram shingle hashes",
      es => WordShingleHashes(es(0), intArg(es(1), "word_shingle_hashes", "n"))),
    ("word_shingle_hashes_all",
      "word_shingle_hashes_all(tokens, n) - positional n-gram hashes (dups kept)",
      es => WordShingleHashesAll(es(0),
        intArg(es(1), "word_shingle_hashes_all", "n"))),
    ("word_shingles", "word_shingles(tokens, n) - n-gram shingle strings",
      es => WordShingles(es(0), intArg(es(1), "word_shingles", "n"))),
    ("hyperplane_sig",
      "hyperplane_sig(vec, dim, bits, seed) - packed LSH sign bits",
      es => HyperplaneSignature(es(0), intArg(es(1), "hyperplane_sig", "dim"),
        intArg(es(2), "hyperplane_sig", "bits"),
        longArg(es(3), "hyperplane_sig", "seed"))),
    ("vec_sum", "vec_sum(vec) - element-wise sum aggregate over vectors",
      es => VectorSum(es.head).toAggregateExpression()),
    ("mg_sketch", "mg_sketch(x, k) - Misra-Gries heavy-hitters aggregate",
      es => MisraGriesSketch(es(0), intArg(es(1), "mg_sketch", "k"))
        .toAggregateExpression()),
    ("cms_sketch", "cms_sketch(x, depth, width) - count-min sketch aggregate",
      es => CountMinSketch(es(0), intArg(es(1), "cms_sketch", "depth"),
        intArg(es(2), "cms_sketch", "width")).toAggregateExpression()),
    ("cms_estimate", "cms_estimate(sk, x, depth, width) - point-count estimate",
      es => CmsEstimate(es(0), es(1), intArg(es(2), "cms_estimate", "depth"),
        intArg(es(3), "cms_estimate", "width"))),
    ("kll_sketch", "kll_sketch(x, k) - KLL quantile sketch aggregate",
      es => KllSketch(es(0), intArg(es(1), "kll_sketch", "k"))
        .toAggregateExpression()),
    ("kll_quantile", "kll_quantile(items, weights, q) - sketch quantile estimate",
      es => KllQuantile(es(0), es(1), es(2))),
    ("count_in_set",
      "count_in_set(tokens, words[, distinct]) - membership count",
      es => CountInSet(es(0), stringArrayArg(es(1), "count_in_set", "words"),
        distinct = es.length > 2 && es(2).eval(null) == true)),
    ("count_matching", "count_matching(tokens, regex) - regex-match count",
      es => CountMatching(es(0), stringArg(es(1), "count_matching", "regex"))),
    ("sum_token_lengths", "sum_token_lengths(tokens) - total character count",
      es => SumTokenLengths(es.head)),
    ("remove_token_ranges",
      "remove_token_ranges(tokens, starts, ends) - drop token spans",
      es => RemoveTokenRanges(es(0), es(1), es(2))),
    ("sig_agreement",
      "sig_agreement(a, b) - matching positions of two signature arrays",
      es => SignatureAgreement(es(0), es(1))),
    ("char_shingles", "char_shingles(text, k) - character k-gram strings",
      es => CharShingles(es(0), intArg(es(1), "char_shingles", "k"))),
    ("char_shingle_hashes",
      "char_shingle_hashes(text, k) - distinct 64-bit character k-gram hashes",
      es => CharShingleHashes(es(0), intArg(es(1), "char_shingle_hashes", "k"))),
    ("char_ngram_buckets",
      "char_ngram_buckets(text, n, buckets) - hashed char-n-gram buckets",
      es => CharNgramBuckets(es(0), intArg(es(1), "char_ngram_buckets", "n"),
        intArg(es(2), "char_ngram_buckets", "buckets"))),
    ("word_bucket", "word_bucket(w, buckets) - poly-31 hash bucket",
      es => WordBucket(es(0), intArg(es(1), "word_bucket", "buckets"))),
    ("keyword_matches",
      "keyword_matches(text, keywords) - per-keyword non-overlapping counts",
      es => KeywordMatches(es(0),
        stringArrayArg(es(1), "keyword_matches", "keywords"))),
    ("keyword_hit_total",
      "keyword_hit_total(text, keywords) - total non-overlapping hits",
      es => KeywordHitTotal(es(0),
        stringArrayArg(es(1), "keyword_hit_total", "keywords"))),
    ("edit_similarity",
      "edit_similarity(a, b[, maxLen]) - 1 - dist/max(len), fused DP",
      es => EditSimilarity(es(0), es(1),
        if (es.length > 2) intArg(es(2), "edit_similarity", "maxLen")
        else 20000)),
    ("jaro_winkler",
      "jaro_winkler(a, b) - Jaro-Winkler similarity (0.7 boost threshold)",
      es => JaroWinkler(es(0), es(1))),
    ("theta_sketch", "theta_sketch(x, k) - KMV/theta distinct sketch aggregate",
      es => ThetaSketch(es(0), intArg(es(1), "theta_sketch", "k"))
        .toAggregateExpression()),
    ("theta_estimate", "theta_estimate(sk) - distinct-count estimate",
      es => ThetaEstimate(es.head)),
    ("theta_intersect_estimate",
      "theta_intersect_estimate(a, b) - |A intersect B| estimate",
      es => ThetaIntersectEstimate(es(0), es(1))),
    ("theta_union_estimate",
      "theta_union_estimate(a, b) - |A union B| estimate",
      es => ThetaUnionEstimate(es(0), es(1))),
    ("char_entropy",
      "char_entropy(text) - Shannon bits/char over code points",
      es => CharEntropy(es.head)),
    ("deflate_size", "deflate_size(text[, level]) - raw-DEFLATE byte length",
      es => DeflateSize(es(0),
        if (es.length > 1) intArg(es(1), "deflate_size", "level") else 6)),
    ("deflate_roundtrip_ok",
      "deflate_roundtrip_ok(text[, level]) - inflate(deflate(text)) == text",
      es => DeflateRoundtripOk(es(0),
        if (es.length > 1) intArg(es(1), "deflate_roundtrip_ok", "level")
        else 6)),
    ("registrable_domain_psl",
      "registrable_domain_psl(host, pslText) - eTLD+1 under a Public Suffix List",
      es => RegistrableDomainPsl(es(0),
        stringArg(es(1), "registrable_domain_psl", "pslText"))),
    ("robots_allowed",
      "robots_allowed(robotsText, path, userAgent) - RFC 9309 crawl verdict",
      es => RobotsAllowed(es(0), es(1),
        stringArg(es(2), "robots_allowed", "userAgent"))),
    ("robots_crawl_delay",
      "robots_crawl_delay(robotsText, userAgent) - group-resolved Crawl-delay seconds",
      es => RobotsCrawlDelay(es(0),
        stringArg(es(1), "robots_crawl_delay", "userAgent"))))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctionTable.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
