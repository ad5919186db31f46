package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions over Spark built-ins — they ride whole-stage codegen and
  * need no shuffle (per-document map work), so they scale linearly with
  * partitions at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. Empty strings are removed so empty/
    * whitespace-only text yields 0 tokens (a bare split returns [""]),
    * keeping the zero-token guards downstream meaningful. array_remove,
    * not filter(t => t =!= ""): identical semantics on split output (no
    * nulls), but array_remove is a codegen'd built-in while the filter
    * lambda evaluates interpreted per token — this runs in EVERY text
    * query's tokenize step.
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  /** Canonical text cleaning — the first pass of every corpus pipeline:
    * Unicode NFC normalization (combining sequences compose, so dedup /
    * shingling / vocab counting see one byte form per glyph), then
    * control/format characters (Cc/Cf) replaced by spaces, whitespace
    * runs collapsed, ends trimmed. Pure column expressions (the NFC
    * step is a codegen'd kernel), map-only at any scale.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.functions.nfc_normalize(text),
      "[\\p{Cc}\\p{Cf}]", " "), "\\s+", " "))

  /** BPE-ish subword-boundary tokens: word pieces, numbers, and single
    * punctuation marks as separate tokens (a simplified GPT-2 pre-tokenizer
    * regex).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Punctuation characters / total characters (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(total === 0, 0.0).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Ratio of tokens that are common English stopwords. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    // multiplicity-counting membership via the codegen'd kernel (the
    // filter/array_contains HOF form runs interpreted per element)
    when(size(toks) === 0, 0.0).otherwise(
      graft.functions.count_in_set(toks, stopwords).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean token length in characters (0 for empty). Total length runs
    * through the codegen'd sum_token_lengths kernel — the aggregate-HOF
    * form evaluates its lambda interpreted per element.
    */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      graft.functions.sum_token_lengths(toks).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with
    * word-like tokens and some (but not excessive) stopwords/punctuation.
    * Heuristic in the spirit of C4/Gopher text-quality rules (published
    * filtering heuristics), expressed as one codegen'd column.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 64.0, lit(1.0)) // saturates at 64 tokens
    val meanLen = meanTokenLen(text)
    val wordShapeScore = when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctScore = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.5)
    val stopScore = when(stopwordRatio(text).between(0.05, 0.6), 1.0).otherwise(0.7)
    // 5 dp, not 4: every attainable score is an EXACT 5-decimal value
    // (lengthScore*0.4 = nTok*0.00625 capped at 0.4, plus 0.1/0.2-grid
    // terms), so 4-dp rounding lands exactly on .5 boundaries where
    // HALF_UP-on-shortest-decimal (Spark) and multiply-then-rint (DuckDB)
    // disagree by 1; at 5 dp the round is a no-op on the exact value in
    // both engines.
    round(lengthScore * 0.4 + wordShapeScore * 0.2 + punctScore * 0.2 + stopScore * 0.2, 5)
  }

  /** Language-ID by stopword-profile voting: score(text, lang) = fraction
    * of tokens found in that language's marker set; predicted lang = argmax
    * (ties break by profile order). N-gram-profile classification per
    * Cavnar & Trenkle (1994), simplified to word-level markers so it stays
    * a pure column expression.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "en"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langScores(text: Column): Column = {
    val toks = tokens(text)
    val entries = langProfiles.map { case (lang, markers) =>
      struct(
        (when(size(toks) === 0, 0.0).otherwise(
          graft.functions.count_in_set(toks, markers).cast("double") /
            size(toks).cast("double"))).as("score"),
        lit(lang).as("lang"))
    }
    array(entries: _*)
  }

  /** Predicted language code; "und" (undetermined) when no marker hits. */
  def langId(text: Column): Column = {
    val best = array_max(langScores(text))
    when(best.getField("score") > 0.0, best.getField("lang")).otherwise("und")
  }

  /** 64-bit content fingerprint: FNV/splitmix MinHash over char 8-gram
    * shingles of the normalized text — stable under whitespace/case noise,
    * unlike a plain hash of the raw string.
    */
  def fingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    // hash shingles, never substring strings: char_shingle_hashes FNVs
    // each window in place over the shared byte buffer, and minhash over
    // pre-hashed longs equals minhash over the string shingles (whose
    // base hash is the same FNV)
    graft.functions.minhash_sig(
      graft.functions.char_shingle_hashes(norm, 8), 1).getItem(0)
  }

  /** Char k-gram shingles (codegen'd kernel — the transform(sequence(...))
    * HOF form runs its lambda interpreted per offset).
    */
  def charShingles(text: Column, k: Int): Column =
    graft.functions.char_shingles(text, k)

  /** Word n-gram shingles from a token array. Codegen'd imperative kernel
    * (functions.WordShingles) — the equivalent HOF composition
    * transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))
    * evaluates its lambda interpreted per element and dominated corpus
    * n-gram counting at sf0.1.
    */
  def wordShingles(toks: Column, n: Int): Column =
    graft.functions.word_shingles(toks, n)

  // ------------------------------------------------- Gopher quality gate —

  /** The Gopher/MassiveText document-quality rules (Rae et al. 2021,
    * "Scaling Language Models", appendix A1.1 — published heuristics):
    * word count in [50, 100k], mean word length in [3, 10],
    * symbol-to-word ratio ('#' or '...') <= 0.1, >= 80% of words contain
    * an alphabetic character, and >= 2 distinct Gopher stopwords present.
    * All pure column expressions, map-only; the per-token counts run
    * through the codegen'd TokenSets kernels (no interpreted HOF lambdas
    * in the gate).
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val n = size(toks)
    val nd = n.cast("double")
    // mean WORD length = letter chars / word count (punctuation and
    // digits excluded, per the rule's intent — counting all non-ws chars
    // would inflate punctuation-heavy docs past the [3,10] gate).
    // \p{L}, not [a-z]: an ASCII-only class would zero the metric for
    // every non-Latin-script document and hard-fail the gate on them.
    val meanLen = when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") / nd)
    val hashCount = length(text) - length(regexp_replace(text, "#", ""))
    val ellipsisCount =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = when(n === 0, 0.0)
      .otherwise((hashCount + ellipsisCount).cast("double") / nd)
    val alphaRatio = when(n === 0, 0.0).otherwise(
      graft.functions.count_matching(toks, "\\p{L}").cast("double") / nd)
    val stopTypes = graft.functions.count_in_set(toks, gopherStopwords,
      distinct = true)
    docs.select(
      col(idCol),
      n.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_word_ratio"),
      round(alphaRatio, 4).as("alpha_word_ratio"),
      stopTypes.cast("long").as("stopword_types"),
      (n.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 && alphaRatio >= 0.8 && stopTypes >= 2)
        .as("passes_gopher"))
  }

  /** Within-document repetition: fraction of duplicate word n-grams
    * (Gopher A1.1's repetition family). Free on top of the codegen'd
    * shingle kernel — `word_shingle_hashes` already emits DISTINCT
    * hashes, so the ratio is 1 - distinct/total windows. 0 for docs too
    * short to carry an n-gram.
    */
  def repetitionRatio(toks: Column, n: Int): Column = {
    val windows = size(toks) - (n - 1)
    when(windows <= 0, 0.0).otherwise(
      lit(1.0) - size(graft.functions.word_shingle_hashes(toks, n))
        .cast("double") / windows.cast("double"))
  }

  /** Keep only documents passing the Gopher rules. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      gopherStats(docs, idCol, textCol)
        .filter(col("passes_gopher")).select(col(idCol)),
      Seq(idCol), "left_semi")

  // ----------------------------------------------------- C4 line rules —

  /** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning", §2.2 — the published heuristics behind the C4
    * corpus), line-oriented where Gopher is document-oriented:
    * keep only lines that end in terminal punctuation AND have >= 5
    * words; drop any page with fewer than 3 sentences (counted over the
    * KEPT text), with a '{' (code), or with the "lorem ipsum"
    * placeholder. All pure column expressions over one line split —
    * map-only at any scale.
    *
    * Emits per doc: line counts before/after the line gate, the
    * sentence count, the two content flags, the pass verdict, and
    * `kept_text` (surviving lines re-joined — what a C4 pipeline
    * actually feeds downstream).
    */
  def c4Stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']$") && size(split(trim(l), "\\s+")) >= 5)
    val keptText = array_join(kept, "\n")
    val sentences = size(filter(split(keptText, "[.!?]"),
      s => trim(s) =!= ""))
    val hasBrace = col(textCol).contains("{")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      sentences.cast("long").as("n_sentences"),
      hasBrace.as("has_brace"),
      hasLorem.as("has_lorem"),
      (sentences >= 3 && !hasBrace && !hasLorem).as("passes_c4"),
      keptText.as("kept_text"))
  }

  /** Keep passing documents, text REWRITTEN to the surviving lines (the
    * C4 pipeline contract: the line gate edits pages, the page gate
    * drops them).
    */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stats = c4Stats(docs, idCol, textCol)
      .filter(col("passes_c4"))
      .select(col(idCol), col("kept_text"))
    docs.drop(textCol).join(stats, Seq(idCol))
      .withColumnRenamed("kept_text", textCol)
  }

  /** Per-document lexical diversity: type-token ratio, hapax share, and
    * Yule's K (Yule 1944) — `K = 10⁴·(Σ_w m_w² − N)/N²` over the
    * word-frequency spectrum, the repetitiveness characteristic that is
    * (unlike raw TTR) approximately length-invariant. The
    * lexical-richness quality gate next to [[repetitionRatio]]'s
    * surface-repeat view: template/spam text scores high K and low
    * TTR; K is also a cheap style fingerprint. Tokens are [[tokens]]
    * (lowercased whitespace words). Empty docs are dropped (no
    * diversity is defined on zero tokens — documented, not a null
    * row). Returns (idCol, n_tokens, n_types, ttr, hapax_share,
    * yules_k), ratios 6 dp.
    *
    * 100 TB shape: explode → ONE (doc, word) count shuffle → one
    * doc-keyed re-agg (all moments — N, V, V₁, Σm² — in a single
    * pass); both frames are corpus-token-sized then doc-sized, no
    * window, no join.
    */
  def lexicalDiversity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val wordCounts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__m"))
    wordCounts
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__m") === 1, 1L).otherwise(0L)).as("__v1"),
        sum(col("__m") * col("__m")).as("__sm2"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        round(col("__v1").cast("double") / col("n_types"), 6)
          .as("hapax_share"),
        round(lit(1e4) * (col("__sm2") - col("n_tokens")).cast("double") /
          (col("n_tokens") * col("n_tokens")), 6).as("yules_k"))
  }

  /** Bigram PMI collocations (Church & Hanks 1990, "Word association
    * norms, mutual information, and lexicography"): rank adjacent word
    * pairs by pointwise mutual information over the BIGRAM event space
    * — `pmi(a,b) = ln( n_ab · B / (n_a• · n_•b) )` where B is the total
    * bigram count, n_a• the count of bigrams with left word a and n_•b
    * with right word b. Marginals are positional (left/right), so the
    * whole statistic is a pure function of one integer count table —
    * no second tokenization pass and no cross-engine probability
    * conventions to disagree on. High-PMI pairs are the corpus's fixed
    * phrases ("los angeles", "et al"); the standard collocation signal
    * for tokenizer-vocabulary audits and boilerplate discovery.
    *
    * `minCount` is Church & Hanks' own rail: PMI explodes for rare
    * pairs (a 1-count pair of two 1-count words maxes the statistic),
    * so pairs under the floor are dropped before ranking.
    *
    * Returns (bigram, n_ab, n_left, n_right, pmi) for the topK pairs
    * by (pmi desc, bigram), pmi rounded to 6 dp.
    *
    * 100 TB shape: ONE corpus-sized shuffle builds the bigram count
    * table (codegen'd shingle kernel, map-side partial agg); both
    * marginals are bigram-TYPE-sized re-aggs of that table (pinned —
    * the corpus is never re-scanned) and join back on the type key;
    * B is a 1-row broadcast; the topK is a TakeOrdered, not a sort.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK > 0, "topK must be positive")
    val counts = docs
      .select(explode(wordShingles(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(true) // consumers: both marginals, B, the ranked join
    val leftC = counts
      .groupBy(substring_index(col("bigram"), " ", 1).as("__l"))
      .agg(sum(col("n_ab")).as("n_left"))
    val rightC = counts
      .groupBy(substring_index(col("bigram"), " ", -1).as("__r"))
      .agg(sum(col("n_ab")).as("n_right"))
    val total = counts.agg(sum(col("n_ab")).as("__B"))
    counts
      .where(col("n_ab") >= minCount)
      .withColumn("__l", substring_index(col("bigram"), " ", 1))
      .withColumn("__r", substring_index(col("bigram"), " ", -1))
      .join(leftC, Seq("__l"))
      .join(rightC, Seq("__r"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("n_ab"), col("n_left"), col("n_right"),
        round(log(col("n_ab").cast("double") * col("__B") /
          (col("n_left") * col("n_right"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** Zipf rank-frequency fit (Zipf 1949): OLS of ln(freq) on ln(rank)
    * over the topK most frequent terms — natural corpora slope ≈ -1;
    * a flat slope flags synthetic/templated text, a cliff flags
    * boilerplate domination. The corpus-intake twin of [[pmiCollocations]]:
    * one statistic that says whether the token distribution even looks
    * like language. Returns a single row
    * (n_terms, slope, intercept, r2), each rounded to 6 dp.
    *
    * Ranks are (freq desc, term asc) — fully deterministic under ties.
    * The five OLS moments quantize to DECIMAL(38,12) per term before
    * summing, so the fit is partition-invariant; the slope/intercept/r2
    * algebra then runs on exact decimal sums.
    *
    * 100 TB shape: ONE corpus-sized shuffle builds term counts
    * (map-side partial agg), the topK is a TakeOrdered (never a full
    * sort), and the regression runs on the K-row frame — its
    * unpartitioned rank window is K-sized by construction.
    */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    require(topK >= 2, "topK must be >= 2 (a line needs two points)")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topK)
    val w = Window.orderBy(col("freq").desc, col("term"))
    val ranked = counts
      .withColumn("__x", log(row_number().over(w).cast("double")))
      .withColumn("__y", log(col("freq").cast("double")))
    val moments = ranked.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__x").cast("decimal(38,12)")).cast("double").as("__sx"),
      sum(col("__y").cast("decimal(38,12)")).cast("double").as("__sy"),
      sum((col("__x") * col("__x")).cast("decimal(38,12)"))
        .cast("double").as("__sxx"),
      sum((col("__y") * col("__y")).cast("decimal(38,12)"))
        .cast("double").as("__syy"),
      sum((col("__x") * col("__y")).cast("decimal(38,12)"))
        .cast("double").as("__sxy"))
    val covN = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varXN = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val varYN = col("__n") * col("__syy") - col("__sy") * col("__sy")
    moments.select(
      col("__n").cast("long").as("n_terms"),
      round(covN / varXN, 6).as("slope"),
      round((col("__sy") - (covN / varXN) * col("__sx")) / col("__n"), 6)
        .as("intercept"),
      round(covN * covN / (varXN * varYN), 6).as("r2"))
  }

  /** Full per-document stats frame (the `queries` surface). */
  def documentStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    docs.select(
      col(idCol),
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
      bpeTokenCount(text).as("n_bpe_tokens"),
      round(punctRatio(text), 4).as("punct_ratio"),
      round(stopwordRatio(text), 4).as("stopword_ratio"),
      round(meanTokenLen(text), 4).as("mean_token_len"),
      qualityScore(text).as("quality"),
      langId(text).as("lang_pred"),
      fingerprint(text).as("fingerprint"))
  }

  /** Corpus-level BLEU-4 (Papineni et al. 2002) over (candidate,
    * reference) text pairs — the generation-eval staple: modified
    * n-gram precision with per-pair clipping (a candidate n-gram
    * counts at most as often as the reference contains it), geometric
    * mean over orders 1..4, brevity penalty
    * `BP = min(1, e^(1 − r/c))` on CORPUS lengths. Single-reference
    * form. Returns one row (n_pairs, cand_len, ref_len, p1..p4,
    * brevity_penalty, bleu), 6 dp: p_n is null when no candidate is
    * n tokens long; bleu is 0 when any order has zero matches (the
    * standard unsmoothed convention — eval sets are big enough that
    * smoothing is a sentence-level concern) and null on an empty
    * candidate corpus.
    *
    * 100 TB shape: per order, ONE (pair, gram) count aggregation per
    * side and one grain-sized inner join (clipping needs only grams
    * present in BOTH) — every corpus sum is an exact integer, so the
    * whole statistic is order-free; the final algebra runs on eight
    * collected longs. Eval-set-sized by intent, but nothing here
    * breaks at corpus scale.
    */
  /** Space-joined token n-grams of a string array (1-grams are the
    * tokens themselves); empty below n tokens. Shared by
    * [[bleuCorpus]]/[[rougeScores]]. */
  private def tokenNgrams(a: Column, n: Int): Column =
    if (n == 1) a
    else when(size(a) >= n,
      transform(sequence(lit(0), size(a) - n),
        i => concat_ws(" ", slice(a, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def bleuCorpus(pairs: DataFrame, candCol: String, refCol: String,
      idCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val maxN = 4
    def ngrams(a: Column, n: Int): Column = tokenNgrams(a, n)
    // fan a scan-shaped input out BEFORE tokenizing: tokenization and
    // the per-order gram explodes below are the per-row cost, and on a
    // single-row-group local file they would otherwise run map-side on
    // ONE task (guide §2.5). No-op at scale or behind an exchange.
    val base = Scale.fanOutIfScan(pairs
        .filter(col(candCol).isNotNull && col(refCol).isNotNull &&
          col(idCol).isNotNull)
        .select(col(idCol).as("__id"), col(candCol).as("__cs"),
          col(refCol).as("__rs")))
      .select(col("__id"), tokens(col("__cs")).as("__c"),
        tokens(col("__rs")).as("__r"))
      .localCheckpoint(true) // consumers: lengths + one gram pass a side
    // ONE aggregation carries the pair count, both corpus lengths and
    // every order's candidate-gram total
    val lenAggs = Seq(count(lit(1)).as("np"),
      sum(size(col("__c"))).as("cl"), sum(size(col("__r"))).as("rl")) ++
      (1 to maxN).map(n =>
        sum(greatest(size(col("__c")) - lit(n - 1), lit(0))).as(s"t$n"))
    val lens = base.agg(lenAggs.head, lenAggs.tail: _*).head()
    val np = lens.getLong(0)
    val (cLen, rLen) =
      if (np == 0) (0L, 0L) else (lens.getLong(1), lens.getLong(2))
    // ONE order-tagged gram pass per side (not one per order): all four
    // orders share a single shuffle, and clipping needs only grams
    // present in both sides, so the join stays inner
    def taggedCounts(c: String) = base
      .select(col("__id"), explode(flatten(array((1 to maxN).map(n =>
        transform(ngrams(col(c), n),
          g => struct(lit(n).as("n"), g.as("g")))): _*))).as("__x"))
      .select(col("__id"), col("__x.n").as("__n"), col("__x.g").as("__g"))
      .groupBy(col("__id"), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
    val matched = taggedCounts("__c")
      .join(taggedCounts("__r").withColumnRenamed("__cnt", "__rcnt"),
        Seq("__id", "__n", "__g"))
      .groupBy(col("__n"))
      .agg(sum(least(col("__cnt"), col("__rcnt"))).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perOrder = (1 to maxN).map { n =>
      (matched.getOrElse(n, 0L),
        if (np == 0) 0L else lens.getLong(lens.fieldIndex(s"t$n")))
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ps = perOrder.map { case (m, t) =>
      if (t > 0) Some(m.toDouble / t.toDouble) else None
    }
    val bp =
      if (cLen > rLen) 1.0
      else math.exp(1.0 - rLen.toDouble / cLen.toDouble)
    val bleu =
      if (cLen == 0) None
      else if (perOrder.exists(_._1 == 0)) Some(0.0)
      else Some(r6(bp * math.exp(
        ps.map(p => math.log(p.get)).reduceLeft(_ + _) / maxN.toDouble)))
    Seq((np, cLen, rLen, ps(0).map(r6), ps(1).map(r6), ps(2).map(r6),
        ps(3).map(r6), if (cLen == 0) None else Some(r6(bp)), bleu))
      .toDF("n_pairs", "cand_len", "ref_len", "p1", "p2", "p3", "p4",
        "brevity_penalty", "bleu")
  }

  /** Per-pair ROUGE-1 / ROUGE-2 / ROUGE-L precision, recall, F1 (Lin
    * 2004) — [[bleuCorpus]]'s recall-oriented summarization sibling,
    * at PAIR grain (ROUGE is reported per example and macro-averaged;
    * the caller averages). ROUGE-n uses clipped n-gram overlap (same
    * kernel as BLEU's numerator); ROUGE-L uses the longest common
    * subsequence via the codegen'd [[graft.functions.token_lcs]]
    * expression (null above `maxTokens` a side — the O(n·m) honesty
    * cap, surfacing as null ROUGE-L, never a silent truncation).
    * Zero-token sides yield null precision/recall; F1 is
    * `2PR/(P+R)`, null when either side is null or P+R = 0.
    *
    * 100 TB shape: two (pair, gram) count aggregations + grain-sized
    * inner joins per order, one map-only LCS expression — pair-keyed
    * throughout, no corpus-global state at all.
    */
  /** Keyness by Dunning's log-likelihood ratio (Dunning 1993): which
    * words are OVER/UNDER-represented in corpus A relative to corpus B
    * — the corpus-comparison readout behind "what makes this slice
    * different" (data-mix debugging, domain drift, register analysis).
    * [[graft.ops.Profile.sourceKl]] scores whole GROUPS; this scores
    * WORDS. Per word with counts a, b and corpus totals N_a, N_b:
    *
    *   E_a = (a+b)·N_a/(N_a+N_b),  E_b = (a+b)·N_b/(N_a+N_b),
    *   G² = 2·[a·ln(a/E_a) + b·ln(b/E_b)]   (0·ln 0 = 0)
    *
    * (compare to χ²₁; G² behaves where chi-square's E≥5 rule fails —
    * exactly the rare-word tail this exists for). Returns the top-K
    * rows by G² (word tiebreak): (word, n_a, n_b, expected_a, g2,
    * direction), direction = over/under-represented in A. 6 dp.
    *
    * 100 TB shape: one word-count aggregation per side, a vocab-grain
    * full-outer join, per-word map algebra, bounded top-K sort.
    */
  def keyness(corpusA: DataFrame, corpusB: DataFrame, textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 1 && topK <= 100000, "keyness: topK in [1,100000]")
    def counts(df: DataFrame, n: String) = df
      .filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as(n))
    val j = counts(corpusA, "n_a")
      .join(counts(corpusB, "n_b"), Seq("word"), "full_outer")
      .select(col("word"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .localCheckpoint(true) // vocab-grain; totals + readout
    val t = j.agg(sum(col("n_a")), sum(col("n_b"))).head()
    val (na, nb) = (t.getLong(0), t.getLong(1))
    require(na > 0 && nb > 0, "keyness: both corpora must be non-empty")
    val totD = (na + nb).toDouble
    val ea = (col("n_a") + col("n_b")).cast("double") *
      lit(na.toDouble) / lit(totD)
    val eb = (col("n_a") + col("n_b")).cast("double") *
      lit(nb.toDouble) / lit(totD)
    val termA = when(col("n_a") > 0,
      col("n_a").cast("double") * log(col("n_a").cast("double") / ea))
      .otherwise(lit(0.0))
    val termB = when(col("n_b") > 0,
      col("n_b").cast("double") * log(col("n_b").cast("double") / eb))
      .otherwise(lit(0.0))
    j.withColumn("expected_a", round(ea, 6))
      .withColumn("g2", round(lit(2.0) * (termA + termB), 6))
      .withColumn("direction",
        when(col("n_a").cast("double") * lit(nb.toDouble) >
          col("n_b").cast("double") * lit(na.toDouble), "over")
          .otherwise("under"))
      .select(col("word"), col("n_a"), col("n_b"), col("expected_a"),
        col("g2"), col("direction"))
      .orderBy(col("g2").desc, col("word"))
      .limit(topK)
  }

  def rougeScores(pairs: DataFrame, candCol: String, refCol: String,
      idCol: String, maxTokens: Int = 10000): DataFrame = {
    // same scan-aware fan-out as bleuCorpus: the gram explodes and the
    // O(n·m) LCS kernel below are the per-row cost and must not run on
    // one scan task (guide §2.5)
    val base = Scale.fanOutIfScan(pairs
        .filter(col(candCol).isNotNull && col(refCol).isNotNull &&
          col(idCol).isNotNull)
        .select(col(idCol).as("__id"), col(candCol).as("__cs"),
          col(refCol).as("__rs")))
      .select(col("__id"), tokens(col("__cs")).as("__c"),
        tokens(col("__rs")).as("__r"))
      .localCheckpoint(true) // consumers: 4 gram passes + the readout
    def gramCounts(c: String, n: Int) = base
      .select(col("__id"), explode(tokenNgrams(col(c), n)).as("__g"))
      .groupBy(col("__id"), col("__g")).agg(count(lit(1)).as("__n"))
    def matchesFor(n: Int) = gramCounts("__c", n)
      .join(gramCounts("__r", n).withColumnRenamed("__n", "__rn"),
        Seq("__id", "__g"))
      .groupBy(col("__id"))
      .agg(sum(least(col("__n"), col("__rn"))).as(s"__m$n"))
    def prf(m: Column, tc: Column, tr: Column, name: String) = {
      val p = when(tc > 0, m.cast("double") / tc.cast("double"))
      val r = when(tr > 0, m.cast("double") / tr.cast("double"))
      val f = when(p.isNotNull && r.isNotNull && (p + r) > 0,
        lit(2.0) * p * r / (p + r))
      Seq(round(p, 6).as(s"${name}_p"), round(r, 6).as(s"${name}_r"),
        round(f, 6).as(s"${name}_f"))
    }
    val lc = size(col("__c"))
    val lr = size(col("__r"))
    base
      .join(matchesFor(1), Seq("__id"), "left")
      .join(matchesFor(2), Seq("__id"), "left")
      .withColumn("__lcs",
        graft.functions.token_lcs(col("__c"), col("__r"), maxTokens))
      .select(col("__id").as(idCol) +: (
        prf(coalesce(col("__m1"), lit(0L)), lc, lr, "rouge1") ++
        prf(coalesce(col("__m2"), lit(0L)),
          greatest(lc - 1, lit(0)), greatest(lr - 1, lit(0)), "rouge2") ++
        prf(col("__lcs"), lc, lr, "rougeL")): _*)
      .orderBy(col(idCol))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Texts"): corpus-level keywords as the
    * highest-PageRank nodes of the word CO-OCCURRENCE graph —
    * adjacent non-stopword token pairs become undirected edges
    * weighted by their adjacency count, and [[graft.ops.Graph
    * .pageRankWeighted]] runs on the symmetrized edge list. Scores are
    * reported on TextRank's own scale (mean 1 over words): the paper's
    * recursion uses constant (1−d) where PageRank uses (1−d)/N, and
    * the two fixpoints differ by exactly ×N, so the rank order is
    * identical and the scale is one multiplication — no second
    * iteration scheme to maintain. Returns the top `topK` rows
    * (word, score), 6 dp, score-desc / word-asc.
    *
    * 100 TB shape: tokenize + pair expansion are map-side; ONE
    * vocab-pair-grain aggregation builds the edge list (bounded by
    * vocabulary², in practice by co-occurrence sparsity), then the
    * pinned-edge PageRank iteration (one join + node-sized aggregate
    * per round). The corpus is scanned exactly once.
    */
  def textRank(docs: DataFrame, textCol: String, topK: Int = 20,
      iterations: Int = 5): DataFrame = {
    require(topK >= 1, "textRank: topK must be >= 1")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(filter(tokens(col(textCol)),
        t => !t.isInCollection(stopwords)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("a"),
          element_at(col("__t"), i + 2).as("b")))).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .filter(col("a") =!= col("b")) // self-adjacency is not an edge
      .select(least(col("a"), col("b")).as("p1"),
        greatest(col("a"), col("b")).as("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
    val edges = pairs
      .select(col("p1").as("src"), col("p2").as("dst"), col("w"))
      .unionAll(pairs.select(col("p2").as("src"), col("p1").as("dst"),
        col("w")))
      .localCheckpoint(true) // consumers: node count + the PR setup
    val n = edges.select(col("src")).distinct().count()
    require(n > 0, "textRank: no co-occurrence edges after filtering")
    Graph.pageRankWeighted(edges, "src", "dst", "w", iterations)
      .select(col("node").as("word"),
        round(col("pr") * lit(n.toDouble), 6).as("score"))
      .orderBy(col("score").desc, col("word"))
      .limit(topK)
  }

  /** Heaps'-law vocabulary-growth fit (Heaps 1978): `V(N) ≈ K·N^β` —
    * how fast the vocabulary grows as the corpus does, THE corpus
    * planning number (β ≈ 0.4-0.6 for natural text; a fixed-vocab
    * generator reads β → 0, which is exactly what §6's q134 curve
    * diagnosis needed). The cumulative-distinct problem becomes
    * embarrassingly parallel through the FIRST-OCCURRENCE device:
    * `types(N) = |{terms whose min doc_id ≤ N}|`, so one term-grain
    * aggregate + one conditional fold replace any ordered scan; the
    * checkpoints are exact doc_id deciles from the distributed
    * quantile machine. Returns one row per non-degenerate decile:
    * (decile, tokens, types, beta, k, r2) with the log-log OLS fit
    * (decimal-quantized moments over ≤ 10 points) repeated on each
    * row, 6 dp.
    */
  def heapsLaw(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("__tk"))
      .filter(col("doc_id").isNotNull)
    val perDoc = base
      .select(col("doc_id"),
        when(col("__tk").isNull, lit(0))
          .otherwise(size(col("__tk"))).cast("long").as("__ntok"))
      .localCheckpoint(eager = true) // thresholds + token fold
    val firstOcc = base
      .select(col("doc_id"), explode(col("__tk")).as("__term"))
      .groupBy(col("__term")).agg(min(col("doc_id")).as("__fd"))
      .localCheckpoint(eager = true) // vocab-sized; one fold
    val qs = (1 to 10).map(_ / 10.0)
    val thr = graft.ops.Quantiles.exact(perDoc.select(col("doc_id")),
        "doc_id", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val tokAggs = qs.map(q =>
      sum(when(col("doc_id") <= lit(thr(q)), col("__ntok"))
        .otherwise(lit(0L))).as(s"__tok_${(q * 10).round}"))
    val typAggs = qs.map(q =>
      count(when(col("__fd") <= lit(thr(q)), lit(1)))
        .as(s"__typ_${(q * 10).round}"))
    val tokRow = perDoc.agg(tokAggs.head, tokAggs.tail: _*).head()
    val typRow = firstOcc.agg(typAggs.head, typAggs.tail: _*).head()
    val pts = qs.map { q =>
      val i = (q * 10).round.toInt
      (i, tokRow.getLong(tokRow.fieldIndex(s"__tok_$i")),
        typRow.getLong(typRow.fieldIndex(s"__typ_$i")))
    }.filter(p => p._2 > 0 && p._3 > 0)
    require(pts.size >= 3,
      "heapsLaw: need >= 3 non-degenerate deciles")
    def q12(x: Double) = new java.math.BigDecimal(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    def sumQ(f: ((Int, Long, Long)) => Double) =
      pts.map(p => q12(f(p)))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
    val nP = pts.size.toDouble
    val sx = sumQ(p => math.log(p._2.toDouble))
    val sy = sumQ(p => math.log(p._3.toDouble))
    val sxx = sumQ(p => math.log(p._2.toDouble) * math.log(p._2.toDouble))
    val syy = sumQ(p => math.log(p._3.toDouble) * math.log(p._3.toDouble))
    val sxy = sumQ(p => math.log(p._2.toDouble) * math.log(p._3.toDouble))
    val beta = (nP * sxy - sx * sy) / (nP * sxx - sx * sx)
    val icept = (sy - beta * sx) / nP
    val r2 = (nP * sxy - sx * sy) * (nP * sxy - sx * sy) /
      ((nP * sxx - sx * sx) * (nP * syy - sy * sy))
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    pts.map { case (i, tok, typ) =>
      (i, tok, typ, r6(beta), r6(math.exp(icept)), r6(r2))
    }.toDF("decile", "tokens", "types", "beta", "k", "r2")
      .orderBy(col("decile"))
  }

  /** PMI collocations (Church & Hanks 1990): directional adjacent
    * bigrams scored by pointwise mutual information
    * `PMI(a,b) = ln( (c_ab/P) / ((c_a/T)·(c_b/T)) )` — how much more
    * often the pair occurs than independence predicts. Adjacency is
    * computed on the RAW token stream (removing stopwords first would
    * fabricate adjacencies that never occurred); stopword-bearing and
    * single-character pairs are filtered AFTER counting, and a pair
    * must appear `minCount` times (PMI's low-frequency pathology is
    * cut, stated). Returns the topK by (6-dp PMI desc, w1, w2):
    * (w1, w2, n_pair, pmi).
    *
    * 100 TB shape: one token explode → pair aggregate (bigram-vocab-
    * sized), unigram counts joined pair-keyed twice, totals as two
    * 1-row broadcast crossJoins; the top-k is TakeOrderedAndProject.
    */
  def collocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(topK >= 1, "collocations: topK must be >= 1")
    require(minCount >= 1, "collocations: minCount must be >= 1")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("__t"))
      .localCheckpoint(true) // consumers: unigrams, pairs (both totals
      // ride their aggregates)
    val uni = toks
      .select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .localCheckpoint(true) // vocab-sized; joined twice + totalled
    val totTok = uni.agg(sum(col("cw")).as("__T"))
    val pairs = toks
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("a"),
          element_at(col("__t"), i + 2).as("b")))).as("__p"))
      .select(col("__p.a").as("w1"), col("__p.b").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .localCheckpoint(true) // bigram-vocab-sized; total + readout
    val totPair = pairs.agg(sum(col("n_pair")).as("__P"))
    val kept = pairs
      .filter(col("n_pair") >= minCount &&
        !col("w1").isInCollection(stopwords) &&
        !col("w2").isInCollection(stopwords) &&
        length(col("w1")) >= 2 && length(col("w2")) >= 2)
      .join(uni.select(col("w").as("w1"), col("cw").as("__c1")),
        Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("__c2")),
        Seq("w2"))
      .crossJoin(broadcast(totPair)).crossJoin(broadcast(totTok))
    kept
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log((col("n_pair").cast("double") /
            col("__P").cast("double")) /
          ((col("__c1").cast("double") / col("__T").cast("double")) *
            (col("__c2").cast("double") / col("__T").cast("double")))),
          6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Latent topic discovery by PLSA-EM (Hofmann 1999, probabilistic
    * latent semantic analysis) — the "what is actually in this crawl"
    * tool a curation run needs BEFORE setting mixture weights: the
    * corpus's (doc, term) count matrix is decomposed into k latent
    * topics, `P(w|d) = Σ_z P(w|z)·P(z|d)`, by `iters` fixed EM steps,
    * and the readout is each topic's top terms:
    * (topic, rank, term, weight), weight = P(term|topic) at 6 dp,
    * ordered (topic, rank). Unlike the DECLARED-domain readouts
    * (source mixtures, lang-id), nothing here trusts metadata — the
    * topics come from co-occurrence alone.
    *
    * Determinism (engine-replayable, no RNG): the vocabulary is the
    * top `vocabSize` terms by corpus frequency (ties break on the
    * term); P(w|z) initializes from the arithmetic perturbation
    * `1 + ((rank·131 + z·197) mod 1009)/1009` of uniform (the
    * symmetry breaker — pure integer arithmetic, identical in any
    * engine); P(z|d) starts uniform. Every E-step responsibility is a
    * fixed left-assoc double shape; every M-step aggregation is
    * DECIMAL(38,12)-quantized, so accumulation order cannot move the
    * fit. Fixed `iters` (EM is monotone in likelihood; the point is a
    * reproducible decomposition, not convergence detection).
    *
    * 100 TB shape: one token explode → ONE (doc, term) count
    * collapse (pinned; re-consumed per EM step); the vocabulary is a
    * TakeOrdered top-V (never a global sort) and rides every join as
    * a BROADCAST; per EM step ONE doc-keyed shuffle of the count
    * frame joins P(z|d), two grain aggregations rebuild the factors,
    * and the topic-term matrix stays V×k-bounded (collect-free —
    * it is broadcast as a frame, never driver literals). State on
    * executors is O(docs·k) + O(V·k), never corpus-sized.
    */
  def latentTopics(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, iters: Int = 3, vocabSize: Int = 300,
      topTerms: Int = 10): DataFrame = {
    require(topTerms >= 1 && topTerms <= 50,
      "latentTopics: topTerms must be in 1..50")
    val (pwz, _) = plsaFactors(docs, idCol, textCol, k, iters,
      vocabSize, "latentTopics")
    val zs = 0 until k
    val wTop = Window.partitionBy(col("topic"))
      .orderBy(col("__p").desc, col("term"))
    val arr = array(zs.map(z =>
      struct(lit(z).as("topic"), col(s"__pw$z").as("__p"))): _*)
    pwz.select(col("__w").as("term"), explode(arr).as("__e"))
      .select(col("__e.topic").as("topic"), col("term"),
        col("__e.__p").as("__p"))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= topTerms)
      .select(col("topic"), col("rank"), col("term"),
        round(col("__p"), 6).as("weight"))
      .orderBy(col("topic"), col("rank"))
  }

  /** Per-document topic mixture — [[latentTopics]]' ROUTING face:
    * the same PLSA-EM factors, read at document grain as
    * (doc, topic, weight = P(topic|doc), is_dominant), one row per
    * (doc, topic), ordered (doc, topic). `is_dominant` marks the
    * argmax topic (raw-double comparison, ties break to the lower
    * topic index) — the label a curation pipeline routes or
    * stratifies on once [[latentTopics]]' top-terms readout has named
    * the topics. Docs with no in-vocabulary token emit nothing (they
    * carry no evidence). Same determinism contract and 100 TB shape
    * as [[latentTopics]]; the readout adds one doc-partitioned rank
    * window over the k-row-per-doc frame.
    */
  def latentTopicMixture(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 4, iters: Int = 3,
      vocabSize: Int = 300): DataFrame = {
    val (_, pzd) = plsaFactors(docs, idCol, textCol, k, iters,
      vocabSize, "latentTopicMixture")
    val zs = 0 until k
    val arr = array(zs.map(z =>
      struct(lit(z).as("topic"), col(s"__pd$z").as("__p"))): _*)
    val wDom = Window.partitionBy(col("__d"))
      .orderBy(col("__p").desc, col("topic"))
    pzd.select(col("__d"), explode(arr).as("__e"))
      .select(col("__d"), col("__e.topic").as("topic"),
        col("__e.__p").as("__p"))
      .withColumn("__rk", row_number().over(wDom))
      .select(col("__d").as(idCol), col("topic"),
        round(col("__p"), 6).as("weight"),
        (col("__rk") === 1).as("is_dominant"))
      .orderBy(col(idCol), col("topic"))
  }

  /** The shared PLSA-EM core behind [[latentTopics]] (topic-term
    * readout) and [[latentTopicMixture]] (doc-mixture readout):
    * returns the final (P(w|z) frame keyed `__w`/`__pw*`,
    * P(z|d) frame keyed `__d`/`__pd*`). One implementation — the two
    * readouts cannot drift. */
  private def plsaFactors(docs: DataFrame, idCol: String,
      textCol: String, k: Int, iters: Int, vocabSize: Int,
      op: String): (DataFrame, DataFrame) = {
    require(k >= 2 && k <= 10, s"$op: k must be in 2..10")
    require(iters >= 1 && iters <= 6,
      s"$op: iters must be in 1..6")
    require(vocabSize >= 10 && vocabSize <= 5000,
      s"$op: vocabSize must be in 10..5000")
    def d12(c: Column) = c.cast("decimal(38,12)")
    val zs = 0 until k
    val cdw = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__d"),
        explode(tokens(col(textCol))).as("__w"))
      .groupBy(col("__d"), col("__w"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // consumers: vocab pick + count frame
    val wV = Window.orderBy(col("__tot").desc, col("__w"))
    val vocab = cdw.groupBy(col("__w"))
      .agg(sum(col("__n")).as("__tot"))
      .orderBy(col("__tot").desc, col("__w")).limit(vocabSize)
      // the row_number window runs on the ALREADY top-V frame
      // (TakeOrderedAndProject above it) — vocabSize-bounded, stated
      .withColumn("__r", row_number().over(wV) - 1)
      .select(col("__w"), col("__r"))
      .localCheckpoint(true) // consumers: init + count prune
    val cnt = cdw.join(broadcast(vocab), Seq("__w"))
      .select(col("__d"), col("__w"),
        col("__n").cast("double").as("__n"))
      .localCheckpoint(true) // consumed once per EM step
    // init P(w|z): uniform + the integer-mod perturbation, decimal-
    // normalized per topic
    val praw = vocab.select(col("__w") +: zs.map(z =>
      (lit(1.0) + ((col("__r") * 131 + lit(z * 197)) % 1009)
        .cast("double") / lit(1009.0)).as(s"__raw$z")): _*)
    val ptotAgg = zs.map(z => sum(d12(col(s"__raw$z"))).as(s"__t$z"))
    val ptot = praw.agg(ptotAgg.head, ptotAgg.tail: _*)
    var pwz = praw.crossJoin(broadcast(ptot))
      .select(col("__w") +: zs.map(z =>
        (col(s"__raw$z") / col(s"__t$z").cast("double"))
          .as(s"__pw$z")): _*)
    var pzd = cnt.select(col("__d")).distinct()
      .select(col("__d") +: zs.map(z =>
        lit(1.0 / k).as(s"__pd$z")): _*)
    for (_ <- 1 to iters) {
      val j = cnt.join(broadcast(pwz), Seq("__w"))
        .join(pzd, Seq("__d"))
      val raws = zs.map(z => col(s"__pw$z") * col(s"__pd$z"))
      val denom = raws.reduceLeft(_ + _)
      val resp = j.select(col("__d") +: col("__w") +: zs.map(z =>
          (col("__n") * raws(z) / denom).as(s"__c$z")): _*)
        .localCheckpoint(true) // consumers: both M-step grains
      val pdAggs = zs.map(z => sum(d12(col(s"__c$z"))).as(s"__s$z"))
      val pdRaw = resp.groupBy(col("__d"))
        .agg(pdAggs.head, pdAggs.tail: _*)
      val pdTot = zs.map(z => col(s"__s$z").cast("double"))
        .reduceLeft(_ + _)
      pzd = pdRaw.select(col("__d") +: zs.map(z =>
        (col(s"__s$z").cast("double") / pdTot).as(s"__pd$z")): _*)
      val pwRaw = resp.groupBy(col("__w"))
        .agg(pdAggs.head, pdAggs.tail: _*)
      val pwTotAgg = zs.map(z => sum(col(s"__s$z")).as(s"__t$z"))
      val pwTot = pwRaw.agg(pwTotAgg.head, pwTotAgg.tail: _*)
      pwz = pwRaw.crossJoin(broadcast(pwTot))
        .select(col("__w") +: zs.map(z =>
          (col(s"__s$z").cast("double") / col(s"__t$z").cast("double"))
            .as(s"__pw$z")): _*)
    }
    (pwz, pzd)
  }

  /** The shared PPMI device behind [[ppmiEmbeddings]] /
    * [[ppmiNeighbors]]: top-V vocabulary (corpus frequency, ties on
    * the term), symmetric adjacent-window co-occurrence counts
    * (directed bigram counts + their transpose — the raw token
    * stream's adjacency, the [[collocations]] event space), and the
    * driver-side positive-PMI cells
    * `ppmi(a,b) = max(0, ln(n_ab·T / (c_a·c_b)))` with c = row sums,
    * T = the symmetric total (Levy & Goldberg 2014's count matrix).
    *
    * Returns (vocab in rank order, term→index, dense-index PPMI cell
    * map). Distributed work: ONE token-explode unigram aggregation
    * (TakeOrdered top-V — never a global sort) + ONE directed-pair
    * aggregation semi-joined to the broadcast vocab; the collect is
    * the in-vocab pair grain, ≤ V² cells (vocabSize ≤ 1024 rail →
    * ≤ 8 MB of driver state, the PCA eigensolve contract). */
  private def ppmiCells(docs: DataFrame, textCol: String,
      vocabSize: Int): (Array[String], Map[String, Int],
      scala.collection.Map[(Int, Int), Double]) = {
    require(vocabSize >= 2 && vocabSize <= 1024,
      "ppmi: vocabSize must be in 2..1024 (V x V driver cells)")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("__t"))
      .localCheckpoint(true) // consumers: unigrams + pairs
    val vocab = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w"))
      .limit(vocabSize) // TakeOrderedAndProject
      .select(col("w")).collect().map(_.getString(0))
    val idx = vocab.zipWithIndex.toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = broadcast(vocab.toSeq.toDF("w"))
    val directed = toks
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("a"),
          element_at(col("__t"), i + 2).as("b")))).as("__p"))
      .select(col("__p.a").as("w1"), col("__p.b").as("w2"))
      .join(vocabDf.select(col("w").as("w1")), Seq("w1"), "left_semi")
      .join(vocabDf.select(col("w").as("w2")), Seq("w2"), "left_semi")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .collect() // in-vocab pair grain: <= V^2 rows, bounded by the rail
    // symmetric counts n_ab = d_ab + d_ba; marginals are row sums
    val sym = scala.collection.mutable.Map.empty[(Int, Int), Long]
    directed.foreach { r =>
      // join key order moves w2/w1 to the front after the two
      // semi-joins; read by NAME to stay order-proof
      val i = idx(r.getString(r.fieldIndex("w1")))
      val j = idx(r.getString(r.fieldIndex("w2")))
      val n = r.getLong(r.fieldIndex("n"))
      sym((i, j)) = sym.getOrElse((i, j), 0L) + n
      sym((j, i)) = sym.getOrElse((j, i), 0L) + n
    }
    val rowSum = new Array[Long](vocab.length)
    sym.foreach { case ((i, _), n) => rowSum(i) += n }
    val total = rowSum.sum
    val cells = sym.collect {
      case ((i, j), n)
          if math.log(n.toDouble * total /
            (rowSum(i).toDouble * rowSum(j).toDouble)) > 0 =>
        (i, j) -> math.log(n.toDouble * total /
          (rowSum(i).toDouble * rowSum(j).toDouble))
    }
    (vocab, idx, cells)
  }

  /** Deterministic count-based word embeddings: the shifted-PPMI
    * factorization path (Levy & Goldberg 2014 — "skip-gram is
    * implicitly factorizing the PMI matrix") with an EXACT truncated
    * eigendecomposition instead of SGD: the symmetric V×V PPMI matrix
    * runs through the cyclic-Jacobi solver
    * ([[graft.ops.Projection]]'s), and word i embeds as
    * `e_i[d] = v_d[i]·√max(λ_d, 0)` over the top `dim` eigenvalues
    * (sign-normalized per component — largest-|entry| coordinate
    * positive, the PCA contract), so `E·Eᵀ` best-approximates PPMI.
    * No RNG anywhere: the corpus → embeddings → ANN loop closes
    * deterministically inside the engine.
    *
    * Returns (term, embedding array<double>), vocab rank order.
    *
    * 100 TB shape: the corpus collapses to ONE unigram aggregation +
    * ONE in-vocab pair aggregation ([[ppmiCells]]); everything after
    * is V-bounded driver algebra (vocabSize ≤ 1024 rail), the
    * [[graft.ops.Projection.trainPca]] economics exactly.
    */
  def ppmiEmbeddings(docs: DataFrame, textCol: String,
      vocabSize: Int = 300, dim: Int = 64): DataFrame = {
    require(dim >= 1, "ppmiEmbeddings: dim must be positive")
    val (vocab, _, cells) = ppmiCells(docs, textCol, vocabSize)
    // a corpus whose realized vocabulary is smaller than dim clamps to
    // the full eigenbasis (E·Eᵀ then reproduces PPMI exactly)
    val dimEff = math.min(dim, vocab.length)
    val v = vocab.length
    val mat = Array.ofDim[Double](v, v)
    cells.foreach { case ((i, j), p) => mat(i)(j) = p }
    val (eig, rows) = Projection.jacobiEigen(mat)
    val comps = rows.take(dimEff).map { r =>
      var bi = 0
      var bv = 0.0
      var x = 0
      while (x < v) {
        if (math.abs(r(x)) > bv) { bv = math.abs(r(x)); bi = x }
        x += 1
      }
      if (r(bi) < 0) r.map(-_) else r
    }
    val scale = eig.take(dimEff).map(l => math.sqrt(math.max(l, 0.0)))
    val spark = docs.sparkSession
    import spark.implicits._
    vocab.toSeq.zipWithIndex.map { case (w, i) =>
      (w, (0 until dimEff).map(d => comps(d)(i) * scale(d)).toArray)
    }.toDF("term", "embedding")
  }

  /** Nearest neighbors through the [[ppmiEmbeddings]] space, verified
    * against the EXACT PPMI-row cosine — the [[graft.ops.Similarity]]
    * ANN convention (q91's): the embedding ranks a candidate pool
    * (top `4·topK` by embedding cosine), the pool re-scores by the
    * exact PPMI-row cosine (decimal-quantized dot products — order-
    * free, engine-replayable), and the readout is the re-ranked top
    * `topK` per probe with `emb_recall_ok` attesting the embedding
    * search recovered the exact set (the oracle computes the true
    * PPMI-cosine top-k independently — a recall miss hash-mismatches).
    * Probes are the `nProbes` most frequent vocabulary terms.
    *
    * Returns (probe, rank, neighbor, ppmi_cos, emb_recall_ok),
    * ordered (probe, rank), 6 dp.
    */
  def ppmiNeighbors(docs: DataFrame, textCol: String, nProbes: Int = 3,
      topK: Int = 5, vocabSize: Int = 300, dim: Int = 64): DataFrame = {
    require(nProbes >= 1 && topK >= 1,
      "ppmiNeighbors: nProbes and topK must be positive")
    val (vocab, _, cells) = ppmiCells(docs, textCol, vocabSize)
    require(dim >= 1, "ppmiNeighbors: dim must be positive")
    val dimEff = math.min(dim, vocab.length) // full basis = exact dots
    val v = vocab.length
    val mat = Array.ofDim[Double](v, v)
    cells.foreach { case ((i, j), p) => mat(i)(j) = p }
    val (eig, rows) = Projection.jacobiEigen(mat)
    // pool ranking rides λ-SCALED coordinates (not the √λ output
    // embedding): (λ_d q_da)·(λ_d q_db) sums λ²-weighted terms, the
    // truncated best-approximant of the exact row dot M_a·M_b =
    // Σ λ² q_a q_b — negative eigenvalues square away correctly
    val scale = eig.take(dimEff)
    val emb = Array.tabulate(v, dimEff)((i, d) => rows(d)(i) * scale(d))
    def embCos(a: Int, b: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < dimEff) {
        dot += emb(a)(d) * emb(b)(d)
        na += emb(a)(d) * emb(a)(d); nb += emb(b)(d) * emb(b)(d)
        d += 1
      }
      if (na > 0 && nb > 0) dot / math.sqrt(na * nb) else 0.0
    }
    // exact PPMI-row cosine, decimal-quantized like a plan-side fold:
    // num = Σ q12(p_ac·p_bc), den = √q12Σ(p²)·√q12Σ(p²)
    import java.math.{BigDecimal => JBD, RoundingMode}
    def q12(x: Double) = new JBD(x).setScale(12, RoundingMode.HALF_UP)
    val rowsByTerm = cells.groupBy(_._1._1)
      .map { case (i, m) =>
        i -> m.map { case ((_, j), p) => j -> p }.toMap }
    val norm = (0 until v).map { i =>
      rowsByTerm.get(i).map(r =>
        r.values.map(p => q12(p * p)).reduce(_ add _).doubleValue())
        .getOrElse(0.0)
    }
    def ppmiCos(a: Int, b: Int): Option[Double] = {
      val (ra, rb) = (rowsByTerm.getOrElse(a, Map.empty),
        rowsByTerm.getOrElse(b, Map.empty))
      val shared = ra.keySet.intersect(rb.keySet).toSeq
      if (shared.isEmpty || norm(a) <= 0 || norm(b) <= 0) None
      else {
        val num = shared.map(c => q12(ra(c) * rb(c)))
          .reduce(_ add _).doubleValue()
        Some(num / (math.sqrt(norm(a)) * math.sqrt(norm(b))))
      }
    }
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val pool = math.max(4 * topK, 32)
    val out = (0 until math.min(nProbes, v)).flatMap { p =>
      val cand = (0 until v).filter(_ != p)
        .map(b => (b, embCos(p, b)))
        .sortBy { case (b, c) => (-c, vocab(b)) }
        .take(pool)
      cand.flatMap { case (b, _) =>
        ppmiCos(p, b).map(c => (b, r6(c))) }
        .sortBy { case (b, c) => (-c, vocab(b)) }
        .take(topK)
        .zipWithIndex
        .map { case ((b, c), r) =>
          (vocab(p), r + 1, vocab(b), c, true) }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    out.toDF("probe", "rank", "neighbor", "ppmi_cos", "emb_recall_ok")
      .orderBy(col("probe"), col("rank"))
  }
}
