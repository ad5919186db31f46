package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-counting kernels: membership/regex counts over a token array in
  * one imperative JVM pass. These replace `size(filter(toks, lambda))`
  * compositions, whose lambdas evaluate through Catalyst's INTERPRETED
  * per-element HOF path — the same cost class that dominated corpus
  * n-gram counting before the shingle kernels (q49, round 1). Sets and
  * compiled regexes are memoized per JVM keyed by their definition, so
  * the plan tree stays small.
  */
object TokenSets {
  val Sep = '\u0001'

  private val sets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[UTF8String]]()
  private val regexes =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def set(key: String): java.util.HashSet[UTF8String] =
    sets.computeIfAbsent(key, { k =>
      val s = new java.util.HashSet[UTF8String]()
      k.split(Sep).foreach(w => s.add(UTF8String.fromString(w)))
      s
    })

  private def pattern(regex: String): java.util.regex.Pattern =
    regexes.computeIfAbsent(regex, java.util.regex.Pattern.compile(_))

  /** Tokens present in the set — counting multiplicity (== the
    * `size(filter(toks, t => array_contains(set, t)))` composition).
    */
  def countIn(tokens: ArrayData, key: String): Int = {
    val s = set(key)
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && s.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** DISTINCT tokens present in the set (== `size(array_intersect(toks,
    * set))`).
    */
  def countDistinctIn(tokens: ArrayData, key: String): Int = {
    val s = set(key)
    val seen = new java.util.HashSet[UTF8String]()
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (s.contains(t) && seen.add(t)) c += 1
      }
      i += 1
    }
    c
  }

  /** Sum of per-token character counts (== the
    * `aggregate(toks, 0L, (acc, t) => acc + length(t))` composition for
    * null-free token arrays; null elements are skipped, like countIn).
    */
  def sumLengths(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) total += tokens.getUTF8String(i).numChars()
      i += 1
    }
    total
  }

  /** Tokens matching the regex, unanchored-find semantics (== the
    * `size(filter(toks, t => t.rlike(regex)))` composition).
    */
  def countMatching(tokens: ArrayData, regex: String): Int = {
    val p = pattern(regex)
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) &&
        p.matcher(tokens.getUTF8String(i).toString).find()) c += 1
      i += 1
    }
    c
  }
}

/** sig_agreement(a, b) -> int: number of index-aligned equal slots of two
  * long-array signatures (the MinHash similarity estimate's numerator).
  * Replaces `size(filter(zip_with(a, b, (x, y) => x === y), x => x))`,
  * whose two lambdas evaluate interpreted per slot per candidate pair —
  * the estimate-prune hot path of LSH dedup.
  */
object SigOps {
  def agreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

case class SignatureAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agreement needs two array<long>, got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigOps.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigOps.agreement($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

sealed trait TokenCountExpression extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${t.simpleString}")
  }
}

case class CountInSet(child: Expression, words: Seq[String],
    distinct: Boolean = false) extends TokenCountExpression {
  // empty words are rejected because the joined-key round trip drops
  // trailing empty segments (String.split), which would silently diverge
  // from the HOF-equivalent semantics
  require(words.nonEmpty &&
    words.forall(w => w != null && w.nonEmpty && !w.contains(TokenSets.Sep)),
    "word set must be non-empty, with non-empty separator-free words")
  private val key = words.mkString(TokenSets.Sep.toString)
  override def prettyName: String = if (distinct) "count_distinct_in_set" else "count_in_set"

  override protected def nullSafeEval(v: Any): Any =
    if (distinct) TokenSets.countDistinctIn(v.asInstanceOf[ArrayData], key)
    else TokenSets.countIn(v.asInstanceOf[ArrayData], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("tokenSetKey", key, "java.lang.String")
    val fn = if (distinct) "countDistinctIn" else "countIn"
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSets.$fn($c, $keyRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sum_token_lengths(tokens) -> long: total characters across the token
  * array in one codegen'd pass — replaces the interpreted
  * `aggregate(toks, 0L, (acc, t) => acc + length(t))` HOF (the mean-token-
  * length hot path).
  */
case class SumTokenLengths(child: Expression) extends TokenCountExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_token_lengths"

  override protected def nullSafeEval(v: Any): Any =
    TokenSets.sumLengths(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSets.sumLengths($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CountMatching(child: Expression, regex: String)
    extends TokenCountExpression {
  require(regex != null && regex.nonEmpty, "regex must be non-empty")
  override def prettyName: String = "count_matching"

  override protected def nullSafeEval(v: Any): Any =
    TokenSets.countMatching(v.asInstanceOf[ArrayData], regex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val regexRef = ctx.addReferenceObj("tokenRegex", regex, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSets.countMatching($c, $regexRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenRanges {
  /** Tokens outside every inclusive [starts(j), ends(j)] index range,
    * joined by a single space. Ranges may arrive unsorted/null (null ->
    * no removal); token positions are 0-based. One imperative pass:
    * mark covered indexes, then join survivors — no per-token lambda,
    * no token-row explode.
    */
  def removeRanges(tokens: ArrayData, starts: ArrayData, ends: ArrayData): UTF8String = {
    val m = tokens.numElements()
    if (starts == null || ends == null || starts.numElements() == 0) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) {
        all(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
        i += 1
      }
      return UTF8String.concatWs(UTF8String.fromString(" "), all: _*)
    }
    require(starts.numElements() == ends.numElements(),
      s"remove_token_ranges: ${starts.numElements()} starts vs ${ends.numElements()} ends")
    val covered = new Array[Boolean](m)
    var j = 0
    while (j < starts.numElements()) {
      // loud, not silent: a NULL range bound is caller corruption, and
      // getLong would read it as position 0 and delete the doc head
      require(!starts.isNullAt(j) && !ends.isNullAt(j),
        s"remove_token_ranges: null range bound at index $j")
      var p = math.max(0, starts.getLong(j).toInt)
      val e = math.min(m - 1, ends.getLong(j).toInt)
      while (p <= e) { covered(p) = true; p += 1 }
      j += 1
    }
    var kept = 0
    var i = 0
    while (i < m) { if (!covered(i)) kept += 1; i += 1 }
    val out = new Array[UTF8String](kept)
    var k = 0
    i = 0
    while (i < m) {
      if (!covered(i)) {
        out(k) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), out: _*)
  }
}

/** remove_token_ranges(tokens, starts, ends) -> string: the token array
  * with every inclusive 0-based index range [starts(j), ends(j)] removed,
  * survivors joined by ' '. The ACT step of duplicated-span dedup: span
  * frames are tiny per doc, so they collect into two long arrays and the
  * removal is one codegen'd map pass — the corpus never explodes to
  * token rows.
  */
case class RemoveTokenRanges(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_token_ranges"
  // null range arrays mean "remove nothing", so evaluate even when the
  // default null-intolerant TernaryExpression would short-circuit
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"remove_token_ranges needs (array<string>, array<long>, array<long>), got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = first.eval(input)
    if (toks == null) return null
    TokenRanges.removeRanges(toks.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[ArrayData],
      third.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = first.genCode(ctx)
    val s = second.genCode(ctx)
    val e = third.genCode(ctx)
    val code =
      code"""
         |${t.code}
         |${s.code}
         |${e.code}
         |boolean ${ev.isNull} = ${t.isNull};
         |UTF8String ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.TokenRanges.removeRanges(${t.value},
         |    ${s.isNull} ? null : ${s.value}, ${e.isNull} ? null : ${e.value});
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** BPE merge-table application (Sennrich et al. 2016 §3, the apply side):
  * a word starts as its code-point sequence; each merge (a, b), in rank
  * order, runs ONE greedy left-to-right scan over the segment array
  * replacing adjacent (a, b) with ab (the scan resumes after the merged
  * symbol, so a freshly-merged segment never re-merges under the same
  * rule — subword-nmt/HF semantics). Array-based on purpose: the earlier
  * space-separated-string `replace` fold could match a merge ACROSS
  * segment boundaries (e.g. segments [the, r, e] matching 'e r'), which
  * this cannot, by construction.
  */
object BpeKernel {
  /** merges flattened as [a0, b0, a1, b1, ...]. */
  def segments(w: UTF8String, merges: Array[String]): ArrayData = {
    val s = w.toString
    // initial segments: one per code point
    var cur = new Array[String](s.length)
    var len = 0
    var ci = 0
    while (ci < s.length) {
      val cc = Character.charCount(s.codePointAt(ci))
      cur(len) = s.substring(ci, ci + cc)
      ci += cc
      len += 1
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)
      val b = merges(m + 1)
      var i = 0
      var k = 0
      while (i < len) {
        if (i + 1 < len && cur(i) == a && cur(i + 1) == b) {
          cur(k) = a + b; i += 2
        } else {
          cur(k) = cur(i); i += 1
        }
        k += 1
      }
      len = k
      m += 2
    }
    val out = new Array[Any](len)
    var i = 0
    while (i < len) { out(i) = UTF8String.fromString(cur(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Segment + vocab-id lookup in ONE pass: the word's subword ids under
    * the merge table, unknown segments mapping to `unkId`. The vocab is a
    * prebuilt hash map shipped by reference — a realistic 32k-100k vocab
    * as plan literals would put ~2N nodes in the expression tree (slow
    * analysis, codegen size limits); here it costs one map probe per
    * segment.
    */
  def tokenIds(w: UTF8String, merges: Array[String],
      vocab: java.util.HashMap[String, Integer], unkId: Int): ArrayData = {
    val segs = segments(w, merges)
    val out = new Array[Int](segs.numElements())
    var i = 0
    while (i < out.length) {
      val id = vocab.get(segs.getUTF8String(i).toString)
      out(i) = if (id == null) unkId else id.intValue()
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** bpe_segments(word, merges) -> array<string>: the word's subword
  * segments under the merge table (see [[BpeKernel]]). The merge table is
  * a plan-time constant shipped to executors as a codegen reference
  * object — vocab-factored callers run this over distinct words only.
  */
case class BpeSegments(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bpe_segments needs a string word and non-empty merges, got ${child.dataType.simpleString}")
  }

  private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.segments(v.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.segments($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_token_ids(word) -> array<int>: the word's subword VOCAB IDS under
  * the merge table ([[BpeKernel.tokenIds]] — one kernel pass doing
  * segmentation + id lookup). Merge table and vocab map both ship to
  * executors as codegen reference objects (a 100k-entry vocab is ~MBs,
  * fine by reference, hopeless as plan literals); vocab-factored callers
  * run this over distinct words only.
  */
case class BpeTokenIds(child: Expression, merges: Seq[(String, String)],
    vocab: Seq[String], unkId: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_token_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.nonEmpty && vocab.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_ids needs a string word, non-empty merges and vocab, " +
        s"got ${child.dataType.simpleString}")
  }

  private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  private lazy val vocabMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.tokenIds(v.asInstanceOf[UTF8String], flat, vocabMap, unkId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocabMap,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.tokenIds($c, $mergesRef, $vocabRef, $unkId)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** WordPiece greedy longest-match-first tokenization (Wu et al. 2016,
  * the BERT tokenizer's subword step): at each position take the
  * LONGEST vocabulary piece that matches — start-of-word pieces at
  * position 0, `##`-continuation pieces after — and emit the whole
  * word as `unkId` if any position has no match at all. The third
  * subword family next to BPE (replay a merge history) and unigram-LM
  * (solve a Viterbi objective): no training state beyond the vocab
  * itself, segmentation is a deterministic scan.
  */
object WordPieceKernel {
  /** Greedy encode of one word. `startMap`/`contMap` key piece CORES
    * (continuation pieces stripped of `##`) to vocab ids; max lengths
    * bound the backward probe so each position costs O(maxLen) map
    * probes, not O(|vocab|).
    */
  def tokenIds(w: UTF8String,
      startMap: java.util.HashMap[String, Integer],
      contMap: java.util.HashMap[String, Integer],
      maxStart: Int, maxCont: Int, unkId: Int): ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) {
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Int](0))
    }
    // Candidate piece ends walk CODE-POINT boundaries (BERT/HF
    // semantics): probing per UTF-16 char would try substrings that
    // split surrogate pairs and degrade supplementary-character words
    // to [UNK] even when the vocab covers them per code point.
    val bounds = new Array[Int](n + 1) // boundary offsets, ascending
    var nb = 0
    var off = 0
    while (off < n) { bounds(nb) = off; nb += 1; off += Character.charCount(s.codePointAt(off)) }
    bounds(nb) = n; nb += 1
    val out = new java.util.ArrayList[Integer](8)
    var bi = 0 // index into bounds; current position is bounds(bi)
    while (bi < nb - 1) {
      val pos = bounds(bi)
      val map = if (pos == 0) startMap else contMap
      val cap = math.min(if (pos == 0) maxStart else maxCont, n - pos)
      var ei = bi + 1
      while (ei < nb - 1 && bounds(ei + 1) - pos <= cap) ei += 1
      var id: Integer = null
      while (ei > bi && id == null) {
        if (bounds(ei) - pos <= cap) id = map.get(s.substring(pos, bounds(ei)))
        if (id == null) ei -= 1
      }
      if (id == null) {
        // BERT semantics: any unmatchable position voids the whole word
        return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(Array(unkId))
      }
      out.add(id)
      bi = ei
    }
    val arr = new Array[Int](out.size)
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(arr)
  }
}

/** wordpiece_ids(word) -> array<int>: greedy longest-match WordPiece
  * ids under a fixed vocabulary ([[WordPieceKernel]]). Vocab ships to
  * executors as two codegen reference maps (start pieces /
  * `##`-continuations, keyed by core) — by-reference like
  * [[BpeTokenIds]], never as plan literals.
  */
case class WordPieceIds(child: Expression, vocab: Seq[String],
    unkId: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wordpiece_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocab.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_ids needs a string word and a non-empty vocab, " +
        s"got ${child.dataType.simpleString}")
  }

  private lazy val startMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocab.zipWithIndex.foreach { case (p, i) =>
      if (!p.startsWith("##")) m.put(p, i)
    }
    m
  }

  private lazy val contMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocab.zipWithIndex.foreach { case (p, i) =>
      if (p.startsWith("##")) m.put(p.substring(2), i)
    }
    m
  }

  private lazy val maxStart: Int =
    vocab.filterNot(_.startsWith("##")).map(_.length).foldLeft(1)(math.max)
  private lazy val maxCont: Int =
    vocab.filter(_.startsWith("##")).map(_.length - 2).foldLeft(1)(math.max)

  override protected def nullSafeEval(v: Any): Any =
    WordPieceKernel.tokenIds(v.asInstanceOf[UTF8String], startMap, contMap,
      maxStart, maxCont, unkId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("wpStart", startMap,
      "java.util.HashMap<String, Integer>")
    val cRef = ctx.addReferenceObj("wpCont", contMap,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceKernel.tokenIds($c, $sRef, $cRef, " +
        s"$maxStart, $maxCont, $unkId)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nfc_normalize(s) -> string: Unicode NFC normalization (canonical
  * decomposition + composition, java.text.Normalizer — the JDK's
  * implementation of UAX #15). The first step of every corpus
  * text-cleaning pass: web text arrives with combining sequences and
  * precomposed forms mixed, which breaks exact dedup, shingling, and
  * vocabulary counting until normalized.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
