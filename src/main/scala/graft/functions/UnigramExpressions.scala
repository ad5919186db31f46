package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation — the OTHER
  * major subword family next to BPE (Kudo 2018, "Subword
  * Regularization"): given a piece vocabulary with log-probabilities,
  * a word segments into the piece sequence maximizing the sum of piece
  * scores. BPE replays a merge history; unigram SOLVES for the best
  * segmentation, so the same vocab can score alternative splits — the
  * property subword-regularized training samples from.
  *
  * Kernel: one left-to-right Viterbi DP over the word's code points —
  * dp[i] = max over pieces p ending at i of dp[i - |p|] + score(p) —
  * with piece lookup in a shared hash map (codegen reference object,
  * never plan literals) and the longest piece length bounding the inner
  * loop. Characters absent from the vocabulary fall back to a single
  * UNK piece with a score penalty below every real piece, so
  * segmentation is total and the DP never dead-ends.
  *
  * Deterministic tie-break: on equal total score the FEWER-pieces path
  * wins, then the one taking the longer piece at the current boundary —
  * fixed, engine-independent results.
  */
object UnigramKernel {

  /** Piece table prepared once per plan: map piece -> (id, score),
    * plus the max piece length in code points.
    */
  final class Table(pieces: Array[String], scores: Array[Double]) extends Serializable {
    // Integer values so a missing piece is an unambiguous null (a
    // HashMap[String, Int] would silently unbox null to 0 == piece id 0)
    val map = new java.util.HashMap[String, java.lang.Integer]()
    pieces.indices.foreach(i => map.put(pieces(i), i))
    val score: Array[Double] = scores
    val maxLen: Int =
      if (pieces.isEmpty) 1
      else pieces.map(p => p.codePointCount(0, p.length)).max
  }

  val UnkScore: Double = -1e4 // below any real log-prob; additive per UNK char

  /** Best-path segment ids for one word; UNK chars emit `unkId`. */
  def tokenIds(w: UTF8String, t: Table, unkId: Int): Array[Int] = {
    val s = w.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return Array.emptyIntArray
    // code-point offsets so supplementary chars segment correctly
    val off = new Array[Int](n + 1)
    var i = 0; var ci = 0
    while (ci < n) { off(ci) = i; i = s.offsetByCodePoints(i, 1); ci += 1 }
    off(n) = s.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val pieces = Array.fill(n + 1)(Int.MaxValue) // piece count tie-break
    val back = new Array[Int](n + 1) // start index of the piece ending here
    val pid = new Array[Int](n + 1) // piece id (or unkId)
    dp(0) = 0.0; pieces(0) = 0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - t.maxLen)
      while (start < end) {
        if (dp(start) != Double.NegativeInfinity) {
          val piece = s.substring(off(start), off(end))
          val idx = t.map.get(piece)
          val (sc, id) =
            if (idx != null) (t.score(idx), idx.intValue())
            else if (end - start == 1) (UnkScore, -1) // single-char UNK fallback
            else (Double.NaN, 0)
          if (!java.lang.Double.isNaN(sc)) {
            val cand = dp(start) + sc
            val candPieces = pieces(start) + 1
            // longer piece at this boundary == smaller `start`; since we
            // scan start ascending, strict > keeps the longest winner
            if (cand > dp(end) ||
              (cand == dp(end) && candPieces < pieces(end))) {
              dp(end) = cand; pieces(end) = candPieces
              back(end) = start; pid(end) = id
            }
          }
        }
        start += 1
      }
      end += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { out += (if (pid(p) < 0) unkId else pid(p)); p = back(p) }
    out.reverse.toArray
  }

  def tokenIdsArray(w: UTF8String, t: Table, unkId: Int): GenericArrayData =
    new GenericArrayData(tokenIds(w, t, unkId))
}

/** Forward–backward E-step kernel for the unigram-LM TRAINER (Kudo 2018
  * §3.2): under the current piece scores, a word's marginal likelihood is
  * the sum over ALL segmentations (the forward pass computes it in one
  * left-to-right sweep), and each piece's EXPECTED count is the posterior
  * mass of the lattice edges labeled with it —
  * `exp(alpha[start] + score + beta[end] - logZ)` summed over the
  * piece's occurrences. Same lattice as the Viterbi kernel above (UNK
  * single-char fallback keeps it total; UNK edges are excluded from the
  * counts — the penalty is a fixed emission, not a trained parameter).
  * All log-domain via logsumexp, fixed loop order, so per-word output is
  * bit-deterministic.
  */
object UnigramEMKernel {

  private def logAddExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  /** (logZ, piece ids asc, expected counts) for one word. */
  def expectedCounts(w: UTF8String, t: UnigramKernel.Table)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = w.toString
    val n = s.codePointCount(0, s.length)
    val off = new Array[Int](n + 1)
    var i = 0; var ci = 0
    while (ci < n) { off(ci) = i; i = s.offsetByCodePoints(i, 1); ci += 1 }
    off(n) = s.length

    // edge lookup, shared by all three sweeps: score (NaN = no edge) + id
    def edge(start: Int, end: Int): (Double, Int) = {
      val idx = t.map.get(s.substring(off(start), off(end)))
      if (idx != null) (t.score(idx), idx.intValue())
      else if (end - start == 1) (UnigramKernel.UnkScore, -1)
      else (Double.NaN, -1)
    }

    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - t.maxLen)
      while (start < end) {
        val (sc, _) = edge(start, end)
        if (!java.lang.Double.isNaN(sc) &&
            alpha(start) != Double.NegativeInfinity)
          alpha(end) = logAddExp(alpha(end), alpha(start) + sc)
        start += 1
      }
      end += 1
    }
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    beta(n) = 0.0
    var start2 = n - 1
    while (start2 >= 0) {
      var e2 = math.min(n, start2 + t.maxLen)
      while (e2 > start2) {
        val (sc, _) = edge(start2, e2)
        if (!java.lang.Double.isNaN(sc) &&
            beta(e2) != Double.NegativeInfinity)
          beta(start2) = logAddExp(beta(start2), sc + beta(e2))
        e2 -= 1
      }
      start2 -= 1
    }
    val logZ = alpha(n)

    // posterior edge mass, accumulated per piece id (ascending-id output
    // and fixed sweep order keep the kernel deterministic)
    val acc = new java.util.TreeMap[Integer, java.lang.Double]()
    if (logZ != Double.NegativeInfinity) {
      var e3 = 1
      while (e3 <= n) {
        var st = math.max(0, e3 - t.maxLen)
        while (st < e3) {
          val (sc, id) = edge(st, e3)
          if (id >= 0 && !java.lang.Double.isNaN(sc) &&
              alpha(st) != Double.NegativeInfinity &&
              beta(e3) != Double.NegativeInfinity) {
            val c = math.exp(alpha(st) + sc + beta(e3) - logZ)
            val prev = acc.get(Integer.valueOf(id))
            acc.put(Integer.valueOf(id),
              if (prev == null) c else prev.doubleValue() + c)
          }
          st += 1
        }
        e3 += 1
      }
    }
    val ids = new Array[Int](acc.size()); val cs = new Array[Double](acc.size())
    var k = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next(); ids(k) = kv.getKey.intValue(); cs(k) = kv.getValue
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](logZ, new GenericArrayData(ids), new GenericArrayData(cs)))
  }
}

/** unigram_expected_counts(word) -> struct<logz, ids array<int>,
  * cs array<double>>: one word's log-marginal and per-piece expected
  * counts under the plan-time vocabulary — the distributed E-step of the
  * unigram trainer. Vocab rides a codegen reference object; the trainer
  * runs this over DISTINCT words and weights by corpus frequency.
  */
case class UnigramExpectedCounts(child: Expression,
    vocab: Seq[(String, Double)]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("logz", DoubleType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false)),
    StructField("cs", ArrayType(DoubleType, containsNull = false))))
  override def prettyName: String = "unigram_expected_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocab.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"unigram_expected_counts needs a string word and non-empty vocab, " +
        s"got ${child.dataType.simpleString}")
  }

  @transient private lazy val table =
    new UnigramKernel.Table(vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override protected def nullSafeEval(v: Any): Any =
    UnigramEMKernel.expectedCounts(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEmTable", table,
      classOf[UnigramKernel.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEMKernel.expectedCounts($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Subword-REGULARIZATION sampling kernel (Kudo 2018 §4): draw a
  * segmentation from the posterior `P(seg | word)^alpha` instead of
  * taking the Viterbi argmax — the data-augmentation device unigram-LM
  * vocabularies exist for. Forward-filter backward-sample over the same
  * lattice as the other two kernels: one alpha-scaled forward pass
  * (logsumexp), then edges drawn right-to-left with probability
  * `exp(fwd[start] + alpha*score - fwd[end])`. `alpha = 0` is uniform
  * over segmentations; larger alpha sharpens toward Viterbi. The RNG is
  * a splitmix64 stream seeded from (seed, word), so equal inputs yield
  * equal samples — per-OCCURRENCE seeds give independent draws.
  */
object UnigramSampleKernel {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def logAddExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  def sampleIds(w: UTF8String, t: UnigramKernel.Table, alpha: Double,
      seed: Long, unkId: Int): GenericArrayData = {
    val s = w.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val off = new Array[Int](n + 1)
    var i = 0; var ci = 0
    while (ci < n) { off(ci) = i; i = s.offsetByCodePoints(i, 1); ci += 1 }
    off(n) = s.length

    def edge(start: Int, end: Int): (Double, Int) = {
      val idx = t.map.get(s.substring(off(start), off(end)))
      if (idx != null) (t.score(idx), idx.intValue())
      else if (end - start == 1) (UnigramKernel.UnkScore, -1)
      else (Double.NaN, -1)
    }

    val fwd = Array.fill(n + 1)(Double.NegativeInfinity)
    fwd(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - t.maxLen)
      while (start < end) {
        val (sc, _) = edge(start, end)
        if (!java.lang.Double.isNaN(sc) &&
            fwd(start) != Double.NegativeInfinity)
          fwd(end) = logAddExp(fwd(end), fwd(start) + alpha * sc)
        start += 1
      }
      end += 1
    }
    // word-keyed deterministic RNG stream (String.hashCode is spec-fixed)
    var state = splitmix64(seed ^ (s.hashCode.toLong * 0x9e3779b97f4a7c15L))
    def nextUniform(): Double = {
      state = splitmix64(state)
      (state >>> 11) * 1.1102230246251565e-16 // 2^-53
    }
    val outRev = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) {
      val u = nextUniform()
      var cum = 0.0
      var chosenStart = -1
      var chosenId = 0
      var start = math.max(0, p - t.maxLen)
      var done = false
      // ascending-start scan: pick the first edge whose cumulative
      // posterior crosses u; float residue falls to the last valid edge
      while (start < p && !done) {
        val (sc, id) = edge(start, p)
        if (!java.lang.Double.isNaN(sc) &&
            fwd(start) != Double.NegativeInfinity) {
          cum += math.exp(fwd(start) + alpha * sc - fwd(p))
          chosenStart = start; chosenId = id
          if (u < cum) done = true
        }
        start += 1
      }
      outRev += (if (chosenId < 0) unkId else chosenId)
      p = chosenStart
    }
    new GenericArrayData(outRev.reverse.toArray)
  }
}

/** unigram_sample_ids(word, seed) -> array<int>: one posterior-sampled
  * segmentation under the plan-time vocabulary (subword regularization).
  * The seed child is a COLUMN so callers derive independent draws per
  * occurrence (e.g. `xxhash64(doc_id, pos, lit(run))`).
  */
case class UnigramSampleIds(left: Expression, right: Expression,
    vocab: Seq[(String, Double)], alpha: Double, unkId: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_sample_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) if vocab.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "unigram_sample_ids needs (string word, long seed) and a " +
          s"non-empty vocab, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }

  @transient private lazy val table =
    new UnigramKernel.Table(vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override protected def nullSafeEval(w: Any, seed: Any): Any =
    UnigramSampleKernel.sampleIds(w.asInstanceOf[UTF8String], table, alpha,
      seed.asInstanceOf[Long], unkId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSampleTable", table,
      classOf[UnigramKernel.Table].getName)
    defineCodeGen(ctx, ev, (wc, sc) =>
      s"graft.functions.UnigramSampleKernel.sampleIds($wc, $ref, $alpha, $sc, $unkId)")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** unigram_token_ids(word) -> array<int>: Viterbi-best piece ids under
  * the (plan-time constant) unigram vocabulary. Vocab rides a codegen
  * reference object; vocab-factored callers run this over DISTINCT
  * words only, like the BPE path.
  */
case class UnigramTokenIds(child: Expression, vocab: Seq[(String, Double)],
    unkId: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_token_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if vocab.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"unigram_token_ids needs a string word and non-empty vocab, got " +
        child.dataType.simpleString)
  }

  @transient private lazy val table =
    new UnigramKernel.Table(vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override protected def nullSafeEval(v: Any): Any =
    UnigramKernel.tokenIdsArray(v.asInstanceOf[UTF8String], table, unkId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramKernel.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernel.tokenIdsArray($c, $ref, $unkId)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
