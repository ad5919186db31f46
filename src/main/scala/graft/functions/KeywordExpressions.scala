package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-keyword substring matching — the blocklist/badwords filter of
  * the published web-corpus pipelines (C4 filtered on a public badwords
  * list; every production pipeline carries some phrase blocklist), run
  * as ONE scan pass no matter how many keywords.
  *
  * The matcher is a byte-level Aho-Corasick automaton (Aho & Corasick,
  * CACM 1975): goto/fail links over UTF-8 bytes, all keywords matched
  * simultaneously in O(text + matches). The automaton is built once per
  * executor from the keyword array the expression carries BY REFERENCE
  * (task-closure shipped, never plan literals — the BPE-vocab device),
  * so a 10k-phrase blocklist costs one trie, not 10k regex passes.
  *
  * Count semantics: per keyword, LEFT-TO-RIGHT NON-OVERLAPPING
  * occurrences (what `replace(text, kw, '')` arithmetic counts — the
  * property an external SQL oracle can recompute); different keywords
  * count independently, so overlaps ACROSS keywords are all seen.
  */
object AhoCorasick {

  // ONE automaton per distinct keyword list per JVM: the expression
  // deserializes per task, and rebuilding (or even re-allocating) a
  // blocklist-sized DFA per task is the scan's dominant cost — the
  // vocab-cache device the tokenizer kernels use. BOUNDED (LRU): a
  // long-running executor cycling through many distinct blocklists must
  // not pin one DFA per list forever; evicted automatons rebuild on
  // demand.
  private val cache = new KernelCache[Seq[String], Automaton](8)

  def cached(keywords: Seq[String]): Automaton =
    cache.getOrCompute(keywords, ks => new Automaton(ks.toArray))

  // Built DFA tables per distinct keyword list per JVM. Keyed by the
  // keyword CONTENT, not the Automaton instance: every task
  // deserializes its own Automaton copy with the plan, and all copies
  // must share one table set. Bounded like `cache`.
  private val builtCache = new KernelCache[
    Seq[String], (Array[Int], Array[Int], Array[Array[Int]])](8)

  private[functions] def builtFor(
      a: Automaton): (Array[Int], Array[Int], Array[Array[Int]]) =
    builtCache.getOrCompute(a.keywords.toSeq, _ => a.buildTables())

  /** Built automaton: flat next-state table over a COMPACT alphabet
    * (only bytes that occur in some keyword get a column — any other
    * byte provably transitions every state to the root, so it needs no
    * table at all; a 10k-phrase ASCII blocklist has ~40 live bytes, so
    * the DFA is nodes x 40 ints, not nodes x 256), fail links, and
    * per-node merged output keyword ids. Immutable after build; shared
    * read-only across a JVM's task threads.
    */
  final class Automaton(val keywords: Array[String]) extends Serializable {
    require(keywords.nonEmpty, "empty keyword list")
    keywords.foreach(k => require(k != null && k.nonEmpty, "empty keyword"))
    val kwBytes: Array[Array[Byte]] =
      keywords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // byte -> compact alphabet id (-1 = never in any keyword)
    val alphaOf: Array[Int] = {
      val m = Array.fill(256)(-1)
      var a = 0
      kwBytes.foreach(_.foreach { b =>
        val c = b & 0xff
        if (m(c) < 0) { m(c) = a; a += 1 }
      })
      m
    }
    val alphaSize: Int = alphaOf.count(_ >= 0)

    // per-copy handle onto the JVM-shared tables (see builtFor)
    @transient private lazy val built: (Array[Int], Array[Int], Array[Array[Int]]) =
      AhoCorasick.builtFor(this)
    def next: Array[Int] = built._1
    def fail: Array[Int] = built._2
    def out: Array[Array[Int]] = built._3

    private[functions] def buildTables(): (Array[Int], Array[Int], Array[Array[Int]]) = {
      val A = alphaSize
      val nexts = scala.collection.mutable.ArrayBuffer(Array.fill(A)(-1))
      val outs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      var i = 0
      while (i < kwBytes.length) {
        var s = 0
        val kb = kwBytes(i)
        var j = 0
        while (j < kb.length) {
          val c = alphaOf(kb(j) & 0xff)
          if (nexts(s)(c) < 0) {
            nexts += Array.fill(A)(-1)
            outs += scala.collection.mutable.ArrayBuffer.empty[Int]
            nexts(s)(c) = nexts.length - 1
          }
          s = nexts(s)(c)
          j += 1
        }
        outs(s) += i
        i += 1
      }
      val n = nexts.length
      val failA = new Array[Int](n)
      // BFS: fail links + goto completion (next becomes a total DFA
      // transition function — no fail-chasing in the match loop)
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < A) {
        val t = nexts(0)(c)
        if (t < 0) nexts(0)(c) = 0
        else { failA(t) = 0; queue.add(t) }
        c += 1
      }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        outs(s) ++= outs(failA(s)) // merge outputs down the fail chain
        c = 0
        while (c < A) {
          val t = nexts(s)(c)
          if (t < 0) nexts(s)(c) = nexts(failA(s))(c)
          else { failA(t) = nexts(failA(s))(c); queue.add(t) }
          c += 1
        }
      }
      val flat = new Array[Int](n * A)
      i = 0
      while (i < n) {
        System.arraycopy(nexts(i), 0, flat, i * A, A)
        i += 1
      }
      (flat, failA, outs.map(_.toArray).toArray)
    }

    /** Per-keyword non-overlapping match counts over `text`'s bytes. */
    def matchCounts(text: UTF8String): Array[Int] = {
      val nx = next // force lazy build
      val o = out
      val A = alphaSize
      val bytes = text.getBytes
      val counts = new Array[Int](kwBytes.length)
      val lastEnd = new Array[Int](kwBytes.length)
      java.util.Arrays.fill(lastEnd, -1)
      var s = 0
      var pos = 0
      while (pos < bytes.length) {
        val a = alphaOf(bytes(pos) & 0xff)
        if (a < 0) s = 0 // byte absent from every keyword: hard reset
        else {
          s = nx(s * A + a)
          val os = o(s)
          var k = 0
          while (k < os.length) {
            val kw = os(k)
            val start = pos - kwBytes(kw).length + 1
            if (start > lastEnd(kw)) { counts(kw) += 1; lastEnd(kw) = pos }
            k += 1
          }
        }
        pos += 1
      }
      counts
    }

    def matchCountsData(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(matchCounts(text))

    /** Total non-overlapping hits across ALL keywords — no per-keyword
      * vector materialized (the shape for pure gate/score use on large
      * blocklists, where a 10k-wide array per row would dominate the
      * scan).
      */
    def matchTotal(text: UTF8String): Long = {
      val nx = next
      val o = out
      val A = alphaSize
      val bytes = text.getBytes
      val lastEnd = new Array[Int](kwBytes.length)
      java.util.Arrays.fill(lastEnd, -1)
      var total = 0L
      var s = 0
      var pos = 0
      while (pos < bytes.length) {
        val a = alphaOf(bytes(pos) & 0xff)
        if (a < 0) s = 0
        else {
          s = nx(s * A + a)
          val os = o(s)
          var k = 0
          while (k < os.length) {
            val kw = os(k)
            if (pos - kwBytes(kw).length + 1 > lastEnd(kw)) {
              total += 1; lastEnd(kw) = pos
            }
            k += 1
          }
        }
        pos += 1
      }
      total
    }
  }
}

/** keyword_matches(text) -> array<int>: per-keyword non-overlapping
  * occurrence counts under the carried keyword list ([[AhoCorasick]]),
  * index-aligned with the list. Compose with `aggregate`/`exists` for
  * "any hit" gates or weighted severity scores.
  */
case class KeywordMatches(child: Expression, keywords: Seq[String])
  extends UnaryExpression {
  @transient private lazy val automaton = AhoCorasick.cached(keywords)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "keyword_matches"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if keywords.nonEmpty && keywords.forall(k =>
      k != null && k.nonEmpty) => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "keyword_matches needs a non-empty list of non-empty keywords")
    case t => TypeCheckResult.TypeCheckFailure(
      s"keyword_matches needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    automaton.matchCountsData(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchCountsData($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** keyword_hit_total(text) -> long: total non-overlapping hits across
  * the carried keyword list in one automaton pass, with NO per-keyword
  * vector — the gate/score shape for blocklists of any size.
  */
case class KeywordHitTotal(child: Expression, keywords: Seq[String])
  extends UnaryExpression {
  @transient private lazy val automaton = AhoCorasick.cached(keywords)

  override def dataType: DataType = LongType
  override def prettyName: String = "keyword_hit_total"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if keywords.nonEmpty && keywords.forall(k =>
      k != null && k.nonEmpty) => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "keyword_hit_total needs a non-empty list of non-empty keywords")
    case t => TypeCheckResult.TypeCheckFailure(
      s"keyword_hit_total needs a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    automaton.matchTotal(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchTotal($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
