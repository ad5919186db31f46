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

  /** Built automaton: flat next-state table (nodes x 256), fail links,
    * and per-node merged output keyword ids. Immutable after build;
    * shared read-only across a JVM's task threads.
    */
  final class Automaton(val keywords: Array[String]) extends Serializable {
    require(keywords.nonEmpty, "empty keyword list")
    keywords.foreach(k => require(k != null && k.nonEmpty, "empty keyword"))
    val kwBytes: Array[Array[Byte]] =
      keywords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // trie build (growable), then frozen into flat arrays; single
    // transient lazy (rebuilt per JVM after deserialization)
    @transient private lazy val built: (Array[Int], Array[Int], Array[Array[Int]]) =
      build()
    def next: Array[Int] = built._1
    def fail: Array[Int] = built._2
    def out: Array[Array[Int]] = built._3

    private def build(): (Array[Int], Array[Int], Array[Array[Int]]) = {
      val nexts = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
      val outs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      var i = 0
      while (i < kwBytes.length) {
        var s = 0
        val kb = kwBytes(i)
        var j = 0
        while (j < kb.length) {
          val c = kb(j) & 0xff
          if (nexts(s)(c) < 0) {
            nexts += Array.fill(256)(-1)
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
      while (c < 256) {
        val t = nexts(0)(c)
        if (t < 0) nexts(0)(c) = 0
        else { failA(t) = 0; queue.add(t) }
        c += 1
      }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        outs(s) ++= outs(failA(s)) // merge outputs down the fail chain
        c = 0
        while (c < 256) {
          val t = nexts(s)(c)
          if (t < 0) nexts(s)(c) = nexts(failA(s))(c)
          else { failA(t) = nexts(failA(s))(c); queue.add(t) }
          c += 1
        }
      }
      val flat = new Array[Int](n * 256)
      i = 0
      while (i < n) {
        System.arraycopy(nexts(i), 0, flat, i * 256, 256)
        i += 1
      }
      (flat, failA, outs.map(_.toArray).toArray)
    }

    /** Per-keyword non-overlapping match counts over `text`'s bytes. */
    def matchCounts(text: UTF8String): Array[Int] = {
      val nx = next // force lazy build
      val o = out
      val bytes = text.getBytes
      val counts = new Array[Int](kwBytes.length)
      val lastEnd = new Array[Int](kwBytes.length)
      java.util.Arrays.fill(lastEnd, -1)
      var s = 0
      var pos = 0
      while (pos < bytes.length) {
        s = nx(s * 256 + (bytes(pos) & 0xff))
        val os = o(s)
        var k = 0
        while (k < os.length) {
          val kw = os(k)
          val start = pos - kwBytes(kw).length + 1
          if (start > lastEnd(kw)) { counts(kw) += 1; lastEnd(kw) = pos }
          k += 1
        }
        pos += 1
      }
      counts
    }

    def matchCountsData(text: UTF8String): GenericArrayData =
      new GenericArrayData(matchCounts(text).map(Int.box))
  }
}

/** keyword_matches(text) -> array<int>: per-keyword non-overlapping
  * occurrence counts under the carried keyword list ([[AhoCorasick]]),
  * index-aligned with the list. Compose with `aggregate`/`exists` for
  * "any hit" gates or weighted severity scores.
  */
case class KeywordMatches(child: Expression, keywords: Seq[String])
  extends UnaryExpression {
  @transient private lazy val automaton =
    new AhoCorasick.Automaton(keywords.toArray)

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
