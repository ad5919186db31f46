package graft.functions

import graft.SparkTestSession
import graft.functions.keyword_matches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

class KeywordExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(text: String, kws: Seq[String]): Seq[Int] =
    new AhoCorasick.Automaton(kws.toArray)
      .matchCounts(UTF8String.fromString(text)).toSeq

  test("classic he/she/his/hers: fail links and merged outputs") {
    // "ushers" contains she, he, hers — the canonical AC example
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ==
      Seq(1, 1, 0, 1))
  }

  test("per-keyword counts are left-to-right non-overlapping (replace semantics)") {
    // "aaaa" vs "aa": replace('aaaa','aa','')='' -> 2 non-overlapping
    assert(counts("aaaa", Seq("aa")) == Seq(2))
    // "aaa": 1 (greedy takes [0,1], [1,2] overlaps, [2] too short)
    assert(counts("aaa", Seq("aa")) == Seq(1))
    // independent keywords both see their own occurrences
    assert(counts("abab", Seq("ab", "ba", "abab")) == Seq(2, 1, 1))
  }

  test("keyword that is a prefix/suffix of another counts independently") {
    assert(counts("infinity in in", Seq("in", "infinity")) ==
      Seq(4, 1)) // 'in'x2 inside infinity + 2 standalone
  }

  test("multibyte keywords match on byte boundaries only") {
    assert(counts("中文 text 中文", Seq("中文", "文")) == Seq(2, 2))
    assert(counts("", Seq("x")) == Seq(0))
  }

  test("expression + SQL registration agree with the kernel") {
    graft.functions.registerAll(spark)
    val kws = Seq("buy now", "free", "now")
    val rows = Seq("buy now! free free stuff now", "clean prose")
      .toDF("t")
      .select(keyword_matches(col("t"), kws).as("m"))
      .as[Seq[Int]].collect()
    assert(rows(0) == Seq(1, 2, 2))
    assert(rows(1) == Seq(0, 0, 0))
    Seq("buy now! free free stuff now").toDF("t")
      .createOrReplaceTempView("kw_t")
    val viaSql = spark.sql(
      "SELECT keyword_matches(t, array('buy now', 'free', 'now')) FROM kw_t")
      .as[Seq[Int]].head()
    assert(viaSql == Seq(1, 2, 2))
  }

  test("matches replace-arithmetic on random text (the oracle's device)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcab "
    val kws = Seq("ab", "ca", "bca", "ab c")
    (0 until 50).foreach { _ =>
      val text = (0 until 200).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = counts(text, kws)
      val want = kws.map { k =>
        // non-overlapping greedy count == length drop / keyword length
        (text.length - text.replace(k, "").length) / k.length
      }
      assert(got == want, s"mismatch on '$text'")
    }
  }

  test("keyword_hit_total equals the vector sum, through plan and SQL") {
    graft.functions.registerAll(spark)
    val kws = Seq("he", "she", "hers", "aa")
    val texts = Seq("ushers aaaa", "nothing here... wait, 'he' twice", "")
    val rows = texts.toDF("t").select(
      graft.functions.keyword_hit_total(col("t"), kws).as("tot"),
      keyword_matches(col("t"), kws).as("m")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getSeq[Int](1).map(_.toLong).sum)
    }
    texts.take(1).toDF("t").createOrReplaceTempView("kwt_t")
    assert(spark.sql(
      "SELECT keyword_hit_total(t, array('he','she','hers','aa')) FROM kwt_t")
      .as[Long].head() == rows(0).getLong(0))
  }

  test("a 10k-keyword list builds once and scans in one pass") {
    val kws = (0 until 10000).map(i => s"phrase$i word")
    val auto = new AhoCorasick.Automaton(kws.toArray)
    val text = "leading phrase9999 word and phrase0 word trailing"
    val c = auto.matchCounts(UTF8String.fromString(text))
    assert(c(9999) == 1 && c(0) == 1 && c.sum == 2)
  }

  test("automaton cache is bounded: many distinct lists do not accumulate") {
    val cache = new KernelCache[Int, String](4)
    (0 until 100).foreach(i => cache.getOrCompute(i, k => s"v$k"))
    assert(cache.sizeNow <= 4)
    // LRU: the latest keys survive, evicted ones rebuild transparently
    assert(cache.getOrCompute(99, _ => "rebuilt") == "v99")
    assert(cache.getOrCompute(0, _ => "rebuilt") == "rebuilt")
  }
}
