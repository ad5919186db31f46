package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wordVocab counts corpus frequency per distinct token") {
    val d = Seq((1L, "ab ab cd"), (2L, "ab CD")).toDF("doc_id", "text")
    val v = Tokenize.wordVocab(d, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("ab" -> 3L, "cd" -> 2L)) // lowercased merge
  }

  test("topBpePairs weights pairs by word frequency with multiplicity") {
    // 'aaa' x2 -> pair 'aa' twice per occurrence = 4; 'ab' x3 -> 'ab' = 3
    val d = Seq((1L, "aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("aa" -> 4L, "ab" -> 3L))
  }

  test("single-char tokens contribute no pair; ties break by pair asc") {
    val d = Seq((1L, "x y zw wz")).toDF("doc_id", "text")
    val pairs = Tokenize.topBpePairs(d, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(pairs == List("wz" -> 1L, "zw" -> 1L))
  }

  test("the top pair is the first BPE merge on a realistic skew") {
    // 'the' dominates -> 'th' (and 'he') lead the count
    val d = Seq((1L, "the the the then he")).toDF("doc_id", "text")
    val top = Tokenize.topBpePairs(d, "text", k = 1).head
    assert(top.getString(0) == "he" && top.getLong(1) == 5L)
  }

  test("bpeEncodedLength applies merges in rank order, hand-computed") {
    // merges (t,h) then (th,e): 'the' -> t h e -> th e -> the (1 token);
    // 'then' -> th e n -> the n (2); 'in' -> i n -> in (1) via (i,n)
    val d = Seq((1L, "the then in"), (2L, "the the")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"))
    val out = Tokenize.bpeEncodedLength(d, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 4L)), s"the=1 then=2 in=1 -> 4 tokens: $out")
    assert(out(2L) == ((2L, 2L)))
    // ORDER matters: without the (t,h) merge first, (th,e) never fires
    val reversed = Tokenize.bpeEncodedLength(d, "doc_id", "text",
      Seq(("th", "e"), ("t", "h"), ("i", "n")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reversed(1L) == 6L, // the -> th e (2), then -> th e n (3), in (1)
      s"rank order must change the encoding: $reversed")
  }
}
