package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden"

  private def docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("warm", "cold")), // near dup of 1
    (4L, "completely different content about distributed query engines and shuffle partitioning strategies in spark"),
    (5L, "yet another unrelated document mentioning parquet files compaction and columnar storage formats")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps the smallest id per key") {
    val out = Dedup.exactKeepFirst(docs, Seq("text"), "doc_id")
    assert(out.count() == 4)
    assert(out.filter(col("doc_id") === 2).count() == 0)
    assert(out.filter(col("doc_id") === 1).count() == 1)
  }

  test("exactGroups reports survivor and copy counts") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(g(1L) == 2L) // keep_id 1 has 2 copies
    assert(g(3L) == 1L)
  }

  test("minhashPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"near dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive with 4: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), s"false positive with 5: $pairs")
  }

  test("minhashPairs jaccard is exact on the verified pair") {
    val j = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head.getDouble(2)
    assert(j == 1.0, s"identical docs must have jaccard 1.0, got $j")
  }

  test("minhashDedup keeps one representative per dup cluster") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L))
    assert(kept.contains(4L) && kept.contains(5L))
  }

  test("minhashPairsAgainst / dedupAgainst: new batch vs reference corpus") {
    // reference corpus = docs 1-5; new batch: 11 repeats doc 1's text,
    // 12 is the near-dup variant, 13 is fresh content
    val newBatch = Seq(
      (11L, base),
      (12L, base.replace("warm", "cold")),
      (13L, "fresh unseen material on watermark semantics in streaming joins")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsAgainst(newBatch, "doc_id", "text",
      docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = pairs.groupBy(_._1)
    assert(byNew(11L).exists(p => p._2 == 1L && p._3 == 1.0)) // exact ref hit
    assert(byNew(12L).exists(_._2 == 3L))                     // near-dup ref hit
    assert(!byNew.contains(13L), s"false positive for fresh doc: $pairs")
    // asymmetric: ref-x-ref pairs (1,2) must NOT appear
    assert(pairs.forall(p => p._1 >= 11L && p._2 <= 5L))

    val kept = Dedup.dedupAgainst(newBatch, "doc_id", "text",
      docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(13L), s"only the fresh doc survives, got $kept")
  }

  test("duplicatedGramReport counts grams shared with other docs") {
    // base has 20 tokens -> 13 word 8-grams; docs 1/2 identical, doc 3
    // changes token 16 ("warm"->"cold") which sits in the last 5 grams
    val rep = Dedup.duplicatedGramReport(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep(1L) == ((13L, 13L)), s"doc1: ${rep(1L)}")
    assert(rep(2L) == ((13L, 13L)), s"doc2: ${rep(2L)}")
    assert(rep(3L) == ((13L, 8L)), s"doc3: ${rep(3L)}")
    assert(rep(4L)._2 == 0L && rep(5L)._2 == 0L, s"unrelated docs dup'd: $rep")
  }

  test("simhashPairs: exact dup at distance 0; unrelated docs far") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("semanticPairs pairs only within a cluster; exact dup found") {
    val dim = 8
    def vec(block: Int, jitter: Float): Seq[Float] =
      (0 until dim).map(i => if (i % 4 == block) 1.0f else jitter)
    val emb = Seq(
      (1L, vec(0, 0.0f)), (2L, vec(0, 0.01f)), // near-identical, cluster 0
      (3L, vec(1, 0.0f)), // other cluster, orthogonal-ish to 1/2
      (4L, vec(0, 0.02f)) // cluster 0, near 1/2
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val pairs = Dedup.semanticPairs(emb, "vec_id", "embedding",
      Dedup.blockCentroids(4, dim), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)), s"near-identical pair missing: $pairs")
    assert(pairs.contains((1L, 4L, 0)) && pairs.contains((2L, 4L, 0)), s"$pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"cross-cluster pair leaked: $pairs")
  }

  test("semanticPairs argmax tie-break picks the smallest centroid index") {
    // the all-ones vector ties on every block centroid -> cluster 0
    val emb = Seq((1L, Seq.fill(8)(1.0f)), (2L, Seq.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Dedup.semanticPairs(emb, "vec_id", "embedding",
      Dedup.blockCentroids(4, 8), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)), s"got ${out.toSeq}")
  }

  test("embeddingNearDupPairs finds planted near-identical vectors") {
    val dim = 8
    val v = Array(0.9f, 0.1f, 0.3f, 0.7f, 0.2f, 0.8f, 0.4f, 0.6f)
    val vNear = v.clone(); vNear(0) = 0.91f
    val vFar = Array(-0.5f, 0.9f, -0.1f, 0.2f, -0.7f, 0.1f, -0.3f, 0.4f)
    val emb = Seq((1L, v.toSeq), (2L, vNear.toSeq), (3L, vFar.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", dim,
      threshold = 0.99).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("minhash dedup scales shape: runs on the real documents table") {
    val real = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val n = real.count()
    val kept = Dedup.minhashDedup(real, "doc_id", "text", threshold = 0.8).count()
    assert(kept > 0 && kept <= n)
  }

  // ---------------------------------------------- connected components —

  /** Brute-force union-find oracle for CC tests. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents collapses a chain to its minimum (greedy would not)") {
    // chain 1-3, 2-3: greedy drop-larger keeps {1, 2}; CC keeps min 1 only
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents matches union-find on a multi-component graph") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // long chain
      (10L, 11L), (11L, 12L), (10L, 12L),               // triangle
      (20L, 21L),                                       // pair
      (30L, 31L), (32L, 31L), (33L, 30L), (34L, 33L))   // star-ish
    val expected = ufComponents(edges)
    val cc = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc == expected)
  }

  test("connectedComponents converges logarithmically on a long path") {
    // path of 64 nodes: diameter 63, pointer jumping must converge well
    // under the 50-round cap (plain propagation would need 63 rounds)
    val edges = (0L until 63L).map(i => (i, i + 1))
    val cc = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.values.toSet == Set(0L), s"all 64 nodes must label 0: $cc")
  }

  test("dedupLines drops corpus-frequent lines, keeps order, keeps emptied docs") {
    val boiler = "subscribe to our newsletter"
    val docsL = Seq(
      (1L, s"unique one\n$boiler\nunique two"),
      (2L, s"$boiler\nanother thing"),
      (3L, s"third doc line\n$boiler"),
      (4L, s"fourth doc line\n$boiler"),
      (5L, boiler) // nothing but boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docsL, "doc_id", "text", maxOccurrences = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("unique one\nunique two", 2L), "order preserved across the gap")
    assert(out(2L) == ("another thing", 1L))
    assert(out(5L) == ("", 0L), "fully-boilerplate doc stays as an empty row")
    assert(out.size == 5)
  }

  test("connectedComponents on an empty pair set is empty (and converges)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("dedupByComponents keeps one survivor per cluster plus singletons") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
    val kept = Dedup.dedupByComponents(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,3} is one near-dup cluster -> keep 1; 4 and 5 are singletons
    assert(kept == Set(1L, 4L, 5L), s"got $kept")
  }

  test("duplicatedSpanReport: overlap merge, within-doc repeats, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),         // 'a b','b c' shared with doc 2 -> one merged span
      (2L, "x a b c y"),         // covered positions 1,2 -> one span of 3 tokens
      (3L, "z z z"),             // 'z z' repeats WITHIN the doc -> fully covered
      (4L, "p q"),               // nothing repeated
      (5L, "solo"),              // shorter than n -> no grams at all
      (6L, "a b m n o a b")      // 'a b' at pos 0 and 5 -> two separate spans
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanReport(docs, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((5L, 1L, 3L, 0.6)))   // span [0,1] covers 'a b c'
    assert(out(2L) == ((5L, 1L, 3L, 0.6)))   // span [1,2] covers 'a b c'
    assert(out(3L) == ((3L, 1L, 3L, 1.0)))   // positions 0,1 merge -> whole doc
    assert(out(4L) == ((2L, 0L, 0L, 0.0)))
    assert(out(5L) == ((1L, 0L, 0L, 0.0)))
    assert(out(6L) == ((7L, 2L, 4L, BigDecimal(4.0 / 7).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))) // pos 0 and 5 don't merge
  }

  test("removeDuplicatedSpans: rewrites docs with covered tokens cut out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "x a b c y"), (3L, "z z z"),
      (4L, "p q"), (5L, "solo"), (6L, "a b m n o a b")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((5L, 2L, "d e")))       // 'a b c' covered
    assert(out(2L) == ((5L, 2L, "x y")))
    assert(out(3L) == ((3L, 0L, "")))          // fully duplicated doc vanishes
    assert(out(4L) == ((2L, 2L, "p q")))       // untouched docs keep all tokens
    assert(out(5L) == ((1L, 1L, "solo")))
    assert(out(6L) == ((7L, 3L, "m n o")))     // both 'a b' spans removed
  }

  test("minhashDedupKeepBest keeps the longest cluster member, not min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val docs = Seq(
      (1L, base),                      // near-dup cluster {1, 2}: 2 is longer
      (2L, base + " with two extra tokens appended"),
      (3L, "completely unrelated content about columnar storage compaction")
    ).toDF("doc_id", "text")
    val score = size(TextAnalysis.tokens(col("text"))).cast("long")
    val kept = Dedup.minhashDedupKeepBest(docs, "doc_id", "text", score,
        threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // min-id policy would keep 1; keep-best must keep the LONGER doc 2
    assert(kept == Seq(2L, 3L), s"got $kept")
  }

  test("editSimilarityVerify: hand-computed sims, threshold, maxLen null report") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "abcdefghij"),   // 2: one substitution -> sim 0.9
      (2L, "abcdefghiX"),
      (3L, "zzzzzzzzzz"),   // vs 1: all 10 differ -> sim 0.0
      (4L, "x" * 50)        // over maxLen guard in the last case
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.editSimilarityVerify(pairs, docs, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.9))) // 0.0 pair filtered out
    // over-length pair: reported with null sim, never silently dropped
    val longPair = Seq((1L, 4L)).toDF("id_a", "id_b")
    val rep = Dedup.editSimilarityVerify(longPair, docs, "doc_id", "text",
        threshold = 0.5, maxLen = 20).collect()
    assert(rep.length == 1 && rep(0).isNullAt(2))
  }
}
