package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InvertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "quick brown quick brown quick"),
    (3L, "Brown QUICK brown"), // case-folds; "quick brown" at pos 1
    (4L, "nothing relevant here"),
    (5L, "quick"), // shorter than the phrase
    (6L, "")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("postings: positions are 0-based, sorted, tf = count") {
    val p = Invert.postings(docs, "doc_id", "text")
      .filter(col("term") === "quick").orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getSeq[Int](2), r.getLong(3)))
    assert(p.toSeq == Seq(
      (1L, Seq(1), 1L), (2L, Seq(0, 2, 4), 3L), (3L, Seq(1), 1L),
      (5L, Seq(0), 1L)))
  }

  test("phrase search (index): adjacency, counts, first position") {
    val idx = Invert.postings(docs, "doc_id", "text")
    assert(rows(Invert.phraseSearchIndex(idx, Seq("quick", "brown"))) ==
      Seq((1L, 1L, 1L), (2L, 2L, 0L), (3L, 1L, 1L)))
    // trigram: only doc 2 has quick brown quick
    assert(rows(Invert.phraseSearchIndex(idx, Seq("quick", "brown", "quick"))) ==
      Seq((2L, 2L, 0L)))
    // both-terms-present but never adjacent in that order
    assert(rows(Invert.phraseSearchIndex(idx, Seq("brown", "dog"))) == Seq())
    // single-term phrase degenerates to term lookup
    assert(rows(Invert.phraseSearchIndex(idx, Seq("quick"))) ==
      Seq((1L, 1L, 1L), (2L, 3L, 0L), (3L, 1L, 1L), (5L, 1L, 0L)))
    // phrase terms are case-folded like the tokenizer
    assert(rows(Invert.phraseSearchIndex(idx, Seq("QUICK", "Brown"))) ==
      rows(Invert.phraseSearchIndex(idx, Seq("quick", "brown"))))
  }

  test("duplicate-term phrase: overlapping occurrences all counted") {
    val d = Seq((1L, "buffalo buffalo buffalo"), (2L, "buffalo x buffalo"))
      .toDF("doc_id", "text")
    val idx = Invert.postings(d, "doc_id", "text")
    // "buffalo buffalo" occurs at 0 and 1 in doc 1, never in doc 2
    assert(rows(Invert.phraseSearchIndex(idx, Seq("buffalo", "buffalo"))) ==
      Seq((1L, 2L, 0L)))
  }

  test("direct scan == index path on the real corpus, several phrases") {
    val corpus = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val idx = Invert.postings(corpus, "doc_id", "text")
    for (ph <- Seq(Seq("table", "scan"), Seq("slow", "hash", "batch"),
        Seq("the"), Seq("no_such_token", "ever"))) {
      val a = rows(Invert.phraseSearch(corpus, "doc_id", "text", ph))
      val b = rows(Invert.phraseSearchIndex(idx, ph))
      assert(a == b, s"direct vs index mismatch for phrase $ph")
      if (ph == Seq("table", "scan")) assert(a.nonEmpty)
    }
  }

  test("persisted index: bucket pruning answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv").toString
    val idx = Invert.postings(docs, "doc_id", "text")
    Invert.writeIndex(idx, dir, nBuckets = 8)
    val back = Invert.readIndex(spark, dir)
    // crc32 bucket column matches the driver-side literal computation
    val mismatch = back.filter(
      pmod(crc32(col("term")), lit(8L)).cast("int") =!= col("bucket")).count()
    assert(mismatch == 0L)
    assert(rows(Invert.phraseSearchIndex(back, Seq("quick", "brown"), nBuckets = 8)) ==
      rows(Invert.phraseSearchIndex(idx, Seq("quick", "brown"))))
    // the embedded nb column makes a WRONG caller bucket count harmless:
    // the modulus comes from the index, not the parameter
    assert(rows(Invert.phraseSearchIndex(back, Seq("quick", "brown"), nBuckets = 64)) ==
      rows(Invert.phraseSearchIndex(idx, Seq("quick", "brown"))))
    assert(Invert.proximitySearch(back, Seq("quick", "dog"), 9, nBuckets = 64)
      .count() == 1L)
    // the pruned plan only reads the phrase's buckets
    val planned = Invert.phraseSearchIndex(back, Seq("quick", "brown"), nBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters") || planned.contains("bucket"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("proximity search: window semantics, order-free, first start") {
    val d = Seq(
      (1L, "alpha x x beta"),        // span [0,3] needs window >= 4
      (2L, "beta alpha"),            // order-free: window 2 suffices
      (3L, "alpha x x x x beta"),    // gap 5: window 6
      (4L, "alpha only here"),
      (5L, "beta alone")
    ).toDF("doc_id", "text")
    val idx = Invert.postings(d, "doc_id", "text")
    def got(w: Int) = Invert.proximitySearch(idx, Seq("alpha", "beta"), w)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got(2) == Seq((2L, 0L)))
    assert(got(4) == Seq((1L, 0L), (2L, 0L)))
    assert(got(6) == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
    // window start snaps to an occurrence, not to position 0
    val late = Seq((9L, "x x x alpha beta")).toDF("doc_id", "text")
    val lidx = Invert.postings(late, "doc_id", "text")
    assert(Invert.proximitySearch(lidx, Seq("alpha", "beta"), 2)
      .head.getLong(1) == 3L)
    // single term: every doc containing it, first occurrence
    assert(Invert.proximitySearch(idx, Seq("beta"), 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 0L), (3L, 5L), (5L, 0L)))
  }

  test("proximity == phrase when window equals phrase length and order matches") {
    val corpus = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val idx = Invert.postings(corpus, "doc_id", "text")
    // phrase hits are a subset of window-2 proximity hits
    val phrase = Invert.phraseSearchIndex(idx, Seq("table", "scan"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val prox = Invert.proximitySearch(idx, Seq("table", "scan"), 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(phrase.subsetOf(prox))
    assert(prox.nonEmpty)
  }

  test("index-backed BM25 == corpus-scan BM25 exactly, including at scale-k") {
    val corpus = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val idx = Invert.postings(corpus, "doc_id", "text")
    val dl = Invert.docLengths(idx)
    // parity precondition: the fixture has no zero-token docs (empty
    // docs would be counted by the corpus scan but not by docLengths)
    assert(corpus.filter(size(TextAnalysis.tokens(col("text"))) === 0).count() == 0L)
    for (terms <- Seq(Seq("customer", "vector", "spark", "query"),
        Seq("window", "stream"), Seq("no_such_term"),
        Seq("Window", "stream"))) { // case asymmetry must match too
      val a = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      val b = Invert.bm25FromIndex(idx, dl, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(a == b, s"index-backed BM25 diverged for $terms")
    }
  }

  test("short docs: sequence guard keeps empty matches, no descending ranges") {
    val d = Seq((1L, "a"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    assert(rows(Invert.phraseSearch(d, "doc_id", "text", Seq("a", "b", "c"))) == Seq())
    assert(rows(Invert.phraseSearch(d, "doc_id", "text", Seq("a", "b"))) ==
      Seq((3L, 1L, 0L)))
  }

  // ----------------------------------------------------- merge —

  private def postingsSet(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2), r.getLong(3)))
      .toSet

  test("mergePostings: delta docs replace, others pass through == full rebuild") {
    val updated = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely new words only"), // replaced: old quick/brown must vanish
      (3L, "Brown QUICK brown"),
      (4L, "nothing relevant here"),
      (5L, "quick"),
      (6L, "")
    ).toDF("doc_id", "text")
    val base = Invert.postings(docs, "doc_id", "text")
    val delta = Invert.postings(
      updated.filter($"doc_id" === 2L), "doc_id", "text")
    val merged = Invert.mergePostings(base, delta)
    assert(postingsSet(merged) ==
      postingsSet(Invert.postings(updated, "doc_id", "text")))
    // deletion semantics: doc 2's stale terms are gone
    assert(merged.filter($"term" === "quick" && $"doc_id" === 2L).count() == 0L)
  }

  test("mergePostings: disjoint delta (pure append) == rebuild over the union") {
    val newDocs = Seq(
      (7L, "fresh append only document"),
      (8L, "quick append")).toDF("doc_id", "text")
    val merged = Invert.mergePostings(
      Invert.postings(docs, "doc_id", "text"),
      Invert.postings(newDocs, "doc_id", "text"))
    assert(postingsSet(merged) ==
      postingsSet(Invert.postings(docs.unionByName(newDocs), "doc_id", "text")))
  }

  test("mergePostings: chained deltas fold; queries run on merged output") {
    val d1 = Seq((7L, "alpha beta")).toDF("doc_id", "text")
    val d2 = Seq((7L, "beta gamma beta")).toDF("doc_id", "text") // re-update 7
    val m = Invert.mergePostings(
      Invert.mergePostings(Invert.postings(docs, "doc_id", "text"),
        Invert.postings(d1, "doc_id", "text")),
      Invert.postings(d2, "doc_id", "text"))
    val expect = Invert.postings(
      docs.unionByName(Seq((7L, "beta gamma beta")).toDF("doc_id", "text")),
      "doc_id", "text")
    assert(postingsSet(m) == postingsSet(expect))
    // the second update wins: tf(beta, 7) = 2, alpha is gone
    assert(rows(Invert.phraseSearchIndex(m, Seq("beta", "gamma"))) ==
      Seq((7L, 1L, 0L)))
    assert(m.filter($"term" === "alpha").count() == 0L)
  }

  test("mergePostings with explicit doc-id set: deleted/emptied docs vanish") {
    val base = Invert.postings(docs, "doc_id", "text")
    // doc 2 deleted outright, doc 3 emptied — neither produces delta
    // postings rows, so only the explicit id set can retire them
    val deltaDocs = Seq((3L, "")).toDF("doc_id", "text")
    val delta = Invert.postings(deltaDocs, "doc_id", "text")
    assert(delta.count() == 0L)
    val ids = Seq(2L, 3L).toDF("doc_id")
    val merged = Invert.mergePostings(base, delta, ids)
    val expect = Invert.postings(
      docs.filter($"doc_id" =!= 2L && $"doc_id" =!= 3L), "doc_id", "text")
    assert(postingsSet(merged) == postingsSet(expect))
    assert(merged.filter($"doc_id".isin(2L, 3L)).count() == 0L)
    // the two-arg form (ids from delta postings) would have kept them
    assert(Invert.mergePostings(base, delta)
      .filter($"doc_id".isin(2L, 3L)).count() > 0L)
  }

  test("mergePostings accepts a persisted base (bucket/nb columns dropped)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-merge").toString
    Invert.writeIndex(Invert.postings(docs, "doc_id", "text"), dir, nBuckets = 8)
    val base = Invert.readIndex(spark, dir)
    val delta = Invert.postings(
      Seq((2L, "replacement text")).toDF("doc_id", "text"), "doc_id", "text")
    val merged = Invert.mergePostings(base, delta)
    assert(merged.columns.toSeq == Seq("term", "doc_id", "positions", "tf"))
    val updated = docs.filter($"doc_id" =!= 2L)
      .unionByName(Seq((2L, "replacement text")).toDF("doc_id", "text"))
    assert(postingsSet(merged) ==
      postingsSet(Invert.postings(updated, "doc_id", "text")))
  }

  test("bm25Batch: per-qid results bit-equal the single-query face; duplicate terms collapse") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark table scan fast table"),
      (2L, "customer join table order"),
      (3L, "spark spark query window"),
      (4L, "batch stream window stream"),
      (5L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val idx = Invert.postings(docs, "doc_id", "text")
    val dl = Invert.docLengths(idx)
    val bags = Seq(
      0L -> Seq("spark", "table"),
      1L -> Seq("customer", "nosuchterm"),
      2L -> Seq("window", "window", "stream")) // dup term must not double-score
    val queries = bags.toDF("qid", "terms")
    val batch = Invert.bm25Batch(idx, dl, queries, "qid", "terms", k = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (-t._2, t._1)).toSeq).toMap
    bags.foreach { case (qid, terms) =>
      val single = Invert.bm25FromIndex(idx, dl, terms, k = 3)
        .collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single,
        s"qid $qid: ${batch.get(qid)} vs $single")
    }
  }
}
