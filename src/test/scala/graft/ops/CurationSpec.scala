package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Observation
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate filters, dedups, annotates — audits ride the single pass") {
    val good = ("the quick brown fox jumps over the lazy dog and then rests " * 3).trim
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup -> dropped
      (3L, "too short"), // < 20 tokens -> filtered
      (4L, "!!! ??? " * 40), // punct soup -> filtered
      (5L, "der hund und die katze laufen durch den garten und dann " +
        "schlafen sie unter dem baum bis der regen kommt und alles nass ist")
    ).toDF("doc_id", "text")

    val obsIn = Observation("cur_in")
    val obsF = Observation("cur_filtered")
    val out = Curation.curate(docs, "doc_id", "text",
      obsIn = Some(obsIn), obsFiltered = Some(obsF)).collect()

    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 5L), s"expected 1 and 5 to survive, got $ids")
    assert(obsIn.get("n") == 5L)
    assert(obsF.get("n") == 3L) // 1, 2, 5 pass the gate
    val byId = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(5L) == "de")
    assert(byId(1L) == "en")
  }

  test("runs over the real documents table") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val out = Curation.curate(docs, "doc_id", "text")
    assert(out.count() > 0)
  }

  test("packSequential: distributed prefix sum matches the serial reference " +
    "and is independent of partition count") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val budget = 512L

    // serial reference: driver-side cumulative sum in id order
    val serial = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val expected = serial.map { case (id, n) =>
      val pack = cum / budget
      cum += n
      id -> pack
    }.toMap

    for (parts <- Seq(1, 3, 16)) {
      val got = Curation.packSequential(
        docs.repartition(parts), "doc_id", "n_tokens", budget)
        .select("doc_id", "pack_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at input partitions=$parts")
    }

    // packs are contiguous in id order and sized ~budget: every non-final
    // pack's token total crosses the budget only via its last (straddling)
    // doc
    val packed = Curation.packSequential(docs, "doc_id", "n_tokens", budget)
      .groupBy("pack_id").agg(sum("n_tokens").as("total"))
      .orderBy("pack_id").collect()
    val maxDoc = serial.map(_._2).max
    packed.dropRight(1).foreach { r =>
      assert(r.getLong(1) >= budget - maxDoc && r.getLong(1) <= budget + maxDoc,
        s"pack ${r.getLong(0)} total ${r.getLong(1)} out of range")
    }
  }

  test("packBucketed: hand-computed buckets, pack sizes, truncation") {
    // budget 64, minBucket 8 -> edges 8,16,32,64; k = 8,4,2,1
    val docs = Seq(
      (1L, 3L),   // bucket 8
      (2L, 8L),   // bucket 8
      (3L, 9L),   // bucket 16
      (4L, 17L),  // bucket 32
      (5L, 40L),  // bucket 64
      (6L, 100L), // > budget -> bucket 64, truncated, alone in a pack
      (7L, 5L), (8L, 6L), (9L, 7L), (10L, 2L), (11L, 1L), (12L, 4L),
      (13L, 8L), (14L, 3L) // ten bucket-8 docs total -> packs of 8 then 2
    ).toDF("doc_id", "n_tokens")
    val out = Curation.packBucketed(docs, "doc_id", "n_tokens",
        budget = 64L, minBucket = 8L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("pack_seq"),
          r.getAs[Boolean]("truncated")))
      .toMap
    assert(out(1L) == (8L, 0L, false))
    assert(out(3L) == (16L, 0L, false))
    assert(out(4L) == (32L, 0L, false))
    assert(out(5L) == (64L, 0L, false))
    assert(out(6L) == (64L, 1L, true)) // own pack, after doc 5 by id
    // bucket-8 members in doc_id order: 1,2,7,8,9,10,11,12,13,14 —
    // first eight share pack 0, the last two spill to pack 1
    assert(out(13L)._2 == 1L && out(14L)._2 == 1L)
    assert(Seq(1L, 2L, 7L, 8L, 9L, 10L, 11L, 12L).forall(out(_)._2 == 0L))
    // invariant: no (bucket, pack) exceeds budget DIV bucket members
    val sizes = out.toSeq.groupBy { case (_, (b, p, _)) => (b, p) }
      .map { case ((b, _), ms) => (b, ms.size) }
    sizes.foreach { case (b, n) => assert(n <= 64L / b, s"bucket $b pack of $n") }
  }

  test("packBucketed rejects null token counts in-plan") {
    val docs = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, null: java.lang.Long)).toDF("doc_id", "n_tokens")
    intercept[Exception] {
      Curation.packBucketed(docs, "doc_id", "n_tokens",
        budget = 64L, minBucket = 8L).collect()
    }
  }

  test("packBucketed is independent of the input partition count") {
    val docs = (1L to 400L).map(i => (i, (i * 37) % 90 + 1)).toDF("doc_id", "n_tokens")
    val expected = Curation.packBucketed(docs.coalesce(1), "doc_id",
        "n_tokens", budget = 128L, minBucket = 16L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bucket"),
        r.getAs[Long]("pack_seq"))).sortBy(_._1).toSeq
    Seq(3, 16).foreach { parts =>
      val got = Curation.packBucketed(docs.repartition(parts), "doc_id",
          "n_tokens", budget = 128L, minBucket = 16L)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("bucket"),
          r.getAs[Long]("pack_seq"))).sortBy(_._1).toSeq
      assert(got == expected, s"mismatch at input partitions=$parts")
    }
  }

  test("chunk: overlapping windows, short-doc and empty-doc edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, "")                                        // empty -> no chunks
    ).toDF("doc_id", "text")
    val out = Curation.chunk(docs, "doc_id", "text", chunkTokens = 4, strideTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6 -> full coverage with no redundant tail window
    // (start 9 would re-chunk only t10, already covered by start 6)
    assert(d1.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"), d1.mkString("|"))
    assert(d1.map(_._3).toSeq == Seq(4L, 4L, 4L))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")),
      "short doc yields exactly one whole-doc chunk")
    assert(!out.exists(_._1 == 3L), "empty doc yields no chunks")
    // every adjacent pair overlaps by chunk - stride tokens
    assert(d1(0)._4.split(" ").last == d1(1)._4.split(" ").head)
  }

  test("corpusDiff: all four statuses, null fields, and no cross-field bleed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq(
      (1L, "same", "en"),
      (2L, "old text", "en"),
      (3L, "gone", "de"),
      (4L, null.asInstanceOf[String], "fr"),   // null field hashes stably
      (5L, "ab", "c")                          // field-boundary probe
    ).toDF("doc_id", "text", "lang")
    val b = Seq(
      (1L, "same", "en"),          // unchanged
      (2L, "new text", "en"),      // changed
      (4L, null.asInstanceOf[String], "fr"),   // unchanged (null == null)
      (5L, "a", "bc"),             // changed: ("ab","c") != ("a","bc")
      (6L, "brand new", "en")      // added
    ).toDF("doc_id", "text", "lang")
    val got = Curation.corpusDiff(a, b, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("chunkBySentences: boundaries respected, greedy fill, oversized sentence keeps its chunk") {
    val docs = Seq(
      (1L, "one two three. four five? six seven eight! nine."),
      (2L, "a b c d e f g h i j k l m n o p")
    ).toDF("doc_id", "text")
    val got = Curation.chunkBySentences(docs, "doc_id", "text", 5)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // doc 1 sentence tokens: 3, 2, 3, 1; exclusive cums 0,3,5,8 ->
    // chunks 0,0,1,1
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 5L, "one two three. four five?"),
      (1L, 1L, 2L, 4L, "six seven eight! nine."),
      // doc 2: a single 16-token "sentence" (no terminal punctuation)
      // exceeds the budget but must stay whole in one chunk
      (2L, 0L, 1L, 16L, "a b c d e f g h i j k l m n o p")))
  }

  test("tokenBudgetPerKey: straddling doc kept, oversized first doc kept, under-budget keys whole") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // key a, best-first order: 40 + 50 crosses 80 at the 50-doc
      // (cum_excl 40 < 80 -> kept); the 30-doc (cum_excl 90) drops
      (1L, "a", 40L), (2L, "a", 50L), (3L, "a", 30L),
      // key b: first doc alone exceeds the budget -> still kept
      (4L, "b", 500L), (5L, "b", 10L),
      // key c: everything fits
      (6L, "c", 20L), (7L, "c", 20L)
    ).toDF("id", "key", "tok")
    val kept = Curation.tokenBudgetPerKey(docs, col("key"), col("tok"),
        80L, Seq(col("tok").desc, col("id")))
      .collect().map(_.getLong(0)).toSet
    // key a order is tok desc: 50 (cum 0), 40 (cum 50), 30 (cum 90)
    assert(kept == Set(1L, 2L, 4L, 6L, 7L), kept.toString)
  }

  test("capPerKey: keeps top-N per key by order with deterministic ties; small keys untouched") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // domain a: 4 docs, scores 9,7,7,5 -> cap 2 keeps id 1 and the
      // LOWER id of the score-7 tie (id 2, not 3)
      (1L, "a", 9L), (2L, "a", 7L), (3L, "a", 7L), (4L, "a", 5L),
      // domain b: under the cap, all kept
      (5L, "b", 1L), (6L, "b", 2L)
    ).toDF("id", "domain", "score")
    val kept = Curation.capPerKey(docs, col("domain"), 2,
        Seq(col("score").desc, col("id")))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L, 6L))
    // result carries the original columns only (__rn dropped)
    assert(Curation.capPerKey(docs, col("domain"), 2,
      Seq(col("score").desc, col("id"))).columns.toSeq ==
      Seq("id", "domain", "score"))
    // partition-count invariance: same survivors at any parallelism
    val kept1 = Curation.capPerKey(docs.repartition(7), col("domain"), 2,
        Seq(col("score").desc, col("id")))
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept)
  }

  test("winsorize: clamps at exact quantiles, keeps rows and nulls") {
    import spark.implicits._
    // 1..100 (doubles): p10 = 10.9, p90 = 90.1 (type-7)
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (999L, Option.empty[Double])).toDF("id", "v")
    val out = Curation.winsorize(df, "v", 0.10, 0.90)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size == 101)              // no rows lost
    assert(math.abs(out(1L).get - 10.9) < 1e-9)   // clamped up
    assert(math.abs(out(100L).get - 90.1) < 1e-9) // clamped down
    assert(out(50L).contains(50.0))      // interior untouched
    assert(out(999L).isEmpty)            // null passes through
  }
}
