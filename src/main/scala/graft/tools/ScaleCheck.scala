package graft.tools

import graft.ops.{Decontamination, Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale evidence runner (not a unit test): synthesizes data 1-3 orders of
  * magnitude beyond the sf0.1 fixtures and measures the quality/throughput
  * of the operators whose behavior can't be judged at 60k rows — LSH
  * dedup recall/precision on planted near-dups, IVF recall vs brute
  * force, archiver write throughput. Results are recorded in
  * SCALECHECK.md.
  *
  * Everything is deterministic (hash-derived data, fixed seeds).
  */
object ScaleCheck {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Synthetic corpus: `n` docs of ~80 tokens from a 5k-word vocabulary;
    * every 20th doc gets a near-duplicate (3 tokens perturbed) planted at
    * id + n.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 80).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(i)), lit(5000)))): _*).as("text"))
    val dups = spark.range(n).filter(col("id") % 20 === 0)
      .select((col("id") + n).as("doc_id"),
        concat_ws(" ", (0 until 80).map(i =>
          if (i % 27 == 13) concat(lit("x"), pmod(xxhash64(col("id"), lit(i + 9999)), lit(5000)))
          else concat(lit("w"), pmod(xxhash64(col("id"), lit(i)), lit(5000)))): _*).as("text"))
    base.unionByName(dups)
  }

  /** Clustered embeddings (the workload IVF exists for): 40 hash-derived
    * centers, each vector = its center + 10% noise.
    */
  def embeddings(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    val cluster = pmod(col("id"), lit(40))
    def u(c: org.apache.spark.sql.Column, salt: Int) =
      pmod(xxhash64(c, lit(salt)), lit(2000)).cast("double") / 1000.0 - 1.0
    val cols = (0 until dim).map(i =>
      (u(cluster, i) + u(col("id"), i + 100000) * 0.1).cast("float"))
    spark.range(n).select(col("id").as("vec_id"), array(cols: _*).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"), Some(32))
    spark.sparkContext.setLogLevel("ERROR")

    // ---- 1. MinHash-LSH dedup on 210k docs with 10k planted near-dups --
    val nDocs = 200000L
    val docs = corpus(spark, nDocs).cache()
    docs.count()
    val planted = (0L until nDocs by 20).map(i => (i, i + nDocs)).toSet
    val (pairs, tDedup) = time {
      Dedup.minhashPairs(docs, "doc_id", "text",
        shingle = 3, numPerm = 128, bands = 32, threshold = 0.6)
        .collect()
    }
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.intersect(found).size.toDouble / planted.size
    // precision vs plant: found pairs are exact-jaccard-verified, so any
    // extra pairs are real vocabulary collisions, not false positives
    println(f"DEDUP> docs=${docs.count()} planted=${planted.size} found=${found.size} " +
      f"recall=$recall%.4f time=${tDedup}%.1f s")

    // ---- 1a. Connected components over the found pair graph -----------
    // planted pairs are disjoint (i, i+n), so the expected component
    // structure is exact: every cluster has exactly 2 members with the
    // base id as representative — any chain-merge across clusters or a
    // non-converged label would break equality.
    val pairsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(found.toSeq.map(p => org.apache.spark.sql.Row(p._1, p._2)), 32),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id_b", org.apache.spark.sql.types.LongType))))
    val (ccRows, tCc) = time {
      Dedup.connectedComponents(pairsDf, "id_a", "id_b").collect()
    }
    val ccOk = ccRows.forall { r =>
      val (id, comp) = (r.getLong(0), r.getLong(1))
      comp == (if (id >= nDocs) id - nDocs else id) ||
        found.exists(p => p._1 == comp) // vocab-collision clusters: min holds
    }
    val nClusters = ccRows.map(_.getLong(1)).distinct.length
    println(f"CC> nodes=${ccRows.length} clusters=$nClusters ok=$ccOk time=${tCc}%.1f s")

    // ---- 1b. Decontamination on the same 210k docs --------------------
    // benchmark = the 10k planted near-dup partners (ids >= nDocs): every
    // base doc with a planted partner shares 8-grams with the benchmark,
    // so expected flags = the 10k planted partners' sources.
    val bench = docs.filter(col("doc_id") >= nDocs)
    val train = docs.filter(col("doc_id") < nDocs)
    val (contaminated, tDecon) = time {
      Decontamination.overlapReport(train, "doc_id", "text", bench, "text", n = 8)
        .collect()
    }
    val flagged = contaminated.map(_.getLong(0)).toSet
    val expected = (0L until nDocs by 20).toSet
    val deconRecall = expected.intersect(flagged).size.toDouble / expected.size
    println(f"DECON> train=${nDocs} bench=10000 flagged=${flagged.size} " +
      f"recall=$deconRecall%.4f time=${tDecon}%.1f s")

    // ---- 1c. Duplicated-gram report on the same 210k docs -------------
    // every planted pair (i, i+n) shares long runs of 8-grams; unrelated
    // 80-token docs over a 5k vocabulary share none (collision odds are
    // negligible) — so expected flagged docs = sources + partners.
    val (dupReport, tDup) = time {
      Dedup.duplicatedGramReport(docs, "doc_id", "text", n = 8)
        .filter(col("n_dup_grams") > 0).collect()
    }
    val dupFlagged = dupReport.map(_.getLong(0)).toSet
    val dupExpected = (0L until nDocs by 20).flatMap(i => Seq(i, i + nDocs)).toSet
    val dupRecall = dupExpected.intersect(dupFlagged).size.toDouble / dupExpected.size
    println(f"DUPGRAM> docs=${nDocs + nDocs / 20} flagged=${dupFlagged.size} " +
      f"recall=$dupRecall%.4f time=${tDup}%.1f s")

    // ---- 1d. DSIR importance scoring throughput on the 210k docs ------
    val (dsirRows, tDsir) = time {
      graft.ops.Importance.dsirScores(docs, "doc_id", "text",
        col("doc_id") % 2 === 0).collect()
    }
    val dsirOk = dsirRows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
    println(f"DSIR> docs=${dsirRows.length} finite=$dsirOk time=${tDsir}%.1f s")

    // ---- 1e. Duplicated-span report on the same 210k docs -------------
    // planted partners differ at token positions 13/40/67 (i % 27 == 13),
    // so the 8-gram windows avoiding those positions are exactly
    // [0,5]+[14,32]+[41,59]+[68,72] -> 4 maximal spans covering 77 of 80
    // tokens in BOTH pair members; unrelated docs share no 8-gram
    // (collision odds over the 5k vocab are negligible). The check is
    // exact: every planted doc must report (4, 77), nobody else reports
    // anything.
    val (spanRows, tSpan) = time {
      Dedup.duplicatedSpanReport(docs, "doc_id", "text", n = 8)
        .filter(col("n_spans") > 0).collect()
    }
    val spanFlagged = spanRows.map(_.getLong(0)).toSet
    val spanRecall = dupExpected.intersect(spanFlagged).size.toDouble / dupExpected.size
    // empty report = the exact regression this check exists to catch —
    // fail loudly (0.0), never print a quiet NaN
    val spanExactOk =
      if (spanRows.isEmpty) 0.0
      else spanRows.count(r =>
        r.getLong(2) == 4L && r.getLong(3) == 77L).toDouble / spanRows.length
    println(f"DUPSPAN> docs=${nDocs + nDocs / 20} flagged=${spanFlagged.size} " +
      f"recall=$spanRecall%.4f exact(4,77)=$spanExactOk%.4f time=${tSpan}%.1f s")

    // ---- 1e2. Incremental dedup: 10k new docs vs 200k reference -------
    // new batch = the planted partners (ids >= nDocs), reference = the
    // 200k base corpus; every new doc near-dups exactly its source
    // (i + nDocs, i), so expected pairs = the 10k plants and recall is
    // exact.
    val (incPairs, tInc) = time {
      Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") >= nDocs), "doc_id", "text",
        docs.filter(col("doc_id") < nDocs), "doc_id", "text",
        shingle = 3, numPerm = 128, bands = 32, threshold = 0.6)
        .collect()
    }
    val incFound = incPairs.map(r => (r.getLong(1), r.getLong(0))).toSet
    val incRecall = planted.intersect(incFound).size.toDouble / planted.size
    println(f"INCDEDUP> new=10000 ref=200000 found=${incFound.size} " +
      f"recall=$incRecall%.4f time=${tInc}%.1f s")

    // ---- 1f. Bigram-LM scoring throughput on the 210k docs ------------
    val (bigramRows, tBigram) = time {
      graft.ops.Retrieval.bigramNll(docs, "doc_id", "text").collect()
    }
    val bigramOk = bigramRows.forall { r =>
      val v = r.getDouble(2); !v.isNaN && !v.isInfinite && v > 0 }
    println(f"BIGRAM> docs=${bigramRows.length} finite=$bigramOk time=${tBigram}%.1f s")

    // ---- 2. IVF vs brute force on 50k x 64-dim vectors ----------------
    val emb = embeddings(spark, 50000L, 64).cache()
    emb.count()
    val q = emb.filter(col("vec_id") === 123).head.getSeq[Float](1)
    val (exact, tBrute) = time {
      Similarity.topK(emb, "vec_id", "embedding", q, 20).collect().map(_.getLong(0)).toSet
    }
    val (cents, tTrain) = time {
      Similarity.trainCentroids(emb, "embedding", k = 32, iters = 4)
    }
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents).cache()
    idx.count()
    val (approx, tProbe) = time {
      Similarity.ivfTopK(idx, "vec_id", "embedding", cents, q, 20, nprobe = 6)
        .collect().map(_.getLong(0)).toSet
    }
    println(f"ANN> n=50000 recall@20=${exact.intersect(approx).size / 20.0}%.2f " +
      f"brute=${tBrute}%.2f s train=${tTrain}%.2f s probe=${tProbe}%.2f s")

    // ---- 2a. SemDeDup over the same 50k vectors with the trained
    // centroids: the data is built around 40 hash centers with 10% noise,
    // so same-center vectors are semantic near-dups; the within-cluster
    // stage must find pairs while staying bounded by cluster size.
    val (semPairs, tSem) = time {
      Dedup.semanticPairs(emb, "vec_id", "embedding",
        cents.map(_.toSeq), threshold = 0.95).count()
    }
    println(f"SEMDEDUP> n=50000 k=${cents.length} pairs=$semPairs time=${tSem}%.1f s")

    // ---- 3. Archiver throughput on 5M generated rows ------------------
    val rows = 5000000L
    val out = java.nio.file.Files.createTempDirectory("scalecheck").toString
    Fixtures.write(spark, rows, s"$out/src") // generate first (not timed)
    val cfgYaml =
      s"""archiver:
         |  source: {type: parquet, path: $out/src_as_table, table: property_sales}
         |  preserver:
         |    batch_size_num_records: 1000000
         |  repository: {type: local, path: $out/dest}
         |""".stripMargin
    // stage the generated parquet as <dir>/<table>.parquet for the source
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$out/src_as_table"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$out/src"),
      java.nio.file.Paths.get(s"$out/src_as_table/property_sales.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val (cat, tSnap) = time {
      graft.snapshot.Archiver.snapshot(spark,
        graft.config.GraftConfig.fromString(cfgYaml), "scale-1")
    }
    println(f"SNAPSHOT> rows=${cat.numRecordsProcessed} " +
      f"ok=${cat.numSourceRecords == cat.numRecordsProcessed && cat.success} " +
      f"time=${tSnap}%.1f s throughput=${cat.numRecordsProcessed / tSnap / 1e6}%.2f M rows/s")

    spark.stop()
  }
}
