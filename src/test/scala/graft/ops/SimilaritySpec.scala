package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read
    .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")

  private lazy val queryVec: Seq[Float] = emb
    .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
    .head.getSeq[Float](1)

  test("brute-force topK: self is rank 1 with sim ~1.0") {
    val top = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10).collect()
    assert(top.length == 10)
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    // scores are non-increasing
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("IVF index assigns every vector to a valid cell") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val cells = idx.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(idx.count() == emb.count())
    assert(cells.size > 1, "kmeans collapsed to a single cell")
  }

  test("IVF topK recall vs brute force is high at nprobe=4/8") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents).cache()
    try {
      val exact = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.ivfTopK(idx, "vec_id", "embedding", cents,
        queryVec, 10, nprobe = 4).collect().map(_.getLong(0)).toSet
      val recall = exact.intersect(approx).size / 10.0
      assert(recall >= 0.6, s"recall $recall too low (exact=$exact approx=$approx)")
    } finally idx.unpersist()
  }

  test("IVF topK reads less data than brute force (cell pruning)") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents).cache()
    try {
      val probed = Similarity.ivfTopK(idx, "vec_id", "embedding", cents,
        queryVec, 10, nprobe = 2)
      // the filter must prune cells before the cosine evaluation
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("cell"), "expected a cell filter in the plan")
    } finally idx.unpersist()
  }

  test("persisted IVF index: probes prune PARTITIONS and match the in-memory path") {
    import org.apache.spark.sql.functions.col
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val path = java.nio.file.Files.createTempDirectory("ivf-idx").toString + "/index"
    Similarity.writeIndex(idx, path)

    // cell is a partition column on disk
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "index must be laid out one directory per cell")

    val onDisk = Similarity.readIndex(spark, path)
    val probed = Similarity.ivfTopK(onDisk, "vec_id", "embedding", cents,
      queryVec, 10, nprobe = 4)
    // the cell IN (...) filter must reach the scan as a PARTITION filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell probe did not become a partition filter:\n${plan.take(600)}")

    val fromDisk = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMem = Similarity.ivfTopK(idx, "vec_id", "embedding", cents,
      queryVec, 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk == inMem, "persisted index must answer identically")
  }

  test("appendIndex: incremental batch lands in the cell layout, equals full rebuild") {
    import org.apache.spark.sql.functions.col
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val path = java.nio.file.Files.createTempDirectory("ivf-append").toString + "/index"
    // day 0: first half; day 1: the rest, encoded with the SAME centroids
    Similarity.writeIndex(
      Similarity.ivfIndex(emb.filter(col("vec_id") < 500), "vec_id", "embedding", cents),
      path)
    Similarity.appendIndex(
      Similarity.ivfIndex(emb.filter(col("vec_id") >= 500), "vec_id", "embedding", cents),
      path)
    val disk = Similarity.readIndex(spark, path)
    assert(disk.count() == emb.count(), "append must add, not replace")
    // identical (id, cell) assignment as a one-shot build
    val full = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val fullAssign = full.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = disk.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == fullAssign, "appended layout must equal the full rebuild's assignment")
    // probes still prune partitions and answer like the one-shot index
    val probed = Similarity.ivfTopK(disk, "vec_id", "embedding", cents,
      queryVec, 10, nprobe = 4)
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"append broke partition pruning:\n${plan.take(600)}")
    val inMem = Similarity.ivfTopK(full, "vec_id", "embedding", cents,
      queryVec, 10, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == inMem)
  }

  test("distributed centroid training converges like the sampled version") {
    val cents = Similarity.trainCentroidsDistributed(emb, "embedding", k = 8, iters = 3)
    assert(cents.length == 8 && cents.head.length == 64)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents).cache()
    try {
      val cells = idx.select("cell").distinct().count()
      assert(cells > 1, "distributed kmeans collapsed to one cell")
      val exact = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.ivfTopK(idx, "vec_id", "embedding", cents,
        queryVec, 10, nprobe = 4).collect().map(_.getLong(0)).toSet
      assert(exact.intersect(approx).size >= 6,
        s"recall too low: ${exact.intersect(approx).size}/10")
    } finally idx.unpersist()
  }

  test("ivfKnnJoin: full-probe equals exact; partial probe stays a subset") {
    import org.apache.spark.sql.functions.col
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val queries = emb.filter(col("vec_id") < 20)
    // probing EVERY cell makes the candidate set the whole corpus, so
    // the join must reproduce exact kNN bit-for-bit (same rounding,
    // same tie-break)
    val full = Similarity.ivfKnnJoin(queries, "vec_id", "embedding",
      idx, "vec_id", "embedding", cents, k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.knnJoinExact(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(full == exact, "nprobe=k cells must reproduce exact kNN")
    // partial probe: every returned neighbor must come from a probed
    // cell and carry the true cosine (no score drift)
    val partial = Similarity.ivfKnnJoin(queries, "vec_id", "embedding",
      idx, "vec_id", "embedding", cents, k = 3, nprobe = 3)
      .collect()
    assert(partial.nonEmpty && partial.length <= 60)
    val exactSims = exact.map(t => (t._1, t._3) -> t._4).toMap
    partial.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactSims.get(key).foreach(s => assert(s == r.getDouble(3),
        s"score drift for $key"))
    }
  }

  test("IVF-PQ: codes are m bytes, ADC recall tracks exact top-k") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val books = Similarity.trainPq(emb, "embedding", cents, m = 8)
    assert(books.length == 8 && books.head.length == 256 && books.head.head.length == 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books).cache()
    try {
      assert(codes.collect().forall(r => r.getAs[Array[Byte]]("code").length == 8),
        "every vector must encode to m=8 bytes")
      val exact = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10)
        .collect().map(_.getLong(0)).toSet
      val adc = Similarity.pqTopK(codes, "vec_id", cents, books,
        queryVec, k = 20, nprobe = 4).collect()
      // the query vector itself (vec_id 0) lives in a probed cell and its
      // ADC estimate of cos=1.0 must stay close despite 32x compression
      val self = adc.find(_.getLong(0) == 0L)
      assert(self.nonEmpty && self.get.getDouble(1) > 0.8,
        s"self-similarity estimate collapsed: $self")
      val recall = exact.intersect(adc.map(_.getLong(0)).toSet).size / 10.0
      assert(recall >= 0.7, s"ADC recall@10-in-20 $recall too low")
    } finally codes.unpersist()
  }

  test("IVF-PQ rerank: exact order restored from the ADC shortlist") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val books = Similarity.trainPq(emb, "embedding", cents, m = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books)
    val ivf = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val reranked = Similarity.pqTopKRerank(codes, "vec_id", cents, books,
      queryVec, ivf, "vec_id", "embedding", k = 10, shortlist = 100, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // nprobe=8 probes every cell and the shortlist is generous, so the
    // reranked result must EQUAL brute force (same exact cosine, same
    // tie-break) — the rerank stage removes all quantization error
    val exact = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reranked == exact,
      s"full-probe rerank must reproduce brute force:\n$reranked\nvs\n$exact")
  }

  test("persisted IVF-PQ index: cell partitions prune, disk matches memory") {
    import org.apache.spark.sql.functions.col
    val cents = Similarity.trainCentroids(emb, "embedding", k = 8, iters = 3)
    val books = Similarity.trainPq(emb, "embedding", cents, m = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books)
    val path = java.nio.file.Files.createTempDirectory("pq-idx").toString + "/index"
    Similarity.writeIndex(codes, path)
    val onDisk = Similarity.readIndex(spark, path)
    val probed = Similarity.pqTopK(onDisk, "vec_id", cents, books,
      queryVec, k = 10, nprobe = 4)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell probe did not become a partition filter:\n${plan.take(600)}")
    val fromDisk = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMem = Similarity.pqTopK(codes, "vec_id", cents, books,
      queryVec, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk == inMem, "persisted PQ index must answer identically")
  }

  test("pqKnnJoin: full probe + full shortlist reproduces exact kNN") {
    import org.apache.spark.sql.functions.col
    val sample = Similarity.sampleVectors(emb, "embedding")
    val cents = Similarity.trainCentroidsFromSample(sample, k = 8, iters = 3)
    val books = Similarity.trainPqFromSample(sample, cents, m = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books)
    val raw = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val queries = emb.filter(col("vec_id") < 20)
    // probing every cell with a corpus-sized shortlist makes the rerank
    // see every candidate: the exact-cosine rerank must then reproduce
    // brute-force kNN bit-for-bit regardless of ADC quantization error
    val full = Similarity.pqKnnJoin(queries, "vec_id", "embedding",
      codes, "vec_id", raw, "vec_id", "embedding", cents, books,
      k = 3, nprobe = 8, shortlist = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.knnJoinExact(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(full == exact, "full-probe full-shortlist pqKnnJoin must equal exact kNN")
  }

  test("pqKnnJoin: tight ADC shortlist keeps high recall, scores stay exact") {
    import org.apache.spark.sql.functions.col
    val sample = Similarity.sampleVectors(emb, "embedding")
    val cents = Similarity.trainCentroidsFromSample(sample, k = 8, iters = 3)
    val books = Similarity.trainPqFromSample(sample, cents, m = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books)
    val raw = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val queries = emb.filter(col("vec_id") < 20)
    // every cell probed but only 20 candidates survive ADC per query:
    // the in-plan LUT scoring now decides the result — recall vs exact
    // measures whether code-only scoring ranks sanely
    val pq = Similarity.pqKnnJoin(queries, "vec_id", "embedding",
      codes, "vec_id", raw, "vec_id", "embedding", cents, books,
      k = 3, nprobe = 8, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val exact = Similarity.knnJoinExact(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val hits = pq.map(t => (t._1, t._2)).toSet
      .intersect(exact.map(t => (t._1, t._2)).toSet)
    assert(hits.size >= (exact.length * 6) / 10,
      s"ADC-shortlist recall too low: ${hits.size}/${exact.length}")
    // any pair both sides return must carry the identical exact cosine
    val exactSims = exact.map(t => (t._1, t._2) -> t._3).toMap
    pq.foreach { t =>
      exactSims.get((t._1, t._2)).foreach(s =>
        assert(s == t._3, s"score drift for (${t._1},${t._2})"))
    }
  }

  test("pqKnnJoin: persisted cell-partitioned code index answers identically") {
    import org.apache.spark.sql.functions.col
    val sample = Similarity.sampleVectors(emb, "embedding")
    val cents = Similarity.trainCentroidsFromSample(sample, k = 8, iters = 3)
    val books = Similarity.trainPqFromSample(sample, cents, m = 8)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cents, books)
      .localCheckpoint(true)
    val raw = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val queries = emb.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("pq-join-idx").toString + "/index"
    Similarity.writeIndex(codes, path)
    val onDisk = Similarity.readIndex(spark, path)
    def run(idx: org.apache.spark.sql.DataFrame) =
      Similarity.pqKnnJoin(queries, "vec_id", "embedding",
        idx, "vec_id", raw, "vec_id", "embedding", cents, books,
        k = 3, nprobe = 8, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(run(onDisk) == run(codes),
      "the persisted code index must answer the batch join identically")
  }

  test("hyperplane signature is deterministic for a fixed seed") {
    import org.apache.spark.sql.functions.col
    val sig1 = emb.limit(20).select(
      Similarity.hyperplaneSignature(col("embedding"), 64, 16, 42L).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val sig2 = emb.limit(20).select(
      Similarity.hyperplaneSignature(col("embedding"), 64, 16, 42L).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(sig1 == sig2)
  }

  test("hardNegativesLsh: different-label only, scores exact, pairs within the LSH candidate set") {
    import org.apache.spark.sql.functions.col
    val labeled = emb // sf0.001 embeddings carry a label column
    val queries = labeled.filter(col("vec_id") < 20)
    val lsh = Similarity.hardNegativesLsh(queries, "vec_id", "embedding",
      "label", labeled, "vec_id", "embedding", "label", k = 3, dim = 64)
      .collect()
    assert(lsh.nonEmpty, "near-identical fixture vectors must collide in some band")
    val qLabels = queries.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    lsh.foreach { r =>
      assert(qLabels(r.getLong(0)) != r.getInt(4),
        s"same-label negative leaked: $r")
    }
    // any pair the exact path also returns must carry the identical
    // rounded cosine (re-attach introduces no score drift)
    val exact = Similarity.hardNegatives(queries, "vec_id", "embedding",
      "label", labeled, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.foreach { r =>
      exact.get((r.getLong(0), r.getLong(2))).foreach(s =>
        assert(s == r.getDouble(3), s"score drift for $r"))
    }
  }

  test("hardNegatives excludes same-label vectors, ranks by similarity") {
    import spark.implicits._
    // id 2 is IDENTICAL to the query but same-label -> must be excluded;
    // id 3 is the near different-label vector (the hard negative);
    // id 4 is orthogonal
    val data = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(1f, 0f), 0),
      (3L, Seq(0.9f, 0.1f), 1),
      (4L, Seq(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      data.filter($"vec_id" === 1L), "vec_id", "embedding", "label",
      data, "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(4)))
      .sortBy(_._1).toList
    assert(out.map(_._2) == List(3L, 4L), s"expected negatives 3 then 4: $out")
    assert(out.forall(_._3 == 1), "every mined negative carries the other label")
  }

  // ------------------------------------------------------------- SQ8 —

  test("SQ8: codes are dim bytes; full-data ranges obey the half-step error bound") {
    import org.apache.spark.sql.functions._
    val all = emb.collect().map(_.getSeq[Float](1).toArray)
    val (vmin, vdiff) = Similarity.trainSqFromSample(all) // no clamp regime
    val dim = all.head.length
    val codes = Similarity.sqEncode(emb, "vec_id", "embedding", vmin, vdiff)
    assert(codes.collect().forall(r => r.getAs[Array[Byte]]("code").length == dim),
      s"every vector must encode to dim=$dim bytes")
    val n = emb.count().toInt
    val approx = Similarity.sqTopK(codes, "vec_id", vmin, vdiff, queryVec, n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = emb.select(col("vec_id"),
        graft.functions.vec_cosine(col("embedding"),
          graft.functions.lit_vec(queryVec)).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // deterministic bound: each dim off by <= half a quantization step
    val qn = {
      val q = queryVec.toArray
      val inv = 1.0 / math.sqrt(q.map(x => x.toDouble * x).sum)
      q.map(x => (x * inv).toFloat)
    }
    val bound = (0 until dim).map(i => math.abs(qn(i).toDouble) * vdiff(i) / 510.0).sum
    exact.foreach { case (id, s) =>
      val e = math.abs(approx(id) - s)
      assert(e <= bound + 1e-6, s"vec $id: |sq - exact| = $e > bound $bound")
    }
  }

  test("SQ8 rerank with a generous shortlist equals brute force exactly") {
    val sample = Similarity.sampleVectors(emb, "embedding")
    val (vmin, vdiff) = Similarity.trainSqFromSample(sample)
    val codes = Similarity.sqEncode(emb, "vec_id", "embedding", vmin, vdiff)
    val reranked = Similarity.sqTopKRerank(codes, "vec_id", vmin, vdiff,
      queryVec, emb, "vec_id", "embedding", k = 10, shortlist = 200)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.topK(emb, "vec_id", "embedding", queryVec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reranked == exact,
      s"generous-shortlist rerank must reproduce brute force:\n$reranked\nvs\n$exact")
  }

  test("SQ8: out-of-range values clamp (saturate) instead of wrapping") {
    import spark.implicits._
    // ranges trained on axis-aligned unit vectors; probe far outside
    val train = Array(Array(1f, 0f), Array(0f, 1f))
    val (vmin, vdiff) = Similarity.trainSqFromSample(train)
    val df = Seq((1L, Seq(-5f, 5f))).toDF("vec_id", "embedding")
    val code = Similarity.sqEncode(df, "vec_id", "embedding", vmin, vdiff)
      .head.getAs[Array[Byte]]("code")
    // normalized (-0.707, 0.707): dim 0 below vmin=0 -> clamps to 0;
    // dim 1 inside [0,1] quantizes normally
    assert((code(0) & 0xFF) == 0, s"expected saturation at 0, got ${code(0) & 0xFF}")
    assert((code(1) & 0xFF) > 0 && (code(1) & 0xFF) < 255)
  }

  test("SQ8 composes with IVF: keep carries the cell column through encode") {
    val cents = Similarity.trainCentroids(emb, "embedding", k = 4, iters = 2)
    val ivf = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
    val sample = Similarity.sampleVectors(emb, "embedding")
    val (vmin, vdiff) = Similarity.trainSqFromSample(sample)
    val idx = Similarity.sqEncode(ivf, "vec_id", "embedding", vmin, vdiff,
      keep = Seq("cell"))
    assert(idx.columns.toSeq == Seq("vec_id", "cell", "code"))
    assert(idx.count() == emb.count())
  }

  test("centroidDrift: identity, opposition, norms, zero centroid") {
    import spark.implicits._
    def df(vs: Seq[Array[Float]]) = vs.map(Tuple1(_)).toDF("v")
    val a = df(Seq(Array(1f, 0f), Array(0f, 1f)))
    val same = Similarity.centroidDrift(a, a, "v").collect()(0)
    assert(same.getLong(0) == 2L && same.getInt(2) == 2)
    assert(same.getDouble(3) == 1.0) // identical centroids
    // opposite centroids -> cosine -1
    val opp = Similarity.centroidDrift(
      df(Seq(Array(1f, 0f))), df(Seq(Array(-1f, 0f))), "v").collect()(0)
    assert(opp.getDouble(3) == -1.0)
    // mean norm: a single (3,4) vector has norm 5
    val nrm = Similarity.centroidDrift(
      df(Seq(Array(3f, 4f))), df(Seq(Array(0f, 2f))), "v").collect()(0)
    assert(nrm.getDouble(4) == 5.0 && nrm.getDouble(5) == 2.0)
    // live side cancels to the zero centroid -> null cosine
    val z = Similarity.centroidDrift(df(Seq(Array(1f, 0f))),
      df(Seq(Array(1f, 0f), Array(-1f, 0f))), "v").collect()(0)
    assert(z.isNullAt(3))
    // ragged dimensions fail loudly
    intercept[IllegalArgumentException] {
      Similarity.centroidDrift(df(Seq(Array(1f, 0f))),
        df(Seq(Array(1f, 0f, 0f))), "v").collect()
    }
  }

  test("clusterSilhouette: hand 2-D case, boundary point, one label") {
    import spark.implicits._
    // A = {(0,0),(0,2)} centroid (0,1); B = {(4,0),(4,2)} centroid
    // (4,1): every point has a = 1, b = sqrt(17), same silhouette
    val rows = Seq(("A", Array(0f, 0f)), ("A", Array(0f, 2f)),
      ("B", Array(4f, 0f)), ("B", Array(4f, 2f)))
    val out = Similarity.clusterSilhouette(rows.toDF("label", "v"),
      "v", "label").collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val s17 = math.sqrt(17.0)
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    out.foreach { r =>
      assert(r.getLong(1) == 2L)
      assert(r.getDouble(2) == 1.0) // mean a
      assert(math.abs(r.getDouble(3) - s17) < 1e-6)
      assert(math.abs(r.getDouble(4) - (s17 - 1.0) / s17) < 1e-6)
    }
    // a point sitting on the rival centroid scores negative
    val mixed = Seq(("A", Array(0f, 0f)), ("A", Array(8f, 0f)),
      ("B", Array(8.1f, 0f)), ("B", Array(7.9f, 0f)))
    val m = Similarity.clusterSilhouette(mixed.toDF("label", "v"),
      "v", "label").collect().map(r => r.getString(0) -> r.getDouble(4))
      .toMap
    assert(m("A") < 0 || m("A") < m("B")) // A straddles B's centroid
    assert(m("B") > 0.9) // B is tight and far from A's centroid
    // a single label is not scoreable
    intercept[IllegalArgumentException] {
      Similarity.clusterSilhouette(
        Seq(("A", Array(0f, 0f)), ("A", Array(1f, 0f))).toDF("label", "v"),
        "v", "label").collect()
    }
  }

  test("daviesBouldin: hand index, coincident centroids null out") {
    import spark.implicits._
    val rows = Seq(("A", Array(0f, 0f)), ("A", Array(0f, 2f)),
      ("B", Array(4f, 0f)), ("B", Array(4f, 2f)))
    val r = Similarity.daviesBouldin(rows.toDF("label", "v"),
      "v", "label").collect()(0)
    // S_A = S_B = 1, M = 4 -> DB = (1+1)/4 = 0.5
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5)
    // three clusters: each pairs with its worst rival
    val three = rows ++ Seq(("C", Array(0f, 100f)), ("C", Array(0f, 102f)))
    val r3 = Similarity.daviesBouldin(three.toDF("label", "v"),
      "v", "label").collect()(0)
    // A and B still pair at 0.5 each; remote C contributes
    // 2/dist(A,C) = 0.02 -> DB = (0.5 + 0.5 + 0.02)/3
    assert(r3.getLong(0) == 3L)
    assert(math.abs(r3.getDouble(2) - 1.02 / 3.0) < 1e-6)
    // coincident centroids -> null index, counts still reported
    val coin = Seq(("A", Array(0f, 0f)), ("A", Array(2f, 0f)),
      ("B", Array(1f, 1f)), ("B", Array(1f, -1f)))
    val rc = Similarity.daviesBouldin(coin.toDF("label", "v"),
      "v", "label").collect()(0)
    assert(rc.getLong(0) == 2L && rc.isNullAt(2))
  }

  test("dbscan: planted blobs, a border point, and noise") {
    import spark.implicits._
    // blob A: ids 1-5 packed at (0,0); blob B: ids 11-15 at (1,1);
    // id 20 within eps of A's edge but density-thin (border);
    // ids 30, 31 far away (noise)
    val a = (1 to 5).map(i => (i.toLong, 0.004 * i, 0.0))
    val b = (11 to 15).map(i => (i.toLong, 1.0 + 0.004 * (i - 10), 1.0))
    // id 20: within eps of ids 4 and 5 only -> 3 with self < minPts 4
    val rest = Seq((20L, 0.004 * 5 + 0.045, 0.0), (30L, 5.0, 5.0),
      (31L, -3.0, 2.0))
    val pts = (a ++ b ++ rest).toSeq.toDF("id", "x", "y")
    val out = Similarity.dbscan(pts, "id", "x", "y",
        eps = 0.05, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    (1 to 5).foreach(i => assert(out(i.toLong) == ("core", 1L)))
    (11 to 15).foreach(i => assert(out(i.toLong) == ("border", 1L) ||
      out(i.toLong) == ("core", 11L)))
    assert((11 to 15).forall(i => out(i.toLong)._1 == "core"))
    assert(out(20L)._1 == "border" && out(20L)._2 == 1L)
    assert(out(30L) == ("noise", -1L) && out(31L) == ("noise", -1L))
  }

  test("dbscan: minPts above any density marks everything noise") {
    import spark.implicits._
    val pts = (1 to 4).map(i => (i.toLong, 0.01 * i, 0.0)).toSeq
      .toDF("id", "x", "y")
    val out = Similarity.dbscan(pts, "id", "x", "y",
      eps = 0.05, minPts = 10).collect()
    assert(out.forall(r => r.getString(1) == "noise" && r.isNullAt(2)))
  }
}
