package graft.ops

import graft.functions.{lit_vec, vec_cosine, vec_dot}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import scala.util.Random

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force top-k is the exact baseline: a map-only cosine pass + Spark's
  * TakeOrderedAndProject (per-partition heap top-k, merge of k*partitions
  * rows on the driver — no global sort, no shuffle of the data). That is
  * already the right 100 TB plan for one-off queries.
  *
  * The scale path for repeated queries is IVF: partition vectors into
  * Voronoi cells around trained centroids (index build = one map pass +
  * optional repartition by cell), then probe only `nprobe` cells per query
  * — the standard inverted-file ANN design (Jegou et al., "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011), including
  * the PQ-compressed variant ([[trainPq]]/[[pqEncode]]/[[pqTopK]] — the
  * paper's IVFADC): residuals quantize to m bytes per vector and probes
  * score codes only, via a per-query lookup table.
  */
object Similarity {

  /** Exact brute-force top-k by cosine. Deterministic tie-break on id. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame =
    emb.select(col(idCol),
        round(vec_cosine(col(vecCol), lit_vec(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** PCA-compressed cosine prefilter + exact rerank: rank the corpus by
    * cosine in the k-dim PCA space ([[Projection.pcaProject]] — a
    * codegen'd map), keep a `shortlist`, then score ONLY the shortlist
    * against the full-width query. The dimensionality-reduction face of
    * the ANN family (next to IVF's partition pruning and PQ's byte
    * codes): the full-width scan drops to shortlist size, the prefilter
    * reads k floats per row instead of d. `shortlist = corpus size`
    * reproduces [[topK]] exactly (the rerank is exact); smaller
    * shortlists trade recall, which the PCA spectrum (energy captured
    * by k components) governs — measure with the q53-style in-plan
    * recall bound. The query compresses through the SAME kernel
    * ([[Projection.projectOne]]) so driver and executors agree
    * bit-for-bit.
    */
  def pcaTopK(emb: DataFrame, idCol: String, vecCol: String,
      m: Projection.PcaModel, query: Seq[Float], k: Int,
      shortlist: Int): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need shortlist >= k >= 1")
    val qp = Projection.projectOne(m, query)
    val short = emb.select(col(idCol), col(vecCol),
        round(vec_cosine(Projection.pcaProject(col(vecCol), m),
          lit_vec(qp)), 6).as("__ps"))
      .orderBy(desc("__ps"), col(idCol))
      .limit(shortlist)
    short.select(col(idCol),
        round(vec_cosine(col(vecCol), lit_vec(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Random-hyperplane sign signature packed into a long (LSH for cosine,
    * Charikar 2002). Planes come from a fixed seed so signatures are
    * reproducible across runs/executors; they are generated inside the
    * expression (memoized per JVM), keeping the plan tree small.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column =
    graft.functions.hyperplane_sig(vec, dim, bits, seed)

  /** Train IVF centroids with Lloyd's iterations on a driver-side sample.
    * Sampling keeps the training cost independent of table size (at 100 TB
    * you train on <<1% and still converge); assignment stays distributed.
    */
  def trainCentroids(emb: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, sampleSize: Int = 10000, seed: Long = 42L): Array[Array[Float]] =
    trainCentroidsFromSample(
      sampleVectors(emb, vecCol, sampleSize, seed), k, iters, seed)

  /** One driver-side sample pass, reusable across trainers: an index
    * build that needs BOTH the coarse quantizer and the PQ codebooks
    * should sample once and call [[trainCentroidsFromSample]] +
    * [[trainPqFromSample]] — at 100 TB each avoided resample is a full
    * table scan.
    */
  def sampleVectors(emb: DataFrame, vecCol: String,
      sampleSize: Int = 10000, seed: Long = 42L,
      knownCount: Option[Long] = None): Array[Array[Float]] = {
    knownCount match {
      case Some(n) =>
        // caller knows the row count (e.g. from table stats): Bernoulli
        // sample at the derived fraction — one scan, no sort state
        val fraction = math.min(1.0, sampleSize.toDouble / math.max(1L, n))
        emb.select(col(vecCol))
          .sample(withReplacement = false, fraction, seed)
          .limit(sampleSize)
          .collect()
          .map(_.getSeq[Float](0).toArray)
      case None =>
        // no count available: take the sampleSize smallest seeded hashes —
        // ONE scan (TakeOrdered keeps a sampleSize-heap per partition, the
        // driver merges partitions*sampleSize rows), a uniform pseudo-random
        // draw, and DETERMINISTIC per dataset (stable centroids across
        // runs). The old fraction path paid a full count() scan first —
        // a pointless extra pass at 100 TB.
        emb.select(col(vecCol))
          .orderBy(xxhash64(col(vecCol), lit(seed)))
          .limit(sampleSize)
          .collect()
          .map(_.getSeq[Float](0).toArray)
    }
  }

  /** [[trainCentroids]] over an already-collected sample. */
  def trainCentroidsFromSample(sample: Array[Array[Float]], k: Int,
      iters: Int = 5, seed: Long = 42L): Array[Array[Float]] = {
    require(sample.nonEmpty, "cannot train centroids on an empty table")

    val rnd = new Random(seed)
    var centroids = rnd.shuffle(sample.toVector).take(k).map(_.clone()).toArray
    val dim = sample.head.length

    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0; var bestSim = Double.MinValue
    var c = 0
    while (c < cs.length) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < v.length) {
        dot += v(i).toDouble * cs(c)(i); na += v(i).toDouble * v(i)
        nb += cs(c)(i).toDouble * cs(c)(i); i += 1
      }
      val sim = if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Fully distributed Lloyd's iterations: assignment is the map-only
    * argmax against broadcast centroids; the update step computes per-cell
    * per-dimension sums via posexplode + one hash shuffle, collecting only
    * k*dim aggregate rows to the driver per iteration. Use this over
    * [[trainCentroids]] when the sample wouldn't be representative (heavy
    * cluster imbalance) — cost is `iters` extra passes over the data.
    */
  def trainCentroidsDistributed(emb: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, seed: Long = 42L): Array[Array[Float]] = {
    // deterministic init: k distinct vectors chosen by seeded hash order
    var centroids: Array[Array[Float]] = emb
      .select(col(vecCol).as("vec"))
      .orderBy(xxhash64(col("vec"), lit(seed)))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.nonEmpty, "cannot train centroids on an empty table")
    val dim = centroids.head.length

    for (_ <- 0 until iters) {
      val sims = array(centroids.map(c => vec_cosine(col(vecCol), lit_vec(c.toSeq))): _*)
      val assigned = emb.select(col(vecCol).as("vec"),
        (array_position(sims, array_max(sims)) - 1).cast("int").as("cell"))
      // one buffer row per cell via the native vec_sum aggregate — k rows
      // reach the driver, independent of data size and dimension count
      val stats = assigned
        .groupBy(col("cell"))
        .agg(graft.functions.vec_sum(col("vec")).as("s"), count(lit(1)).as("n"))
        .collect()
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      stats.foreach { r =>
        val c = r.getInt(0)
        val s = r.getSeq[Double](1)
        var i = 0
        while (i < dim) { sums(c)(i) = s(i); i += 1 }
        counts(c) = r.getLong(2)
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
    }
    centroids
  }

  /** Build the IVF index: every vector tagged with its nearest centroid
    * (map-only — centroids are inlined literals). Persist/bucket the result
    * by `cell` for repeated querying.
    */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val sims = array(centroids.map(c => vec_cosine(col(vecCol), lit_vec(c.toSeq))): _*)
    emb.select(col(idCol), col(vecCol),
      (array_position(sims, array_max(sims)) - 1).cast("int").as("cell"))
  }

  /** Batch k-NN join: top-k neighbors in `emb` for EVERY query row (not
    * one vector). Bucketed by LSH band so each query only meets its
    * bucket's candidates, then per-query top-k via window — the scalable
    * form of "ANN join" (a cross join + per-row sort would be quadratic).
    * Exactness: candidates are limited to hyperplane-bucket collisions;
    * raise `bits`/`bands` for recall like any LSH index.
    */
  /** ids-only LSH banding for the k-NN join family (candidate volume is
    * quadratic in bucket size — payloads must not ride it; vectors
    * re-attach per UNIQUE candidate pair before scoring). The signature
    * materializes ONCE per row before the band slice — referencing the
    * sig expression inside each band column would recompute the dim*bits
    * dot products `bands` times.
    */
  private def bandedIds(df: DataFrame, id: String, vec: String, idOut: String,
      dim: Int, bits: Int, bands: Int, seed: Long): DataFrame = {
    val rowsPer = bits / bands
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val withSig = df.repartition(parallelism)
      .select(col(id).as(idOut),
        graft.functions.hyperplane_sig(col(vec), dim, bits, seed).as("sig"))
    val bandCols = (0 until bands).map(b =>
      shiftright(col("sig"), b * rowsPer).bitwiseAND(lit((1L << rowsPer) - 1)))
    withSig.select(col(idOut), posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
  }

  def knnJoin(queries: DataFrame, qId: String, qVec: String,
      emb: DataFrame, eId: String, eVec: String,
      k: Int, dim: Int, bits: Int = 48, bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    val candidates = bandedIds(queries, qId, qVec, "qid", dim, bits, bands, seed)
      .join(bandedIds(emb, eId, eVec, "eid", dim, bits, bands, seed),
        Seq("band", "bkey"))
      .filter(col("qid") =!= col("eid"))
      .select(col("qid"), col("eid"))
      .dropDuplicates("qid", "eid")
    val qv = queries.select(col(qId).as("qid"), col(qVec).as("qvec"))
    val ev = emb.select(col(eId).as("eid"), col(eVec).as("evec"))
    val scored = candidates.join(qv, "qid").join(ev, "eid")
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("eid"), col("sim"))
  }

  /** Batch k-NN join via the IVF index — the cell-join alternative to
    * [[knnJoin]]'s LSH banding: every query row probes its `nprobe`
    * nearest cells (map-only ranking against broadcast centroid
    * literals), equi-joins the cell-partitioned index on the cell key,
    * exact cosine within candidates, per-query top-k via window.
    *
    * 100 TB shape: with the index persisted/bucketed by `cell`
    * ([[writeIndex]]) the join co-locates on the index's layout — only
    * the (small) query side shuffles — and candidate volume is the sum
    * of probed cell sizes, never |queries| x |emb|. Recall is the IVF
    * tradeoff: raise `nprobe` like any inverted-file index.
    */
  def ivfKnnJoin(queries: DataFrame, qId: String, qVec: String,
      index: DataFrame, eId: String, eVec: String,
      centroids: Array[Array[Float]], k: Int, nprobe: Int = 2): DataFrame = {
    require(nprobe <= centroids.length, "nprobe cannot exceed cell count")
    val sims = array(centroids.map(c => vec_cosine(col(qVec), lit_vec(c.toSeq))): _*)
    // rank cells per query in-plan: sort (negated sim, cell) structs —
    // no UDF, the whole assignment stays codegen'd
    val ranked = array_sort(zip_with(sims,
      sequence(lit(0), lit(centroids.length - 1)),
      (s, i) => struct((-s).as("negs"), i.as("cell"))))
    val probes = slice(transform(ranked, x => x.getField("cell")), 1, nprobe)
    val qp = queries.select(col(qId).as("qid"), col(qVec).as("qvec"),
      explode(probes).as("cell"))
    val cand = qp.join(
        index.select(col(eId).as("eid"), col(eVec).as("evec"), col("cell")),
        Seq("cell"))
      .filter(col("qid") =!= col("eid"))
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("eid"), col("sim"))
  }

  /** Batch k-NN join over the PQ-CODE index (IVFADC for the "embed the
    * corpus, find every row's neighbors" workload): each query row
    * computes its m*codes ADC lookup table IN-PLAN (`pq_lut`, ~8 KB at
    * m=8) and probes its `nprobe` nearest cells; candidates come from a
    * cell equi-join against the code index and are scored from codes
    * alone (`pq_adc_lut` — the scan reads m bytes per candidate instead
    * of dim*4 raw floats, 32x less at dim=64/m=8). The per-query ADC
    * shortlist then fetches raw vectors for an exact cosine rerank to
    * top-k — only shortlist*|queries| raw rows are ever read.
    *
    * 100 TB shape: with the code index persisted by `cell`
    * ([[writeIndex]]) only the query side (ids + LUTs) shuffles into the
    * join; the LUT column is projected away before the per-query window,
    * so the top-k shuffle moves (qid, eid, cell, sim_adc) rows only. If
    * `raw` carries a `cell` column (the [[ivfIndex]] output), the rerank
    * fetch joins on (cell, eid) and co-locates with the same persisted
    * layout.
    *
    * PASS A STORED (persisted or pinned) CODE INDEX, not the lazy
    * [[pqEncode]] pipeline: whole-stage codegen defers a streamed-side
    * projection into the hash join's match loop, so an inline-built
    * `code` column re-runs the encode kernel once per CANDIDATE row
    * (jstack-verified; ~matches x m x codes x dsub ops) instead of once
    * per index row. The persisted lifecycle (build once -> [[writeIndex]]
    * -> join many) never hits this; for an ad-hoc in-memory build,
    * `localCheckpoint` the encode output first.
    */
  def pqKnnJoin(queries: DataFrame, qId: String, qVec: String,
      codeIndex: DataFrame, eId: String,
      raw: DataFrame, rawIdCol: String, rawVecCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      k: Int, nprobe: Int = 2, shortlist: Int = 50): DataFrame = {
    require(nprobe <= centroids.length, "nprobe cannot exceed cell count")
    val dim = centroids.head.length
    val m = codebooks.length
    val codes = codebooks.head.length
    val booksFlat = flatten2(codebooks.map(flatten2))
    // rank cells per query in-plan (the ivfKnnJoin device), keeping each
    // probe's centroid dot — vec_cosine(q, c) == <q̂, ĉ>, the ADC cell term
    val sims = array(centroids.map(c => vec_cosine(col(qVec), lit_vec(c.toSeq))): _*)
    val ranked = array_sort(zip_with(sims,
      sequence(lit(0), lit(centroids.length - 1)),
      (s, i) => struct((-s).as("negs"), i.as("cell"))))
    val probes = slice(ranked, 1, nprobe)
    val qp = queries
      .select(col(qId).as("qid"),
        graft.functions.pq_lut(col(qVec), booksFlat, dim, m, codes).as("lut"),
        explode(probes).as("p"))
      .select(col("qid"), col("lut"), col("p.cell").as("cell"),
        (-col("p.negs")).as("celldot"))
    val cand = qp
      .join(codeIndex.select(col(eId).as("eid"), col("code"), col("cell")),
        Seq("cell"))
      .filter(col("qid") =!= col("eid"))
      // project the LUT away here: the window shuffle below must move
      // (qid, cell, eid, sim_adc) rows, not 8 KB tables
      .select(col("qid"), col("cell"), col("eid"),
        round(col("celldot") +
          graft.functions.pq_adc_lut(col("code"), col("lut"), codes), 6)
          .as("sim_adc"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim_adc").desc, col("eid"))
    val sl = cand.withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= shortlist)
      .select(col("qid"), col("eid"), col("cell"))
    // exact rerank: raw vectors only for the shortlist
    val hasCell = raw.columns.contains("cell")
    val ev =
      if (hasCell) raw.select(col(rawIdCol).as("eid"),
        col(rawVecCol).as("evec"), col("cell"))
      else raw.select(col(rawIdCol).as("eid"), col(rawVecCol).as("evec"))
    val fetched =
      if (hasCell) sl.join(ev, Seq("cell", "eid")) else sl.join(ev, Seq("eid"))
    val qv = queries.select(col(qId).as("qid"), col(qVec).as("qvec"))
    val rer = fetched.join(qv, Seq("qid"))
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    rer.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("eid"), col("sim"))
  }

  /** Persist the IVF index partitioned BY CELL: repeated queries then
    * read only the probed cells — [[ivfTopK]]'s `cell IN (probes)` filter
    * becomes a partition filter, pruned at file-listing time, so each
    * query scans nprobe/k of the data no matter the corpus size. This is
    * the index lifecycle for the repeated-query workload (build once,
    * probe many).
    */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incrementally ADD an encoded batch to a persisted cell-partitioned
    * index (raw [[ivfIndex]] rows, [[pqEncode]] codes, or [[sqEncode]]
    * output carrying a `cell` column) — the ANN face of the
    * index-maintenance lifecycle (`Invert.mergePostings` is the sparse
    * one): an append-mode partitioned write lands new files inside the
    * existing `cell=` directories, probes prune identically, and no
    * existing data is rewritten. The coarse quantizer is FROZEN at
    * build time — encode new batches with the ORIGINAL centroids (the
    * standard IVF lifecycle; mixing quantizers corrupts cell geometry),
    * retrain + [[writeIndex]] rebuild only when drift accumulates.
    * Add-only: ids are assumed new; replacing changed vectors is a
    * compaction rewrite — at 100 TB you compact periodically, not per
    * batch.
    */
  def appendIndex(encoded: DataFrame, path: String): Unit =
    encoded.write.mode("append").partitionBy("cell").parquet(path)

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Exact k-NN join for a BOUNDED query side: every query row scored
    * against every candidate (nested-loop over the broadcast-able query
    * set), per-query top-k via window. O(|queries| * |emb|) by
    * construction — this is the oracle anchor for [[knnJoin]]'s LSH path,
    * linear in |emb| only while the query side stays fixed-size (same
    * device as the q45/q51 bounds).
    */
  def knnJoinExact(queries: DataFrame, qId: String, qVec: String,
      emb: DataFrame, eId: String, eVec: String, k: Int): DataFrame = {
    val a = queries.select(col(qId).as("qid"), col(qVec).as("qvec"))
    val b = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .select(col(eId).as("eid"), col(eVec).as("evec"))
    val scored = b.join(broadcast(a), col("qid") =!= col("eid"))
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("eid"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most-similar corpus vectors with a DIFFERENT
    * label — the "looks alike but isn't" examples a retrieval/embedding
    * trainer wants next to each positive. Exact form: queries broadcast
    * against the corpus (the [[knnJoinExact]] shape plus the label-
    * mismatch predicate), ties broken (sim desc, eid asc) on the
    * 6-dp-rounded similarity so ordering is engine-reproducible.
    *
    * Scale path: swap the exact scan for [[knnJoin]]'s LSH candidates
    * with the same label filter applied — candidates are label-filtered
    * AFTER bucketing, so the index stays label-agnostic and one index
    * serves every label split.
    */
  def hardNegatives(queries: DataFrame, qId: String, qVec: String,
      qLabel: String, corpus: DataFrame, cId: String, cVec: String,
      cLabel: String, k: Int): DataFrame = {
    val a = queries.select(col(qId).as("qid"), col(qVec).as("qvec"),
      col(qLabel).as("qlabel"))
    val b = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(cId).as("eid"), col(cVec).as("evec"),
        col(cLabel).as("neg_label"))
    // the label-mismatch predicate alone excludes the true self-pair (a
    // row's label always equals itself); no id-equality clause, so query
    // and corpus ids may come from independent key spaces
    val scored = b.join(broadcast(a), col("qlabel") =!= col("neg_label"))
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("eid"), col("sim"), col("neg_label"))
  }

  /** The 100 TB form of [[hardNegatives]]: candidates come from the LSH
    * band join ([[knnJoin]]'s device — ids only, bucket-bounded volume),
    * labels attach per unique candidate pair, and the mismatch filter
    * runs AFTER bucketing — the index stays label-agnostic, so one
    * banding serves every label split. Same output contract as the exact
    * form: per query, top-k most-similar different-label candidates
    * (sim desc, eid asc on the 6-dp-rounded cosine). Recall is the LSH
    * tradeoff — raise `bits`/`bands` like any signature index.
    */
  def hardNegativesLsh(queries: DataFrame, qId: String, qVec: String,
      qLabel: String, corpus: DataFrame, cId: String, cVec: String,
      cLabel: String, k: Int, dim: Int, bits: Int = 48, bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    val candidates = bandedIds(queries, qId, qVec, "qid", dim, bits, bands, seed)
      .join(bandedIds(corpus, cId, cVec, "eid", dim, bits, bands, seed),
        Seq("band", "bkey"))
      .select(col("qid"), col("eid"))
      .dropDuplicates("qid", "eid")
    val a = queries.select(col(qId).as("qid"), col(qVec).as("qvec"),
      col(qLabel).as("qlabel"))
    val b = corpus.select(col(cId).as("eid"), col(cVec).as("evec"),
      col(cLabel).as("neg_label"))
    val scored = candidates.join(a, "qid").join(b, "eid")
      // label mismatch alone excludes the true self-pair (a row's label
      // equals itself) — ids may come from independent key spaces
      .filter(col("qlabel") =!= col("neg_label"))
      .withColumn("sim", round(vec_cosine(col("qvec"), col("evec")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("eid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("eid"), col("sim"), col("neg_label"))
  }

  /** Query the IVF index: probe the nprobe nearest cells, exact cosine
    * inside them. Cell pruning happens in the scan filter, so a
    * cell-partitioned index only reads nprobe/k of the data.
    */
  def ivfTopK(index: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], query: Seq[Float], k: Int,
      nprobe: Int = 2): DataFrame = {
    val q = query.map(_.toDouble).toArray
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < q.length) {
        dot += q(j) * c(j); na += q(j) * q(j); nb += c(j).toDouble * c(j); j += 1
      }
      (if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb)), i)
    }.sortBy(-_._1).take(nprobe).map(_._2)

    index.filter(col("cell").isin(probes.toSeq: _*))
      .select(col(idCol), round(vec_cosine(col(vecCol), lit_vec(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  // -------------------------------------------------------------------
  // IVF-PQ: product-quantized codes over cell residuals (Jegou et al.
  // 2011, the "IVFADC" variant). The memory/scan story for 100 TB
  // embedding corpora: the probe-time scan reads m bytes per vector
  // instead of dim*4 (32x smaller at dim=64/m=8), and ADC scores codes
  // without ever touching raw vectors. Build once (train -> encode ->
  // writeIndex partitioned by cell), probe many.
  // -------------------------------------------------------------------

  private def normalized(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    Array.tabulate(v.length)(j => (v(j) * inv).toFloat)
  }

  private def flatten2(a: Array[Array[Float]]): Array[Float] = {
    val out = new Array[Float](a.length * a.head.length)
    var i = 0
    while (i < a.length) {
      System.arraycopy(a(i), 0, out, i * a.head.length, a(i).length); i += 1
    }
    out
  }

  /** Train the PQ codebooks on cell residuals: unit-normalize, subtract
    * the (normalized) nearest cell centroid, then run Lloyd's per
    * subspace (L2, `codes` entries). One shared codebook set serves all
    * cells (the standard IVFADC layout). Driver-side sample like
    * [[trainCentroids]] — training cost is corpus-size independent.
    * Returns m x codes x (dim/m).
    */
  def trainPq(emb: DataFrame, vecCol: String, centroids: Array[Array[Float]],
      m: Int, codes: Int = 256, iters: Int = 10, sampleSize: Int = 10000,
      seed: Long = 42L): Array[Array[Array[Float]]] =
    trainPqFromSample(sampleVectors(emb, vecCol, sampleSize, seed),
      centroids, m, codes, iters, seed)

  /** [[trainPq]] over an already-collected sample — pair with
    * [[sampleVectors]]/[[trainCentroidsFromSample]] so one sampling scan
    * feeds the whole index build.
    */
  def trainPqFromSample(sample: Array[Array[Float]],
      centroids: Array[Array[Float]], m: Int, codes: Int = 256,
      iters: Int = 10, seed: Long = 42L): Array[Array[Array[Float]]] = {
    val dim = centroids.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(codes <= 256, "codes must fit one byte per subspace")
    val dsub = dim / m
    require(sample.nonEmpty, "cannot train PQ on an empty table")
    val ncents = centroids.map(normalized)
    val residuals = sample.map { v =>
      val u = normalized(v)
      val cell = nearestCentroid(u, ncents)
      Array.tabulate(dim)(i => u(i) - ncents(cell)(i))
    }
    val rnd = new Random(seed)
    Array.tabulate(m) { j =>
      val subs = residuals.map(r => java.util.Arrays.copyOfRange(r, j * dsub, (j + 1) * dsub))
      var book = rnd.shuffle(subs.toVector).take(codes).map(_.clone()).toArray
      if (book.length < codes) // tiny samples: pad by repeating entries
        book = Array.tabulate(codes)(c => book(c % book.length).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(codes)(new Array[Double](dsub))
        val counts = new Array[Long](codes)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < codes) {
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = s(t) - book(c)(t); d += diff.toDouble * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += s(t); t += 1 }
        }
        book = book.indices.map { c =>
          if (counts(c) == 0) book(c)
          else Array.tabulate(dsub)(t => (sums(c)(t) / counts(c)).toFloat)
        }.toArray
      }
      book
    }
  }

  /** Encode the corpus into the IVF-PQ index: (id, cell, m-byte code).
    * Map-only — assignment + residual quantization run in one codegen'd
    * pass against broadcast constants. Persist with [[writeIndex]] (the
    * frame carries the same `cell` column) so probes prune at
    * file-listing time.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val dim = centroids.head.length
    val m = codebooks.length
    val codes = codebooks.head.length
    val centsFlat = flatten2(centroids.map(normalized))
    val booksFlat = flatten2(codebooks.map(flatten2))
    ivfIndex(emb, idCol, vecCol, centroids)
      .select(col(idCol), col("cell"),
        graft.functions.pq_code(col(vecCol), col("cell"),
          centsFlat, dim, booksFlat, m, codes).as("code"))
  }

  /** Query the IVF-PQ index with asymmetric-distance scoring: the query
    * builds its m x codes lookup table of subspace dot products ONCE on
    * the driver; each indexed row's cosine estimate is then
    * cellDot[cell] + sum of m table lookups — no raw vectors read, so a
    * cell-partitioned code index scans m bytes per candidate. Returns
    * (id, sim_adc) top-k by the ADC estimate.
    */
  /** Per-query ADC preparation: probed cells, the m x codes lookup table
    * of subspace dot products, and the per-cell centroid dots.
    */
  private def adcTables(centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], query: Seq[Float],
      nprobe: Int): (Seq[Int], Array[Float], Array[Float]) = {
    val dim = centroids.head.length
    val m = codebooks.length
    val codes = codebooks.head.length
    val dsub = dim / m
    val qn = normalized(query.toArray)
    val ncents = centroids.map(normalized)
    val cellDot = Array.tabulate(ncents.length) { c =>
      var d = 0.0; var i = 0
      while (i < dim) { d += qn(i).toDouble * ncents(c)(i); i += 1 }
      d.toFloat
    }
    val probes = cellDot.zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2).toSeq
    val lut = new Array[Float](m * codes)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codes) {
        var d = 0.0; var t = 0
        while (t < dsub) { d += qn(j * dsub + t).toDouble * codebooks(j)(c)(t); t += 1 }
        lut(j * codes + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    (probes, lut, cellDot)
  }

  def pqTopK(index: DataFrame, idCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      query: Seq[Float], k: Int, nprobe: Int = 2): DataFrame = {
    val codes = codebooks.head.length
    val (probes, lut, cellDot) = adcTables(centroids, codebooks, query, nprobe)
    index.filter(col("cell").isin(probes: _*))
      .select(col(idCol),
        round(graft.functions.pq_adc(col("code"), col("cell"), lut, codes, cellDot), 6)
          .as("sim_adc"))
      .orderBy(desc("sim_adc"), col(idCol))
      .limit(k)
  }

  /** IVFADC with reranking (Jegou et al. §VII, FAISS's IVFPQR shape):
    * the ADC pass shortlists `shortlist` candidates from codes alone,
    * then ONLY those rows fetch their raw vectors for an exact cosine
    * rerank to top-k. This is the correct lifecycle when candidates are
    * tightly clustered — quantized scores tie inside a near-dup cluster,
    * and the exact rerank restores the true order while still scanning
    * m-byte codes for the bulk of the corpus.
    *
    * `raw` is the (id, vec) table; pass the cell-partitioned
    * [[ivfIndex]] output (it carries a `cell` column) and the rerank
    * fetch prunes to the probed cells at file-listing time — the
    * shortlist itself rides a broadcast, so the raw side never shuffles.
    */
  def pqTopKRerank(index: DataFrame, idCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      query: Seq[Float], raw: DataFrame, rawIdCol: String, vecCol: String,
      k: Int, shortlist: Int = 200, nprobe: Int = 2): DataFrame = {
    val (probes, _, _) = adcTables(centroids, codebooks, query, nprobe)
    val sl = pqTopK(index, idCol, centroids, codebooks, query, shortlist, nprobe)
      .select(col(idCol))
    val fetch0 = raw.select(col(rawIdCol).as(idCol), col(vecCol),
      (if (raw.columns.contains("cell")) col("cell") else lit(null)).as("__cell"))
    val fetch =
      if (raw.columns.contains("cell")) fetch0.filter(col("__cell").isin(probes: _*))
      else fetch0
    fetch.join(broadcast(sl), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(vec_cosine(col(vecCol), lit_vec(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------- SQ8 —

  /** Train SQ8 per-dimension ranges from a sample (pair with
    * [[sampleVectors]] so one sampling scan feeds every trainer): the
    * min and width of each NORMALIZED dimension. Returns (vmin, vdiff).
    * Out-of-sample values clamp at encode time — bounded decode error,
    * so a rerank-topped query is still exact-ordered; train on wider
    * samples (or the full table) to shrink clamp incidence.
    */
  def trainSqFromSample(sample: Array[Array[Float]]): (Array[Float], Array[Float]) = {
    require(sample.nonEmpty, "cannot train SQ on an empty sample")
    val dim = sample.head.length
    val vmin = Array.fill(dim)(Float.MaxValue)
    val vmax = Array.fill(dim)(Float.MinValue)
    sample.foreach { v =>
      val u = normalized(v)
      var i = 0
      while (i < dim) {
        if (u(i) < vmin(i)) vmin(i) = u(i)
        if (u(i) > vmax(i)) vmax(i) = u(i)
        i += 1
      }
    }
    (vmin, Array.tabulate(dim)(i => vmax(i) - vmin(i)))
  }

  /** Encode the corpus into the SQ8 index: (id [, keep...], code) with
    * dim BYTES per vector — 4x smaller than float32. Map-only (one
    * codegen'd affine pass against broadcast constants); `keep` carries
    * extra columns through (pass "cell" from [[ivfIndex]] output to get
    * an IVF-SQ index whose probes prune at file-listing time via
    * [[writeIndex]], exactly like the PQ path).
    */
  def sqEncode(emb: DataFrame, idCol: String, vecCol: String,
      vmin: Array[Float], vdiff: Array[Float],
      keep: Seq[String] = Nil): DataFrame =
    emb.select(col(idCol) +: keep.map(col) :+
      graft.functions.sq_code(col(vecCol), vmin, vdiff).as("code"): _*)

  /** Per-query SQ scoring constants: w_i = q̂_i * vdiff_i / 255 and
    * c0 = <q̂, vmin>.
    */
  private def sqQuery(vmin: Array[Float], vdiff: Array[Float],
      query: Seq[Float]): (Array[Float], Double) = {
    val qn = normalized(query.toArray)
    val w = Array.tabulate(qn.length)(i => qn(i) * vdiff(i) / 255.0f)
    var c0 = 0.0
    var i = 0
    while (i < qn.length) { c0 += qn(i).toDouble * vmin(i); i += 1 }
    (w, c0)
  }

  /** Top-k by the SQ8 asymmetric estimate: one codes-only scan (dim
    * bytes per row) + TakeOrdered — the same ideal exch=0 shape as
    * [[topK]] at a quarter of the bytes. Returns (id, sim_sq).
    */
  def sqTopK(index: DataFrame, idCol: String,
      vmin: Array[Float], vdiff: Array[Float],
      query: Seq[Float], k: Int): DataFrame = {
    val (w, c0) = sqQuery(vmin, vdiff, query)
    index.select(col(idCol),
        round(graft.functions.sq_adc(col("code"), w, c0), 6).as("sim_sq"))
      .orderBy(desc("sim_sq"), col(idCol))
      .limit(k)
  }

  /** SQ8 shortlist + exact rerank (the [[pqTopKRerank]] lifecycle): the
    * byte-code scan shortlists, only the shortlist fetches raw vectors
    * (broadcast semi-join — the raw side never shuffles) for the exact
    * cosine top-k.
    */
  /** Embedding-space drift between a REFERENCE and a LIVE corpus: the
    * cosine between the two CENTROIDS plus each side's mean vector
    * norm — the [[graft.ops.Profile.distributionDrift]] of the
    * embedding world (an upstream encoder change, a domain shift, or
    * a silent normalization bug all move one of these before any
    * downstream metric notices). Returns one row (n_ref, n_live, dim,
    * centroid_cosine, mean_norm_ref, mean_norm_live), 6 dp; a
    * zero centroid on either side yields null cosine.
    *
    * 100 TB shape: ONE per-side pass for counts + norm means (the
    * norm is a per-row left-fold over the vector — map-only), ONE
    * posexploded dimension-keyed aggregation for both centroids
    * (dim-sized frame after it), one dim-frame product aggregate.
    * Every cross-row sum quantizes to DECIMAL(38,12) (float inputs
    * widen to double exactly; order-free).
    */
  def centroidDrift(ref: DataFrame, live: DataFrame,
      vecCol: String): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def d12(c: Column) = c.cast("decimal(38,12)")
    def side(df: DataFrame, tag: String) = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(lit(tag).as("__s"), col(vecCol).as("__v"))
    val both = side(ref, "a").unionAll(side(live, "b"))
      .localCheckpoint(true) // consumers: per-side stats + the centroid pass
    val normCol = sqrt(aggregate(col("__v"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val stats = both
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n"), sum(d12(normCol)).as("snorm"),
        min(size(col("__v"))).as("dmin"), max(size(col("__v"))).as("dmax"))
      .collect().map(r => r.getString(0) -> r).toMap
    require(stats.contains("a") && stats.contains("b"),
      "centroidDrift: both sides must be non-empty")
    val (ra, rb) = (stats("a"), stats("b"))
    val na = ra.getLong(1)
    val nb = rb.getLong(1)
    val dim = ra.getInt(4) // dmax
    require(ra.getInt(3) == dim && rb.getInt(3) == dim &&
      rb.getInt(4) == dim, "centroidDrift: ragged vector dimensions")
    val meanNormA = ra.getDecimal(2).doubleValue() / na.toDouble
    val meanNormB = rb.getDecimal(2).doubleValue() / nb.toDouble
    val dims = both
      .select(col("__s"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__p"))
      .agg(sum(when(col("__s") === "a", d12(col("__x").cast("double"))))
          .as("__sa"),
        sum(when(col("__s") === "b", d12(col("__x").cast("double"))))
          .as("__sb"))
      .withColumn("__ma", col("__sa").cast("double") / lit(na.toDouble))
      .withColumn("__mb", col("__sb").cast("double") / lit(nb.toDouble))
      .agg(sum(d12(col("__ma") * col("__mb"))).as("sab"),
        sum(d12(col("__ma") * col("__ma"))).as("saa"),
        sum(d12(col("__mb") * col("__mb"))).as("sbb"))
      .head()
    val sab = dims.getDecimal(0).doubleValue()
    val saa = dims.getDecimal(1).doubleValue()
    val sbb = dims.getDecimal(2).doubleValue()
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val cos =
      if (saa > 0 && sbb > 0)
        Some(r6(sab / (math.sqrt(saa) * math.sqrt(sbb))))
      else None
    Seq((na, nb, dim, cos, r6(meanNormA), r6(meanNormB)))
      .toDF("n_ref", "n_live", "dim", "centroid_cosine",
        "mean_norm_ref", "mean_norm_live")
  }

  def sqTopKRerank(index: DataFrame, idCol: String,
      vmin: Array[Float], vdiff: Array[Float],
      query: Seq[Float], raw: DataFrame, rawIdCol: String, vecCol: String,
      k: Int, shortlist: Int = 200): DataFrame = {
    val sl = sqTopK(index, idCol, vmin, vdiff, query, shortlist)
      .select(col(idCol))
    raw.select(col(rawIdCol).as(idCol), col(vecCol))
      .join(broadcast(sl), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(vec_cosine(col(vecCol), lit_vec(query)), 6).as("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Per-label mean vectors off ONE dimension-keyed decimal
    * aggregation: returns (sorted labels, per-label counts, centroids
    * as Array[Double]) — the shared machinery of [[clusterSilhouette]]
    * and [[daviesBouldin]]. Labels × dims is the collect bound (k ≤
    * 4096 enforced); ragged vectors fail loudly. */
  private def labelCentroids(emb: DataFrame, vecCol: String,
      labelCol: String)
      : (Array[String], Map[String, Long], Map[String, Array[Double]],
        DataFrame) = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val pts = emb
      .filter(col(labelCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) > 0)
      .select(col(labelCol).cast("string").as("__l"),
        col(vecCol).as("__v"))
      .localCheckpoint(true) // consumers: stats + centroid pass +
        // the caller's distance pass
    val stats = pts.groupBy(col("__l"))
      .agg(count(lit(1)).as("n"), min(size(col("__v"))).as("dmin"),
        max(size(col("__v"))).as("dmax"))
      .collect()
    require(stats.nonEmpty, "labelCentroids: empty input")
    require(stats.length >= 2,
      s"labelCentroids: need >= 2 labels, got ${stats.length}")
    require(stats.length <= 4096,
      s"labelCentroids: ${stats.length} labels exceed the 4096 bound")
    val dim = stats.head.getInt(2)
    require(stats.forall(r => r.getInt(2) == dim && r.getInt(3) == dim),
      "labelCentroids: ragged vector dimensions")
    val counts = stats.map(r => r.getString(0) -> r.getLong(1)).toMap
    val sums = pts
      .select(col("__l"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__l"), col("__p"))
      .agg(sum(d12(col("__x").cast("double"))).as("__s"))
      .collect() // k x d rows — bounded by the 4096-label gate
    val cents = sums.groupBy(_.getString(0)).map { case (l, rows) =>
      val c = new Array[Double](dim)
      rows.foreach(r => c(r.getInt(1)) =
        r.getDecimal(2).doubleValue() / counts(l).toDouble)
      l -> c
    }
    (counts.keys.toArray.sorted, counts, cents, pts)
  }

  /** Per-point distances to every label centroid as ONE map-side
    * expression block (no join, no shuffle): column `__d_i` = euclidean
    * distance to sorted-label i's centroid, squared-difference terms
    * summed as a SEQUENTIAL double fold in array order — the exact op
    * sequence DuckDB's `list_reduce` replays (a 0-seeded fold equals a
    * first-element-seeded fold bitwise because 0.0 + t = t for the
    * non-negative squares), so every distance double is engine-
    * replayable without decimal quantization. */
  private def centroidDistCols(labels: Array[String],
      cents: Map[String, Array[Double]]): Seq[Column] = {
    labels.toSeq.map { l =>
      val terms = zip_with(col("__v"), typedlit(cents(l).toSeq),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c))
      sqrt(aggregate(terms, lit(0.0), (acc, t) => acc + t))
    }
  }

  /** Simplified silhouette of a LABELED embedding table (Rousseeuw
    * 1987; the centroid form of Hruschka et al. 2004 — a(i)/b(i) are
    * distances to centroids, not mean pairwise distances, which is the
    * only formulation that is linear rather than quadratic in N): per
    * point, a = distance to its own label's centroid, b = the nearest
    * OTHER label's centroid, s = (b−a)/max(a,b) (0 when both are 0).
    * THE per-cluster quality readout for any labeled/clustered
    * embedding set — "are these labels geometrically real" — scoring
    * each label by its mean silhouette: ≈1 compact and far from the
    * rest, ≈0 on the boundary, <0 overlapping another cluster.
    *
    * Returns one row per label (label, n, mean_dist_own,
    * mean_dist_other, silhouette), 6 dp, ordered by label; per-point
    * a/b/s quantize to DECIMAL(38,12) before the group means.
    *
    * 100 TB shape: one dimension-keyed aggregation builds the k
    * centroids (k·d driver bound, k ≤ 4096); distances ride a single
    * MAP-SIDE expression block over the pinned points (no join, no
    * N×k×d shuffle — the k centroid literals broadcast in the plan),
    * then ONE label-keyed aggregate. Linear in N·k·d compute, one
    * shuffle of k rows.
    */
  def clusterSilhouette(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val (labels, _, cents, pts) = labelCentroids(emb, vecCol, labelCol)
    val dcols = centroidDistCols(labels, cents)
    val withD = pts.select(col("__l") +:
      dcols.zipWithIndex.map { case (c, i) => c.as(s"__d_$i") }: _*)
    val own = labels.indices.foldLeft(lit(null).cast("double")) {
      (acc, i) => when(col("__l") === labels(i), col(s"__d_$i"))
        .otherwise(acc)
    }
    val otherCands = labels.indices.map(i =>
      when(col("__l") =!= labels(i), col(s"__d_$i")))
    val other = least(otherCands: _*)
    val s = when(greatest(own, other) > 0,
      (other - own) / greatest(own, other)).otherwise(lit(0.0))
    withD
      .select(col("__l").as("label"), d12(own).as("__a"),
        d12(other).as("__b"), d12(s).as("__s"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__a")).cast("double") / count(lit(1)), 6)
          .as("mean_dist_own"),
        round(sum(col("__b")).cast("double") / count(lit(1)), 6)
          .as("mean_dist_other"),
        round(sum(col("__s")).cast("double") / count(lit(1)), 6)
          .as("silhouette"))
      .orderBy(col("label"))
  }

  /** Davies-Bouldin index (Davies & Bouldin 1979) of a labeled
    * embedding table — the one-number companion to
    * [[clusterSilhouette]] (lower = better separated):
    *
    *   DB = (1/k) Σᵢ maxⱼ≠ᵢ (Sᵢ + Sⱼ) / Mᵢⱼ
    *
    * with Sᵢ = mean distance of label i's points to its centroid and
    * Mᵢⱼ = centroid-to-centroid distance. Returns one row
    * (k, n, db_index), 6 dp; coincident centroids (Mᵢⱼ = 0) make the
    * pair's ratio infinite — reported as null db_index rather than a
    * number (the labels are not a partition worth scoring).
    *
    * 100 TB shape: the same two passes as [[clusterSilhouette]] (one
    * k·d centroid aggregation, one map-side distance pass into a
    * k-row aggregate); the k×k ratio matrix is driver algebra with
    * every cross-term DECIMAL(38,12)-quantized (replayable).
    */
  def daviesBouldin(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    def d12(c: Column) = c.cast("decimal(38,12)")
    val (labels, counts, cents, pts) =
      labelCentroids(emb, vecCol, labelCol)
    val dcols = centroidDistCols(labels, cents)
    val withD = pts.select(col("__l") +:
      dcols.zipWithIndex.map { case (c, i) => c.as(s"__d_$i") }: _*)
    val own = labels.indices.foldLeft(lit(null).cast("double")) {
      (acc, i) => when(col("__l") === labels(i), col(s"__d_$i"))
        .otherwise(acc)
    }
    val sRows = withD.select(col("__l"), d12(own).as("__a"))
      .groupBy(col("__l"))
      .agg(sum(col("__a")).as("__sa"), count(lit(1)).as("__n"))
      .collect()
    val sI = sRows.map(r => r.getString(0) ->
      r.getDecimal(1).doubleValue() / r.getLong(2).toDouble).toMap
    val k = labels.length
    // M_ij with per-dim terms quantized exactly like the point
    // distances (java BigDecimal HALF_UP at scale 12 = the engines'
    // DECIMAL(38,12) cast), so the oracle replays every double
    def q12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    def mDist(a: String, b: String): Double = {
      var acc = java.math.BigDecimal.ZERO
      val (ca, cb) = (cents(a), cents(b))
      var p = 0
      while (p < ca.length) {
        val d = ca(p) - cb(p)
        acc = acc.add(q12(d * d))
        p += 1
      }
      math.sqrt(acc.doubleValue())
    }
    var degenerate = false
    var accSum = java.math.BigDecimal.ZERO
    for (i <- 0 until k if !degenerate) {
      var best = Double.NegativeInfinity
      for (j <- 0 until k if j != i) {
        val m = mDist(labels(i), labels(j))
        if (m == 0.0) degenerate = true
        else {
          val r = (sI(labels(i)) + sI(labels(j))) / m
          if (r > best) best = r
        }
      }
      if (!degenerate) accSum = accSum.add(q12(best))
    }
    val n = counts.values.sum
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    val db =
      if (degenerate) None
      else Some(r6(accSum.doubleValue() / k.toDouble))
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((k.toLong, n, db)).toDF("k", "n", "db_index")
  }

  /** Grid-bucketed DBSCAN (Ester et al. 1996) over 2-D points: density
    * clustering without a k — core points (≥ minPts neighbors within
    * eps, self included), components over the core-core ε-graph,
    * border points adopted by their minimum-id core neighbor, the rest
    * noise. Ties and the classic order-dependence are resolved
    * deterministically (min-id everywhere), stated rather than hidden.
    * Returns (id, role ∈ core|border|noise, cluster) with cluster =
    * the component's minimum core id (null for noise), ordered by id.
    *
    * 100 TB shape: the ε-neighbor search is the GRID join — each point
    * probes only its 3×3 cell neighborhood (cell = floor(coord/eps)),
    * so candidate pairs are local-density-bounded, never all-pairs;
    * core flags are one pair-count aggregate; the component pass is
    * [[graft.ops.Dedup.connectedComponents]]'s pointer-jumping
    * label propagation (O(log diameter) rounds). A pathological eps
    * (≫ data spread) degrades to all-pairs — size eps to the density
    * question being asked.
    *
    * Input contract: ids must be castable to long — a non-numeric id
    * fails loudly (never a silent drop); rows whose id, x or y IS NULL
    * carry no point and are excluded (no output row).
    */
  def dbscan(points: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double, minPts: Int): DataFrame = {
    require(eps > 0, "dbscan: eps must be positive")
    require(minPts >= 1, "dbscan: minPts must be >= 1")
    val spark = points.sparkSession
    import spark.implicits._
    val idL = col(idCol).cast("long")
    val pts = points
      .select(
        when(col(idCol).isNotNull && idL.isNull,
          raise_error(concat(lit("dbscan: id not castable to long: "),
            col(idCol).cast("string"))).cast("long"))
          .otherwise(idL).as("id"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .filter(col("id").isNotNull && col("x").isNotNull &&
        col("y").isNotNull)
      .withColumn("cx", floor(col("x") / lit(eps)).cast("long"))
      .withColumn("cy", floor(col("y") / lit(eps)).cast("long"))
      .localCheckpoint(eager = true) // probes + build side + readout
    val offsets = (for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy")))
    val probes = pts
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        explode(array(offsets: _*)).as("__o"),
        col("cx"), col("cy"))
      .select(col("ida"), col("xa"), col("ya"),
        (col("cx") + col("__o.dx")).as("cx"),
        (col("cy") + col("__o.dy")).as("cy"))
    val eps2 = eps * eps
    val pairs = probes
      .join(pts.select(col("id").as("idb"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(eps2))
      .select(col("ida"), col("idb"))
      .localCheckpoint(eager = true) // neighbor counts + edges + border
    val degrees = pairs.groupBy(col("ida")).agg(count(lit(1)).as("deg"))
    val core = degrees.filter(col("deg") >= minPts)
      .select(col("ida").as("id"))
      .localCheckpoint(eager = true) // edge endpoints + border adopt
    val coreEdges = pairs
      .join(core.select(col("id").as("ida")), Seq("ida"))
      .join(core.select(col("id").as("idb")), Seq("idb"))
      .filter(col("ida") < col("idb"))
    val comps = graft.ops.Dedup.connectedComponents(coreEdges,
      "ida", "idb")
      .select(col("id"), col("cluster_id").as("comp"))
    // isolated core points (no core neighbor) form their own cluster
    val coreLab = core.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"))
      .localCheckpoint(eager = true) // border adopt + readout
    val border = pairs
      .join(core.select(col("id").as("idb"), lit(1).as("__bc")),
        Seq("idb"))
      .join(core.select(col("id").as("ida"), lit(1).as("__ac")),
        Seq("ida"), "left")
      .filter(col("__ac").isNull) // a is not core, b is
      .groupBy(col("ida").as("id"))
      .agg(min(col("idb")).as("__adopt")) // min-id core neighbor
      .join(coreLab.select(col("id").as("__adopt"),
        col("cluster")), Seq("__adopt"))
      .select(col("id"), col("cluster"))
    pts.select(col("id"))
      .join(coreLab.select(col("id"), col("cluster").as("__cc")),
        Seq("id"), "left")
      .join(border.select(col("id"), col("cluster").as("__bc2")),
        Seq("id"), "left")
      .select(col("id"),
        when(col("__cc").isNotNull, lit("core"))
          .when(col("__bc2").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__cc"), col("__bc2")).as("cluster"))
      .orderBy(col("id"))
  }
}
