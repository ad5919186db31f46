package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** fastText-style supervised quality classifier: binary LOGISTIC
  * REGRESSION over hashed bag-of-words features (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"; the hashing trick
  * after Weinberger et al. 2009), trained by full-batch gradient
  * descent — the learned gate production curation stacks train on
  * "reference corpus vs crawl" labels (GPT-3's WebText classifier,
  * LLaMA's Wikipedia-reference classifier) next to the closed-form NB
  * of [[LangId]].
  *
  * Features: each token hashes to one of `numBuckets` slots
  * ([[graft.functions.WordBucketKernel]] — transparent poly-31, so an
  * external SQL oracle replays the whole training run); a document's
  * feature value is its in-doc term frequency L1-normalized by token
  * count (fastText's mean-of-embeddings normalization), plus a constant
  * bias feature on a reserved slot. The model is `numBuckets + 1`
  * doubles regardless of vocabulary.
  *
  * Training (per iteration): forward pass = one broadcast join of the
  * persisted feature frame against the current weights + a doc-keyed
  * aggregate for the logits; backward pass = residuals joined back to
  * the SAME doc-partitioned frame (co-partitioned — no extra shuffle)
  * + one bucket-keyed aggregate bounded by `numBuckets` AFTER map-side
  * partial aggregation. The only driver state is the weight vector
  * (`numBuckets`-bounded collect, the same bounded-model discipline as
  * Lloyd's in [[Similarity]]) and the update rule; weights round to
  * 6 dp HALF_UP each step so independent engines agree bit-for-bit.
  *
  * 100 TB shape: the feature frame is built once (map + one
  * (doc, bucket) aggregate), persisted partitioned by doc; each
  * iteration touches it twice with nothing larger than the model
  * crossing to the driver. Mini-batch = pass a sampled frame.
  */
object Classify {

  /** Reserved feature slot for the intercept: real buckets are
    * [0, numBuckets), so -1 never collides.
    */
  val BiasBucket: Int = -1

  /** Trained model: sparse weight map over feature slots (absent slot =
    * 0.0; [[BiasBucket]] holds the intercept), plus the per-iteration
    * mean log-loss trace (training health observable — must be
    * non-increasing on a separable-enough corpus).
    */
  final case class LrModel(weights: Map[Int, Double], numBuckets: Int,
      lossTrace: Seq[Double]) {
    def bias: Double = weights.getOrElse(BiasBucket, 0.0)
  }

  /** (doc_id, y, b, x) hashed-feature frame: x = tf_b / n_tokens for
    * real slots, plus the constant bias row (b = -1, x = 1) every doc
    * gets — zero-token docs carry only the bias row, so every doc is
    * scored. `y` is the 0/1 label as double (null labels rejected
    * in-plan via the cast contract).
    */
  private def featureFrame(docs: DataFrame, idCol: String, label: Column,
      textCol: String, numBuckets: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      label.cast("int").cast("double").as("y"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val feats = base
      .select(col("doc_id"), col("y"),
        size(col("__toks")).cast("double").as("n"),
        explode(col("__toks")).as("w"))
      .groupBy(col("doc_id"), col("y"), col("n"),
        graft.functions.word_bucket(col("w"), numBuckets).as("b"))
      .agg(count(lit(1)).cast("double").as("tf"))
      // tf/n as ONE division (not a sum of 1/n terms) — the exact FP
      // value any oracle computes from integer counts
      .select(col("doc_id"), col("y"), col("b"), (col("tf") / col("n")).as("x"))
    val biasRows = base.select(col("doc_id"), col("y"),
      lit(BiasBucket).as("b"), lit(1.0).as("x"))
    feats.unionByName(biasRows)
  }

  /** Round HALF_UP to 6 dp — the cross-engine weight discipline (SQL
    * `round()` is half-away-from-zero in DuckDB and Spark alike;
    * `math.rint` is half-even and would NOT match).
    */
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train by full-batch gradient descent: `w -= lr * X^T (p - y) / n`,
    * `iters` fixed iterations from w = 0. Deterministic: no sampling, no
    * shuffling sensitivity (all reductions are order-free after the 6 dp
    * rounding), reproducible across engines and partition counts.
    *
    * `numBuckets` bounds BOTH the model and the per-iteration collect;
    * it must fit comfortably on the driver (fastText defaults to 2M
    * slots ~ 16 MB — fine; the require guards absurd values).
    */
  def trainLogReg(docs: DataFrame, idCol: String, label: Column,
      textCol: String, numBuckets: Int = 1 << 18, iters: Int = 8,
      learningRate: Double = 2.0): LrModel = {
    // Rail math: the per-iteration collect is one (int, double, double)
    // row per LIVE bucket — ≤ numBuckets+1 rows, ~40 B each on the
    // driver. 2^22 ≈ 170 MB worst case: comfortable; 2^24 would be
    // ~670 MB per iteration and was too generous a rail. Users copying
    // fastText's 2M-bucket default fit either way; past 2^22, use
    // [[trainLogRegMiniBatch]] (smaller live-bucket sets per step) or
    // shrink the hash space.
    require(numBuckets > 0 && numBuckets <= (1 << 22),
      s"trainLogReg: numBuckets must be in (0, 2^22] (the model and the " +
        s"per-iteration gradient collect are driver-held; see " +
        s"trainLogRegMiniBatch for larger spaces), got $numBuckets")
    require(iters >= 1 && iters <= 1000,
      s"trainLogReg: iters must be in [1,1000], got $iters")
    require(learningRate > 0, "trainLogReg: learningRate must be positive")
    val spark = docs.sparkSession
    // one doc-partitioned persisted frame: the forward aggregate and the
    // backward residual join both reuse this partitioning — per
    // iteration the corpus never re-shuffles
    val feats = featureFrame(docs, idCol, label, textCol, numBuckets)
      .repartition(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded collect: ONE long (the denominator of the mean gradient)
      val nDocs = feats.filter(col("b") === BiasBucket).count()
      require(nDocs > 0, "trainLogReg: empty training corpus")
      var weights = Map.empty[Int, Double]
      val losses = Seq.newBuilder[Double]
      for (_ <- 1 to iters) {
        // log args clamped away from 0: a saturated sigmoid (p == 0.0 or
        // 1.0 in doubles) would put 0 * -Inf = NaN into the trace
        val resid = forward(feats, weights, spark)
          .select(col("doc_id"), (col("p") - col("y")).as("r"),
            (-(col("y") * log(greatest(col("p"), lit(1e-15))) +
              (lit(1.0) - col("y")) *
                log(greatest(lit(1.0) - col("p"), lit(1e-15))))).as("l"))
        // backward: co-partitioned doc join, then a bucket-keyed
        // aggregate whose output is numBuckets-bounded (partial agg
        // map-side); the loss rides the bias rows (exactly one per doc)
        // so one pass yields gradient AND trace.
        // Bounded collect: numBuckets + 1 rows (the model update).
        val rows = feats.join(resid, Seq("doc_id"))
          .groupBy(col("b"))
          .agg(sum(col("x") * col("r")).as("g"),
            sum(when(col("b") === BiasBucket, col("l"))).as("lsum"))
          .collect()
        losses += rows.collectFirst {
          case row if row.getInt(0) == BiasBucket => row.getDouble(2) / nDocs
        }.getOrElse(Double.NaN)
        weights = rows.map { row =>
          val b = row.getInt(0)
          val g = row.getDouble(1)
          b -> round6(weights.getOrElse(b, 0.0) - learningRate * g / nDocs)
        }.toMap
      }
      LrModel(weights, numBuckets, losses.result())
    } finally { feats.unpersist(); () }
  }

  /** Mini-batch variant of [[trainLogReg]]: each iteration descends on
    * a DETERMINISTIC hash-sampled subset of the corpus — iteration i's
    * batch is the docs whose seeded md5 score under `(seed, i)` falls
    * below `batchFraction` (the [[Sampling.seededScore]] device: no RNG
    * state, so the same batches reproduce across engines, retries, and
    * partition counts, and a new seed is a new batch schedule).
    *
    * Scale shape: identical to the full-batch path (the persisted
    * doc-partitioned feature frame is built once; the batch filter is a
    * map-side predicate on it), but each step's gradient aggregate and
    * collect only see ~`batchFraction` of the docs — the live-bucket
    * set per step shrinks accordingly, which is what makes larger hash
    * spaces workable. An empty batch (tiny corpus × small fraction)
    * applies no update and records a NaN loss for that step.
    */
  def trainLogRegMiniBatch(docs: DataFrame, idCol: String, label: Column,
      textCol: String, numBuckets: Int = 1 << 18, iters: Int = 8,
      learningRate: Double = 2.0, batchFraction: Double = 0.25,
      seed: Long = 0L): LrModel = {
    require(numBuckets > 0 && numBuckets <= (1 << 22),
      s"trainLogRegMiniBatch: numBuckets must be in (0, 2^22], got $numBuckets")
    require(iters >= 1 && iters <= 1000,
      s"trainLogRegMiniBatch: iters must be in [1,1000], got $iters")
    require(learningRate > 0, "trainLogRegMiniBatch: learningRate must be positive")
    require(batchFraction > 0 && batchFraction <= 1,
      s"trainLogRegMiniBatch: batchFraction must be in (0,1], got $batchFraction")
    val spark = docs.sparkSession
    val feats = featureFrame(docs, idCol, label, textCol, numBuckets)
      .repartition(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      require(!feats.isEmpty, "trainLogRegMiniBatch: empty training corpus")
      var weights = Map.empty[Int, Double]
      val losses = Seq.newBuilder[Double]
      for (i <- 1 to iters) {
        val batch = feats.filter(
          Sampling.seededScore(col("doc_id"), seed * 1000003L + i)
            < batchFraction)
        val resid = forward(batch, weights, spark)
          .select(col("doc_id"), (col("p") - col("y")).as("r"),
            (-(col("y") * log(greatest(col("p"), lit(1e-15))) +
              (lit(1.0) - col("y")) *
                log(greatest(lit(1.0) - col("p"), lit(1e-15))))).as("l"))
        // same one-pass gradient+trace aggregate as the full-batch path,
        // with the batch size riding the bias rows (one per batch doc)
        val rows = batch.join(resid, Seq("doc_id"))
          .groupBy(col("b"))
          .agg(sum(col("x") * col("r")).as("g"),
            sum(when(col("b") === BiasBucket, col("l"))).as("lsum"),
            sum(when(col("b") === BiasBucket, 1L)).as("nb"))
          .collect()
        val nb = rows.collectFirst {
          case row if row.getInt(0) == BiasBucket => row.getLong(3)
        }.getOrElse(0L)
        if (nb == 0) losses += Double.NaN // empty batch: skip the step
        else {
          losses += rows.collectFirst {
            case row if row.getInt(0) == BiasBucket => row.getDouble(2) / nb
          }.getOrElse(Double.NaN)
          weights = weights ++ rows.map { row =>
            val b = row.getInt(0)
            val g = row.getDouble(1)
            b -> round6(weights.getOrElse(b, 0.0) - learningRate * g / nb)
          }
        }
      }
      LrModel(weights, numBuckets, losses.result())
    } finally { feats.unpersist(); () }
  }

  /** Forward pass: per-doc logit + sigmoid against broadcast weights.
    * Input frame must carry (doc_id, y, b, x); weights ship as a
    * broadcast (b, wt) frame (absent slots read as 0 via the left
    * join), never as plan literals.
    */
  private def forward(feats: DataFrame, weights: Map[Int, Double],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val wdf = spark.createDataFrame(weights.toSeq).toDF("b", "wt")
    feats.join(broadcast(wdf), Seq("b"), "left")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("x") * coalesce(col("wt"), lit(0.0))).as("z"))
      .select(col("doc_id"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
  }

  /** Per-doc probability of the positive class under a trained model.
    * Output: (doc_id, prob) with prob rounded to `dp` decimals (the
    * engine-parity surface; raw doubles differ in final ulps across
    * reduction orders). One broadcast join + one doc-keyed aggregate.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
      model: LrModel, dp: Int = 4): DataFrame =
    forward(featureFrame(docs, idCol, lit(0), textCol, model.numBuckets),
      model.weights, docs.sparkSession)
      .select(col("doc_id"), round(col("p"), dp).as("prob"))

  /** Hard 0/1 prediction at the 0.5 threshold (the raw probability
    * decides — thresholding before rounding).
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: LrModel, dp: Int = 4): DataFrame =
    forward(featureFrame(docs, idCol, lit(0), textCol, model.numBuckets),
      model.weights, docs.sparkSession)
      .select(col("doc_id"), round(col("p"), dp).as("prob"),
        (col("p") >= 0.5).cast("int").as("pred"))

  /** 2x2 confusion counts over a labeled corpus — the quality-gate
    * evaluation artifact (pure counts: no floats cross an engine
    * boundary).
    */
  def confusion(docs: DataFrame, idCol: String, label: Column,
      textCol: String, model: LrModel): DataFrame =
    classify(docs, idCol, textCol, model)
      .join(docs.select(col(idCol).as("doc_id"),
        label.cast("int").as("y")), Seq("doc_id"))
      .groupBy(col("y"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("y"), col("pred"))

  /** Multinomial naive Bayes with Laplace (+1) smoothing, trained and
    * scored wholly in-plan — the bag-of-words baseline classifier
    * (McCallum & Nigam 1998) beside [[trainLogReg]]'s hashed
    * discriminative face. Per class c and test doc d:
    *
    *   score(c,d) = ln P(c) + Σ_{t∈d} tf_d(t)·ln(tf_c(t)+1)
    *                − N_d·ln(tot_c + V)
    *
    * — the smoothed `Σ tf_d ln((tf_c+1)/(tot_c+V))` regrouped so
    * unseen terms contribute ln(1) = 0 and drop from the join: no
    * dense vocab×class grid is ever materialized. Prediction is the
    * argmax over classes on the 6-dp score, ties to the smaller label
    * (deterministic, engine-replayable). Returns one row per test doc:
    * (doc_id, pred, score).
    *
    * 100 TB shape: model = one (class, term) aggregation; scoring = a
    * term-keyed join of the test doc-term frame against the model
    * (output ≤ test tokens × classes), one (doc, class) fold with
    * DECIMAL(38,12)-quantized log terms, a broadcast class-constants
    * frame, and a doc-keyed window bounded by the class count. Class
    * cardinality must be bounded (it is a CLASSIFIER); vocab need not.
    */
  def naiveBayes(train: DataFrame, test: DataFrame, labelCol: String,
      textCol: String, idCol: String): DataFrame = {
    def d12(c: org.apache.spark.sql.Column) = c.cast("decimal(38,12)")
    val trDocs = train
      .select(col(labelCol).cast("string").as("lab"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(col("lab").isNotNull)
    val trTok = trDocs
      .select(col("lab"), explode(col("__tk")).as("term"))
    val model = trTok.groupBy(col("lab"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = true) // (class × term); two consumers
    val vFrame = model.agg(countDistinct(col("term")).as("__v"))
    val perLab = trDocs.groupBy(col("lab"))
      .agg(count(lit(1)).as("__ndocs"))
      .join(model.groupBy(col("lab"))
        .agg(sum(col("tf")).as("__tot")), Seq("lab"), "left")
      .na.fill(0L, Seq("__tot"))
    val totDocs = trDocs.agg(count(lit(1)).as("__nall"))
    val labConsts = perLab.crossJoin(vFrame).crossJoin(totDocs)
      .select(col("lab"),
        log(col("__ndocs").cast("double") / col("__nall").cast("double"))
          .as("__prior"),
        log((col("__tot") + col("__v")).cast("double")).as("__den"))
    // null test ids would collapse into one pseudo-document at the
    // doc_id grain — exclude them, mirroring the train-side label filter
    val teDocs = test
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(col("doc_id").isNotNull)
    val docLen = teDocs.select(col("doc_id"),
      when(col("__tk").isNull, lit(0))
        .otherwise(size(col("__tk"))).cast("double").as("__nd"))
    val dt = teDocs
      .select(col("doc_id"), explode(col("__tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("__tfd"))
    val partial = dt.join(model, Seq("term"))
      .select(col("doc_id"), col("lab"),
        d12(col("__tfd").cast("double") *
          log(col("tf").cast("double") + lit(1.0))).as("__t"))
      .groupBy(col("doc_id"), col("lab"))
      .agg(sum(col("__t")).as("__s"))
    val scored = docLen.crossJoin(broadcast(labConsts))
      .join(partial, Seq("doc_id", "lab"), "left")
      .withColumn("score",
        round((col("__prior") +
          coalesce(col("__s").cast("double"), lit(0.0))) -
          col("__nd") * col("__den"), 6))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lab")) // class-count-bounded
    scored
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("lab").as("pred"), col("score"))
      .orderBy(col("doc_id"))
  }
}
