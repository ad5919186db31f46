package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Everything here is
  * hash-ordered, not RNG-ordered: the sample is a pure function of the
  * data, so re-runs, retries, and different cluster sizes produce the
  * SAME sample (the property that matters for reproducible dataset
  * builds; `DataFrame.sample` gives none of it).
  */
object Sampling {

  /** A stable [0,1) score from an id column (md5-based — engine-agnostic,
    * so an external system can reproduce the sample).
    */
  def hashScore(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / math.pow(2, 32)

  /** Keep ~fraction of rows, deterministically (score < fraction). */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashScore(col(idCol)) < fraction)

  /** Deterministic named splits (train/val/test): each row lands in the
    * split whose cumulative-weight interval contains its id hash. Pure
    * function of the id — identical across engines, runs, retries, and
    * cluster sizes, and map-only (zero shuffle at any scale). The
    * comparison runs on the md5 HEX PREFIX against precomputed hex
    * bounds, so an external system (or the DuckDB oracle) reproduces
    * assignments with nothing but `md5(id)`: split k gets
    * [floor(cum_{k-1} * 2^32), floor(cum_k * 2^32)) of the first 8 hex
    * chars.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val hex = substring(md5(col(idCol).cast("string").cast("binary")), 1, 8)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => f"${math.floor(c * 4294967296.0).toLong.min(0xFFFFFFFFL)}%08x")
    val chain = splits.init.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), bound)) =>
        val cond = hex < lit(bound)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    val assigned = chain.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn(splitCol, assigned)
  }

  /** LEAKAGE-SAFE split: [[hashSplit]] keyed by near-duplicate CLUSTER
    * instead of by document, so two near-identical documents can never
    * land on opposite sides of a train/eval boundary (the train-test
    * contamination mode document-level splitting cannot prevent — Lee
    * et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better" measure exactly this leak). `pairs` is any near-dup pair
    * frame (MinHash-LSH, SimHash, embedding-LSH — the [[Dedup]]
    * surface); the group key is the connected-component label for
    * clustered docs and the doc's own id otherwise, and the md5 split
    * runs on that key. Costs: the component propagation is pair-sized
    * (never corpus-sized) + one broadcast-or-shuffle join of the labels
    * onto the corpus; the split itself stays map-only.
    *
    * Output: the input rows + (group_key, splitCol). Deterministic and
    * engine-reproducible: labels are min-id per component, the split is
    * the q56 md5 rule on the group key.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val labels = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id"), col("cluster_id"))
    val keyed = docs
      .join(labels, docs(idCol) === labels("id"), "left")
      .withColumn("group_key",
        coalesce(col("cluster_id"), docs(idCol).cast("long")))
      .drop("id", "cluster_id")
    hashSplit(keyed, "group_key", splits, splitCol)
  }

  /** Stratified top-k: per stratum, the k rows with the smallest hash
    * score (ties broken by id). One shuffle on the stratum keys; balanced
    * output regardless of stratum skew — the standard way to cap a
    * dominant source/language in a corpus.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement, deterministic: the
    * Efraimidis-Spirakis exponential-key scheme (Inf. Proc. Letters
    * 2006) — each row draws key = u^(1/w) with u its stable md5
    * uniform, and the k largest keys ARE a weighted
    * without-replacement sample (a row's inclusion probability is
    * proportional to its weight among the remaining rows at every
    * draw). Hash-derived u keeps the established reproducibility
    * contract: the same rows win on any engine, cluster size, or
    * retry, and the DuckDB oracle replays the selection with nothing
    * but md5/pow.
    *
    * Rows with weight <= 0 or null are excluded (they'd never be
    * drawn). Plan shape: map-only key computation + a global top-k
    * (TakeOrdered — per-partition heaps then a k-row merge, no full
    * sort, no shuffle of the corpus at any scale).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, keyCol: String = "sample_key"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val key = pow(hashScore(col(idCol)),
      lit(1.0) / col(weightCol).cast("double"))
    // NaN > 0 is TRUE under Spark's ordering and NaN keys sort above
    // every real key under desc — filter them with the other undrawables
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn(keyCol, round(key, 9))
      .orderBy(col(keyCol).desc, col(idCol))
      .limit(k)
  }

  /** A stable [0,1) score from an id AND a seed — [[hashScore]] with an
    * epoch/run discriminator, so each (seed) draws an independent but
    * reproducible permutation.
    */
  def seededScore(id: Column, seed: Long): Column =
    hashScore(concat(id.cast("string"), lit(":"), lit(seed.toString)))

  /** Deterministic training order: global rank under the seeded md5
    * score — the 100 TB form of "shuffle the corpus before training"
    * (no RNG state, identical across engines/retries/cluster sizes,
    * new seed = new permutation). Returns the input with a
    * `train_order` rank column.
    *
    * 100 TB shape: the rank is the distributed prefix-sum device of
    * [[graft.ops.Curation.packSequential]] — range partition by the
    * score, partition-local ranks, per-partition counts collected
    * (one row per partition) and rebroadcast as offsets. NOT a global
    * `Window.orderBy`, which funnels the corpus through one partition.
    */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    val score = seededScore(col(idCol), seed)
    // localCheckpoint pins the sampled range boundaries: the offsets
    // job and the output job must agree on partition membership (see
    // packSequential for the full argument)
    val parts = df
      .withColumn("__score", score)
      .repartitionByRange(col("__score"), col(idCol))
      .sortWithinPartitions(col("__score"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = counts.map { r =>
      val here = running
      running += r.getLong(1)
      (r.getInt(0), here)
    }
    val session = df.sparkSession
    import session.implicits._
    val offsetsDf = broadcast(offsetRows.toSeq.toDF("__pid", "__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__score"), col(idCol))
    parts
      .join(offsetsDf, Seq("__pid"))
      .withColumn("train_order",
        row_number().over(w).cast("long") - 1 + col("__offset"))
      .drop("__pid", "__offset", "__score")
  }

  /** MATERIALIZE a domain mixture: emit each doc `floor(epochs_d)`
    * times, plus one more with probability `frac(epochs_d)` decided by
    * the doc's own seeded score — the apply side of
    * [[temperatureMixture]] ("epochs 2.3" → every doc twice, and the
    * reproducible 30% of docs a third time). Output carries the epoch
    * index (`copy`), so downstream shuffling/packing can interleave.
    * Map-only per doc (posexplode of a bounded repeat array — epochs
    * are small by construction; require'd <= 64 as a sanity rail).
    */
  def applyMixture(docs: DataFrame, idCol: String, domainCol: String,
      epochsPerDomain: DataFrame, epochsDomainCol: String,
      epochsCol: String, seed: Long = 0L): DataFrame = {
    val e = epochsPerDomain.select(
      col(epochsDomainCol).as("__dom"), col(epochsCol).as("__epochs"))
    val joined = docs.join(broadcast(e), col(domainCol) === col("__dom"))
    val full = floor(col("__epochs")).cast("int")
    val frac = col("__epochs") - floor(col("__epochs"))
    val copies = full +
      when(seededScore(col(idCol), seed) < frac, 1).otherwise(0)
    joined
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      // sanity rail: a runaway epoch count would explode the corpus
      .withColumn("__copies",
        when(col("__copies") > 64,
          raise_error(concat(lit("applyMixture: epochs > 64 for "),
            col(domainCol))))
          .otherwise(col("__copies")))
      .select(docs.columns.map(col) :+
        posexplode(array_repeat(lit(1), col("__copies")))
          .as(Seq("copy", "__one")): _*)
      .drop("__one")
  }

  /** Temperature-scaled domain mixture — the standard multilingual /
    * multi-source sampling rule (weight_d ∝ n_d^τ; τ=1 is proportional,
    * τ→0 is uniform; τ≈0.7 is the published multilingual convention, cf.
    * Conneau & Lample 2019): given per-domain token counts, compute each
    * domain's sampling weight and, for a token budget, how many epochs of
    * the domain that draw implies (epochs > 1 = upsampled domain).
    *
    * Input is the per-domain aggregate (domain, n_tokens) — domains
    * number in the dozens, so everything here is a tiny frame; the one
    * corpus-sized pass is the caller's token-count aggregation. The
    * normalizer rides a broadcast, keeping the whole thing in-plan.
    */
  def temperatureMixture(perDomain: DataFrame, domainCol: String,
      tokenCol: String, tau: Double, tokenBudget: Long): DataFrame = {
    val z = perDomain.agg(sum(pow(col(tokenCol), tau)).as("__z"))
    perDomain.crossJoin(broadcast(z))
      // all-empty corpus: every weight is 0, not 0/0 = NaN
      .withColumn("weight",
        when(col("__z") === 0, lit(0.0))
          .otherwise(round(pow(col(tokenCol), tau) / col("__z"), 6)))
      // an empty domain draws nothing: 0 weight, 0 epochs (not 0/0 = NaN)
      .withColumn("epochs",
        when(col(tokenCol) === 0, lit(0.0)).otherwise(
          round(lit(tokenBudget.toDouble) * pow(col(tokenCol), tau) / col("__z") /
            col(tokenCol), 6)))
      .drop("__z")
  }
}
