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
}
