package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language identification / learned quality classification via a
  * hashed char-n-gram MULTINOMIAL NAIVE BAYES — the closed-form
  * learned classifier that gates every production curation stack
  * before the heuristic rules ([[TextAnalysis.c4Stats]], Gopher)
  * run: C4/CCNet put a fastText-class langid model first, and NB over
  * hashed char n-grams is the same feature family (Cavnar & Trenkle
  * 1994; Joulin et al. 2016) with training that is PURE AGGREGATION —
  * no SGD, no iteration, fully deterministic, so both the model and
  * every score are re-derivable by an external SQL oracle.
  *
  * Training = one `groupBy(label, bucket).count` over exploded
  * [[graft.functions.CharNgramKernel]] buckets (one shuffle, partial
  * aggregation does the heavy lifting map-side) + a label-count frame
  * for priors. The model is DENSE over the bucket space — `L x B`
  * rows with Laplace-smoothed `ln((c+1)/(t_l+B))` — so scoring never
  * needs an outer join: absent grams are already priced in.
  *
  * Scoring = docs' gram tf frame equi-joined to the BROADCAST dense
  * model on bucket, then one `groupBy(doc, label)` sum. Two shuffles
  * end-to-end at any corpus size; the model is `L x B` rows
  * (5 labels x 4096 buckets = 20k) — broadcast territory up to
  * `L x B ~ 10M`.
  *
  * 100 TB shape: train touches each doc once (map) + one
  * bucket-keyed shuffle bounded by `L x B` AFTER partial
  * aggregation; score is map + broadcast-join + one doc-keyed
  * shuffle. Nothing quadratic, nothing driver-side.
  */
object LangId {

  /** Trained model: `labels` = (label, log_prior) — L rows;
    * `likelihoods` = (label, b, logp) DENSE over all `numBuckets`
    * buckets. Both are plans over the training frame (persist via
    * parquet for reuse across jobs).
    */
  final case class NbModel(labels: DataFrame, likelihoods: DataFrame,
      n: Int, numBuckets: Int)

  /** Hashed char-n-gram buckets of lowercased text — one per gram
    * START (multiplicity preserved; multinomial NB counts instances).
    */
  private def grams(text: org.apache.spark.sql.Column, n: Int, numBuckets: Int) =
    graft.functions.char_ngram_buckets(lower(text), n, numBuckets)

  /** Closed-form NB training: per-(label, bucket) gram counts with
    * Laplace smoothing. Labels whose docs are ALL shorter than n code
    * points still get a prior and the uniform smoothed likelihood.
    */
  def train(docs: DataFrame, labelCol: String, textCol: String,
      n: Int = 3, numBuckets: Int = 4096): NbModel = {
    val g = docs.select(col(labelCol).as("label"),
      explode(grams(col(textCol), n, numBuckets)).as("b"))
    val counts = g.groupBy(col("label"), col("b"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("label")).agg(sum(col("c")).as("t"))
    val nDocs = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val totalDocs = nDocs.agg(sum(col("n_docs")).as("total"))
    val labels = nDocs.crossJoin(broadcast(totalDocs))
      .select(col("label"),
        log(col("n_docs").cast("double") / col("total")).as("log_prior"))
    // dense L x B grid: every (label, bucket) priced, absent counts -> +1
    val dense = nDocs.join(totals, Seq("label"), "left")
      .select(col("label"), coalesce(col("t"), lit(0L)).as("t"))
      .withColumn("b", explode(sequence(lit(0), lit(numBuckets - 1))))
      .join(counts, Seq("label", "b"), "left")
      .select(col("label"), col("b"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("t") + lit(numBuckets.toLong))).as("logp"))
    NbModel(labels, dense, n, numBuckets)
  }

  /** Per-(doc, label) log-posterior scores:
    * `log_prior_l + sum_grams tf * ln((c_lb+1)/(t_l+B))`. Docs with
    * fewer than n code points carry no n-gram evidence and are
    * DROPPED (standard langid behavior — nothing to classify on).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
      explode(grams(col(textCol), model.n, model.numBuckets)).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("tf"))
    tf.join(broadcast(model.likelihoods), Seq("b"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * col("logp")).as("ll"))
      .join(broadcast(model.labels), Seq("label"))
      .select(col("doc_id"), col("label"),
        (col("ll") + col("log_prior")).as("score"))
  }

  /** Argmax label per doc (ties break to the lexicographically
    * smallest label — deterministic). Output: (doc_id, pred_label,
    * score).
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame =
    scores(docs, idCol, textCol, model)
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("label"))).as("m"))
      .select(col("doc_id"), col("m.label").as("pred_label"),
        (-col("m.ns")).as("score"))

  /** Label x predicted-label confusion counts over a labeled corpus —
    * the standard self-evaluation artifact of a langid gate.
    */
  def confusion(docs: DataFrame, idCol: String, labelCol: String,
      textCol: String, model: NbModel): DataFrame =
    classify(docs, idCol, textCol, model)
      .join(docs.select(col(idCol).as("doc_id"), col(labelCol).as("label")),
        Seq("doc_id"))
      .groupBy(col("label"), col("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("label"), col("pred_label"))
}
