package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Offline retrieval-evaluation metrics — the measurement side of the
  * retrieval/ANN operators (q50/q53/q91/q103/q111 produce rankings;
  * this scores them). Standard IR metrics per query, macro-ready:
  * recall@k, MRR@k, nDCG@k (binary relevance), from a scored
  * (query, candidate, score, rel) pair frame.
  *
  * Everything is windows + one grouped aggregate over the pair frame —
  * rows never leave the executors and the only shuffle is the per-query
  * hash partition, so scoring 10^6 queries x k candidates is one pass.
  * The ideal-DCG denominator is a k-row broadcast lookup (closed form
  * over the position index), not a per-row HOF, keeping the whole plan
  * inside whole-stage codegen.
  */
object Eval {

  /** Per-query metrics from scored pairs.
    *
    * @param pairs one row per (query, candidate) with a numeric score
    *              (higher = better) and a 0/1 relevance column
    * @param k     cutoff for recall@k / MRR@k / nDCG@k
    * @return one row per query: (qid, n_rel, recall_at_k, mrr_at_k,
    *         ndcg_at_k); queries with zero relevant candidates score 0
    *         on all three (not null), so macro averages are stable
    */
  def rankingMetrics(pairs: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "rankingMetrics: k must be >= 1")
    val spark = pairs.sparkSession
    import spark.implicits._

    val qid = col(qidCol)
    val w = Window.partitionBy(qid).orderBy(col(scoreCol).desc, col(idCol))
    val rel = col(relCol).cast("double")

    val perQuery = pairs
      .withColumn("rnk", row_number().over(w))
      .groupBy(qid)
      .agg(
        sum(rel).cast("long").as("n_rel"),
        sum(when(col("rnk") <= k, rel).otherwise(0.0)).as("rel_at_k"),
        min(when(col("rnk") <= k && rel > 0, col("rnk"))).as("first_rel"),
        sum(when(col("rnk") <= k, rel / log2(col("rnk") + 1))
          .otherwise(0.0)).as("dcg"))

    // ideal DCG for m = min(k, n_rel) relevant items in the top positions;
    // k rows, broadcast — the closed form no SQL engine disagrees on
    val idcg = (1 to k).map { m =>
      (m.toLong, (1 to m).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum)
    }.toDF("m", "idcg")

    perQuery
      .withColumn("m", least(lit(k.toLong), col("n_rel")))
      .join(broadcast(idcg), Seq("m"), "left")
      .select(
        qid,
        col("n_rel"),
        when(col("n_rel") > 0, col("rel_at_k") / col("n_rel"))
          .otherwise(0.0).as("recall_at_k"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("mrr_at_k"),
        when(col("n_rel") > 0, col("dcg") / col("idcg"))
          .otherwise(0.0).as("ndcg_at_k"))
  }

  /** Macro average of [[rankingMetrics]] output: one row
    * (n_queries, recall_at_k, mrr_at_k, ndcg_at_k).
    */
  def macroAverage(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall_at_k")).as("recall_at_k"),
      avg(col("mrr_at_k")).as("mrr_at_k"),
      avg(col("ndcg_at_k")).as("ndcg_at_k"))

  /** Label-relevance evaluation harness: rank a bounded candidate set
    * for each query vector by exact cosine and score the ranking with
    * "same label" as the relevance oracle — the standard
    * embedding-quality probe (do nearest neighbors share the class?).
    * Score is rounded to 6 dp BEFORE ranking so independent engines
    * produce the identical rank order under the deterministic
    * (score desc, id) tie-break.
    */
  def labelRankingEval(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Column, candidateIds: Column,
      k: Int): DataFrame = {
    val queries = emb.filter(queryIds)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col(labelCol).as("qlabel"))
    val cands = emb.filter(candidateIds)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        col(labelCol).as("clabel"))
    val pairs = cands.crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(graft.functions.vec_cosine(col("cvec"), col("qvec")), 6)
          .as("score"),
        (col("clabel") === col("qlabel")).cast("int").as("rel"))
    rankingMetrics(pairs, "qid", "cid", "score", "rel", k)
  }
}
