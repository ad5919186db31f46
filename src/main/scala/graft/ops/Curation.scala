package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Observation}

/** End-to-end corpus curation: the composed training-data pipeline
  * (filter -> dedup -> annotate) with per-stage audit counts — the
  * downstream shape every LLM-data pipeline runs at 100 TB.
  *
  * All stages are the engine's own operators; each is individually
  * map-only or one-shuffle, so the composition inherits their scale
  * behavior (no extra passes: audit counts ride the stages via
  * `observe`).
  */
object Curation {

  /** Audit of a curation run (counts observed in-pass, like the
    * archiver's catalog).
    */
  case class CurationAudit(input: Long, afterFilter: Long, afterDedup: Long)

  /** Rule-based quality gate: token count in [minTokens, maxTokens],
    * punctuation ratio <= maxPunct. (The score-based gate is
    * `TextAnalysis.qualityScore`; this variant is cross-engine exact.)
    */
  def qualityFilter(docs: DataFrame, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 5000,
      maxPunct: Double = 0.2): DataFrame = {
    val text = col(textCol)
    docs.filter(
      TextAnalysis.tokenCount(text).between(minTokens, maxTokens) &&
        TextAnalysis.punctRatio(text) <= maxPunct)
  }

  /** Filter -> exact-dedup -> annotate (lang pred + token count). Returns
    * the curated frame; pass Observations to collect audits without extra
    * scans.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 5000, maxPunct: Double = 0.2,
      obsIn: Option[Observation] = None,
      obsFiltered: Option[Observation] = None): DataFrame = {
    val observedIn = obsIn.fold(docs)(o => docs.observe(o, count(lit(1)).as("n")))
    val filtered = qualityFilter(observedIn, textCol, minTokens, maxTokens, maxPunct)
    val observedF = obsFiltered.fold(filtered)(o => filtered.observe(o, count(lit(1)).as("n")))
    val deduped = Dedup.exactKeepFirst(observedF, Seq(textCol), idCol)
    deduped.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextAnalysis.langId(col(textCol)).as("lang_pred"))
  }
}
