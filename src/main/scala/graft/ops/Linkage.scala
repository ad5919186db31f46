package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.jaro_winkler

/** Blocked fuzzy record linkage — the entity-resolution face next to the
  * dedup family: where MinHash-LSH (q43) answers "near-identical
  * documents" over set overlap, linkage answers "same real-world entity,
  * differently spelled" over a NAME column, with Jaro-Winkler as the
  * matcher (position-tolerant, prefix-boosted — the standard choice for
  * names since the Census Bureau record-linkage work).
  *
  * Scale shape: candidate generation is BLOCKED — both sides hash-shuffle
  * once on a caller-chosen blocking key (first token, phonetic code,
  * sorted-shingle prefix, ...) and pairs form only within a block, so the
  * cost is sum(block²), never n². The blocking key is the scale knob: at
  * 100 TB the caller blocks finer (or stacks multiple blocking passes —
  * the standard multi-pass linkage design — unioning pair sets). On top
  * of the block join sits a LOSSLESS length prefilter: jw >= t implies
  * jaro >= (t-0.4)/0.6 (prefix boost caps at 0.4·(1-jaro)), and with
  * m <= min(|a|,|b|) the Jaro bound gives min/max >= 5t-4 — so for
  * t > 0.8 pairs whose lengths differ too much are cut BEFORE the
  * similarity kernel runs (the q100 prefix-filter device; vacuous below
  * t = 0.8 where the bound is non-positive).
  */
object Linkage {

  /** All within-block pairs (idCol_a < idCol_b) with
    * `jaro_winkler(name_a, name_b) >= threshold`. Input should be one
    * row per entity (dedupe the name dictionary first — linkage over a
    * raw table with repeated names pays block² on the duplicates and
    * reports every copy; the dictionary face is both the cheap and the
    * meaningful one). Output: (id_a, id_b, name_a, name_b, sim) with sim
    * rounded to 6 dp.
    */
  def fuzzyPairs(entities: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val a = entities.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      blockKey.as("__blk"), length(col(nameCol)).as("__len_a"))
    val b = entities.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      blockKey.as("__blk"), length(col(nameCol)).as("__len_b"))
    // lossless length prefilter (see scaladoc); vacuous for t <= 0.8
    val ratio = 5.0 * threshold - 4.0
    val lenGate =
      if (ratio <= 0.0) lit(true)
      else least(col("__len_a"), col("__len_b")) >=
        lit(ratio) * greatest(col("__len_a"), col("__len_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b") && lenGate)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        round(jaro_winkler(col("name_a"), col("name_b")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Entity resolution end to end: [[fuzzyPairs]] finds the match
    * edges, connected components collapses transitive chains (a≈b,
    * b≈c ⇒ one entity even when a and c never paired — the step
    * pairwise linkage alone cannot take), and every input row gets its
    * cluster's canonical id (the minimum member id). Rows matching
    * nothing are their own entity. Returns
    * (id, name, entity_id, n_members) ordered by id.
    *
    * 100 TB shape: the pair graph is block-bounded (fuzzyPairs), the
    * CC label table holds only ids that appear in pairs (the matched
    * subgraph, not the input), pointer-jumping converges in
    * O(log n) rounds (ops/Dedup.scala), and the final label join is
    * one id-keyed exchange; n_members is an entity-keyed re-agg of the
    * same pinned frame joined back on its own key (AQE broadcasts it
    * when small enough to qualify).
    */
  def resolveEntities(entities: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, threshold: Double): DataFrame = {
    val pairs = fuzzyPairs(entities, idCol, nameCol, blockKey, threshold)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val labeled = entities
      .select(col(idCol).cast("long").as("id"), col(nameCol).as("name"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), col("name"),
        coalesce(col("cluster_id"), col("id")).as("entity_id"))
      .localCheckpoint(true) // consumers: sizes and the readout
    val sizes = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, Seq("entity_id"))
      .select(col("id"), col("name"), col("entity_id"), col("n_members"))
      .orderBy(col("id"))
  }
}
