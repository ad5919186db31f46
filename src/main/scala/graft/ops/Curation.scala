package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Observation}

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

  /** Sequence packing for training batches: documents in `orderCol` order
    * are conceptually concatenated and cut into packs of ~`budget` tokens
    * (pack = floor(exclusive running token total / budget) — the standard
    * concat-then-chunk policy; a doc may straddle a boundary, which the
    * token-level chunker downstream resolves).
    *
    * The running total is a DISTRIBUTED prefix sum: range-partition by
    * the order column, per-partition running sums via a partition-local
    * window, then per-partition subtotals (one tiny row each) are
    * collected and rebroadcast as offsets. No global single-partition
    * window — the classic scalable prefix-sum shape, deterministic and
    * independent of the partition count.
    */
  def packSequential(docs: DataFrame, orderCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // fail fast on a non-integral token column: the offset collection
    // below reads longs, and silently truncating a double/decimal token
    // count would corrupt every pack boundary
    docs.schema(tokenCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"packSequential needs an integral token column; '$tokenCol' is ${other.simpleString}")
    }
    // localCheckpoint PINS the range partitioning: the offsets job and
    // the output job must see the SAME partition boundaries, and
    // repartitionByRange re-samples its boundaries when recomputed —
    // without the pin, a boundary row can move between jobs and shift
    // every subsequent pack assignment. Checkpoint over persist(): the
    // truncated lineage CANNOT re-sample, and the blocks are released by
    // the ContextCleaner once the returned frame is unreferenced (a
    // bare persist would leak one pinned copy per call).
    val parts = docs
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // tiny: one row per partition
    val offsets = parts.groupBy(col("__pid"))
      .agg(sum(col(tokenCol)).cast("long").as("__psum"))
      .collect()
      .sortBy(_.getInt(0))
    var running = 0L
    val offsetRows = offsets.map { r =>
      val pid = r.getInt(0)
      val here = running
      running += (if (r.isNullAt(1)) 0L else r.getLong(1)) // all-null partition
      (pid, here)
    }
    // (pid, offset) as a broadcast-joined frame, NOT a chained when()
    // expression: the expression form is O(P)-deep — at thousands of range
    // partitions it defeats codegen and risks analyzer stack overflow; a
    // broadcast hash join on __pid is O(1)-deep at any partition count
    val session = docs.sparkSession
    import session.implicits._
    val offsetsDf = broadcast(
      offsetRows.toSeq.toDF("__pid", "__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    parts
      .join(offsetsDf, Seq("__pid"))
      .withColumn("__cum_excl",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)) + col("__offset"))
      .withColumn("pack_id", floor(col("__cum_excl") / budget).cast("long"))
      .drop("__pid", "__offset", "__cum_excl")
  }

  /** Length-BUCKETED packing (bucketed batching): each document maps to
    * the smallest power-of-two-scaled bucket ≥ its token count (edges
    * `minBucket, 2·minBucket, …`, capped at `budget`); within a bucket,
    * `budget div bucketLen` documents share a pack in `idCol` order.
    * The padding-minimizing batching policy production training stacks
    * use when documents must stay WHOLE — the complement of
    * [[packSequential]]'s concat-then-chunk (which lets a doc straddle
    * packs): padding is bounded by construction (a doc fills > half its
    * bucket slot, so pack occupancy exceeds 50% wherever buckets are
    * full), and the assignment is pure integer arithmetic — fully
    * deterministic and cross-engine exact. Documents longer than
    * `budget` land in the `budget` bucket one-per-pack with
    * `truncated = true` (downstream truncation's concern).
    *
    * Returns (idCol, tokenCol, bucket, pack_seq, truncated):
    * `pack_seq` numbers packs within a bucket, so (bucket, pack_seq) is
    * the pack key.
    *
    * 100 TB shape: the per-bucket rank is the SAME distributed prefix
    * sum as [[packSequential]] — range partition by (bucket, id),
    * partition-local ranks, per-(partition, bucket) counts collected
    * (tiny: partitions × buckets rows) and rebroadcast as offsets.
    * No per-bucket global window: a bucket holding billions of docs
    * never funnels through one partition. Requires unique ids.
    */
  def packBucketed(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, minBucket: Long = 16L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(minBucket > 0 && minBucket <= budget,
      "need 0 < minBucket <= budget")
    docs.schema(tokenCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"packBucketed needs an integral token column; '$tokenCol' is ${other.simpleString}")
    }
    // doubling bucket edges, capped at budget (bounded: log2 of the span)
    val edges = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(e => e < budget && e > 0).toSeq :+ budget
    val tok = col(tokenCol).cast("long")
    // in-plan null rejection: without it a null count would fall through
    // every `when` and silently land in the budget bucket
    val bucketExpr = when(tok.isNull,
        raise_error(lit(s"packBucketed: null '$tokenCol'")).cast("long"))
      .otherwise(edges.reverse.foldLeft(lit(budget)) { (acc, e) =>
        when(tok <= e, lit(e)).otherwise(acc)
      })
    // same pin rationale as packSequential: the offsets job and the
    // output job must agree on partition boundaries
    val parts = docs
      .withColumn("bucket", bucketExpr)
      .withColumn("truncated", tok > budget)
      .repartitionByRange(col("bucket"), col(idCol))
      .sortWithinPartitions(col("bucket"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    // tiny: one row per (partition, bucket)
    val counts = parts.groupBy(col("__pid"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1)) // per bucket, in partition order
    val offsetRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var curBucket = Long.MinValue
    var running = 0L
    counts.foreach { case (pid, b, c) =>
      if (b != curBucket) { curBucket = b; running = 0L }
      offsetRows += ((pid, b, running))
      running += c
    }
    val session = docs.sparkSession
    import session.implicits._
    val offsetsDf = broadcast(
      offsetRows.toSeq.toDF("__pid", "bucket", "__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("bucket")).orderBy(col(idCol))
    parts
      .join(offsetsDf, Seq("__pid", "bucket"))
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1L + col("__offset"))
      .withColumn("pack_seq",
        expr(s"__rank DIV ($budget DIV bucket)"))
      .drop("__pid", "__offset", "__rank")
  }

  /** Token-window chunking with overlap — the context-window primitive
    * (RAG indexing, long-doc training prep): each document becomes
    * windows of `chunkTokens` tokens starting every `strideTokens`
    * (overlap = chunk - stride); the last window may be shorter, a doc
    * shorter than one chunk yields exactly one chunk, empty docs yield
    * none. Returns (doc_id, chunk_id, n_tokens, chunk_text).
    *
    * 100 TB shape: pure map — tokenization, window arithmetic, and the
    * chunk materialization are all per-row column expressions + one
    * posexplode; no shuffle, so it scales with the scan.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      "need 0 < stride <= chunk")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // number of window starts 0, s, 2s, ...: one for n <= chunk, then
    // one more per stride of tokens past the first chunk
    val nChunks = when(n <= 0, lit(0L)).otherwise(
      lit(1L) + greatest(lit(0L),
        ceil((n - lit(chunkTokens)).cast("double") / strideTokens).cast("long")))
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"), nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0L), col("__nc") - 1),
        i => slice(col("__toks"), (i * strideTokens + 1).cast("int"),
          lit(chunkTokens)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

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

  /** Sentence-boundary-respecting chunking — the RAG/embedding chunker
    * that never cuts mid-sentence: split on terminal punctuation
    * ([.!?]+ followed by whitespace), then greedily pack consecutive
    * sentences into chunks of ~`budgetTokens` (chunk = floor(exclusive
    * running token total / budget), the [[packSequential]] policy at
    * sentence granularity — a sentence LONGER than the budget keeps a
    * chunk to itself rather than splitting; token-exact packing that
    * may cut sentences is [[chunk]]).
    *
    * Returns (doc_id, chunk_id, n_sentences, n_tokens, chunk_text).
    *
    * Scale shape: the split is a map-only sentinel-insert + split (one
    * regex pass, no lookbehind so any engine replays it); the running
    * total is a window PARTITIONED BY DOC (doc-sized groups — no
    * global window), and the chunk rebuild is one grouped aggregate.
    * One shuffle on (doc, chunk).
    */
  def chunkBySentences(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    // sentinel device: mark each boundary, then split — replayable
    // without lookbehind. Any U+0001 already IN the text flattens to
    // a space first, so hostile bytes cannot forge a sentence
    // boundary (that control char never survives into chunk_text —
    // a char every text pipeline strips anyway).
    val marked = regexp_replace(
      regexp_replace(col(textCol), "\u0001", " "),
      "([.!?])\\s+", "$1\u0001")
    val sents = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(marked, "\u0001")).as(Seq("sent_idx", "sentence")))
      .filter(trim(col("sentence")) =!= "")
      .withColumn("__t",
        TextAnalysis.tokenCount(col("sentence")).cast("long"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sent_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sents
      .withColumn("chunk_id",
        floor(coalesce(sum(col("__t")).over(w), lit(0L)) /
          budgetTokens).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("__t")).as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sent_idx"), col("sentence")))),
          s => s.getField("sentence"))).as("chunk_text"))
  }

  /** Per-key output cap — the "at most N pages per registered domain"
    * policy of web-corpus curation (a handful of template-heavy sites
    * otherwise dominate the token budget): keep the top `cap` rows of
    * each key by `order` (pass a deterministic tie-break as the last
    * column — an id — or retried runs may keep different rows).
    *
    * Scale shape: one hash shuffle on the key + a per-key rank window —
    * the standard distributed top-N-per-group. The window never
    * materializes a group in memory (rank streams over the sorted run),
    * so a pathological mega-domain costs sort spill, not OOM; cap
    * output is bounded at |keys|·cap rows by construction.
    */
  def capPerKey(df: DataFrame, keyCol: Column, cap: Int,
      order: Seq[Column]): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(order.nonEmpty, "capPerKey: need at least one order column")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number()
        .over(Window.partitionBy(keyCol).orderBy(order: _*)))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Per-key TOKEN budget — the other half of mixture construction
    * next to [[capPerKey]]'s count cap: keep each key's docs in
    * priority order while the EXCLUSIVE running token total is under
    * `budgetTokens` ("30B tokens per domain, best docs first"). The
    * straddling doc is KEPT, so a key's kept mass is < budget + one
    * doc and a doc larger than the whole budget still represents its
    * key (never an empty domain). Pass a deterministic tie-break as
    * the last order column.
    *
    * Scale shape: one key shuffle + a streaming per-key prefix-sum
    * window (rank/sum stream over the sorted run — a mega-domain costs
    * sort spill, not memory).
    */
  def tokenBudgetPerKey(df: DataFrame, keyCol: Column, tokenCol: Column,
      budgetTokens: Long, order: Seq[Column]): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive")
    require(order.nonEmpty, "tokenBudgetPerKey: need an order")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(tokenCol).over(w), lit(0L)))
      .filter(col("__cum") < budgetTokens)
      .drop("__cum")
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

  /** RELEASE DIFF between two corpus snapshots — the archive-maintenance
    * question ("what changed between v1 and v2?") a snapshot catalog
    * cannot answer from counts alone. Per id: `added` (new side only),
    * `removed` (old side only), `changed` (both sides, content hash
    * differs over `hashCols`), `unchanged`. Returns (id, status).
    *
    * 100 TB shape: content comparison is by md5 over the concatenated
    * hash columns computed MAP-SIDE on each snapshot — the join then
    * carries (id, 32-char hash) rows, never document bodies; one
    * id-keyed full-outer sort-merge join, no skew surface beyond the id
    * itself. Columns hash individually before combining, so field
    * boundaries hold for ANY byte content — ("ab","c") never equals
    * ("a","bc") — and nulls are distinct from every real value.
    */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "corpusDiff: need at least one hash column")
    def hashed(df: DataFrame) = df.select(col(idCol).as("id"),
      // hash EACH column first: the per-column digests are fixed-width,
      // so field boundaries cannot bleed whatever bytes the values
      // contain (a raw separator would collide on values containing the
      // separator char); a null column hashes to the 1-char sentinel
      // "-", which no md5 hex string can equal
      md5(concat(hashCols.map(c =>
        coalesce(md5(col(c).cast("string")), lit("-"))): _*)).as("h"))
    hashed(oldSnap).withColumnRenamed("h", "h_old")
      .join(hashed(newSnap).withColumnRenamed("h", "h_new"),
        Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Per-group percentile normalization: `percent_rank` of `valueCol`
    * WITHIN each key — the per-source score calibration every corpus
    * mixer needs before a global threshold means anything (FineWeb's
    * per-dump normalization: a 0.6 quality score from a clean dump and
    * a 0.6 from a spam-heavy dump are different animals; their
    * within-source percentiles are comparable). Ties share a rank
    * (percent_rank semantics), so the output is deterministic with no
    * tiebreak column. Rank rounds to 6 dp.
    *
    * Scale note: the window partitions by key, so each key's rows sort
    * within their partition — right for the per-SOURCE shape (sources
    * are thousands, each holding its own slice). For a single
    * unbounded group, rank via the Quantiles range-partition device
    * instead (a one-key window is a single-reducer sort).
    */
  def percentileNormalize(df: DataFrame, keyCol: String,
      valueCol: String, outCol: String = "pct_rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(outCol,
      round(percent_rank().over(
        Window.partitionBy(col(keyCol)).orderBy(col(valueCol))), 6))
  }

  /** Winsorize a numeric column at exact quantile thresholds: values
    * below the loQ quantile clamp up to it, above hiQ clamp down — the
    * outlier treatment that KEEPS the row (a wild measurement becomes a
    * boundary measurement) where a filter would lose it; standard
    * before means/regressions on heavy-tailed metrics. Thresholds come
    * from the distributed exact-quantile machine (`Quantiles.exact` —
    * type-7, engine-replayable) and land as two literals, so the clamp
    * itself is a map-only projection at any scale. Adds
    * `<valueCol>_w` (original column untouched); nulls pass through
    * null.
    */
  def winsorize(df: DataFrame, valueCol: String, loQ: Double = 0.01,
      hiQ: Double = 0.99): DataFrame = {
    require(loQ >= 0 && loQ < hiQ && hiQ <= 1, "need 0 <= loQ < hiQ <= 1")
    val qs = Quantiles.exact(df.select(col(valueCol)), valueCol,
        Seq(loQ, hiQ))
      .collect().sortBy(_.getDouble(0)).map(_.getDouble(1))
    require(qs.length == 2,
      s"winsorize: no non-null '$valueCol' values to set thresholds from")
    val (lo, hi) = (qs(0), qs(1))
    // least/greatest SKIP nulls in both Spark and DuckDB (a null value
    // would silently clamp to the boundary) — guard explicitly
    df.withColumn(s"${valueCol}_w",
      when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))))
  }
}
