package graft.cdc

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Apply CDC changes to materialized table state — the consumer side of
  * the replication loop (the reference ships events to Kafka and stops;
  * this is what a lakehouse does with them).
  *
  * Semantics (Debezium apply rules):
  *   - per key, the change with the highest position (LSN) wins;
  *   - op 'd' removes the row; c/u/r upsert the after-image;
  *   - base rows with no change pass through.
  *
  * Shape: one hash shuffle on the key + per-key window — merge cost is
  * O(base + changes), never a cross product, and the same code runs
  * per-micro-batch under foreachBatch for continuous materialization.
  */
object Apply {

  /** Merge a batch of raw changes (ChangeSource.rawSchema) into `base`.
    *
    * @param base    current state: one row per key, columns = data cols
    * @param changes raw change rows; after/before maps hold the images
    * @param keyCol  key field inside the after/before image
    * @param cols    data columns to materialize (from the images)
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    // latest change per key wins (LSN order, txId tiebreak)
    val keyFromImage = coalesce(
      col("after").getItem(keyCol), col("before").getItem(keyCol))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("lsn").desc, col("txId").desc)
    val latest = changes
      .withColumn("__key", keyFromImage)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        Seq(col("__key"), col("op")) ++
          cols.map(c => col("after").getItem(c).as(c)): _*)

    val baseKeyed = base.select(
      (col(keyCol).cast("string").as("__key") +: cols.map(col)): _*)

    // survivors: base rows without a change + upserts; deletes drop out
    val unchanged = baseKeyed.join(latest.select(col("__key")), Seq("__key"), "left_anti")
    val upserts = latest.filter(col("op") =!= "d").drop("op")
    unchanged.unionByName(upserts)
      .withColumnRenamed("__key", keyCol)
  }

  /** SCD type-2 history: expand a change batch into a
    * slowly-changing-dimension history table — one row per non-delete
    * change with `valid_from` (the change's event time), `valid_to` (the
    * key's NEXT change time, null while current) and `is_current`. A
    * delete emits no row of its own but closes the previous version's
    * interval, so a deleted key's history ends with a bounded row.
    *
    * Shape: one hash shuffle on the key + a per-key `lead` window —
    * O(changes), no join against the base table at all (history derives
    * from the stream alone), and the same code runs per micro-batch
    * under foreachBatch with the batch unioned onto the open tail.
    */
  def scd2History(changes: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val keyFromImage = coalesce(
      col("after").getItem(keyCol), col("before").getItem(keyCol))
    val w = Window.partitionBy(col("__key")).orderBy(col("lsn"), col("txId"))
    changes
      .withColumn("__key", keyFromImage)
      .withColumn("valid_from", col("ts_ms"))
      .withColumn("valid_to", lead(col("ts_ms"), 1).over(w))
      .filter(col("op") =!= "d")
      .select(
        Seq(col("__key").as(keyCol)) ++
          cols.map(c => col("after").getItem(c).as(c)) ++
          Seq(col("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current")): _*)
  }

  /** Continuous materialization: consume a raw change stream and keep a
    * parquet table at `tableDir` up to date, one merge per micro-batch
    * (overwrite-on-merge; swap in MERGE INTO on a lakehouse format for
    * transactional updates).
    */
  /** Continuous SCD2 materialization: per micro-batch, close the open
    * tails of keys the batch touches (their `valid_to` becomes the key's
    * first change time in the batch) and append the batch's own versioned
    * rows from [[scd2History]]. History is append-mostly — only the
    * current rows of touched keys change — written stage+swap like
    * [[startMaterialize]] (a lakehouse format would make this a MERGE).
    *
    * Replay-safe under foreachBatch's at-least-once contract: a replayed
    * batch's rows already sit in the table, so (a) the tail-close only
    * touches current rows that PRECEDE the batch (`valid_from <
    * __first`) — never the batch's own rows from the failed attempt —
    * and (b) the append deduplicates on (key, valid_from), making the
    * whole merge idempotent. Assumes per-key event times are
    * non-decreasing across batches (CDC position order).
    *
    * A missing table dir means first batch; any OTHER read failure
    * propagates and fails the batch — it must never be mistaken for
    * "no history" or the swap would destroy the table.
    */
  def startScd2Materialize(spark: SparkSession, changes: DataFrame,
      keyCol: String, cols: Seq[String], tableDir: String,
      checkpointDir: String, triggerMs: Long = 500L): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val newHist = scd2History(batch, keyCol, cols)
        val tablePath = new org.apache.hadoop.fs.Path(tableDir)
        val tableFs = tablePath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val merged =
          if (!tableFs.exists(tablePath)) newHist
          else {
            val hist = s.read.parquet(tableDir)
            val firstChange = batch
              .withColumn("__key", coalesce(
                col("after").getItem(keyCol), col("before").getItem(keyCol)))
              .groupBy(col("__key").as(keyCol))
              .agg(min(col("ts_ms")).as("__first"))
            hist
              .join(firstChange, Seq(keyCol), "left")
              .withColumn("valid_to",
                when(col("is_current") && col("__first").isNotNull &&
                    col("valid_from") < col("__first"), col("__first"))
                  .otherwise(col("valid_to")))
              .withColumn("is_current", col("valid_to").isNull)
              .drop("__first")
              .unionByName(newHist)
              .dropDuplicates(keyCol, "valid_from")
          }
        val staged = tableDir + ".staging"
        merged.write.mode("overwrite").parquet(staged)
        val fs = new org.apache.hadoop.fs.Path(tableDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
        fs.rename(new org.apache.hadoop.fs.Path(staged),
          new org.apache.hadoop.fs.Path(tableDir))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  def startMaterialize(spark: SparkSession, changes: DataFrame, keyCol: String,
      cols: Seq[String], tableDir: String, checkpointDir: String,
      triggerMs: Long = 500L): StreamingQuery = {
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // missing dir == first batch; any OTHER read failure must fail
        // the batch — mistaking it for "no table" would let the swap
        // below destroy the existing state (same rule as the SCD2 merge)
        val tablePath = new org.apache.hadoop.fs.Path(tableDir)
        val tableFs = tablePath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val current =
          if (tableFs.exists(tablePath)) s.read.parquet(tableDir)
          else
            s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(
                org.apache.spark.sql.types.StructField(keyCol,
                  org.apache.spark.sql.types.StringType) +:
                  cols.map(c => org.apache.spark.sql.types.StructField(c,
                    org.apache.spark.sql.types.StringType))))
        val merged = applyChanges(current, batch, keyCol, cols)
        // stage + swap: the overwrite must not read the dir it replaces
        val staged = tableDir + ".staging"
        merged.write.mode("overwrite").parquet(staged)
        val fs = new org.apache.hadoop.fs.Path(tableDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
        fs.rename(new org.apache.hadoop.fs.Path(staged),
          new org.apache.hadoop.fs.Path(tableDir))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
