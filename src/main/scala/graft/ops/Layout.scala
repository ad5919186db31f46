package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Data-layout optimization: multi-dimensional clustering of a table's
  * files so engine-side min/max pruning (parquet row-group stats /
  * file-listing elimination) works for box predicates on EVERY
  * clustered dimension — the `OPTIMIZE ZORDER BY` capability of
  * lakehouse table formats, as an operator. A plain sort clusters only
  * the leading key: a query on the second dimension reads everything.
  * The Morton code interleaves the dimensions' bits, so files cover
  * hyper-rectangles and a selective box query intersects ~n^((d-1)/d)
  * of them instead of all (measured: SCALECHECK §5n).
  *
  * 100 TB shape: one stats aggregate (broadcast back as a 1-row
  * frame), one map pass to code rows, one range repartition by the
  * code (Spark samples ranges — no global sort), and a
  * sort-within-partitions that is file-local. Nothing here is more
  * than the one shuffle a rewrite inherently needs.
  */
object Layout {

  /** Attach a `bits`-bit-per-dimension Morton code column computed from
    * min/max-scaled dimension buckets (linear scaling — the same
    * normalization Delta's Z-order uses; rank-based scaling would add a
    * per-dimension sort for marginal skew benefit).
    */
  def withZValue(df: DataFrame, dims: Seq[String], bits: Int,
      outCol: String = "zval"): DataFrame = {
    require(dims.nonEmpty, "withZValue: need at least one dimension")
    val aggs = dims.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val maxCode = (1L << bits) - 1
    val buckets: Seq[Column] = dims.map { c =>
      val lo = col(s"__min_$c")
      val span = col(s"__max_$c") - lo
      when(span <= 0, lit(0L)).otherwise(
        floor((col(c).cast("double") - lo) / span * maxCode).cast("long"))
    }
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, graft.functions.z_value(buckets, bits))
      .drop(dims.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Z-ordered rewrite: cluster `df` into `numFiles` parquet files by
    * the Morton code of `dims`. Range partition (sampled bounds, no
    * global sort) + file-local sort; the code column does not persist.
    */
  def writeZOrdered(df: DataFrame, dims: Seq[String], bits: Int,
      path: String, numFiles: Int): Unit =
    withZValue(df, dims, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** COMPACTION: rewrite a small-files parquet directory into
    * size-targeted files — the standing maintenance job of any
    * long-running ingest (every micro-batch and every task retry leaves
    * small files; scan cost and NameNode/listing pressure grow with
    * file COUNT, not bytes). Returns (files, bytes, rows) before/after
    * as a 1-row frame.
    *
    * File count = ceil(actual on-disk bytes / targetBytes) — sized from
    * the SOURCE's real compressed footprint, so the rewrite needs no
    * size estimation model. `sortCols` optionally re-clusters during
    * the rewrite (range partition + file-local sort — the zOrdered
    * shape); otherwise a round-robin repartition balances bytes.
    * The rewrite goes to `outPath` (no in-place swap: at 100 TB the
    * atomic publish step belongs to the table format / catalog layer,
    * not the engine).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stats(p: String): (Long, Long) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var files = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          files += 1; bytes += f.getLen
        }
      }
      (files, bytes)
    }
    val (filesIn, bytesIn) = stats(inPath)
    val df = spark.read.parquet(inPath)
    val nOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    // rows-in rides the rewrite pass itself — the input is scanned
    // exactly ONCE for the rewrite; at 100 TB a separate count() pass
    // would double the job. The observe sits ABOVE the exchange (just
    // under the writer): below it, repartitionByRange's range-boundary
    // sampling pass would evaluate the node a second time and
    // double-count; above it, the metric fires once and counts exactly
    // the rows handed to the writer (repartition is row-preserving).
    val obs = org.apache.spark.sql.Observation()
    val rewritten =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    rewritten.observe(obs, count(lit(1)).as("rows_in"))
      .write.mode("overwrite").parquet(outPath)
    val rows = obs.get("rows_in").asInstanceOf[Long]
    val (filesOut, bytesOut) = stats(outPath)
    // rows-out from the parquet FOOTERS of what was just written —
    // metadata-only (O(files) footer reads), no second scan of the data.
    val rowsOut = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(outPath), true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              f.getPath, spark.sparkContext.hadoopConfiguration))
          try n += rd.getRecordCount finally rd.close()
        }
      }
      n
    }
    require(rowsOut == rows,
      s"compaction lost rows: $rowsOut != $rows") // never silently
    import spark.implicits._
    Seq((filesIn, bytesIn, rows, filesOut, bytesOut, rowsOut))
      .toDF("files_in", "bytes_in", "rows_in",
        "files_out", "bytes_out", "rows_out")
  }

  /** Per-file min/max of `cols` for a parquet directory — the stats a
    * pruning engine consults, surfaced as a frame so layout quality is
    * measurable (how many files does this box query intersect?).
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
