package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loader for the driver-generated TPC-H-ish testdata
  * (`TESTDATA.md`). All queries resolve their inputs through here so the
  * parquet scans stay uniform (and Catalyst can prune/push down against
  * the raw files — no caching layer in between).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory.
    *
    * Timestamp normalization (the session runs in UTC):
    *   - parquet naive timestamps load as LTZ (not NTZ) so the full
    *     timestamp function surface applies; with a UTC session the wall
    *     times are identical to DuckDB's naive reading;
    *   - `events.ts` has shipped in two encodings across testdata
    *     generations: int64 nanoseconds (which Spark's vectorized reader
    *     rejects without the legacy nanos-as-long conf) and native
    *     `timestamp[us]`. The nanos→micros floor conversion applies ONLY
    *     when the loaded column is actually a long — a native timestamp
    *     column passes through untouched.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer division keeps full precision (a double division would
      // lose bits above 2^53)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
