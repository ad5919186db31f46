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

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
