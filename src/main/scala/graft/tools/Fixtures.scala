package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture generator (reference S6, `internal/cmd/fixtures/gen.go:13-109`):
  * synthesizes `property_sales` rows. The reference loops row-by-row and
  * COPYs in 1000-row batches; here it's one declarative plan over
  * `spark.range(n)` — distributed, no driver loop, deterministic from the
  * id (hash-derived pseudo-randomness, seed-stable across runs/executors).
  */
object Fixtures {

  def propertySales(spark: SparkSession, records: Long): DataFrame = {
    // deterministic per-id pseudo-randomness: u01(salt) in [0, 1)
    def u01(salt: Int) =
      pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") / 1000000.0

    spark.range(records).select(
      (col("id") + 1).cast("long").as("serial_number"),
      (lit(2001) + (u01(1) * 23).cast("int")).cast("long").as("list_year"),
      date_add(lit("2001-01-01").cast("date"), (u01(2) * 8000).cast("int")).as("date_recorded"),
      concat(lit("town_"), (u01(3) * 170).cast("int").cast("string")).as("town"),
      concat((u01(4) * 9999).cast("int").cast("string"), lit(" main st")).as("address"),
      (u01(5) * 1000000).cast(DecimalType(12, 2)).as("assessed_value"),
      (u01(6) * 1500000).cast(DecimalType(12, 2)).as("sale_amount"),
      (u01(7) * 10).cast(DecimalType(10, 2)).as("sales_ratio"),
      element_at(array(lit("Residential"), lit("Commercial"), lit("Vacant Land"),
        lit("Apartments"), lit("Industrial")), (u01(8) * 5).cast("int") + 1)
        .as("property_type"),
      element_at(array(lit("Single Family"), lit("Two Family"), lit("Three Family"),
        lit("Condo")), (u01(9) * 4).cast("int") + 1).as("residential_type"),
      lit(null).cast("string").as("non_use_code"),
      lit(null).cast("string").as("assessor_remarks"),
      lit(null).cast("string").as("opm_remarks"))
  }

  def write(spark: SparkSession, records: Long, outDir: String): Long = {
    val df = propertySales(spark, records)
    df.write.mode("overwrite").parquet(outDir)
    records
  }
}
