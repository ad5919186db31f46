package graft.snapshot

import graft.SparkTestSession
import graft.config.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class ArchiverSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def outDir = Files.createTempDirectory("graft-snap").toString

  test("end-to-end snapshot: parquet source -> typed parts + catalog (archiver.go:57-130)") {
    val dest = outDir
    val yaml =
      s"""version: "1.0"
         |name: lineitem-snapshot
         |archiver:
         |  source:
         |    type: parquet
         |    path: ${SparkTestSession.sf0001}
         |    table: lineitem
         |    query: "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem"
         |  preserver:
         |    batch_size_num_records: 2000
         |    schema:
         |      fields:
         |        - {name: l_orderkey, type: INT64}
         |        - {name: l_quantity, type: INT64, converted_type: DECIMAL, scale: 2, length: 12}
         |        - {name: l_returnflag, type: BYTE_ARRAY, converted_type: UTF8}
         |  repository:
         |    type: local
         |    path: $dest
         |""".stripMargin
    val cfg = GraftConfig.fromString(yaml)
    val catalog = Archiver.snapshot(spark, cfg, "snap-1")

    assert(catalog.success)
    assert(catalog.numSourceRecords > 0)
    assert(catalog.numSourceRecords == catalog.numRecordsProcessed)

    // output exists under the snapshot-id prefix with the declared schema
    val written = spark.read.parquet(s"$dest/snap-1")
    assert(written.count() == catalog.numRecordsProcessed)
    assert(written.schema("l_quantity").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(written.schema("l_orderkey").dataType ==
      org.apache.spark.sql.types.LongType)

    // part files are record-bounded (batch_size_num_records = 2000, ~6k rows)
    val parts = new java.io.File(s"$dest/snap-1").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length >= 3, s"expected >=3 bounded parts, got ${parts.length}")

    // catalog audit record (underscore-prefixed so parquet readers skip it)
    val catJson = Files.readString(Paths.get(s"$dest/snap-1/${Archiver.CatalogFileName}"))
    assert(catJson.contains("\"id\":\"snap-1\""))
    assert(catJson.contains(s""""num_source_records":${catalog.numSourceRecords}"""))
    assert(catJson.contains("\"success\":true"))
  }

  test("DATE and DECIMAL output types survive to collect() (ADVICE r2: " +
    "q22 renders them as timestamp/double for driver parity, so this is " +
    "where a date/decimal output regression gets caught)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val typed = spark.read.parquet(s"${SparkTestSession.sf0001}/orders.parquet")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price_dec"),
        col("o_orderdate").cast(DateType).as("order_date"))
    assert(typed.schema("price_dec").dataType == DecimalType(12, 2))
    assert(typed.schema("order_date").dataType == DateType)
    val rows = typed.orderBy("o_orderkey").limit(5).collect()
    rows.foreach { r =>
      assert(r.get(r.fieldIndex("price_dec")).isInstanceOf[java.math.BigDecimal])
      assert(r.get(r.fieldIndex("order_date")).isInstanceOf[java.sql.Date])
      assert(r.getAs[java.math.BigDecimal]("price_dec").scale == 2)
    }
    // and the typed columns round-trip through a parquet write (T2/T3
    // conversions, internal/parquet/sql.go:33-49 -> Spark casts)
    val dest = outDir
    typed.write.parquet(s"$dest/typed")
    val back = spark.read.parquet(s"$dest/typed")
    assert(back.schema("price_dec").dataType == DecimalType(12, 2))
    assert(back.schema("order_date").dataType == DateType)
  }

  test("schema arity mismatch fails like RecordToParquetRow (schema.go:53-59)") {
    val df = spark.read.parquet(s"${SparkTestSession.sf0001}/region.parquet")
    val oneField = Seq(graft.schema.FieldSpec("r_regionkey", "INT64"))
    intercept[IllegalArgumentException](Preserver.applySchema(df, oneField))
  }

  test("empty declared schema passes the frame through untyped") {
    val df = spark.read.parquet(s"${SparkTestSession.sf0001}/region.parquet")
    assert(Preserver.applySchema(df, Seq.empty).schema == df.schema)
  }

  test("repository path resolution: local and s3") {
    assert(Repository.resolve("local", "/tmp/x", "id1") == "/tmp/x/id1")
    assert(Repository.resolve("s3", "s3://bucket/pre", "id1") == "s3a://bucket/pre/id1")
    intercept[IllegalArgumentException](Repository.resolve("gcs", "x", "y"))
  }

  test("default query is SELECT * (sql/source.go:172-174)") {
    val src = ParquetSnapshotSource(SparkTestSession.sf0001, "region", None)
    assert(src.frame(spark).count() == 5)
  }
}
