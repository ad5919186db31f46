package graft.snapshot

import graft.SparkTestSession
import graft.config.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.DriverManager

/** The JDBC snapshot path against a REAL database — embedded Derby (ships
  * with Spark), so the whole-query pushdown, partitioned read, and the
  * full archiver lifecycle (§3.1) run offline exactly as they would
  * against PostgreSQL.
  */
class JdbcSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE property_sales (id INT NOT NULL, price DOUBLE, region VARCHAR(16))")
      val ins = conn.prepareStatement(
        "INSERT INTO property_sales VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setDouble(2, i * 1000.0)
        ins.setString(3, if (i % 2 == 0) "east" else "west")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  test("whole-query pushdown: the database executes the user SQL") {
    seeded
    val src = JdbcSnapshotSource(url,
      "SELECT id, price FROM property_sales WHERE id <= 50")
    val df = src.frame(spark)
    assert(df.columns.toSeq.map(_.toLowerCase) == Seq("id", "price"))
    assert(df.count() == 50)
    assert(df.agg(org.apache.spark.sql.functions.max("id")).head.getInt(0) == 50)
  }

  test("partitioned read splits the range across numPartitions") {
    seeded
    val src = JdbcSnapshotSource(url, "SELECT id, price FROM property_sales",
      partitionColumn = Some("id"), numPartitions = 4,
      lowerBound = 1L, upperBound = 101L)
    val df = src.frame(spark)
    assert(df.rdd.getNumPartitions == 4, "range-partitioned parallel extraction")
    assert(df.count() == 100, "partition predicates must not lose or duplicate rows")
  }

  test("full archiver lifecycle over JDBC: typed parts + catalog audit") {
    seeded
    val dest = Files.createTempDirectory("jdbc-snap").toString
    val yaml =
      s"""version: "1.0"
         |name: jdbc-snapshot
         |archiver:
         |  source:
         |    type: jdbc
         |    url: "$url"
         |    query: "SELECT id, price, region FROM property_sales"
         |  preserver:
         |    batch_size_num_records: 40
         |    schema:
         |      fields:
         |        - {name: id, type: INT64}
         |        - {name: price, type: INT64, converted_type: DECIMAL, scale: 2, length: 12}
         |        - {name: region, type: BYTE_ARRAY, converted_type: UTF8}
         |  repository:
         |    type: local
         |    path: $dest
         |""".stripMargin
    val catalog = Archiver.snapshot(spark, GraftConfig.fromString(yaml), "jdbc-1")
    assert(catalog.success)
    assert(catalog.numSourceRecords == 100)
    assert(catalog.numSourceRecords == catalog.numRecordsProcessed)

    val written = spark.read.parquet(s"$dest/jdbc-1")
    assert(written.count() == 100)
    assert(written.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(written.schema("id").dataType == org.apache.spark.sql.types.LongType)
  }
}
