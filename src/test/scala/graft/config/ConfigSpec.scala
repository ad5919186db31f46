package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("full yaml parses (config.go:24-85 shape)") {
    val cfg = GraftConfig.fromString(
      """version: "1.0"
        |name: property-sales
        |archiver:
        |  source:
        |    type: jdbc
        |    url: jdbc:postgresql://localhost/db
        |    schema: public
        |    table: property_sales
        |    query: "SELECT * FROM property_sales ORDER BY serial_number"
        |  preserver:
        |    batch_size_num_records: 100000
        |    schema:
        |      fields:
        |        - name: serial_number
        |          type: INT64
        |          repetition_type: REQUIRED
        |        - name: assessed_value
        |          type: INT64
        |          converted_type: DECIMAL
        |          scale: 2
        |          length: 12
        |  repository:
        |    type: s3
        |    path: s3://bucket/prefix
        |""".stripMargin)
    assert(cfg.name == "property-sales")
    assert(cfg.archiver.source.tpe == "jdbc")
    assert(cfg.archiver.source.query.get.startsWith("SELECT *"))
    assert(cfg.archiver.preserver.batchSizeNumRecords.contains(100000L))
    val fs = cfg.archiver.preserver.fields
    assert(fs.map(_.name) == Seq("serial_number", "assessed_value"))
    assert(!fs.head.nullable)
    assert(fs(1).precision.contains(12) && fs(1).scale.contains(2))
    assert(cfg.archiver.repository.tpe == "s3")
  }

  test("missing sections raise") {
    intercept[IllegalArgumentException](GraftConfig.fromString("version: '1'"))
    intercept[IllegalArgumentException](GraftConfig.fromString(
      "archiver:\n  source: {type: parquet}\n"))
  }

  test("minimal config defaults") {
    val cfg = GraftConfig.fromString(
      """archiver:
        |  source: {type: parquet, path: /tmp, table: t}
        |  repository: {type: local, path: /tmp/out}
        |""".stripMargin)
    assert(cfg.version == "1.0")
    assert(cfg.archiver.preserver.fields.isEmpty)
    assert(cfg.archiver.preserver.batchSizeNumRecords.isEmpty)
  }
}
