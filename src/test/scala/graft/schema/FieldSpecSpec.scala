package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class FieldSpecSpec extends AnyFunSuite {

  test("reference type mappings (internal/parquet/sql.go:10-61)") {
    assert(FieldSpec("a", "INT64").sparkType == LongType)
    assert(FieldSpec("a", "BYTE_ARRAY", Some("UTF8")).sparkType == StringType)
    assert(FieldSpec("a", "INT32", Some("DATE")).sparkType == DateType)
    assert(FieldSpec("a", "INT64", Some("DECIMAL"), None, Some(2), Some(12)).sparkType
      == DecimalType(12, 2))
    assert(FieldSpec("a", "INT64", Some("TIMESTAMP_MILLIS")).sparkType == TimestampType)
    assert(FieldSpec("a", "INT64", Some("TIME_MICROS")).sparkType == LongType)
  }

  test("repetition REQUIRED -> not nullable (internal/parquet/sql.go:54-58)") {
    assert(!FieldSpec("a", "INT64", repetitionType = Some("REQUIRED")).nullable)
    assert(FieldSpec("a", "INT64", repetitionType = Some("OPTIONAL")).nullable)
    assert(FieldSpec("a", "INT64").nullable) // unset defaults nullable
  }

  test("unsupported type raises") {
    intercept[IllegalArgumentException](FieldSpec("a", "INT96").sparkType)
  }

  test("DDL round-trip: property_sales shape (FIXTURES.md §3)") {
    val fields = FieldSpec.fromDdl(
      """CREATE TABLE property_sales (
        |  serial_number INTEGER,
        |  date_recorded DATE,
        |  town VARCHAR(50),
        |  assessed_value DECIMAL(12,2) NOT NULL,
        |  remarks TEXT)""".stripMargin)
    assert(fields.map(_.name) ==
      Seq("serial_number", "date_recorded", "town", "assessed_value", "remarks"))
    // INT32 deliberately widened to INT64, like the reference
    assert(fields(0).tpe == "INT64")
    assert(fields(1).convertedType.contains("DATE"))
    assert(fields(2).convertedType.contains("UTF8"))
    assert(fields(3).precision.contains(12) && fields(3).scale.contains(2))
    assert(fields(3).repetitionType.contains("REQUIRED"))
    assert(fields(4).tpe == "BYTE_ARRAY")
  }

  test("bare column list DDL also parses") {
    val fs = FieldSpec.fromDdl("id BIGINT, name STRING")
    assert(fs.map(_.sparkType) == Seq(LongType, StringType))
  }

  private val specGen: Gen[FieldSpec] = for {
    name <- Gen.identifier.map(_.take(10)).suchThat(_.nonEmpty)
    spec <- Gen.oneOf(
      FieldSpec(name, "INT64"),
      FieldSpec(name, "BYTE_ARRAY", Some("UTF8")),
      FieldSpec(name, "INT32", Some("DATE")),
      FieldSpec(name, "INT64", Some("DECIMAL"), None, Some(2), Some(12)),
      FieldSpec(name, "INT64", Some("TIMESTAMP_MILLIS")),
      FieldSpec(name, "BOOLEAN"),
      FieldSpec(name, "DOUBLE"))
    req <- Gen.oneOf(Some("REQUIRED"), Some("OPTIONAL"), None)
  } yield spec.copy(repetitionType = req)

  test("property: FieldSpec -> StructField -> FieldSpec preserves spark type + nullability") {
    val prop = Prop.forAll(specGen) { spec =>
      val back = FieldSpec.fromStructField(spec.toStructField)
      back.sparkType == spec.sparkType &&
        back.nullable == spec.nullable &&
        back.name == spec.name
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
