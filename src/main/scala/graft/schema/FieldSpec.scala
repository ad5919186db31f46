package graft.schema

import org.apache.spark.sql.types._

/** Declared parquet-schema field, mirroring the reference's
  * `Field{Name, Type, ConvertedType, RepetitionType, Scale, Precision,
  * Length}` (`internal/parquet/schema.go:12-22`) — but mapped onto Spark's
  * `StructType`, which carries the same information natively.
  *
  * Types accepted (reference `internal/parquet/sql.go:10-61`):
  *   INT64                      -> LongType
  *   INT32                      -> IntegerType
  *   BYTE_ARRAY + UTF8          -> StringType
  *   INT32 + DATE               -> DateType
  *   INT64 + DECIMAL(p,s)       -> DecimalType(p,s)
  *   INT64 + TIMESTAMP_MILLIS   -> TimestampType
  *   INT64 + TIMESTAMP_MICROS   -> TimestampType
  *   INT32 + TIME_MILLIS        -> LongType (millis of day; Spark has no TimeType)
  *   INT64 + TIME_MICROS        -> LongType
  *   BOOLEAN                    -> BooleanType
  *   DOUBLE / FLOAT             -> DoubleType / FloatType
  */
case class FieldSpec(
    name: String,
    tpe: String,
    convertedType: Option[String] = None,
    repetitionType: Option[String] = None, // OPTIONAL | REQUIRED
    scale: Option[Int] = None,
    precision: Option[Int] = None) {

  def nullable: Boolean = !repetitionType.contains("REQUIRED")

  def sparkType: DataType = (tpe.toUpperCase, convertedType.map(_.toUpperCase)) match {
    case ("INT64", None)                      => LongType
    case ("INT32", None)                      => IntegerType
    case ("BYTE_ARRAY", Some("UTF8")) | ("BYTE_ARRAY", None) => StringType
    case ("INT32", Some("DATE"))              => DateType
    case ("INT64", Some("DECIMAL")) | ("INT32", Some("DECIMAL")) =>
      DecimalType(precision.getOrElse(18), scale.getOrElse(0))
    case ("INT64", Some("TIMESTAMP_MILLIS"))  => TimestampType
    case ("INT64", Some("TIMESTAMP_MICROS"))  => TimestampType
    case ("INT32", Some("TIME_MILLIS"))       => LongType
    case ("INT64", Some("TIME_MICROS"))       => LongType
    case ("BOOLEAN", _)                       => BooleanType
    case ("DOUBLE", _)                        => DoubleType
    case ("FLOAT", _)                         => FloatType
    case other =>
      throw new IllegalArgumentException(s"unsupported field spec: $other")
  }

  def toStructField: StructField = StructField(name, sparkType, nullable)
}

object FieldSpec {

  /** Declared schema -> Spark StructType. */
  def toStructType(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(_.toStructField))

  /** Inverse mapping: StructField -> FieldSpec (for the schema-generate
    * tool, reference `internal/cmd/schema/generate.go` +
    * `internal/parquet/sql.go:10-61`; note the reference deliberately
    * widens INT32 -> INT64 "so the parquet schema works" — we keep that).
    */
  def fromStructField(f: StructField): FieldSpec = {
    val rep = if (f.nullable) Some("OPTIONAL") else Some("REQUIRED")
    f.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        FieldSpec(f.name, "INT64", None, rep)
      case StringType  => FieldSpec(f.name, "BYTE_ARRAY", Some("UTF8"), rep)
      case DateType    => FieldSpec(f.name, "INT32", Some("DATE"), rep)
      case d: DecimalType =>
        FieldSpec(f.name, "INT64", Some("DECIMAL"), rep,
          Some(d.scale), Some(d.precision))
      case TimestampType =>
        FieldSpec(f.name, "INT64", Some("TIMESTAMP_MILLIS"), rep)
      case BooleanType => FieldSpec(f.name, "BOOLEAN", None, rep)
      case DoubleType  => FieldSpec(f.name, "DOUBLE", None, rep)
      case FloatType   => FieldSpec(f.name, "FLOAT", None, rep)
      case other =>
        throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
  }

  /** `CREATE TABLE` column-list DDL -> declared schema, via Spark's own
    * parser (`StructType.fromDDL`). Replaces the reference's dependency on
    * a third-party SQL parser (`internal/cmd/schema/generate.go:28-54`).
    *
    * Accepts either a bare column list ("a INT, b STRING NOT NULL") or a
    * full `CREATE TABLE t (...)` statement.
    */
  def fromDdl(ddl: String): Seq[FieldSpec] = {
    val colList = {
      val trimmed = ddl.trim
      if (trimmed.toUpperCase.startsWith("CREATE TABLE")) {
        val open = trimmed.indexOf('(')
        val close = trimmed.lastIndexOf(')')
        require(open >= 0 && close > open, s"malformed CREATE TABLE: $ddl")
        trimmed.substring(open + 1, close)
      } else trimmed
    }
    // Normalize common Postgres types Spark's DDL parser doesn't accept.
    val normalized = colList
      .replaceAll("(?i)\\bSERIAL\\b", "INT")
      .replaceAll("(?i)\\bBIGSERIAL\\b", "BIGINT")
      .replaceAll("(?i)\\bTEXT\\b", "STRING")
      .replaceAll("(?i)\\bVARCHAR\\s*\\(\\d+\\)", "STRING")
      .replaceAll("(?i)\\bVARCHAR\\b", "STRING")
      .replaceAll("(?i)\\bPRIMARY\\s+KEY\\b", "")
      .replaceAll("(?i)\\bNUMERIC\\b", "DECIMAL")
    StructType.fromDDL(normalized).fields.toSeq.map(fromStructField)
  }
}
