package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.schema.FieldSpec

import scala.jdk.CollectionConverters._

/** YAML pipeline configuration, shape-compatible with the reference's
  * `internal/config/config.go:24-85` (librarian -> archiver -> source /
  * preserver / repository). Parsed with jackson-dataformat-yaml (already on
  * the Spark classpath) into plain case classes.
  *
  * Example (matches `dev/examples/property-sales.snapshot.yml` shape):
  * {{{
  * version: "1.0"
  * name: my-snapshot
  * archiver:
  *   source:
  *     type: parquet            # parquet | jdbc
  *     path: /root/testdata/sf0.001
  *     table: lineitem
  *     query: "SELECT * FROM lineitem"
  *   preserver:
  *     batch_size_num_records: 1000
  *     schema:
  *       fields:
  *         - {name: l_orderkey, type: INT64}
  *         - {name: l_comment, type: BYTE_ARRAY, converted_type: UTF8}
  *   repository:
  *     type: local              # local | s3
  *     path: /tmp/out
  * }}}
  */
case class SourceConfig(
    tpe: String,
    path: Option[String],
    url: Option[String],
    schema: Option[String],
    table: Option[String],
    query: Option[String])

case class PreserverConfig(
    batchSizeNumRecords: Option[Long],
    fields: Seq[FieldSpec])

case class RepositoryConfig(tpe: String, path: String)

case class ArchiverConfig(
    source: SourceConfig,
    preserver: PreserverConfig,
    repository: RepositoryConfig)

case class GraftConfig(version: String, name: String, archiver: ArchiverConfig)

object GraftConfig {
  private val mapper = new ObjectMapper(new YAMLFactory())

  def fromFile(path: String): GraftConfig =
    fromNode(mapper.readTree(new java.io.File(path)))

  def fromString(yaml: String): GraftConfig =
    fromNode(mapper.readTree(yaml))

  private def str(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText)

  private def fromNode(root: JsonNode): GraftConfig = {
    val arch = Option(root.get("archiver")).getOrElse(
      throw new IllegalArgumentException("config: missing 'archiver'"))
    val src = Option(arch.get("source")).getOrElse(
      throw new IllegalArgumentException("config: missing 'archiver.source'"))
    val pres = Option(arch.get("preserver"))
    val repo = Option(arch.get("repository")).getOrElse(
      throw new IllegalArgumentException("config: missing 'archiver.repository'"))

    val fields: Seq[FieldSpec] = pres
      .flatMap(p => Option(p.get("schema")))
      .flatMap(s => Option(s.get("fields")))
      .map(_.elements.asScala.toSeq.map { f =>
        FieldSpec(
          name = str(f, "name").getOrElse(
            throw new IllegalArgumentException("schema field missing 'name'")),
          tpe = str(f, "type").getOrElse(
            throw new IllegalArgumentException("schema field missing 'type'")),
          convertedType = str(f, "converted_type"),
          repetitionType = str(f, "repetition_type"),
          scale = Option(f.get("scale")).map(_.asInt),
          precision = Option(f.get("precision")).orElse(Option(f.get("length"))).map(_.asInt))
      })
      .getOrElse(Seq.empty)

    GraftConfig(
      version = str(root, "version").getOrElse("1.0"),
      name = str(root, "name").getOrElse("graft"),
      archiver = ArchiverConfig(
        source = SourceConfig(
          tpe = str(src, "type").getOrElse("parquet"),
          path = str(src, "path"),
          url = str(src, "url"),
          schema = str(src, "schema"),
          table = str(src, "table"),
          query = str(src, "query")),
        preserver = PreserverConfig(
          batchSizeNumRecords = pres.flatMap(p =>
            Option(p.get("batch_size_num_records")).map(_.asLong)),
          fields = fields),
        repository = RepositoryConfig(
          tpe = str(repo, "type").getOrElse("local"),
          path = str(repo, "path").getOrElse(
            throw new IllegalArgumentException("config: missing repository.path")))))
  }
}
