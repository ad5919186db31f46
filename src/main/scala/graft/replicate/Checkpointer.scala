package graft.replicate

import graft.model.Checkpoint

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Base64

/** Checkpoint persistence for the embedded-library API. Structured
  * Streaming queries use `checkpointLocation` (Spark's own offset log); this
  * trait exists for API parity with the reference's `Checkpointer`
  * (`pkg/replicator/checkpoint.go:20-29`) so sources driven outside a
  * StreamingQuery (library embedding, README.md:301-398) can resume.
  */
trait Checkpointer {
  def save(c: Checkpoint): Unit
  /** None when no checkpoint exists yet for this replicator id. */
  def load(replicatorId: String): Option[Checkpoint]
}

/** JSON-file checkpointer with atomic tmp+rename writes, mirroring
  * `pkg/replicator/checkpoint.go:57-126`. File layout:
  * `<dir>/<replicatorId>.json` containing
  * `{"replicator_id":..., "position":"<base64>", "timestamp_ms":...}`.
  */
class FilesystemCheckpointer(dir: String) extends Checkpointer {
  private val base: Path = Paths.get(dir)
  Files.createDirectories(base)

  private def fileFor(id: String): Path = {
    // strict allow-list: the id lands in both a filename and a JSON string
    // literal, so reject anything that would need escaping in either
    require(id.nonEmpty && id.matches("[A-Za-z0-9._\\-]+"),
      s"bad replicator id (allowed: letters, digits, . _ -): $id")
    base.resolve(s"$id.json")
  }

  override def save(c: Checkpoint): Unit = {
    val b64 = Base64.getEncoder.encodeToString(c.position)
    val json =
      s"""{"replicator_id":"${c.replicatorId}","position":"$b64","timestamp_ms":${c.timestampMs}}"""
    val target = fileFor(c.replicatorId)
    val tmp = base.resolve(s".${c.replicatorId}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def load(replicatorId: String): Option[Checkpoint] = {
    val f = fileFor(replicatorId)
    if (!Files.exists(f)) None
    else {
      val json = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      // fields are flat and known — a tiny extractor beats a parser dep
      def field(k: String): Option[String] =
        s""""$k"\\s*:\\s*("([^"]*)"|\\d+)""".r.findFirstMatchIn(json)
          .map(m => Option(m.group(2)).getOrElse(m.group(1)))
      for {
        id <- field("replicator_id")
        pos <- field("position")
        ts <- field("timestamp_ms")
      } yield Checkpoint(id, Base64.getDecoder.decode(pos), ts.toLong)
    }
  }
}
