package graft.replicate

import graft.model.Checkpoint
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class CheckpointerSpec extends AnyFunSuite {

  private def tmpDir = Files.createTempDirectory("graft-ckpt").toString

  test("save/load round-trips position bytes via base64") {
    val cp = new FilesystemCheckpointer(tmpDir)
    val pos = Array[Byte](0, 1, 2, -1, 127, 10, 34) // includes JSON-hostile bytes
    cp.save(Checkpoint("r1", pos, 1723400000000L))
    val got = cp.load("r1").get
    assert(got.replicatorId == "r1")
    assert(got.position.toSeq == pos.toSeq)
    assert(got.timestampMs == 1723400000000L)
  }

  test("load of unknown id is None") {
    assert(new FilesystemCheckpointer(tmpDir).load("nope").isEmpty)
  }

  test("save overwrites atomically (no .tmp left behind)") {
    val dir = tmpDir
    val cp = new FilesystemCheckpointer(dir)
    cp.save(Checkpoint("r1", "a".getBytes, 1L))
    cp.save(Checkpoint("r1", "b".getBytes, 2L))
    assert(new String(cp.load("r1").get.position) == "b")
    val leftovers = Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty)
  }

  test("ids that would escape the directory are rejected") {
    val cp = new FilesystemCheckpointer(tmpDir)
    intercept[IllegalArgumentException](cp.save(Checkpoint("../evil", Array(1), 1L)))
  }
}
