package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Observation
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate filters, dedups, annotates — audits ride the single pass") {
    val good = ("the quick brown fox jumps over the lazy dog and then rests " * 3).trim
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup -> dropped
      (3L, "too short"), // < 20 tokens -> filtered
      (4L, "!!! ??? " * 40), // punct soup -> filtered
      (5L, "der hund und die katze laufen durch den garten und dann " +
        "schlafen sie unter dem baum bis der regen kommt und alles nass ist")
    ).toDF("doc_id", "text")

    val obsIn = Observation("cur_in")
    val obsF = Observation("cur_filtered")
    val out = Curation.curate(docs, "doc_id", "text",
      obsIn = Some(obsIn), obsFiltered = Some(obsF)).collect()

    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 5L), s"expected 1 and 5 to survive, got $ids")
    assert(obsIn.get("n") == 5L)
    assert(obsF.get("n") == 3L) // 1, 2, 5 pass the gate
    val byId = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(5L) == "de")
    assert(byId(1L) == "en")
  }

  test("runs over the real documents table") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val out = Curation.curate(docs, "doc_id", "text")
    assert(out.count() > 0)
  }
}
