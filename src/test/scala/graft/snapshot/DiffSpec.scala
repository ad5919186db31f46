package graft.snapshot

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies insert/delete/update and drops unchanged keys") {
    val before = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
    ).toDF("id", "status", "amount")
    val after = Seq(
      (1L, "a", 10),   // unchanged -> dropped
      (2L, "b", 25),   // amount changed
      (4L, "x", 40),   // status changed
      (5L, "e", 50)    // new key
    ).toDF("id", "status", "amount")
    val out = Diff.diff(before, after, Seq("id"), Seq("status", "amount"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "update", 3L -> "delete", 4L -> "update",
      5L -> "insert"), s"got $out")
  }

  test("diff treats NULL-to-value transitions as updates (null-safe compare)") {
    val before = Seq((1L, Option.empty[String]), (2L, Option("v")))
      .toDF("id", "status")
    val after = Seq((1L, Option("now-set")), (2L, Option.empty[String]))
      .toDF("id", "status")
    val out = Diff.diff(before, after, Seq("id"), Seq("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "update", 2L -> "update"))
  }
}
