package graft.ops

import graft.SparkTestSession
import graft.functions.JaroWinklerKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val entities = Seq(
    (1L, "jon smith"), (2L, "john smith"), (3L, "john smyth"),
    (4L, "jane smith"), (5L, "bob jones"), (6L, "rob jones"),
    (7L, "zz")).toDF("id", "name")

  test("within-block pairs above threshold, ordered ids, 6dp sims") {
    val out = Linkage.fuzzyPairs(entities, "id", "name",
        substring(col("name"), 1, 1), 0.9)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // blocking on first char: j-block {1,2,3,4}, b-block {5}, r-block {6},
    // z-block {7} — bob/rob NEVER pair (different blocks) even though
    // jw(bob jones, rob jones) = 0.925
    assert(out.forall { case (a, b, s) => a < b && s >= 0.9 })
    assert(out.map(p => (p._1, p._2)).toSet
      .subsetOf(Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))))
    assert(out.map(p => (p._1, p._2)).contains((2L, 3L))) // john smith/smyth
    assert(!out.map(p => (p._1, p._2)).contains((5L, 6L)))
  }

  test("matches a brute-force oracle within blocks") {
    val t = 0.86
    val got = Linkage.fuzzyPairs(entities, "id", "name",
        substring(col("name"), 1, 1), t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    val rows = entities.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, na) <- rows; (ib, nb) <- rows
      if ia < ib && na.head == nb.head
      s = JaroWinklerKernel.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(na),
        org.apache.spark.unsafe.types.UTF8String.fromString(nb))
      sr = math.floor(s * 1e6 + 0.5) / 1e6
      if sr >= t
    } yield (ia, ib, sr)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("length prefilter is lossless: same result with and without it in range") {
    // t = 0.9 -> ratio gate 0.5; craft a pair near the boundary
    val df = Seq((1L, "abcdefgh"), (2L, "abcd"), (3L, "abcdefghx"))
      .toDF("id", "name")
    val out = Linkage.fuzzyPairs(df, "id", "name", lit("k"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle without any gate
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, na) <- rows; (ib, nb) <- rows if ia < ib
      s = JaroWinklerKernel.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(na),
        org.apache.spark.unsafe.types.UTF8String.fromString(nb))
      if math.floor(s * 1e6 + 0.5) / 1e6 >= 0.9
    } yield (ia, ib)).toSet
    assert(out == want)
  }

  test("resolveEntities: transitive chain collapses to one entity") {
    import spark.implicits._
    // marthe~martha pair, martha~marta pair; marthe~marta alone may not
    // clear 0.93 — CC must still put all three in one entity. "zebra"
    // matches nothing and keeps its own id.
    val df = Seq((10L, "martha"), (11L, "marthe"), (12L, "martah"),
      (20L, "zebra"))
      .toDF("id", "name")
    val out = Linkage.resolveEntities(df, "id", "name", lit("k"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L), (20L, 20L, 1L)))
  }

  test("resolveEntities: blocks gate matching, singletons keep own id") {
    import spark.implicits._
    val df = Seq((1L, "alpha one"), (2L, "alpha one"), (3L, "beta one"))
      .toDF("id", "name")
    // block on first token: ids 1,2 share a block and are identical;
    // id 3 is in another block, so even an identical suffix can't pair
    val out = Linkage.resolveEntities(df, "id", "name",
        org.apache.spark.sql.functions.split(col("name"), " ").getItem(0),
        0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }
}
