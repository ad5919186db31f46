package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("haversine: textbook distances") {
    val out = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278), // Paris -> London ~343.5 km
      (0.0, 0.0, 0.0, 180.0),              // half the equator
      (10.0, 20.0, 10.0, 20.0))            // same point
      .toDF("la1", "lo1", "la2", "lo2")
      .select(Geo.haversineKm(col("la1"), col("lo1"),
        col("la2"), col("lo2")).as("d"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 343.5) < 1.0, s"Paris-London ${out(0)}")
    assert(math.abs(out(1) - math.Pi * Geo.EarthRadiusKm) < 0.01)
    assert(out(2) == 0.0)
  }

  test("gridKnnJoin: finds in-neighborhood neighbors, honors k and ties") {
    // query at origin; targets at increasing distance inside the 3x3
    // (cellDeg=1), one far target OUTSIDE the neighborhood (lat 5)
    val q = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    val t = Seq(
      (10L, 0.1, 0.0), (11L, 0.2, 0.0), (12L, 0.9, 0.9),
      (13L, 5.0, 0.0)) // outside 3x3 -> must not appear even for k=4
      .toDF("id", "lat", "lon")
    val out = Geo.gridKnnJoin(q, "id", t, "id", "lat", "lon",
        k = 4, cellDeg = 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 10L), (2, 11L), (3, 12L)))
  }

  test("gridKnnJoin: the antimeridian is a seam, not an edge") {
    // query just west of the dateline, target just east: ~11 km apart
    // in space but 359.9 degrees apart in raw longitude; a decoy target
    // sits 555 km away on the query's side
    val q = Seq((1L, 0.0, 179.95)).toDF("id", "lat", "lon")
    val t = Seq((10L, 0.0, -179.95), (11L, 0.0, 174.95))
      .toDF("id", "lat", "lon")
    val out = Geo.gridKnnJoin(q, "id", t, "id", "lat", "lon",
        k = 2, cellDeg = 10.0)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 2)
    assert(out(0)._2 == 10L, s"nearest across the seam: ${out.toSeq}")
    assert(out(0)._3 < 12.0 && out(1)._2 == 11L)
  }

  test("gridKnnJoin: matches brute force when everything is in range") {
    val qs = (1L to 5L).map(i => (i, i * 0.3 - 1.0, i * 0.2))
    val ts = (10L to 30L).map(i => (i, (i % 7) * 0.25 - 0.8, (i % 5) * 0.3))
    val out = Geo.gridKnnJoin(qs.toDF("id", "lat", "lon"), "id",
        ts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        k = 3, cellDeg = 4.0) // everything within one cell hop
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def hav(a: (Double, Double), b: (Double, Double)) = {
      val dla = math.toRadians(b._1 - a._1) / 2
      val dlo = math.toRadians(b._2 - a._2) / 2
      val x = math.sin(dla) * math.sin(dla) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.sin(dlo) * math.sin(dlo)
      math.rint(2 * Geo.EarthRadiusKm * math.asin(math.sqrt(x)) * 1e6) / 1e6
    }
    val want = qs.flatMap { case (qid, qla, qlo) =>
      ts.map { case (tid, tla, tlo) =>
        (qid, tid, hav((qla, qlo), (tla, tlo))) }
        .sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((_, tid, _), i) => (qid, i + 1, tid) }
    }
    assert(out.toSeq.sorted == want.sorted)
  }
}
