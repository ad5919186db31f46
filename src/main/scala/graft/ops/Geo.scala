package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Geospatial primitives: great-circle distance and the grid-bucketed
  * nearest-neighbor join — the spatial member of the "never cross join"
  * family (IVF partitions vector space, LSH buckets shingle space, the
  * degree cap bounds wedge space; here a lat/lon grid buckets the
  * globe). All column expressions ride Spark's codegen'd math
  * built-ins; no UDFs.
  */
object Geo {

  /** WGS-84 mean earth radius (km) — the standard haversine constant. */
  val EarthRadiusKm: Double = 6371.0088

  /** Great-circle distance in km between two (lat, lon) points, degrees
    * in, haversine formula (stable for small angles where the spherical
    * law of cosines loses precision).
    */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Grid-bucketed k-nearest-neighbor join: each point lands in a
    * `cellDeg`-degree grid cell; every query probes its 3×3 cell
    * neighborhood and ranks candidates by haversine distance
    * (6-dp-rounded, id tiebreak — deterministic under near-ties).
    * Returns (query id, rank 1..k, target id, distance_km).
    *
    * Contract: a neighbor is FOUND iff it lies in the 3×3 neighborhood
    * — anything within `cellDeg` degrees in both coordinates is
    * guaranteed in; farther points may be missed. Longitude wraps —
    * the antimeridian is a seam, not an edge, so lon 179.9 and −179.9
    * are adjacent cells. Latitude does not wrap (the polar-cap caveat
    * in the implementation note). Pick `cellDeg` at or
    * above the expected k-th-neighbor distance (the same
    * recall-vs-cost dial as IVF's nprobe). Queries with fewer than k
    * in-neighborhood candidates return what they found.
    *
    * 100 TB shape: targets key into ONE cell each, queries replicate
    * ×9 (a plan-time constant) — the join is a keyed equi-join on the
    * cell, never a cross join, and the per-query top-k is a window
    * over candidate rows only. Skew rail: a dense city cell makes a
    * hot key — the window stays candidate-bounded, and halving
    * cellDeg quarters the hot cell's population.
    */
  def gridKnnJoin(queries: DataFrame, qIdCol: String,
      targets: DataFrame, tIdCol: String,
      latCol: String, lonCol: String,
      k: Int, cellDeg: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(cellDeg > 0 && cellDeg <= 120.0,
      "cellDeg must be in (0, 120] — above 120 the 3-cell longitude " +
        "probe wraps onto itself and double-counts candidates")
    // cellDeg must divide 360: otherwise the seam cell is NARROWER than
    // cellDeg and the within-cellDeg recall guarantee silently breaks
    // for points straddling it (a 7-degree grid leaves a 3-degree sliver
    // at the antimeridian)
    require(math.abs(360.0 / cellDeg -
        math.round(360.0 / cellDeg).toDouble) < 1e-9,
      s"cellDeg must divide 360 evenly (got $cellDeg) — a fractional " +
        "last cell breaks the neighborhood guarantee at the seam")
    // longitude cells wrap at the antimeridian: ids live in
    // [0, ceil(360/cellDeg)) via a +180 shift, and neighbor probes go
    // through pmod — a query at lon 179.9 really does see targets at
    // -179.9 (they are km apart, not a world apart). Latitude does NOT
    // wrap: the poles are grid boundaries, not seams (two points "across"
    // a pole are in the same top cells only if longitudes agree — the
    // polar-cap caveat of every lat/lon grid; shrink cellDeg near poles
    // or pre-rotate if polar data matters).
    val nLon = math.ceil(360.0 / cellDeg).toLong
    val cellLat = (c: Column) => floor(c / cellDeg).cast("long")
    val cellLon = (c: Column) =>
      pmod(floor((c + 180.0) / cellDeg).cast("long"), lit(nLon))
    val t = targets.select(col(tIdCol).as("t_id"),
      col(latCol).as("t_lat"), col(lonCol).as("t_lon"),
      cellLat(col(latCol)).as("__cla"), cellLon(col(lonCol)).as("__clo"))
    val offsets = Seq(-1, 0, 1)
    val q = queries.select(col(qIdCol).as("q_id"),
        col(latCol).as("q_lat"), col(lonCol).as("q_lon"),
        cellLat(col(latCol)).as("__qla"), cellLon(col(lonCol)).as("__qlo"))
      .withColumn("__da", explode(typedLit(offsets)))
      .withColumn("__do", explode(typedLit(offsets)))
      .select(col("q_id"), col("q_lat"), col("q_lon"),
        (col("__qla") + col("__da")).as("__cla"),
        pmod(col("__qlo") + col("__do"), lit(nLon)).as("__clo"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("distance_km"), col("t_id"))
    q.join(t, Seq("__cla", "__clo"))
      .withColumn("distance_km",
        round(haversineKm(col("q_lat"), col("q_lon"),
          col("t_lat"), col("t_lon")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("t_id"), col("distance_km"))
      .orderBy(col("q_id"), col("rank"))
  }
}
