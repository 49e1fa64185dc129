package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial neighbor search — the radius self-join behind
  * "areas near this area" / store-catchment / co-located-entity queries
  * (the reference's domain is literally lat/lng climbing areas; its
  * GeoJSON sink is covered in etl.Sinks, this is the analytic side).
  *
  * The scale shape is the classic GRID-BUCKETED spatial join: bucket the
  * plane into radius-sized cells, explode each point to its 3×3 cell
  * neighborhood on ONE side, and equi-join against home cells — lossless
  * for the radius (any pair within r differs by ≤ r per axis, hence lies
  * in adjacent cells), with join cost Σ per-cell 9·n_a·n_b — bounded by
  * spatial DENSITY, never n². The cell id is a uniform shuffle key for
  * uniform data; geographic hotspots make it skewed, which is exactly
  * what the library's salting/AQE toolbox (q115/q120) handles — same
  * pattern, spatial key.
  *
  * Distance is squared DEGREE-space (dx² + dy² ≤ r²): a fixed
  * subtract/multiply/add sequence both engines evaluate identically —
  * the demonstration keeps the contract exact rather than geodesic
  * (a haversine variant swaps the predicate; candidate generation is
  * unchanged as long as the cell size dominates the metric's radius). */
object Geo {

  /** Deterministic synthetic coordinate from a content hash: the 52-bit
    * md5 prefix as an exact dyadic uniform, scaled to [−offset,
    * span−offset) — engine-portable like every hash-derived decision in
    * the library (the [[Sampling.orderKey53]] convention). */
  def hashCoord(key: Column, salt: String, span: Double,
      offset: Double): Column =
    Sampling.orderKey53(concat(lit(salt), key.cast("string")))
      ./(lit(4503599627370496.0)).*(lit(span)).-(lit(offset))

  /** All point pairs (id_a < id_b) within `radiusDeg` in degree space,
    * with the squared distance. `points` must carry (id, lat, lng). */
  def radiusPairs(points: DataFrame, radiusDeg: Double): DataFrame = {
    require(radiusDeg > 0, s"radiusDeg=$radiusDeg")
    val r = radiusDeg
    // pinned: the celled relation is read by both join sides
    val celled = points.select(col("id"), col("lat"), col("lng"),
        floor((col("lng") + lit(180.0)) / lit(r)).cast("long").as("ix"),
        floor((col("lat") + lit(90.0)) / lit(r)).cast("long").as("iy"))
      .localCheckpoint()
    val neighbors = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct((col("ix") + dx).as("cx"), (col("iy") + dy).as("cy"))
    val exploded = celled.select(col("id").as("id_a"),
        col("lat").as("lat_a"), col("lng").as("lng_a"),
        explode(array(neighbors: _*)).as("c"))
      .select(col("id_a"), col("lat_a"), col("lng_a"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val home = celled.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lng").as("lng_b"), col("ix").as("cx"), col("iy").as("cy"))
    val d2 = (col("lng_a") - col("lng_b")) * (col("lng_a") - col("lng_b")) +
      (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b"))
    // each unordered pair survives exactly once: the b side sits at its
    // single home cell, and the id_a < id_b filter kills the mirrored hit
    exploded.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") && d2 <= lit(r * r))
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }
}
