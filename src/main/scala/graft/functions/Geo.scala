package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.WKTReader

/** Geo predicates — the `geo:` numeric functions (GeoFunctions.java:69-149)
  * as pure Column arithmetic (codegen'd), and the `geowave:` topological
  * predicates (GeoWaveFunctions.java:137-345) via JTS (jts-core is a Spark
  * runtime dependency).
  *
  * The reference evaluates `geo:` in decimal-degree space, including the
  * antimeridian split when minLon > maxLon, and `within_circle` as a
  * EUCLIDEAN circle in degrees (not great-circle) — both reproduced
  * exactly. At scale the pruning story is the z-order key
  * ([[Normalizers.geoPointZ]]) as a partition/sort column; these
  * predicates then evaluate only surviving row groups.
  */
object Geo {

  /** Reference lat/lon bounding box with antimeridian handling
    * (GeoFunctions.evaluate / within_bounding_box 6-arg form). */
  def withinBoundingBox(lon: Column, lat: Column,
                        minLon: Double, minLat: Double,
                        maxLon: Double, maxLat: Double): Column = {
    val lonMatch =
      if (minLon > maxLon) // crossed the antimeridian: split
        (lon >= minLon && lon <= 180.0) || (lon >= -180.0 && lon <= maxLon)
      else lon >= minLon && lon <= maxLon
    lat >= minLat && lat <= maxLat && lonMatch
  }

  /** "lat_lon" combined-value parse (GeoNormalizer's separator). */
  def latOf(latLon: Column): Column =
    split(latLon, "_").getItem(0).cast("double")
  def lonOf(latLon: Column): Column =
    split(latLon, "_").getItem(1).cast("double")

  /** Euclidean degree-space circle, matching the reference exactly:
    * (lonΔ² + latΔ²) ≤ r². */
  def withinCircle(lon: Column, lat: Column,
                   centerLat: Double, centerLon: Double,
                   radius: Double): Column =
    (lon - centerLon) * (lon - centerLon) +
      (lat - centerLat) * (lat - centerLat) <= radius * radius

  /** Supported geowave topological relations. */
  val GeowaveOps: Set[String] =
    Set("contains", "covers", "covered_by", "crosses", "intersects",
      "overlaps", "within")

  /** Per-executor parse cache: WKT geometry columns repeat heavily
    * (points/footprints per producer); bound the cache to stay tiny. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Geometry]()
  private val MaxCache = 50000

  private def parseWkt(s: String): Geometry = {
    if (cache.size() > MaxCache) cache.clear()
    cache.computeIfAbsent(s, w => new WKTReader(new GeometryFactory()).read(w))
  }

  /** JTS topological predicate UDF: fieldWkt `op` queryWkt. The query
    * geometry is parsed once per executor (it is a closure constant);
    * field values go through the bounded parse cache. A UDF (not codegen)
    * is the right tradeoff here: full JTS topology can't be expressed in
    * Catalyst primitives, and geo predicates sit behind z-order pruning at
    * scale (GeoWavePruningVisitor analog). */
  def geowavePredicate(op: String, queryWkt: String): UserDefinedFunction = {
    require(GeowaveOps.contains(op), s"unknown geowave op $op")
    val opCopy = op
    val wktCopy = queryWkt
    udf((fieldWkt: String) => {
      if (fieldWkt == null) false
      else {
        try {
          val g = parseWkt(fieldWkt)
          val q = parseWkt(wktCopy)
          opCopy match {
            case "contains" => g.contains(q)
            case "covers" => g.covers(q)
            case "covered_by" => g.coveredBy(q)
            case "crosses" => g.crosses(q)
            case "intersects" => g.intersects(q)
            case "overlaps" => g.overlaps(q)
            case "within" => g.within(q)
          }
        } catch { case _: Exception => false }
      }
    })
  }
}
