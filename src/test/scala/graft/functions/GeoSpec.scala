package graft.functions

import graft.SparkSpec
import graft.jexl.{Compiler, QueryModel, QueryPolicy}
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private val permissive = QueryPolicy(fullTableScanEnabled = true)

  private lazy val points = Seq(
    ("inside", 45.0, 10.0),
    ("edge_lat", 10.0, 0.0),      // on the min-lat boundary (inclusive)
    ("north", 75.0, 0.0),
    ("west", 45.0, -60.0),
    ("antimeridian_e", 0.0, 179.0),
    ("antimeridian_w", 0.0, -179.0))
    .toDF("name", "lat", "lon")

  private def names(jexl: String): Set[String] =
    Compiler.filter(points, jexl, QueryModel(), permissive)
      .select("name").collect().map(_.getString(0)).toSet

  test("geo:within_bounding_box 6-arg form, inclusive bounds") {
    assert(names("geo:within_bounding_box(LON, LAT, -30, 10, 40, 60)") ==
      Set("inside", "edge_lat"))
  }

  test("geo:within_bounding_box handles antimeridian crossing") {
    // minLon 170 > maxLon -170 → wraps across the antimeridian
    assert(names("geo:within_bounding_box(LON, LAT, 170, -10, -170, 10)") ==
      Set("antimeridian_e", "antimeridian_w"))
  }

  test("geo:within_bounding_box 3-arg lat_lon form and within_circle") {
    val combined = points.withColumn("pt",
      concat(col("lat").cast("string"), lit("_"), col("lon").cast("string")))
    def go(q: String): Set[String] =
      Compiler.filter(combined, q, QueryModel(), permissive)
        .select("name").collect().map(_.getString(0)).toSet
    assert(go("geo:within_bounding_box(PT, '10_-30', '60_40')") ==
      Set("inside", "edge_lat"))
    // Euclidean degree circle centered (45, 0) radius 11: includes
    // (45,10) at distance 10; excludes (75,0) at 30 and (45,-60) at 60
    assert(go("geo:within_circle(PT, '45.0_0.0', 11)") == Set("inside"))
  }

  test("geowave topological predicates via JTS") {
    val geoms = Seq(
      ("pt_in", "POINT (5 5)"),
      ("pt_out", "POINT (50 50)"),
      ("pt_edge", "POINT (0 5)"),
      ("poly_overlap", "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
      ("poly_inside", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"))
      .toDF("name", "geom")
    val box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    def go(q: String): Set[String] =
      Compiler.filter(geoms, q, QueryModel(), permissive)
        .select("name").collect().map(_.getString(0)).toSet
    assert(go(s"geowave:intersects(GEOM, '$box')") ==
      Set("pt_in", "pt_edge", "poly_overlap", "poly_inside"))
    assert(go(s"geowave:within(GEOM, '$box')") ==
      Set("pt_in", "poly_inside")) // boundary point is NOT within
    assert(go(s"geowave:covered_by(GEOM, '$box')") ==
      Set("pt_in", "pt_edge", "poly_inside"))
    assert(go(s"geowave:overlaps(GEOM, '$box')") == Set("poly_overlap"))
    assert(go(s"geowave:contains(GEOM, 'POINT (1.5 1.5)')") ==
      Set("poly_inside"))
  }
}
