package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.jexl.QueryPolicy
import graft.query.{QueryParams, ShardQueryLogic}

/** Geo gate queries — `geo:`/`geowave:` predicates driven by query strings
  * (GeoFunctions.java:69-149, GeoWaveFunctions.java:137-345).
  *
  * The driver tables carry no coordinates, so deterministic synthetic
  * lat/lon are derived per customer with pure integer arithmetic (mirrored
  * exactly in the DuckDB oracles): lat = (key·7919 mod 18000)/100 − 90,
  * lon = (key·104729 mod 36000)/100 − 180.
  */
object GeoQueries {

  private val logic =
    new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))

  private def withGeo(c: DataFrame): DataFrame =
    c.withColumn("lat",
        (pmod(col("c_custkey") * 7919, lit(18000)).cast("double") / 100.0) - 90.0)
      .withColumn("lon",
        (pmod(col("c_custkey") * 104729, lit(36000)).cast("double") / 100.0) - 180.0)

  private val geoSql =
    """(SELECT c_custkey,
      |   CAST((c_custkey * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
      |   CAST((c_custkey * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
      | FROM customer)""".stripMargin

  /** geo:within_bounding_box 6-arg (lonField, latField, bounds) form. */
  def geoBbox(s: SparkSession, d: String): DataFrame =
    logic.query(withGeo(Tables.customer(s, d)),
        "geo:within_bounding_box(LON, LAT, -30, 10, 40, 60)",
        QueryParams(returnFields = Seq("c_custkey", "lat", "lon")))
      .select("c_custkey", "lat", "lon")

  /** geo:within_circle on a combined 'lat_lon' value (Euclidean degrees,
    * exactly the reference's arithmetic). */
  def geoCircle(s: SparkSession, d: String): DataFrame =
    logic.query(
        withGeo(Tables.customer(s, d)).withColumn("latlon",
          concat(col("lat").cast("string"), lit("_"), col("lon").cast("string"))),
        "geo:within_circle(LATLON, '20.0_-50.0', 25)",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:intersects of per-row POINT WKT against a box polygon (JTS);
    * the axis-aligned box makes the oracle plain range arithmetic. */
  def geowaveIntersects(s: SparkSession, d: String): DataFrame =
    logic.query(
        withGeo(Tables.customer(s, d)).withColumn("geom",
          concat(lit("POINT ("), col("lon").cast("string"), lit(" "),
            col("lat").cast("string"), lit(")"))),
        "geowave:intersects(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** Scala replica of Normalizers.geoPointZ for driver-side bound
    * computation (same quantization + interleave). */
  private def zOf(lat: Double, lon: Double): Long = {
    val latQ = ((lat + 90.0) / 180.0 * ((1 << 20) - 1)).toLong
    val lonQ = ((lon + 180.0) / 360.0 * ((1 << 20) - 1)).toLong
    (0 until 20).map { i =>
      (((latQ >> i) & 1L) << (2 * i + 1)) | (((lonQ >> i) & 1L) << (2 * i))
    }.reduce(_ | _)
  }

  /** Same bbox THROUGH the z-order composite key: Morton codes are
    * monotone per coordinate, so the box is contained in
    * [z(ll), z(ur)] — a coarse sargable range prefilter (the
    * CompositeSeekingIterator / GeoWave SFC pruning story; at scale zkey
    * is the sort/partition column so this range prunes files), then the
    * exact predicate refines. Output equals geo_bbox. */
  def geoBboxZ(s: SparkSession, d: String): DataFrame = {
    val g = withGeo(Tables.customer(s, d))
      .withColumn("zkey", graft.functions.Normalizers.geoPointZ(col("lat"), col("lon")))
    g.filter(col("zkey").between(zOf(10, -30), zOf(60, 40)))
      .filter(col("lat").between(10, 60) && col("lon").between(-30, 40))
      .select("c_custkey", "lat", "lon")
  }

  /** The same bounding box from a LUCENE `#GEO` string — the
    * GeoFunction.java translation path end-to-end. */
  def luceneGeo(s: SparkSession, d: String): DataFrame =
    logic.query(withGeo(Tables.customer(s, d)),
        "#GEO(bounding_box, LON, LAT, '-30', '10', '40', '60')",
        QueryParams(returnFields = Seq("c_custkey", "lat", "lon"),
          syntax = "LUCENE"))
      .select("c_custkey", "lat", "lon")

  private def pointWkt(c: DataFrame): DataFrame =
    c.withColumn("geom",
      concat(lit("POINT ("), col("lon").cast("string"), lit(" "),
        col("lat").cast("string"), lit(")")))

  /** Per-row axis-aligned BOX polygon around the synthetic point, with a
    * custkey-derived half-width 1..5° — box-vs-box and box-vs-point
    * JTS predicates become exact range arithmetic in the oracle. */
  private def boxWkt(c: DataFrame): DataFrame = {
    val h = (pmod(col("c_custkey"), lit(5)) + 1).cast("double")
    def s(x: org.apache.spark.sql.Column) = x.cast("string")
    c.withColumn("x1", col("lon") - h).withColumn("x2", col("lon") + h)
      .withColumn("y1", col("lat") - h).withColumn("y2", col("lat") + h)
      .withColumn("geom", concat(lit("POLYGON (("),
        s(col("x1")), lit(" "), s(col("y1")), lit(", "),
        s(col("x2")), lit(" "), s(col("y1")), lit(", "),
        s(col("x2")), lit(" "), s(col("y2")), lit(", "),
        s(col("x1")), lit(" "), s(col("y2")), lit(", "),
        s(col("x1")), lit(" "), s(col("y1")), lit("))")))
  }

  /** geowave:covered_by — point coveredBy box is the INCLUSIVE range
    * check (boundary points covered, unlike `within`). */
  def geowaveCoveredBy(s: SparkSession, d: String): DataFrame =
    logic.query(pointWkt(withGeo(Tables.customer(s, d))),
        "geowave:covered_by(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:within — JTS `within` needs an INTERIOR intersection, so a
    * point exactly on the box boundary is NOT within (the strict form of
    * covered_by; the two gates differ on real boundary rows). */
  def geowaveWithin(s: SparkSession, d: String): DataFrame =
    logic.query(pointWkt(withGeo(Tables.customer(s, d))),
        "geowave:within(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:contains — the ROW geometry (box) contains the QUERY point:
    * strict interior membership (a boundary-only touch is not
    * containment). */
  def geowaveContains(s: SparkSession, d: String): DataFrame =
    logic.query(boxWkt(withGeo(Tables.customer(s, d))),
        "geowave:contains(GEOM, 'POINT (5 35)')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:overlaps — row box vs query box: interiors intersect but
    * NEITHER covers the other (JTS overlaps for same-dimension
    * geometries). */
  def geowaveOverlaps(s: SparkSession, d: String): DataFrame =
    logic.query(boxWkt(withGeo(Tables.customer(s, d))),
        "geowave:overlaps(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:covers — the ROW box covers the QUERY point: the INCLUSIVE
    * form of contains (boundary touch counts). */
  def geowaveCovers(s: SparkSession, d: String): DataFrame =
    logic.query(boxWkt(withGeo(Tables.customer(s, d))),
        "geowave:covers(GEOM, 'POINT (5 35)')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")

  /** geowave:crosses — a VERTICAL segment per row (the point stretched
    * ±h in latitude) vs the query box: JTS crosses holds iff the
    * segment's interior meets both the box interior and its exterior —
    * exactly the span conditions the oracle states. */
  def geowaveCrosses(s: SparkSession, d: String): DataFrame = {
    val h = (pmod(col("c_custkey"), lit(5)) + 1).cast("double")
    val seg = withGeo(Tables.customer(s, d))
      .withColumn("geom", concat(lit("LINESTRING ("),
        col("lon").cast("string"), lit(" "), (col("lat") - h).cast("string"),
        lit(", "),
        col("lon").cast("string"), lit(" "), (col("lat") + h).cast("string"),
        lit(")")))
    logic.query(seg,
        "geowave:crosses(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))')",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")
  }

  /** Whindex value-trigger remap (WhindexVisitor.java:58-71): the frame
    * has NO generic GEOM column at all — only the value-specific
    * MARS_GEOM (populated where planet = MARS, the pre-filtered index
    * the whindex exists to exploit). The query names GEOM && the marker;
    * the mapping swaps the field and consumes the marker term, and the
    * query can only succeed through the remap (compiling GEOM would
    * refuse: nonexistent field). */
  def whindexRemap(s: SparkSession, d: String): DataFrame = {
    val g = withGeo(Tables.customer(s, d))
      .withColumn("planet",
        when(col("c_custkey") % 3 === 0, "MARS").otherwise("VENUS"))
      // derived from custkey, not planet: after the remap consumes the
      // marker, NOTHING references planet — Catalyst prunes the column
      // out of the scan entirely (PlanSpec pins that)
      .withColumn("mars_geom",
        when(col("c_custkey") % 3 === 0,
          concat(lit("POINT ("), col("lon").cast("string"), lit(" "),
            col("lat").cast("string"), lit(")"))))
    val wl = new ShardQueryLogic(
      policy = QueryPolicy(fullTableScanEnabled = true),
      whindex = Seq(graft.jexl.Whindex.Mapping("PLANET", "MARS", "GEOM", "MARS_GEOM")))
    wl.query(g,
        "geowave:intersects(GEOM, 'POLYGON ((-30 10, 40 10, 40 60, -30 60, -30 10))') && PLANET == 'MARS'",
        QueryParams(returnFields = Seq("c_custkey")))
      .select("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lucene_geo" -> luceneGeo _,
    "whindex_remap" -> whindexRemap _,
    "geo_bbox" -> geoBbox _,
    "geo_bbox_z" -> geoBboxZ _,
    "geo_circle" -> geoCircle _,
    "geowave_intersects" -> geowaveIntersects _,
    "geowave_covered_by" -> geowaveCoveredBy _,
    "geowave_within" -> geowaveWithin _,
    "geowave_contains" -> geowaveContains _,
    "geowave_overlaps" -> geowaveOverlaps _,
    "geowave_covers" -> geowaveCovers _,
    "geowave_crosses" -> geowaveCrosses _,
  )

  val oracleSql: Map[String, String] = Map(
    // the remapped query is the value-specific slice: planet-MARS rows
    // (custkey ≡ 0 mod 3) whose point intersects the box
    "whindex_remap" ->
      s"""SELECT c_custkey FROM $geoSql
         | WHERE c_custkey % 3 = 0
         |   AND lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    "lucene_geo" ->
      s"""SELECT c_custkey, lat, lon FROM $geoSql
         | WHERE lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    "geo_bbox_z" ->
      s"""SELECT c_custkey, lat, lon FROM $geoSql
         | WHERE lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    "geo_bbox" ->
      s"""SELECT c_custkey, lat, lon FROM $geoSql
         | WHERE lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    "geo_circle" ->
      s"""SELECT c_custkey FROM $geoSql
         | WHERE (lon - (-50.0)) * (lon - (-50.0)) +
         |       (lat - 20.0) * (lat - 20.0) <= 25.0 * 25.0""".stripMargin,
    "geowave_intersects" ->
      s"""SELECT c_custkey FROM $geoSql
         | WHERE lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    // point coveredBy box: inclusive ranges
    "geowave_covered_by" ->
      s"""SELECT c_custkey FROM $geoSql
         | WHERE lat >= 10 AND lat <= 60 AND lon >= -30 AND lon <= 40""".stripMargin,
    // point within box: JTS within requires interior intersection, so
    // strict ranges (boundary rows excluded — this oracle differs from
    // covered_by exactly on them)
    "geowave_within" ->
      s"""SELECT c_custkey FROM $geoSql
         | WHERE lat > 10 AND lat < 60 AND lon > -30 AND lon < 40""".stripMargin,
    // row box (half-width h = custkey mod 5 + 1) contains POINT (5 35):
    // strict interior membership
    "geowave_contains" ->
      s"""SELECT c_custkey FROM (
         |  SELECT c_custkey, lat, lon,
         |    CAST(c_custkey % 5 + 1 AS DOUBLE) AS h
         |  FROM $geoSql t)
         | WHERE lon - h < 5 AND 5 < lon + h
         |   AND lat - h < 35 AND 35 < lat + h""".stripMargin,
    // row box vs query box (-30..40, 10..60): interiors intersect AND
    // neither covers the other (the row box never covers the 70x50
    // query box, so only query-covers-row must be excluded)
    "geowave_overlaps" ->
      s"""SELECT c_custkey FROM (
         |  SELECT c_custkey, lon - h AS x1, lon + h AS x2,
         |         lat - h AS y1, lat + h AS y2
         |  FROM (SELECT c_custkey, lat, lon,
         |          CAST(c_custkey % 5 + 1 AS DOUBLE) AS h
         |        FROM $geoSql t) b)
         | WHERE x1 < 40 AND x2 > -30 AND y1 < 60 AND y2 > 10
         |   AND NOT (x1 >= -30 AND x2 <= 40 AND y1 >= 10 AND y2 <= 60)""".stripMargin,
    // row box covers POINT (5 35): inclusive membership
    "geowave_covers" ->
      s"""SELECT c_custkey FROM (
         |  SELECT c_custkey, lat, lon,
         |    CAST(c_custkey % 5 + 1 AS DOUBLE) AS h
         |  FROM $geoSql t)
         | WHERE lon - h <= 5 AND 5 <= lon + h
         |   AND lat - h <= 35 AND 35 <= lat + h""".stripMargin,
    // vertical segment {lon} x [lat-h, lat+h] crosses the box iff lon is
    // strictly inside (-30, 40), the open segment meets the open lat
    // band (10, 60), and it also exits the closed band
    "geowave_crosses" ->
      s"""SELECT c_custkey FROM (
         |  SELECT c_custkey, lat, lon,
         |    CAST(c_custkey % 5 + 1 AS DOUBLE) AS h
         |  FROM $geoSql t)
         | WHERE lon > -30 AND lon < 40
         |   AND lat - h < 60 AND lat + h > 10
         |   AND (lat - h < 10 OR lat + h > 60)""".stripMargin,
  )
}
