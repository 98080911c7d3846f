package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable facet sketches (FacetHandler sketch interchange): the
  * serialized sketch column must survive persistence and merge across
  * independently-written batches to the same estimates. */
class FacetsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (day, user, event_type)
    ("d1", 1, "click"), ("d1", 1, "view"), ("d1", 2, "click"),
    ("d2", 1, "click"), ("d2", 1, "purchase"), ("d2", 2, "click"),
    ("d3", 2, "signup"), ("d3", 3, "error"))
    .toDF("day", "user_id", "event_type")

  test("batch sketches merge to exact distinct counts at low cardinality") {
    val merged = Facets.merge(
      Facets.sketchBatches(rows, "day", "user_id", "event_type"), "user_id")
      .orderBy("user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // user 1: click/view/purchase = 3 distinct over 4 rows;
    // user 2: click/signup = 2 over 3; user 3: error = 1 over 1
    assert(merged.toSeq == Seq((1, 3L, 4L), (2, 2L, 3L), (3, 1L, 1L)))
  }

  test("sketch binaries survive a parquet round-trip and late-batch union") {
    val dir = java.nio.file.Files.createTempDirectory("facets").toString
    // batches d1/d2 written by one "ingest run", d3 by a later one —
    // the incremental-maintenance shape
    Facets.sketchBatches(rows.filter(col("day") =!= "d3"),
      "day", "user_id", "event_type").write.parquet(s"$dir/b1")
    Facets.sketchBatches(rows.filter(col("day") === "d3"),
      "day", "user_id", "event_type").write.parquet(s"$dir/b2")
    val reread = spark.read.parquet(s"$dir/b1").unionAll(
      spark.read.parquet(s"$dir/b2"))
    val merged = Facets.merge(reread, "user_id").orderBy("user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == Seq((1, 3L, 4L), (2, 2L, 3L), (3, 1L, 1L)))
  }
}
