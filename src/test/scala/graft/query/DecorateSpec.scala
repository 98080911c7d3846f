package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Transforms.decorate against the reference's
  * EventQueryDataDecorator semantics (EventQueryDataDecorator.java:23-63):
  * ordered first-match pattern walk, every-destination-row overwrite vs
  * visibility-inheriting append, deterministic first value for
  * multi-valued sources, and full placeholder substitution. */
class DecorateSpec extends SparkSpec {
  import spark.implicits._

  private def longFrame(rows: Seq[(String, String, String, String)]) =
    rows.toDF("uid", "visibility", "field", "value")
      .withColumn("datatype", lit("t"))
      .withColumn("shard_date", to_date(lit("2024-01-01")))
      .withColumn("group", lit(""))
      .select("uid", "datatype", "shard_date", "visibility", "field", "group", "value")

  private val patterns = Seq(
    "ID" -> "https://ex.org/id/@field_value@",
    "NAME" -> "https://ex.org/n/@field_value@")

  test("first matching pattern wins; later sources are ignored") {
    val df = longFrame(Seq(
      ("a", "V1", "ID", "42"), ("a", "V2", "NAME", "bob")))
    val out = Transforms.decorate("LINK", patterns)(df)
      .filter(col("field") === "LINK").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("value") == "https://ex.org/id/42")
    // appended row inherits the WINNING source's visibility
    assert(out(0).getAs[String]("visibility") == "V1")
  }

  test("ordered fallback: docs without the first source use the second") {
    val df = longFrame(Seq(("b", "V2", "NAME", "bob")))
    val out = Transforms.decorate("LINK", patterns)(df)
      .filter(col("field") === "LINK").collect()
    assert(out.length == 1 &&
      out(0).getAs[String]("value") == "https://ex.org/n/bob")
  }

  test("existing destination rows are ALL overwritten, markings untouched") {
    val df = longFrame(Seq(
      ("c", "V1", "ID", "7"),
      ("c", "D1", "LINK", "old1"), ("c", "D2", "LINK", "old2")))
    val out = Transforms.decorate("LINK", patterns)(df)
      .filter(col("field") === "LINK").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("value") == "https://ex.org/id/7"))
    // reference setValue()s in place — destination visibilities survive
    assert(out.map(_.getAs[String]("visibility")).sorted.toSeq == Seq("D1", "D2"))
  }

  test("multi-valued source: the deterministic first (minimum) value is used") {
    val df = longFrame(Seq(
      ("d", "V1", "ID", "9"), ("d", "V1", "ID", "3"), ("d", "V1", "ID", "5")))
    val out = Transforms.decorate("LINK", patterns)(df)
      .filter(col("field") === "LINK").collect()
    assert(out.length == 1 &&
      out(0).getAs[String]("value") == "https://ex.org/id/3")
  }

  test("no source field present leaves the document untouched") {
    val df = longFrame(Seq(("e", "V1", "OTHER", "x"), ("e", "D1", "LINK", "old")))
    val out = Transforms.decorate("LINK", patterns)(df)
    assert(out.count() == 2)
    val link = out.filter(col("field") === "LINK").collect()
    assert(link.length == 1 && link(0).getAs[String]("value") == "old")
  }

  test("every placeholder occurrence substitutes (String.replace semantics)") {
    val df = longFrame(Seq(("f", "V1", "ID", "5")))
    val out = Transforms.decorate("DOUBLED",
      Seq("ID" -> "@field_value@-@field_value@"))(df)
      .filter(col("field") === "DOUBLED").collect()
    assert(out.length == 1 && out(0).getAs[String]("value") == "5-5")
  }
}
