package graft.ingest

import graft.SparkSpec
import graft.query.Transforms
import org.apache.spark.sql.functions._

class HandlersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val long = Ingest.toLong(
    Seq((1L, "2024-01-02 00:00:00", "a", 10.0),
        (2L, "2023-06-01 00:00:00", "b", 20.0))  // old record
      .toDF("id", "ts", "cat", "num")
      .withColumn("ts", col("ts").cast("timestamp")),
    uidCol = "id", datatype = "t", dateCol = "ts")

  test("registry dispatches per datatype with discard interval") {
    val reg = Handlers.Registry()
      .register("t", df => df.filter(col("field") === "cat"))
      .register("t", df => Ingest.metadata(df))
    val outs = Handlers.dispatch(long, reg, maxAgeDays = Some(90),
      asOf = Some(java.sql.Date.valueOf("2024-01-31")))
    assert(outs.size == 2)
    val catRows = outs.find(o => o._2 == 0).get._3.collect()
    // uid 2 is older than the discard interval → dropped
    assert(catRows.map(_.getAs[String]("uid")).toSet == Set("1"))
  }

  test("writeAll fans one cached scan into all sinks") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    val paths = Handlers.writeAll(long, dir)
    assert(paths.size == 4)
    val gi = spark.read.parquet(s"$dir/global_index")
    assert(gi.count() > 0)
    val md = spark.read.parquet(s"$dir/metadata")
    assert(md.select("field").collect().map(_.getString(0)).toSet == Set("cat", "num"))
  }

  test("document transform chain composes in order") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    val out = Transforms.chain(Seq(
      Transforms.enrich(Map("v2" -> (col("v") * 2))),
      Transforms.dedup(Seq("k")),
      Transforms.where(col("v2") >= 2),
      Transforms.rename(Map("v2" -> "doubled")),
      Transforms.project(Seq("k", "doubled"))))(df)
    assert(out.columns.toSeq == Seq("k", "doubled"))
    assert(out.count() == 2)
  }
}
