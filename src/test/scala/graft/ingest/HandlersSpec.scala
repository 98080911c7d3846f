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

  test("writeAll folds planning statistics from the same scan; a re-run replaces, not double-counts") {
    val dir = java.nio.file.Files.createTempDirectory("sinks2").toString
    val stats = java.nio.file.Files.createTempDirectory("stats2").toString
    Handlers.writeAll(long, dir, stats = Some((stats, 0L)))
    val once = MetadataStats.read(spark, stats)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    // the re-run of the SAME load (same batch id) overwrites its sinks
    // AND its statistics — cnt must not double
    Handlers.writeAll(long, dir, stats = Some((stats, 0L)))
    val twice = MetadataStats.read(spark, stats)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(once == twice, s"re-run double-counted: $once vs $twice")
    assert(once.map(_._2).sum == long.count())
  }

  test("date index resolves alternate date semantics to shard dates") {
    // event stored under its EVENT date, but carries a different
    // ACTIVITY date — the ACTIVITY-bounded query must reach the EVENT
    // shard via the index
    val df = Seq(
      ("e1", "2024-01-10", "2024-01-03"),  // stored Jan 10, activity Jan 3
      ("e2", "2024-01-11", "2024-01-20"))
      .toDF("uid", "shard_date", "activity_date")
      .withColumn("shard_date", col("shard_date").cast("date"))
    val idx = Ingest.dateIndex(df, "ACTIVITY", "activity_date")
    val shards = Ingest.shardDatesFor(idx, "ACTIVITY", "2024-01-01", "2024-01-05")
      .collect().map(_.getDate(0).toString)
    assert(shards.toSeq == Seq("2024-01-10"))
  }

  test("whindex swaps value-specific fields and drops the marker") {
    import graft.jexl._
    val ast = JexlParser.parse("geowave:intersects(GEO, 'POINT (1 1)') && PLANET == 'MARS'")
    val out = Whindex.rewrite(ast,
      Seq(Whindex.Mapping("PLANET", "MARS", "GEO", "MARS_GEO")))
    assert(out == Node.Func("geowave", "intersects",
      List(Node.FieldArg("MARS_GEO"), Node.LitArg(Literal.Str("POINT (1 1)")))))
    // unrelated marker values leave the tree untouched
    val ast2 = JexlParser.parse("geowave:intersects(GEO, 'POINT (1 1)') && PLANET == 'VENUS'")
    assert(Whindex.rewrite(ast2,
      Seq(Whindex.Mapping("PLANET", "MARS", "GEO", "MARS_GEO"))) == ast2)
  }

  test("whindex keeps the marker when no sibling references the generic field") {
    import graft.jexl._
    val ms = Seq(Whindex.Mapping("PLANET", "MARS", "GEO", "MARS_GEO"))
    // PLANET == 'MARS' here is an ordinary predicate the user wrote —
    // nothing to remap, so dropping it would silently widen the result
    val ast = JexlParser.parse("AGE > 30 && PLANET == 'MARS'")
    assert(Whindex.rewrite(ast, ms) == ast)
  }

  test("whindex swap reaches fields nested under boolean structure") {
    import graft.jexl._
    val ms = Seq(Whindex.Mapping("PLANET", "MARS", "GEO", "MARS_GEO"))
    val ast = JexlParser.parse(
      "(geowave:intersects(GEO, 'POINT (1 1)') || AGE > 99) && PLANET == 'MARS'")
    val out = Whindex.rewrite(ast, ms)
    assert(out == Node.Or(List(
      Node.Func("geowave", "intersects",
        List(Node.FieldArg("MARS_GEO"), Node.LitArg(Literal.Str("POINT (1 1)")))),
      Node.FieldOp("AGE", CompareOp.Gt, Literal.Num(BigDecimal(99))))))
  }

  test("modification service: field insert/delete via anti-join + union") {
    import Modifications._
    val out = applyEdits(long, Seq(
      DeleteField("1", "t", "cat"),                       // all instances
      DeleteField("2", "t", "num", value = Some("20.0")), // specific value
      PutField("1", "t", "cat", "z",
        shardDate = java.sql.Date.valueOf("2024-01-02"))))
    val rows = out.select("uid", "field", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(!rows.contains(("1", "cat", "a")))
    assert(rows.contains(("1", "cat", "z")))
    assert(!rows.exists(r => r._1 == "2" && r._2 == "num"))
    assert(rows.exists(r => r._1 == "2" && r._2 == "cat")) // untouched
  }

  test("patchIndex nets REMOVEDUID deltas against the Uid.List") {
    import Modifications._
    // 25 events of value 'x' on one day (saturates the 20-cap), 3 of 'y'
    val wide = ((1 to 25).map(i => (i.toLong, "2024-01-02 00:00:00", "x")) ++
        (26 to 28).map(i => (i.toLong, "2024-01-02 00:00:00", "y")))
      .toDF("id", "ts", "cat")
      .withColumn("ts", col("ts").cast("timestamp"))
    val lg = Ingest.toLong(wide, uidCol = "id", datatype = "t", dateCol = "ts")
      .filter(col("field") === "cat")
    val idx = Ingest.globalIndex(lg)
    val patched = patchIndex(idx, lg,
      (1 to 3).map(i => DeleteField(i.toString, "t", "cat"): FieldEdit) ++ Seq(
        DeleteField("26", "t", "cat"),
        DeleteField("27", "t", "cat"),
        DeleteField("28", "t", "cat"), // 'y' nets to zero → key vanishes
        PutField("90", "t", "cat", "z", // brand-new key materializes
          shardDate = java.sql.Date.valueOf("2024-01-03"))))
    val byValue = patched.collect()
      .map(r => r.getAs[String]("value") ->
        (r.getAs[Long]("cnt"), r.getAs[Seq[String]]("uid_sample")))
      .toMap
    // saturated key: COUNT is exact (25−3), uid list best-effort ≤ 20
    assert(byValue("x")._1 == 22 && byValue("x")._2.size <= 20)
    // overlapping whole-field + value-specific deletes for uid 1 must
    // not double-decrement (each long row removes once)
    val overlapped = patchIndex(idx, lg, Seq(
      DeleteField("1", "t", "cat"),
      DeleteField("1", "t", "cat", Some("x"))))
    assert(overlapped.filter(col("value") === "x")
      .head().getAs[Long]("cnt") == 24)
    assert(!byValue("x")._2.exists(Set("1", "2", "3"))) // removed uids gone
    assert(!byValue.contains("y"))                      // zeroed key vanished
    assert(byValue("z") == (1L, Seq("90")))             // new key from put
    // delete+put of the SAME uid in one batch (re-assert an entry): the
    // uid must survive in the sample — a sub-cap Uid.List is complete,
    // and a silently dropped uid would make the needle scan omit events
    val reasserted = patchIndex(idx, lg, Seq(
      DeleteField("26", "t", "cat", Some("y")),
      PutField("26", "t", "cat", "y",
        shardDate = java.sql.Date.valueOf("2024-01-02"))))
    val y = reasserted.filter(col("value") === "y").head()
    assert(y.getAs[Long]("cnt") == 3)
    assert(y.getAs[scala.collection.Seq[String]]("uid_sample").contains("26"))
  }

  test("age-off sweep expires by rule specificity") {
    import Modifications._
    val out = ageOff(long, Seq(
        AgeOffRule(datatype = Some("t"), field = Some("num"), ttlDays = 30),
        AgeOffRule(ttlDays = 365)),
      asOf = java.sql.Date.valueOf("2024-01-31"))
    val kept = out.select("uid", "field").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // uid 2 (2023-06-01) is older than 30d for num and within 365d for
    // the catch-all → its num rows expire, cat rows stay
    assert(!kept.contains(("2", "num")))
    assert(kept.contains(("2", "cat")))
    assert(kept.contains(("1", "num"))) // fresh rows stay
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
