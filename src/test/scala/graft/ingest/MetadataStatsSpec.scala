package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ingest-maintained planning statistics (EventMetadata.java:96-110
  * pattern): per-datatype max_tree_depth written at ingest, merged
  * across batches with max/sum, read back at plan time — never derived
  * by a per-query corpus scan. */
class MetadataStatsSpec extends SparkSpec {
  import spark.implicits._

  test("two ingest batches merge to the whole-corpus statistic: max of depths, sum of counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms1").toString
    // batch 1: flat roots; batch 2: dotted children of the SAME datatype
    // plus a second datatype that only ever sees batch 2
    val b1 = Seq(("r1", "doc"), ("r2", "doc")).toDF("uid", "datatype")
    val b2 = Seq(("r1.1", "doc"), ("r1.2.1", "doc"), ("e1", "edge"))
      .toDF("uid", "datatype")
    MetadataStats.update(spark, dir, Ingest.datatypeStats(b1))
    MetadataStats.update(spark, dir, Ingest.datatypeStats(b2))
    val rows = MetadataStats.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("doc", 3L, 4L), ("edge", 1L, 1L)))
    // the planner's read-back: corpus-wide and per-datatype
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(3))
    assert(MetadataStats.maxTreeDepth(spark, dir, Some("edge")) == Some(1))
    assert(MetadataStats.maxTreeDepth(spark, dir, Some("nope")) == None)
  }

  test("merge order does not matter and replays converge (max/sum over the union)") {
    val a = Seq(("r1", "doc")).toDF("uid", "datatype")
    val b = Seq(("r1.1", "doc")).toDF("uid", "datatype")
    val ab = Ingest.mergeDatatypeStats(
      Ingest.datatypeStats(a), Ingest.datatypeStats(b))
    val ba = Ingest.mergeDatatypeStats(
      Ingest.datatypeStats(b), Ingest.datatypeStats(a))
    assert(ab.collect().toSet == ba.collect().toSet)
    assert(ab.head().getLong(1) == 2L && ab.head().getLong(2) == 2L)
  }

  test("no statistic stored yet answers None, not a guess — the caller owns the backfill decision") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms2").toString
    assert(MetadataStats.maxTreeDepth(spark, dir) == None)
  }

  test("a crash between the update's renames recovers on the next read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms3").toString
    val b1 = Seq(("r1.1", "doc")).toDF("uid", "datatype")
    MetadataStats.update(spark, dir, Ingest.datatypeStats(b1))
    // simulate the half-swapped window: store moved aside, tmp gone
    val t = java.nio.file.Paths.get(s"$dir/datatype_stats")
    java.nio.file.Files.move(t,
      java.nio.file.Paths.get(s"$dir/datatype_stats.old"))
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(2))
  }

  test("updateBatch is replay-idempotent: a crash-replayed batch REPLACES its rows, cnt stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms5").toString
    val b1 = Seq(("r1", "doc"), ("r2", "doc")).toDF("uid", "datatype")
    val b2 = Seq(("r1.1", "doc"), ("r1.2.1", "doc"), ("e1", "edge"))
      .toDF("uid", "datatype")
    MetadataStats.updateBatch(dir, 0L, Ingest.datatypeStats(b1))
    MetadataStats.updateBatch(dir, 1L, Ingest.datatypeStats(b2))
    // the crash window update() cannot survive: the store committed but
    // the producer's own checkpoint didn't — the batch replays
    MetadataStats.updateBatch(dir, 1L, Ingest.datatypeStats(b2))
    MetadataStats.updateBatch(dir, 1L, Ingest.datatypeStats(b2))
    val rows = MetadataStats.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("doc", 3L, 4L), ("edge", 1L, 1L)),
      s"replay double-counted: $rows")
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(3))
  }

  test("legacy merged generations and per-batch rows merge at read time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms6").toString
    val backfill = Seq(("r1", "doc"), ("r2", "doc")).toDF("uid", "datatype")
    val live = Seq(("r1.1", "doc")).toDF("uid", "datatype")
    MetadataStats.update(spark, dir, Ingest.datatypeStats(backfill))
    MetadataStats.updateBatch(dir, 7L, Ingest.datatypeStats(live))
    val rows = MetadataStats.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("doc", 2L, 3L)))
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(2))
  }

  test("a partial per-batch dir (crash mid-updateBatch) neither folds in nor wedges the read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms7").toString
    val b1 = Seq(("r1", "doc")).toDF("uid", "datatype")
    MetadataStats.updateBatch(dir, 0L, Ingest.datatypeStats(b1))
    // crash-partial batch 1: garbage part file, no _SUCCESS
    val partial = java.nio.file.Paths
      .get(s"$dir/datatype_stats_batches/batch=1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-00000.snappy.parquet"),
      "not parquet".getBytes)
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(1))
    assert(MetadataStats.read(spark, dir).count() == 1)
  }

  test("a marker-disabled committer conf still reads its stores — no permanent None") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms8").toString
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    try {
      val b1 = Seq(("r1.1", "doc")).toDF("uid", "datatype")
      // both producer paths write WITHOUT markers under this conf; the
      // committedUnder probe must degrade rather than read absent forever
      MetadataStats.update(spark, dir, Ingest.datatypeStats(b1))
      assert(!graft.core.Fs.committed(s"$dir/datatype_stats"),
        "precondition: the disabled committer writes no markers")
      assert(MetadataStats.maxTreeDepth(spark, dir) == Some(2))
      MetadataStats.updateBatch(dir, 0L, Ingest.datatypeStats(b1))
      assert(MetadataStats.read(spark, dir)
        .head().getLong(2) == 2L) // legacy + batch rows both served
    } finally
      hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
  }

  test("a crash mid-first-write reads as absent and the retried update heals it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ms4").toString
    val b1 = Seq(("r1.1", "doc")).toDF("uid", "datatype")
    MetadataStats.update(spark, dir, Ingest.datatypeStats(b1))
    // strip the commit proof: the generation must count as ABSENT, not
    // wedge later reads with a corrupt-parquet error
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/datatype_stats/_SUCCESS"))
    assert(MetadataStats.maxTreeDepth(spark, dir) == None)
    MetadataStats.update(spark, dir, Ingest.datatypeStats(b1))
    assert(MetadataStats.maxTreeDepth(spark, dir) == Some(2))
  }
}
