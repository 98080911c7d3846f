package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BatchStore contracts the streamed tiers all inherit — in particular
  * the compaction horizon's commit-proof rule: "a `batch=N` dir exists"
  * is NOT "batch N registered". A crash mid-`registerBatch` leaves a
  * partial dir with no `_SUCCESS`; compaction must neither fold those
  * rows nor advance the horizon past them, or the checkpoint replay of
  * batch N would skip re-registration and the missing rows would be
  * lost permanently. */
class BatchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(b: Long, n: Int) =
    (0 until n).map(i => (b * 100 + i, b)).toDF("id", "b")

  private def storeIds(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("id").as[Long].collect().toSeq.sorted

  test("compact never folds an unproven batch; horizon stays below it; the carried dir replays in full") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs1").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 3), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 3), store, 1L)
    // crash window: batch 2's write landed its rows but never
    // committed — no _SUCCESS marker
    BatchStore.registerBatch(rowsOf(2, 3), store, 2L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$store/batch=2/_SUCCESS"))
    BatchStore.compact(spark, store)
    // horizon proves only batches 0-1; batch 2 is carried verbatim as a
    // splinter dir (visible exactly as before compaction) — NOT folded
    // (replay would then duplicate it) and NOT dropped (if its stream
    // commit DID land, dropping would lose it permanently)
    assert(BatchStore.compactedThrough(store) == 1L)
    val subdirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(subdirs == Seq("batch=2", "batch=compacted"),
      subdirs.mkString(","))
    assert(storeIds(store) ==
      Seq(0L, 1L, 2L, 100L, 101L, 102L, 200L, 201L, 202L))
    // the checkpoint replay of the uncommitted batch overwrites the
    // carried dir in place — exactly-once
    BatchStore.registerBatch(rowsOf(2, 3), store, 2L)
    assert(storeIds(store) ==
      Seq(0L, 1L, 2L, 100L, 101L, 102L, 200L, 201L, 202L))
    val dup = spark.read.parquet(store).groupBy("id").count()
      .filter(col("count") > 1).count()
    assert(dup == 0, "replay duplicated store rows")
  }

  test("every batch above an unproven gap is carried as a splinter dir, so replays overwrite instead of duplicating") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs2").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    BatchStore.registerBatch(rowsOf(2, 2), store, 2L)
    // batch 1 crashed mid-write; batch 2 landed on disk but its STREAM
    // commit may not have — both must stay individually re-registerable
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$store/batch=1/_SUCCESS"))
    BatchStore.compact(spark, store)
    assert(BatchStore.compactedThrough(store) == 0L)
    val subdirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(subdirs == Seq("batch=1", "batch=2", "batch=compacted"),
      subdirs.mkString(","))
    // replay both: each overwrites its carried splinter dir in place
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    BatchStore.registerBatch(rowsOf(2, 2), store, 2L)
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L, 200L, 201L))
    val dup = spark.read.parquet(store).groupBy("id").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("a marker-conf flip (ON then OFF) never loses committed batches: unmarked dirs are carried, not dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs5").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store) // seed carries a marker
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    // the conf flips markers OFF: later batches commit without proof
    // (simulated by stripping the markers from 0 and 1 — the store now
    // has marker-bearing dirs [seed] beside unmarked committed batches)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$store/batch=0/_SUCCESS"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$store/batch=1/_SUCCESS"))
    BatchStore.compact(spark, store)
    // nothing folds past the proof gap, and — critically — NOTHING is
    // lost: both unmarked batches survive as carried splinter dirs
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L),
      "conf-flip batches must survive compaction")
    assert(BatchStore.compactedThrough(store) == -1L ||
      BatchStore.compactedThrough(store) < 0L)
  }

  test("a deployment with _SUCCESS markers disabled falls back to fold-everything — never data loss") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs4").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    // simulate mapreduce.fileoutputcommitter.marksuccessfuljobs=false:
    // no dir anywhere carries a marker — treating every dir as
    // "unproven partial" would silently DELETE all registered batches
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(store))
      .iterator().asScala.toSeq
      .filter(_.getFileName.toString == "_SUCCESS")
      .foreach(java.nio.file.Files.delete)
    BatchStore.compact(spark, store)
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L),
      "marker-disabled compaction must fold everything, not drop batches")
    assert(BatchStore.compactedThrough(store) == 1L)
  }

  test("clean stores compact exactly as before: everything folds, horizon = max id") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs3").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    BatchStore.compact(spark, store, filesPerTable = 1)
    assert(BatchStore.compactedThrough(store) == 1L)
    val subdirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(subdirs == Seq("batch=compacted"))
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L))
    // at-or-below-horizon replays stay no-ops
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L))
  }
}
