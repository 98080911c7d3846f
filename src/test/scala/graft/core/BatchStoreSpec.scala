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
    // the REAL marker-disabled deployment: the conf is off, so writes
    // never produce _SUCCESS — treating every dir as "unproven partial"
    // would silently DELETE all registered batches. The probe reads the
    // conf (Fs.markersEnabled), so the fallback engages even though no
    // directory state hints at it.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    try {
      BatchStore.seed(rowsOf(0, 0), store)
      BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
      BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
      assert(!graft.core.Fs.committed(s"$store/batch=1"),
        "precondition: the disabled committer writes no markers")
      BatchStore.compact(spark, store)
      assert(storeIds(store) == Seq(0L, 1L, 100L, 101L),
        "marker-disabled compaction must fold everything, not drop batches")
      assert(BatchStore.compactedThrough(store) == 1L)
    } finally
      hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
  }

  test("a store seeded under markers-ON does not pin a later markers-OFF deployment to carry-everything") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs6").toString
    val store = s"$tmp/store"
    // seed + batch 0 written while markers were ON (they carry proof)
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    // the deployment then disables markers; later batches carry none
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    try {
      BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
      BatchStore.registerBatch(rowsOf(2, 2), store, 2L)
      // compaction under the OFF conf folds everything: the old marked
      // dirs must NOT convince the probe that markers are on (which
      // would carry batches 1-2 as splinters forever — the horizon
      // never advancing for any post-flip batch)
      BatchStore.compact(spark, store)
      assert(BatchStore.compactedThrough(store) == 2L,
        "the horizon must advance under the flipped conf")
      val subdirs = new java.io.File(store).listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq.sorted
      assert(subdirs == Seq("batch=compacted"), subdirs.mkString(","))
      assert(storeIds(store) == Seq(0L, 1L, 100L, 101L, 200L, 201L))
    } finally
      hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
  }

  test("a crash-partial dir with an unreadable footer cannot wedge compaction — it is carried, never footer-probed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs7").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    BatchStore.registerBatch(rowsOf(1, 2), store, 1L)
    // a crashed registerBatch: a part file with NO valid parquet footer
    // and no _SUCCESS — a whole-table schema-inferring read could touch
    // it and fail; the proven-paths fold must never list it
    val partial = java.nio.file.Paths.get(s"$store/batch=2")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-00000.snappy.parquet"),
      "not a parquet file".getBytes)
    BatchStore.compact(spark, store)
    assert(BatchStore.compactedThrough(store) == 1L)
    val subdirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(subdirs == Seq("batch=2", "batch=compacted"),
      subdirs.mkString(","))
    // the carried garbage is byte-identical (raw copy, no re-encode) …
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/batch=2/part-00000.snappy.parquet")))
      == "not a parquet file")
    // … and the checkpoint replay of batch 2 overwrites it in place
    BatchStore.registerBatch(rowsOf(2, 2), store, 2L)
    assert(storeIds(store) == Seq(0L, 1L, 100L, 101L, 200L, 201L))
  }

  test("compaction never deletes what it didn't fold: unrecognized entries carry verbatim") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs8").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    // an operator's manual backup and a stray file — not partitions the
    // fold recognizes, but compaction must not be the thing that
    // deletes them
    Fs.copyRecursively(s"$store/batch=0", s"$store/batch=0.bak")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/NOTES.txt"), "ops note".getBytes)
    BatchStore.compact(spark, store)
    val names = new java.io.File(store).listFiles().map(_.getName).toSeq.sorted
    assert(names == Seq("NOTES.txt", "batch=0.bak", "batch=compacted"),
      names.mkString(","))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/NOTES.txt"))) == "ops note")
  }

  test("readProven serves only committed partitions and survives a crash-partial dir") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs9").toString
    val store = s"$tmp/store"
    BatchStore.seed(rowsOf(0, 0), store)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    val partial = java.nio.file.Paths.get(s"$store/batch=1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-00000.snappy.parquet"),
      "garbage".getBytes)
    val rows = BatchStore.readProven(spark, store).get
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows == Seq(0L, 1L))
    assert(BatchStore.readProven(spark, s"$tmp/absent").isEmpty)
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

  test("a crash-partial batch=seed (Spark-written into the live dir) neither folds nor wedges compact/readProven") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bs11").toString
    val store = s"$tmp/store"
    // a crashed seed(): a torn part file, no _SUCCESS — unlike
    // batch=compacted (only ever visible through a completed swap),
    // the seed dir is Spark-written straight into the live store, so a
    // partial IS reachable and takes the numeric dirs' proof rule
    val partialSeed = java.nio.file.Paths.get(s"$store/batch=seed")
    java.nio.file.Files.createDirectories(partialSeed)
    java.nio.file.Files.write(partialSeed.resolve("part-00000.snappy.parquet"),
      "torn seed".getBytes)
    BatchStore.registerBatch(rowsOf(0, 2), store, 0L)
    // the proven read never footer-probes the torn seed
    val rows = BatchStore.readProven(spark, store).get
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows == Seq(0L, 1L))
    // compaction folds the proven batch and carries the torn seed
    // verbatim (raw copy — the stream's restart re-seeds over it)
    BatchStore.compact(spark, store)
    val names = new java.io.File(store).listFiles().map(_.getName).toSeq.sorted
    assert(names == Seq("batch=compacted", "batch=seed"), names.mkString(","))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/batch=seed/part-00000.snappy.parquet")))
      == "torn seed")
    // the restart's re-seed (mode overwrite) replaces the splinter and
    // restores its proof
    BatchStore.seed(rowsOf(0, 0), store)
    assert(graft.core.Fs.committed(s"$store/batch=seed"))
    assert(BatchStore.readProven(spark, store).get
      .select("id").collect().map(_.getLong(0)).toSeq.sorted == Seq(0L, 1L))
  }
}
