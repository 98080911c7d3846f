package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{BatchStore, Fs}

/** Durable per-datatype planning statistics — the lake twin of the
  * reference's metadata-table statistic rows (EventMetadata.java:96-110
  * writes them at ingest; MetadataHelper serves them at plan time).
  * Two producer paths share one read-side merge:
  *
  *  - '''[[updateBatch]]''' — the INGEST tier's path (streaming
  *    foreachBatch, batch loads): one tiny stats row-set per ingest
  *    batch under `batch=<id>` with overwrite semantics, so a
  *    crash-replayed micro-batch REPLACES its rows instead of folding
  *    them twice — `cnt` stays exact under replay (`max_tree_depth`
  *    was always safe; max is idempotent). The layout is
  *    [[graft.core.BatchStore]]'s, so the store compacts with the same
  *    offline maintenance as every other batch-partitioned store.
  *  - '''[[update]]''' — the fold-in-place path for one-shot producers
  *    (a query-side backfill over a whole corpus). NOT replay-safe for
  *    `cnt`: a crash between the swap and the caller's own checkpoint
  *    double-counts a replayed fold. Ingest paths use [[updateBatch]].
  *
  * [[read]] merges both stores (max of maxes, sum of counts). At 100 TB
  * the point of this module is what it AVOIDS: a query planner that
  * needs the corpus's tree depth reads a few-row parquet store instead
  * of re-buying a full corpus aggregate per query. */
object MetadataStats {

  private def table(dir: String) = s"$dir/datatype_stats"
  private def batchTable(dir: String) = s"$dir/datatype_stats_batches"

  /** A store generation counts only with its commit proof
    * ([[Fs.committedUnder]], the one shared rule — honoring a
    * marker-disabled committer conf) — a crash mid-first-write leaves a
    * partial dir that must read as ABSENT (and be overwritten by the
    * retried update), never wedge every later read with a
    * corrupt-parquet error. Post-swap generations always carry the
    * marker (the tmp was a completed spark write). */
  private def committed(spark: SparkSession, t: String): Boolean =
    Fs.committedUnder(spark, t)

  /** Fold one batch's [[Ingest.datatypeStats]] rows into the merged
    * store (creating it on first touch). For producers that run ONCE
    * per corpus (backfill); a replayable ingest batch must use
    * [[updateBatch]] — replaying this fold double-counts `cnt`. */
  def update(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val t = table(dir)
    Fs.recoverSwap(t)
    if (!committed(spark, t))
      batch.repartition(1).write.mode("overwrite").parquet(t)
    else {
      val tmp = t + ".compacting"
      Ingest.mergeDatatypeStats(spark.read.parquet(t), batch)
        .repartition(1).write.mode("overwrite").parquet(tmp)
      Fs.swapDir(t, tmp)
    }
  }

  /** The ingest tier's per-batch fold: `batchStats` (an
    * [[Ingest.datatypeStats]] frame) lands under `batch=<batchId>` with
    * overwrite semantics — exactly-once under checkpoint replay, like
    * every [[graft.core.BatchStore]] registration. Aggregation happens
    * at READ time ([[read]]), so no read-modify-write and no lost
    * update between concurrent batch writers. */
  def updateBatch(dir: String, batchId: Long,
                  batchStats: DataFrame): Unit =
    BatchStore.registerBatch(batchStats.repartition(1),
      batchTable(dir), batchId)

  /** Collapse the per-batch splinters (offline maintenance, like any
    * batch store — run while the ingest stream is stopped). */
  def compactBatches(spark: SparkSession, dir: String): Unit =
    BatchStore.compact(spark, batchTable(dir))

  /** The committed per-batch stats rows, if any — the shared
    * proven-partitions read ([[BatchStore.readProven]]): explicit
    * paths, so a crash-partial batch dir can neither fold in nor wedge
    * the read with a corrupt footer. */
  private def batchRows(spark: SparkSession, dir: String): Option[DataFrame] =
    BatchStore.readProven(spark, batchTable(dir))

  /** The stored statistics: the merged-table generations and the
    * per-batch rows, aggregated (max of maxes, sum of counts). An
    * absent or uncommitted store reads as ZERO ROWS — the same
    * absent-semantics [[maxTreeDepth]] applies, never a corrupt-parquet
    * error. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    Fs.recoverSwap(table(dir))
    val legacy =
      if (committed(spark, table(dir))) Some(spark.read.parquet(table(dir)))
      else None
    (legacy, batchRows(spark, dir)) match {
      case (Some(l), Some(b)) => Ingest.mergeDatatypeStats(l, b)
      case (Some(l), None) => l
      case (None, Some(b)) =>
        // same max/sum aggregation as the merge — several batches carry
        // rows for one datatype
        b.groupBy("datatype")
          .agg(max(col("max_tree_depth")).as("max_tree_depth"),
            sum(col("cnt")).as("cnt"))
      case (None, None) =>
        // the absent-store schema derives through datatypeStats itself
        // (zero-row input → zero-row stats), so a column added to the
        // statistics can never drift this rarely-exercised path
        Ingest.datatypeStats(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "uid STRING, datatype STRING")))
    }
  }

  /** The planner's read-back: the corpus-wide max tree depth (across
    * every datatype, or one datatype when named). None = no statistic
    * stored yet — the caller decides between a backfill and the
    * un-pruned plan; guessing here would risk a wrong prune. */
  def maxTreeDepth(spark: SparkSession, dir: String,
                   datatype: Option[String] = None): Option[Int] = {
    // read() already answers an absent/uncommitted store with zero rows
    // (→ null max → None) — no separate existence probe, which would
    // double every recoverSwap/commit/listing I/O on the planner path
    val all = read(spark, dir)
    val rows = datatype.fold(all)(dt => all.filter(col("datatype") === dt))
    val r = rows.agg(max(col("max_tree_depth"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0).toInt)
  }
}
