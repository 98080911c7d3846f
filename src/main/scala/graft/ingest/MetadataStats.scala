package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Fs

/** Durable per-datatype planning statistics — the lake twin of the
  * reference's metadata-table statistic rows (EventMetadata.java:96-110
  * writes them at ingest; MetadataHelper serves them at plan time).
  * The store is one tiny parquet table (a row per datatype, columns
  * `max_tree_depth` + `cnt` from [[Ingest.datatypeStats]]); [[update]]
  * folds a new batch in behind the [[Fs.swapDir]] rename-only swap, so
  * a crash mid-update never loses the prior generation. At 100 TB the
  * point of this module is what it AVOIDS: a query planner that needs
  * the corpus's tree depth reads a 2-row parquet file instead of
  * re-buying a full corpus aggregate per query. */
object MetadataStats {

  private def table(dir: String) = s"$dir/datatype_stats"

  /** A store generation counts only with its `_SUCCESS` commit proof
    * ([[Fs.committed]], the one shared rule) — a crash mid-first-write
    * leaves a partial dir that must read as ABSENT (and be overwritten
    * by the retried update), never wedge every later read with a
    * corrupt-parquet error. Post-swap generations always carry the
    * marker (the tmp was a completed spark write). */
  private def committed(t: String): Boolean = Fs.committed(t)

  /** Fold one batch's [[Ingest.datatypeStats]] rows into the store
    * (creating it on first touch). Call once per ingest batch — merge
    * is max/sum, so replaying order doesn't matter for the depth
    * statistic the planner reads. */
  def update(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val t = table(dir)
    Fs.recoverSwap(t)
    if (!committed(t))
      batch.repartition(1).write.mode("overwrite").parquet(t)
    else {
      val tmp = t + ".compacting"
      Ingest.mergeDatatypeStats(spark.read.parquet(t), batch)
        .repartition(1).write.mode("overwrite").parquet(tmp)
      Fs.swapDir(t, tmp)
    }
  }

  /** The stored statistics ([[update]]'s merged rows); an absent or
    * uncommitted store reads as ZERO ROWS — the same absent-semantics
    * [[maxTreeDepth]] applies, never a corrupt-parquet error. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    Fs.recoverSwap(table(dir))
    if (committed(table(dir))) spark.read.parquet(table(dir))
    else
      // the absent-store schema derives through datatypeStats itself
      // (zero-row input → zero-row stats), so a column added to the
      // statistics can never drift this rarely-exercised path
      Ingest.datatypeStats(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "uid STRING, datatype STRING")))
  }

  /** The planner's read-back: the corpus-wide max tree depth (across
    * every datatype, or one datatype when named). None = no statistic
    * stored yet — the caller decides between a backfill and the
    * un-pruned plan; guessing here would risk a wrong prune. */
  def maxTreeDepth(spark: SparkSession, dir: String,
                   datatype: Option[String] = None): Option[Int] = {
    // recover a half-swapped update BEFORE the existence probe — in the
    // crash window the table dir is the `.old` generation; an
    // UNCOMMITTED partial dir reads as absent (the caller backfills)
    Fs.recoverSwap(table(dir))
    if (!committed(table(dir))) return None
    val rows = datatype.fold(read(spark, dir))(dt =>
      read(spark, dir).filter(col("datatype") === dt))
    val r = rows.agg(max(col("max_tree_depth"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0).toInt)
  }
}
