package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Field-index-hole semantics (FieldIndexHole, MetadataHelper
  * .getFieldIndexHoles, PushdownMissingIndexRangeNodesVisitor — planner
  * :1511): a field can be indexed for only PART of a query's date range
  * (indexing enabled late, backfill gaps). For dates the index covers,
  * an index lookup prunes the event scan to the dates where the value is
  * known to exist; for hole dates the index proves nothing, so those
  * dates fall back to a full event scan with the residual predicate.
  *
  * The reference computes holes by comparing the metadata "f" (frequency
  * — field present in events) rows against the "i" (indexed) rows per
  * date. The analog here: [[graft.ingest.Ingest.fieldFrequency]] is the
  * always-complete "f" side, the (possibly partial) global index is the
  * "i" side, and a hole is a (field, date) in the former but not the
  * latter.
  *
  * Spark shape: both date sets are tiny (one row per field-date), so the
  * union broadcasts into a LeftSemi hash join against the event scan —
  * partition pruning at scale, never a full-table fallback unless the
  * holes genuinely span the whole range.
  */
object IndexHoles {

  /** (field, shard_date) pairs where events carry the field but the index
    * has no entries — the FieldIndexHole set. */
  def holes(fieldFrequency: DataFrame, index: DataFrame): DataFrame =
    fieldFrequency.select("field", "shard_date").distinct()
      .join(index.select("field", "shard_date").distinct(),
        Seq("field", "shard_date"), "left_anti")

  /** Index-driven event scan with hole fallback for `field == value`:
    * keeps the dates where the index proves the value exists, plus every
    * hole date (unprunable). This is PRUNING ONLY — the returned frame
    * still contains every event on those dates; the CALLER owns applying
    * the residual `field == value` predicate on top (both in-repo
    * callers do). `dateExpr` maps the event frame's time column to a
    * shard date. */
  def prunedScan(events: DataFrame, dateExpr: org.apache.spark.sql.Column,
                 fieldFrequency: DataFrame, index: DataFrame,
                 field: String, value: String): DataFrame = {
    val hitDates = index
      .filter(col("field") === field && col("value") === value)
      .select(col("shard_date"))
    val holeDates = holes(
      fieldFrequency.filter(col("field") === field),
      index.filter(col("field") === field))
      .select(col("shard_date"))
    val dates = hitDates.union(holeDates).distinct()
    events.join(broadcast(dates), dateExpr === col("shard_date"), "left_semi")
  }
}
