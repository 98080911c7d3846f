package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Uid-list-driven needle scan (CreateUidsIterator.java:68,
  * IndexInfo/RangeStream): a `field == value` term consults the global
  * index per shard date and plans at TWO granularities:
  *
  *  - **document ranges** — dates whose Uid.List is complete (count ≤
  *    the 20-cap): the uids themselves identify the matching events, so
  *    the scan is a broadcast semi-join on uid — it touches exactly the
  *    matching documents, not the shard;
  *  - **shard ranges** — dates past the cap (the aggregator's IGNORE /
  *    count-only regime — the list is a sample, NOT the matches): fall
  *    back to date-level pruning, exactly [[IndexHoles.prunedScan]]'s
  *    shape.
  *
  * The residual predicate applies over the union (uid-ranged rows are
  * index-proven for a simple indexed equality, but evaluation stays the
  * contract — the reference evaluates document ranges too).
  *
  * Scale shape: both target sets (uids of sub-cap dates, saturated
  * dates) are bounded and broadcast; the event scan is touched by two
  * semi-joins and never fully scanned.
  */
object NeedleScan {

  def scan(events: DataFrame, uidExpr: Column, dateExpr: Column,
           index: DataFrame, field: String, value: String,
           residual: Column, cap: Int = 20): DataFrame = {
    // one term's index entries: tiny, consumed twice → persist
    val hits = index
      .filter(col("field") === field && col("value") === value)
      .select(col("shard_date"), col("cnt"), col("uid_sample"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val uidTargets = hits.filter(col("cnt") <= cap)
      .select(explode(col("uid_sample")).as("__needle_uid")).distinct()
    val dateTargets = hits.filter(col("cnt") > cap)
      .select(col("shard_date").as("__needle_date")).distinct()
    val byUid = events.join(broadcast(uidTargets),
      uidExpr === col("__needle_uid"), "left_semi")
    val byDate = events.join(broadcast(dateTargets),
      dateExpr === col("__needle_date"), "left_semi")
    byUid.unionByName(byDate).filter(residual)
  }
}
