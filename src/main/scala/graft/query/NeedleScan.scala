package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uid-list-driven needle scan (CreateUidsIterator.java:68,
  * IndexInfo/RangeStream): a `field == value` term consults the global
  * index per shard date and plans at TWO granularities:
  *
  *  - **document ranges** — dates whose Uid.List is complete (count ≤
  *    the 20-cap): the uids themselves identify the matching events, so
  *    the scan filters on the uid set — it touches exactly the matching
  *    documents, not the shard;
  *  - **shard ranges** — dates past the cap (the aggregator's IGNORE /
  *    count-only regime — the list is a sample, NOT the matches): fall
  *    back to date-level pruning, exactly [[IndexHoles.prunedScan]]'s
  *    shape.
  *
  * The residual predicate applies over the union (uid-ranged rows are
  * index-proven for a simple indexed equality, but evaluation stays the
  * contract — the reference evaluates document ranges too).
  *
  * Scale shape: the reference's RangeStream materializes ranges on the
  * PLANNER side; the bounded collect here is the same move — one term's
  * index entries (≤ `maxDriverRanges` dates, ≤ cap uids each) come to
  * the driver once, and both regimes become In-list predicates on a
  * SINGLE event-scan pass: no join, no shuffle, and no cached frame left
  * behind (a per-query `persist` in a long-lived session leaks
  * CacheManager entries until someone calls clearCache). A term wider
  * than the bound keeps the fully-distributed broadcast-semi-join plan.
  */
object NeedleScan {

  def scan(events: DataFrame, uidExpr: Column, dateExpr: Column,
           index: DataFrame, field: String, value: String,
           residual: Column, cap: Int = 20,
           maxDriverRanges: Int = 100000): DataFrame = {
    val hits = index
      .filter(col("field") === field && col("value") === value)
      .select(col("shard_date"), col("cnt"), col("uid_sample"))
    val rows = hits.limit(maxDriverRanges + 1).collect()
    if (rows.length > maxDriverRanges) {
      // policy-bound exceeded: stay distributed (index read per regime)
      val uidTargets = hits.filter(col("cnt") <= cap)
        .select(explode(col("uid_sample")).as("__needle_uid")).distinct()
      val dateTargets = hits.filter(col("cnt") > cap)
        .select(col("shard_date").as("__needle_date")).distinct()
      val byUid = events.join(broadcast(uidTargets),
        uidExpr === col("__needle_uid"), "left_semi")
      val byDate = events.join(broadcast(dateTargets),
        dateExpr === col("__needle_date"), "left_semi")
      byUid.unionByName(byDate).filter(residual)
    } else {
      val (sub, sat) = rows.partition(_.getAs[Long]("cnt") <= cap)
      val uids = sub.flatMap(
        _.getAs[scala.collection.Seq[String]]("uid_sample")).distinct.toSeq
      val dates = sat.map(_.get(0)).distinct.toSeq // shard_date, native type
      val uidPred = if (uids.isEmpty) lit(false) else uidExpr.isin(uids: _*)
      val datePred = if (dates.isEmpty) lit(false) else dateExpr.isin(dates: _*)
      // disjoint by construction: a date is either sub-cap or saturated
      events.filter(uidPred || datePred).filter(residual)
    }
  }
}
