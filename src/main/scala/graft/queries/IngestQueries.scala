package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.Ingest

/** Gates that consume INGEST-PRODUCED tables — proving the write path
  * feeds the read path (VERDICT r1 item 7): the long event layout →
  * global index / metadata catalog → discovery, index-only lookup, and a
  * needle-query semi-join (RangeStream semantics: the index yields the
  * shard dates, the event scan prunes to them).
  */
object IngestQueries {

  private def longEvents(s: SparkSession, d: String): DataFrame =
    Ingest.toLong(graft.core.Spread(Tables.events(s, d)), uidCol = "event_id",
      datatype = "event", dateCol = "ts")

  /** Discovery (DiscoveryLogic.java:71): per-term counts by day/datatype
    * from the global index, never touching events. */
  def ingDiscovery(s: SparkSession, d: String): DataFrame =
    Ingest.globalIndex(longEvents(s, d))
      .filter(col("value") === "click")
      .select(col("value"), col("field"),
        date_format(col("shard_date"), "yyyy-MM-dd").as("day"),
        col("datatype"), col("cnt"))

  /** Index-only lookup (ShardIndexQueryTable.java:88): regex against the
    * global index, aggregated across dates. */
  def ingIndexLookup(s: SparkSession, d: String): DataFrame =
    Ingest.globalIndex(longEvents(s, d))
      .filter(col("field") === "event_type" && col("value").rlike("^(click|view)$"))
      .groupBy("value", "field")
      .agg(sum(col("cnt")).as("total"))

  /** Needle query: the global index supplies the candidate shard dates
    * (RangeStream), a broadcast semi-join prunes the event scan to them,
    * then the residual predicate evaluates — index-driven, not a full
    * scan. */
  def ingNeedleSemiJoin(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val dates = Ingest.globalIndex(longEvents(s, d))
      .filter(col("field") === "user_id" && col("value") === "42")
      .select(col("shard_date"))
    events.join(broadcast(dates),
        to_date(col("ts")) === col("shard_date"), "left_semi")
      .filter(col("user_id") === 42)
      .select("event_id", "user_id")
  }

  /** Metadata catalog (EventMetadata.java:96-110): field inventory with
    * counts, cardinality, and date bounds. */
  def ingMetadata(s: SparkSession, d: String): DataFrame =
    Ingest.metadata(longEvents(s, d))
      .select(col("field"), col("datatype"), col("cnt"), col("cardinality"),
        date_format(col("first_date"), "yyyy-MM-dd").as("first_date"),
        date_format(col("last_date"), "yyyy-MM-dd").as("last_date"))

  /** Unfielded expansion through the global index
    * (UnfieldedIndexExpansionVisitor.java:40): `_ANYFIELD_ == 'click'`
    * asks the index which fields contain 'click' — only event_type does —
    * so the compiled filter is a single pushed-down equality, not an OR
    * over every string column (PlanSpec pins the pruned shape). */
  def ingUnfieldedExpand(s: SparkSession, d: String): DataFrame = {
    val logic = new graft.query.ShardQueryLogic(
      index = Some(Ingest.globalIndex(longEvents(s, d))))
    logic.query(Tables.events(s, d), "_ANYFIELD_ == 'click'")
      .select("event_id", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ing_discovery" -> ingDiscovery _,
    "ing_index_lookup" -> ingIndexLookup _,
    "ing_needle_semijoin" -> ingNeedleSemiJoin _,
    "ing_metadata" -> ingMetadata _,
    "ing_unfielded_expand" -> ingUnfieldedExpand _,
  )

  /** The long layout melts (user_id, event_type, value, props); oracles
    * reconstruct the same melt with UNION ALL. */
  private def meltSql(field: String, expr: String) =
    s"""SELECT '$field' AS field, 'event' AS datatype,
       |   CAST($expr AS VARCHAR) AS value, CAST(ts AS DATE) AS shard_date
       | FROM events WHERE $expr IS NOT NULL""".stripMargin
  private val longSql =
    Seq("user_id" -> "user_id", "event_type" -> "event_type",
      "value" -> "value", "props" -> "props")
      .map { case (f, e) => meltSql(f, e) }.mkString("(", " UNION ALL ", ")")

  val oracleSql: Map[String, String] = Map(
    "ing_discovery" ->
      s"""SELECT value, field, strftime(shard_date, '%Y-%m-%d') AS day,
         |   datatype, count(*) AS cnt
         | FROM $longSql
         | WHERE value = 'click' GROUP BY 1, 2, 3, 4""".stripMargin,
    "ing_index_lookup" ->
      s"""SELECT value, field, count(*) AS total FROM $longSql
         | WHERE field = 'event_type' AND value IN ('click', 'view')
         | GROUP BY 1, 2""".stripMargin,
    "ing_needle_semijoin" ->
      "SELECT event_id, user_id FROM events WHERE user_id = 42",
    "ing_metadata" ->
      s"""SELECT field, datatype, count(*) AS cnt,
         |   count(DISTINCT value) AS cardinality,
         |   strftime(MIN(shard_date), '%Y-%m-%d') AS first_date,
         |   strftime(MAX(shard_date), '%Y-%m-%d') AS last_date
         | FROM $longSql GROUP BY 1, 2""".stripMargin,
    // the index proves 'click' lives only in event_type, so the oracle is
    // the single-field equality the expansion compiles to
    "ing_unfielded_expand" ->
      "SELECT event_id, event_type FROM events WHERE event_type = 'click'",
  )
}
