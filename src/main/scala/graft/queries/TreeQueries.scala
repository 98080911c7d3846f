package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.DocumentTree
import graft.query.{QueryParams, ShardQueryLogic}

/** TLD / Ancestor document-tree gates (TLDQueryIterator.java:54,
  * AncestorQueryLogic.java) + masked-field projection
  * (QueryParameters.java:61). The document tree is synthesized from
  * orders (top-level) and lineitem (children) via the reference's
  * dotted-uid encoding: child uid = `orderkey.linenumber`.
  */
object TreeQueries {

  private val logic = new ShardQueryLogic()

  /** orders ∪ lineitem as a dotted-uid document tree. */
  private def treeDocs(s: SparkSession, d: String): DataFrame = {
    val parents = Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as("uid"),
      lit("order").as("kind"),
      col("o_orderpriority").as("priority"),
      lit(null).cast("double").as("quantity"))
    val children = Tables.lineitem(s, d).select(
      concat(col("l_orderkey").cast("string"), lit("."),
        col("l_linenumber").cast("string")).as("uid"),
      lit("line").as("kind"),
      lit(null).cast("string").as("priority"),
      col("l_quantity").as("quantity"))
    parents.unionAll(children)
  }

  /** TLD query: a child-level match (quantity > 49) returns the WHOLE
    * tree — top-level document and every member. */
  def tldQuery(s: SparkSession, d: String): DataFrame =
    DocumentTree.tldQuery(treeDocs(s, d), col("quantity") > 49)
      .select("uid", "kind")

  /** Ancestor query: matches plus every ancestor on their root path. */
  def ancestorQuery(s: SparkSession, d: String): DataFrame =
    DocumentTree.ancestorsOfMatches(treeDocs(s, d), col("quantity") > 49)
      .select("uid", "kind")

  /** Planning-statistic cache, keyed by corpus dir (the reference's
    * MetadataHelper caches its metadata-table reads the same way — and
    * shares the same contract: the cache serves the statistic AS OF its
    * last refresh; a corpus MUTATED IN PLACE must refresh via
    * [[invalidateStats]], exactly as the reference's metadata cache
    * must be reloaded after out-of-band table edits. An ingest path
    * that only APPENDS batches through Ingest.datatypeStats keeps the
    * stored statistic correct by construction — max is monotone). A
    * corpus whose metadata store has no statistic yet pays the ONE-TIME
    * ingest backfill (Ingest.datatypeStats → MetadataStats.update, the
    * write the ingest tier performs per batch in a live deployment),
    * then reads it back; every later parent query in the process reads
    * the cached value — plan-from-metadata, never plan-from-corpus-scan.
    * A missing read-back maps to depth 1, which parentsOfMatches treats
    * as NO PRUNE (the fail-safe side: extra rows into the semi-join,
    * never a dropped parent). */
  private val depthStat =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Corpus dir → the [[graft.ingest.MetadataStats]] store its INGEST
    * tier maintains ([[graft.streaming.StreamingIngest.ingestTo]]'s
    * `statsDir` / [[graft.ingest.Handlers.writeAll]]'s). A bound corpus
    * reads the statistic its ingest wrote — plan-from-metadata with NO
    * backfill, the reference's MetadataHelper-over-metadata-table path.
    * Unbound corpora (the read-only test fixtures) keep the one-time
    * backfill below. */
  private val boundStats =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bind `dir`'s planning statistics to the store its ingest tier
    * writes; drops any memoized backfill value so the next parent query
    * reads the ingest-maintained statistic. */
  def bindStats(dir: String, statsDir: String): Unit = {
    boundStats.put(dir, statsDir)
    depthStat.remove(dir)
  }

  /** Drop the cached planning statistic for `dir` (or all corpora) —
    * call after mutating a corpus in place so the next parent query
    * re-derives it. An empty dir also drops every ingest-store binding. */
  def invalidateStats(dir: String = ""): Unit =
    if (dir.isEmpty) { depthStat.clear(); boundStats.clear() }
    else { depthStat.remove(dir); boundStats.remove(dir) }

  /** Parent query: child matches resolve to their parent document;
    * top-level matches resolve to themselves (ParentQueryLogic /
    * ParentDocumentTransformer id rewrite). The predicate hits both
    * levels so the gate separates parent semantics from TLD (no
    * children returned) and Ancestor (matching children returned).
    * The retrieve side prunes on the `max_tree_depth` statistic READ
    * BACK from the ingest-maintained metadata store
    * (EventMetadata.java:96-110 writes it at ingest, MetadataHelper
    * serves it at plan time): at depth 2, only root documents can be
    * parents, so the child leg never reaches the semi-join shuffle. */
  def parentQuery(s: SparkSession, d: String): DataFrame = {
    val docs = treeDocs(s, d)
    val depth = depthStat.computeIfAbsent(d, _ => {
      // ingest-bound corpus first: read the statistic the ingest tier
      // wrote (no backfill job at all); only an unbound corpus pays the
      // one-time backfill — the write a live deployment's ingest
      // performs per batch
      Option(boundStats.get(d))
        .flatMap(sd => graft.ingest.MetadataStats.maxTreeDepth(s, sd))
        .map(Int.box)
        .getOrElse {
          val dir =
            java.nio.file.Files.createTempDirectory("graft-treemeta").toString
          graft.ingest.MetadataStats.update(s, dir,
            graft.ingest.Ingest.datatypeStats(docs, datatypeCol = "kind"))
          Int.box(graft.ingest.MetadataStats.maxTreeDepth(s, dir).getOrElse(1))
        }
    })
    DocumentTree.parentsOfMatches(docs,
        (col("kind") === "line" && col("quantity") > 49) ||
          (col("kind") === "order" && col("priority") === "1-URGENT"),
        maxTreeDepth = Some(depth))
      .select("uid", "kind")
  }

  /** Hierarchy decorations (INCLUDE_HIERARCHY_FIELDS / INCLUDE_PARENT /
    * INCLUDE_CHILD_COUNT, QueryParameters.java:59,76-77): every returned
    * document carries PARENT_UID (null at roots) and its DIRECT child
    * count. Filtered to urgent orders + their big lines so both tree
    * levels appear. */
  def hierarchyFields(s: SparkSession, d: String): DataFrame =
    DocumentTree.withHierarchyFields(treeDocs(s, d))
      .filter((col("kind") === "order" && col("priority") === "1-URGENT") ||
        (col("kind") === "line" && col("quantity") > 49))
      .select("uid", "kind", "PARENT_UID", "CHILD_COUNT")

  /** INCLUDE_RECORD_ID / INCLUDE_DATATYPE_AS_FIELD over the shard-query
    * path: the result rows carry the full event key
    * (shardDate/datatype/uid) and the datatype as fields, surviving the
    * RETURN_FIELDS projection like HIT_TERM does. */
  def recordIdFields(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id").as("uid"), lit("events").as("datatype"),
      to_date(col("ts")).as("shard_date"), col("event_type"), col("user_id"))
    logic.query(ev, "EVENT_TYPE == 'error' && USER_ID < 30",
      QueryParams(returnFields = Seq("uid", "user_id"),
        includeDatatypeAsField = true, includeRecordId = true))
  }

  /** Masked-field projection: unauthorized viewers get the masked name. */
  def maskedFields(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .withColumn("c_name_masked",
        concat(lit("XXX-"), substring(col("c_name"), -4, 4)))
    logic.query(c, "C_MKTSEGMENT == 'BUILDING'",
        QueryParams(maskedFields = Map("c_name" -> "c_name_masked"),
          unmaskAuthorized = false,
          returnFields = Seq("c_custkey", "c_name")))
      .select("c_custkey", "c_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tld_query" -> tldQuery _,
    "ancestor_query" -> ancestorQuery _,
    "parent_query" -> parentQuery _,
    "masked_fields" -> maskedFields _,
    "qs_hierarchy" -> hierarchyFields _,
    "qs_record_id" -> recordIdFields _,
  )

  val oracleSql: Map[String, String] = Map(
    // two-level tree: parent = uid with its last dotted segment dropped;
    // child count = docs pointing at the uid
    "qs_hierarchy" ->
      """WITH tree AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS uid, 'order' AS kind,
        |     o_orderpriority AS priority, CAST(NULL AS DOUBLE) AS quantity
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_linenumber AS VARCHAR),
        |     'line', NULL, l_quantity FROM lineitem
        |), dec AS (
        |  SELECT uid, kind, priority, quantity,
        |    CASE WHEN uid LIKE '%.%'
        |         THEN regexp_replace(uid, '\.[^.]*$', '') END AS parent
        |  FROM tree
        |), cc AS (
        |  SELECT parent AS p, count(*) AS c FROM dec
        |  WHERE parent IS NOT NULL GROUP BY 1
        |)
        |SELECT d.uid, d.kind, d.parent AS "PARENT_UID",
        |   CAST(COALESCE(cc.c, 0) AS BIGINT) AS "CHILD_COUNT"
        | FROM dec d LEFT JOIN cc ON d.uid = cc.p
        | WHERE (d.kind = 'order' AND d.priority = '1-URGENT')
        |    OR (d.kind = 'line' AND d.quantity > 49)""".stripMargin,
    "qs_record_id" ->
      """SELECT event_id AS uid, user_id,
        |   'events' AS "EVENT_DATATYPE",
        |   strftime(CAST(ts AS DATE), '%Y%m%d') || '/events/' ||
        |     CAST(event_id AS VARCHAR) AS "RECORD_ID"
        | FROM events WHERE event_type = 'error' AND user_id < 30""".stripMargin,
    "tld_query" ->
      """WITH roots AS (
        |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS root
        |  FROM lineitem WHERE l_quantity > 49)
        |SELECT CAST(o_orderkey AS VARCHAR) AS uid, 'order' AS kind
        | FROM orders WHERE CAST(o_orderkey AS VARCHAR) IN (SELECT root FROM roots)
        |UNION ALL
        |SELECT CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_linenumber AS VARCHAR), 'line'
        | FROM lineitem WHERE CAST(l_orderkey AS VARCHAR) IN (SELECT root FROM roots)""".stripMargin,
    "ancestor_query" ->
      """WITH m AS (
        |  SELECT DISTINCT
        |    CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_linenumber AS VARCHAR) AS muid,
        |    CAST(l_orderkey AS VARCHAR) AS root
        |  FROM lineitem WHERE l_quantity > 49)
        |SELECT CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_linenumber AS VARCHAR) AS uid,
        |       'line' AS kind
        | FROM lineitem
        | WHERE CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_linenumber AS VARCHAR)
        |       IN (SELECT muid FROM m)
        |UNION ALL
        |SELECT CAST(o_orderkey AS VARCHAR), 'order'
        | FROM orders WHERE CAST(o_orderkey AS VARCHAR) IN (SELECT root FROM m)""".stripMargin,
    "parent_query" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS uid, 'order' AS kind
        | FROM orders
        | WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        |    OR o_orderpriority = '1-URGENT'""".stripMargin,
    "masked_fields" ->
      """SELECT c_custkey, 'XXX-' || right(c_name, 4) AS c_name
        | FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
  )
}
