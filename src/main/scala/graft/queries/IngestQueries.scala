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

  /** Leading-wildcard discovery through the REVERSE index
    * (DiscoveryLogic.java:71 reversed-pattern branch): `*ick` probes the
    * reversed-value aggregate with a sargable prefix — PlanSpec pins
    * StartsWith, no regex over the forward values. */
  def ingDiscoveryRev(s: SparkSession, d: String): DataFrame = {
    val long = longEvents(s, d)
    graft.query.Discovery.terms(
        Ingest.globalIndex(long), Ingest.reverseGlobalIndex(long),
        graft.query.Discovery.Pattern("*ick"), field = Some("event_type"))
      .select(col("value"), col("field"),
        date_format(col("shard_date"), "yyyy-MM-dd").as("day"),
        col("datatype"), col("cnt"))
  }

  /** Range discovery (DiscoveryLogic ranges): per-term counts for index
    * values inside a bounded range, straight off the forward index. */
  def ingDiscoveryRange(s: SparkSession, d: String): DataFrame = {
    val long = longEvents(s, d)
    graft.query.Discovery.terms(
        Ingest.globalIndex(long), Ingest.reverseGlobalIndex(long),
        graft.query.Discovery.Bounds("click", "purchase"),
        field = Some("event_type"))
      .groupBy("value", "field", "datatype")
      .agg(sum(col("cnt")).as("total"))
  }

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

  /** Uid.List-granular needle scan (CreateUidsIterator.java:68): one term
    * whose per-date lists stay complete (user_id=42, ≤20/day → DOCUMENT
    * ranges, a uid semi-join) and one that saturates the cap everywhere
    * (event_type=signup → IGNORE regime, shard-date fallback) — both
    * regimes green against the plain-filter oracle. */
  def ingNeedleUidList(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val idx = Ingest.globalIndex(longEvents(s, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uidRegime = graft.query.NeedleScan.scan(events,
      col("event_id").cast("string"), to_date(col("ts")), idx,
      "user_id", "42", col("user_id") === 42)
    val dateRegime = graft.query.NeedleScan.scan(events,
      col("event_id").cast("string"), to_date(col("ts")), idx,
      "event_type", "signup", col("event_type") === "signup")
    // both scans collected their ranges eagerly — the returned frames no
    // longer reference idx, so the cache entry can go now
    idx.unpersist()
    uidRegime.select(col("event_id"), lit("uid").as("regime"))
      .unionAll(dateRegime.select(col("event_id"), lit("date").as("regime")))
  }

  /** Metadata catalog (EventMetadata.java:96-110): field inventory with
    * counts, cardinality, and date bounds. */
  def ingMetadata(s: SparkSession, d: String): DataFrame =
    Ingest.metadata(longEvents(s, d))
      .select(col("field"), col("datatype"), col("cnt"), col("cardinality"),
        date_format(col("first_date"), "yyyy-MM-dd").as("first_date"),
        date_format(col("last_date"), "yyyy-MM-dd").as("last_date"))

  /** Data dictionary (`/DataDictionary`): the metadata catalog flagged
    * with the ingest configuration's indexing decisions. */
  def ingDataDictionary(s: SparkSession, d: String): DataFrame =
    Ingest.dataDictionary(longEvents(s, d),
        indexedFields = Seq("user_id", "event_type", "value"),
        reverseIndexedFields = Seq("event_type"),
        tokenizedFields = Seq("props"))
      .select(col("field"), col("datatype"), col("forward_indexed"),
        col("reverse_indexed"), col("tokenized"), col("cnt"),
        col("cardinality"),
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

  /** Field-index-hole fallback (FieldIndexHole / PushdownMissingIndex
    * RangeNodesVisitor): the global index is built only from the FIRST
    * half of the month — user_id is "indexed late". The query over the
    * whole month must still find every match: indexed dates prune via the
    * index's value hits, hole dates (where field frequency shows user_id
    * present but the index has nothing) fall back to the event scan. */
  def ingIndexHole(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    // one evaluation: freq, the partial index, and both date sets all
    // derive from the same melt — without the persist the melt+groupBy
    // subtree re-executes once per consumer (4×). The RESULT is
    // materialized (tiny: the matching events) so the melt cache can
    // release before return — the returned frame is the one persisted
    // thing left, caller-owned like every pipeline gate
    // (CacheHygieneSpec).
    val long = longEvents(s, d).filter(col("field") === "user_id").persist()
    val freq = Ingest.fieldFrequency(long)
    val partialIndex = Ingest.globalIndex(
      long.filter(col("shard_date") < lit("2024-01-16")))
    val out = graft.query.IndexHoles.prunedScan(events, to_date(col("ts")),
        freq, partialIndex, field = "user_id", value = "7")
      .filter(col("user_id") === 7)
      .select("event_id", "user_id")
      .persist()
    out.count()
    long.unpersist()
    out
  }

  /** Date-index resolution (DateIndexDataTypeHandler.java:43-72): a query
    * bounded on ORDER date resolves through the date index into the SHIP
    * shard dates that hold matching lineitems — partition pruning under a
    * non-storage date semantic. */
  def ingDateIndex(s: SparkSession, d: String): DataFrame = {
    val li = s.read.parquet(s"$d/lineitem.parquet")
    val ord = s.read.parquet(s"$d/orders.parquet")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderdate"), to_date(col("l_shipdate")).as("shard_date"))
    val idx = Ingest.dateIndex(joined, "ORDER", "o_orderdate")
    Ingest.shardDatesFor(idx, "ORDER", "1996-03-01", "1996-03-31")
      .select(date_format(col("shard_date"), "yyyy-MM-dd").as("shard_date"))
  }

  /** Dead-letter channel (ErrorShardedDataTypeHandler): records whose
    * props payload fails validation (k > 90) route to the error frame. */
  def ingErrorChannel(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int")
    val (_, errors) = Ingest.withErrorChannel(events, k <= 90)
    errors.select("event_id", "event_type", "props")
  }

  /** Uid.List 20-cap (CreateUidsIterator, Uid.List MAX=20): the global
    * index keeps at most 20 sample uids per term — the count column stays
    * exact while the uid list saturates. */
  def ingUidList(s: SparkSession, d: String): DataFrame =
    Ingest.globalIndex(longEvents(s, d))
      .filter(col("field") === "event_type")
      .select(col("value"),
        date_format(col("shard_date"), "yyyy-MM-dd").as("day"),
        col("cnt"), size(col("uid_sample")).as("uid_sample_size"))

  /** Modification service end-to-end (MutableMetadataHandler.java:188):
    * delete a field wholesale for some events, a specific value for
    * another, insert a corrected value — then query the post-modification
    * state. The oracle replays the same edits in SQL. */
  def modsApplied(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.Modifications._
    val long = longEvents(s, d)
    val edits: Seq[FieldEdit] = Seq(
      DeleteField("12", "event", "event_type"),               // whole field
      DeleteField("17", "event", "event_type", Some("view")), // one value
      PutField("12", "event", "event_type", "corrected_click",
        shardDate = java.sql.Date.valueOf("2024-01-05")))
    applyEdits(long, edits)
      .filter(col("field") === "event_type")
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("uid")).as("n_uids"))
  }

  /** UPDATE mode + modification history (MutableMetadataHandler
    * MODE.UPDATE:369-377, insertHistory:573-590): an update removes the
    * old value and inserts the new one, and every leg appends a
    * `HISTORY_<FIELD>` row `<ts>:<user>:<value>:<mode>` — uid 12's
    * update contributes BOTH its delete and its insert trail entry. */
  def modsUpdateHistory(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.Modifications._
    val long = longEvents(s, d)
    val edits: Seq[FieldEdit] = Seq(
      UpdateField("12", "event", "event_type",
        oldValue = "click", newValue = "corrected",
        shardDate = java.sql.Date.valueOf("2024-01-05")),
      DeleteField("17", "event", "event_type", Some("view")),
      PutField("19", "event", "event_type", "flagged",
        shardDate = java.sql.Date.valueOf("2024-01-05")))
    applyEdits(long, edits, insertHistory = true, user = "alice",
        timeMillis = 1700000000000L)
      .filter(col("uid").isin("12", "17", "19") &&
        col("field").isin("event_type", "HISTORY_event_type"))
      .select("uid", "field", "value")
  }

  /** Uid.List REMOVEDUID patch (GlobalIndexUidAggregator.java:21-25):
    * deletes net against the index — counts decrement, uids leave the
    * list, zeroed keys vanish, puts materialize new keys. Keys stay under
    * the 20-cap so the patched sample is exactly the surviving uid set
    * (saturated lists keep exact counts, best-effort uids — the
    * reference's IGNORE regime, pinned in ModificationsSpec). */
  def ingUidListRemoved(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.Modifications._
    // the shared melt persists for the index + patch legs; the small
    // patched result materializes so the melt cache releases before
    // return (caller-owned returned persist — CacheHygieneSpec)
    val long = longEvents(s, d).filter(col("field") === "user_id").persist()
    val index = Ingest.globalIndex(long)
    val edits: Seq[FieldEdit] =
      (1 to 50).map(i => DeleteField(i.toString, "event", "user_id"): FieldEdit) ++
      Seq(
        PutField("9000001", "event", "user_id", "42",
          shardDate = java.sql.Date.valueOf("2024-01-05")),
        PutField("9000002", "event", "user_id", "42",
          shardDate = java.sql.Date.valueOf("2024-01-05")))
    val out = patchIndex(index, long, edits)
      .filter(col("value").isin("42", "7"))
      .select(col("value"),
        date_format(col("shard_date"), "yyyy-MM-dd").as("day"),
        col("cnt"), size(col("uid_sample")).as("uid_sample_size"))
      .persist()
    out.count()
    long.unpersist()
    out
  }

  /** Atom feed sink (AtomDataTypeHandler.java:35-40). */
  def feedsAtom(s: SparkSession, d: String): DataFrame =
    graft.ingest.Feeds.atom(longEvents(s, d))
      .filter(col("category") === "event_type")
      .select(col("category"), col("value"),
        date_format(col("latest_date"), "yyyy-MM-dd").as("latest_date"),
        col("occurrences"))

  /** Metrics-summary sink (MetricsSummaryDataTypeHandler). */
  def feedsSummary(s: SparkSession, d: String): DataFrame =
    graft.ingest.Feeds.summary(longEvents(s, d))
      .filter(col("field").isin("user_id", "event_type"))

  /** Datatype filter + mandatory date bounds (QueryParameters
    * DATATYPE_FILTER_SET + begin/end; row 43): the partition-pruning
    * predicates of every event query, driven through ShardQueryLogic. */
  def shardBounds(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
      .withColumn("shard_date", to_date(col("ts")))
      .withColumn("datatype",
        when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val logic = new graft.query.ShardQueryLogic()
    logic.query(events, "EVENT_TYPE == 'click'",
        graft.query.QueryParams(datatypeFilter = Seq("even"),
          beginDate = Some("2024-01-10"), endDate = Some("2024-01-20")))
      .select("event_id", "user_id", "datatype")
  }

  /** JSON ingest (format readers, row 2): the props payload parses
    * through from_json with an explicit schema — the semi-structured
    * branch of the reader surface. */
  def ingJsonReader(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .filter(col("k") > 80)

  /** EventMapper dispatch through the handler registry (rows 1/78): two
    * datatypes route to different handler chains in one pass; the gate
    * returns per-(datatype, handler) output counts. */
  def handlersDispatch(s: SparkSession, d: String): DataFrame = {
    import graft.ingest.Handlers
    val wide = Tables.events(s, d)
      .withColumn("datatype",
        when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val long = Ingest.toLong(
        graft.core.Spread(wide.select(col("event_id"), col("ts"),
          col("event_type"), col("value"))),
        uidCol = "event_id", datatype = "ignored", dateCol = "ts")
      // toLong stamps a constant datatype; the real per-record datatype
      // joins back in from the wide frame below
      .drop("datatype")
    val dtByUid = wide.select(col("event_id").cast("string").as("uid"),
      col("datatype"))
    val typed = long.join(dtByUid, "uid")
    val registry = Handlers.Registry()
      .register("even", df => df.filter(col("field") === "event_type"))
      .register("even", df => df.filter(col("field") === "value"))
      .register("odd", df => df.filter(col("field") === "event_type"))
    val outs = Handlers.dispatch(typed, registry)
    outs.map { case (dt, seq, df) =>
        df.groupBy(lit(dt).as("datatype"), lit(seq).as("handler_seq"))
          .agg(count(lit(1)).as("cnt"))
      }.reduce(_ unionAll _)
  }

  /** Rule-based age-off sweep (ConfigurableAgeOffFilter): per-datatype
    * TTLs with first-rule-wins order, a default TTL for unclaimed types,
    * and a 5-day short-circuit that rescues recent rows from the
    * aggressive error-channel rule. scanStart is pinned so the gate is
    * deterministic. */
  def ageOff(s: SparkSession, d: String): DataFrame = {
    val day = 86400000L
    val scanStart = java.time.Instant.parse("2024-01-31T00:00:00Z").toEpochMilli
    graft.ingest.AgeOff.filter(Tables.events(s, d), "ts", scanStart,
      defaultTtlMillis = 15 * day,
      rules = Seq(
        graft.ingest.AgeOff.dataTypeRule(Seq("click"), 10 * day, typeCol = "event_type"),
        graft.ingest.AgeOff.dataTypeRule(Seq("view"), 25 * day, typeCol = "event_type"),
        graft.ingest.AgeOff.dataTypeRule(Seq("error"), 2 * day, typeCol = "event_type")),
      shortCircuitTtlMillis = Some(5 * day))
      .select(col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
  }

  /** Ingest-maintained planning statistics (EventMetadata.java:96-110:
    * statistics written into the metadata table AT INGEST, read back at
    * plan time): two ingest batches of one datatype — the flat order
    * roots (depth 1), then their dotted lineitem children (depth 2) —
    * each fold their [[Ingest.datatypeStats]] rows into the durable
    * store through the INGEST tier's per-batch path
    * ([[graft.ingest.MetadataStats.updateBatch]]), and the children
    * batch is then REPLAYED (the crash-after-swap window a streaming
    * checkpoint replay produces): the overwrite-keyed registration
    * replaces its rows, so the oracle's exact `cnt` proves replay does
    * not double-count. The read-back is the merged statistic = the
    * whole-corpus aggregate with no corpus re-scan at read time — the
    * statistic [[TreeQueries.parentQuery]] prunes on. */
  def ingTreeDepthStat(s: SparkSession, d: String): DataFrame = {
    val dir =
      java.nio.file.Files.createTempDirectory("graft-dtstats").toString
    val roots = Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as("uid"), lit("doc").as("datatype"))
    val children = Tables.lineitem(s, d).select(
      concat(col("l_orderkey").cast("string"), lit("."),
        col("l_linenumber").cast("string")).as("uid"),
      lit("doc").as("datatype"))
    graft.ingest.MetadataStats.updateBatch(dir, 0L,
      Ingest.datatypeStats(roots))
    graft.ingest.MetadataStats.updateBatch(dir, 1L,
      Ingest.datatypeStats(children))
    // checkpoint replay of batch 1: must REPLACE, not double-count
    graft.ingest.MetadataStats.updateBatch(dir, 1L,
      Ingest.datatypeStats(children))
    graft.ingest.MetadataStats.read(s, dir)
      .select("datatype", "max_tree_depth", "cnt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "age_off" -> ageOff _,
    "ing_tree_depth_stat" -> ingTreeDepthStat _,
    "shard_bounds" -> shardBounds _,
    "ing_json_reader" -> ingJsonReader _,
    "handlers_dispatch" -> handlersDispatch _,
    "ing_discovery" -> ingDiscovery _,
    "ing_discovery_rev" -> ingDiscoveryRev _,
    "ing_discovery_range" -> ingDiscoveryRange _,
    "ing_index_lookup" -> ingIndexLookup _,
    "ing_needle_semijoin" -> ingNeedleSemiJoin _,
    "ing_needle_uidlist" -> ingNeedleUidList _,
    "ing_metadata" -> ingMetadata _,
    "ing_data_dictionary" -> ingDataDictionary _,
    "ing_unfielded_expand" -> ingUnfieldedExpand _,
    "ing_index_hole" -> ingIndexHole _,
    "ing_date_index" -> ingDateIndex _,
    "ing_error_channel" -> ingErrorChannel _,
    "ing_uid_list" -> ingUidList _,
    "mods_applied" -> modsApplied _,
    "mods_update_history" -> modsUpdateHistory _,
    "ing_uid_list_removed" -> ingUidListRemoved _,
    "feeds_atom" -> feedsAtom _,
    "feeds_summary" -> feedsSummary _,
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
    // the merged store row must equal the whole-corpus statistic
    "ing_tree_depth_stat" ->
      """WITH t AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS uid FROM orders
        |  UNION ALL
        |  SELECT CAST(l_orderkey AS VARCHAR) || '.' ||
        |         CAST(l_linenumber AS VARCHAR) FROM lineitem)
        |SELECT 'doc' AS datatype,
        |   MAX(CAST(len(string_split(uid, '.')) AS BIGINT)) AS max_tree_depth,
        |   COUNT(*) AS cnt
        | FROM t""".stripMargin,
    "age_off" ->
      """SELECT event_id, event_type,
        |   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        | FROM events
        | WHERE ts > TIMESTAMP '2024-01-26 00:00:00'
        |    OR ts > CASE WHEN event_type = 'click' THEN TIMESTAMP '2024-01-21 00:00:00'
        |                 WHEN event_type = 'view' THEN TIMESTAMP '2024-01-06 00:00:00'
        |                 WHEN event_type = 'error' THEN TIMESTAMP '2024-01-29 00:00:00'
        |                 ELSE TIMESTAMP '2024-01-16 00:00:00' END""".stripMargin,
    "ing_discovery" ->
      s"""SELECT value, field, strftime(shard_date, '%Y-%m-%d') AS day,
         |   datatype, count(*) AS cnt
         | FROM $longSql
         | WHERE value = 'click' GROUP BY 1, 2, 3, 4""".stripMargin,
    "ing_index_lookup" ->
      s"""SELECT value, field, count(*) AS total FROM $longSql
         | WHERE field = 'event_type' AND value IN ('click', 'view')
         | GROUP BY 1, 2""".stripMargin,
    "ing_discovery_rev" ->
      s"""SELECT value, field, strftime(shard_date, '%Y-%m-%d') AS day,
         |   datatype, count(*) AS cnt
         | FROM $longSql
         | WHERE field = 'event_type' AND value LIKE '%ick'
         | GROUP BY 1, 2, 3, 4""".stripMargin,
    "ing_discovery_range" ->
      s"""SELECT value, field, datatype, count(*) AS total FROM $longSql
         | WHERE field = 'event_type'
         |   AND value BETWEEN 'click' AND 'purchase'
         | GROUP BY 1, 2, 3""".stripMargin,
    "ing_needle_semijoin" ->
      "SELECT event_id, user_id FROM events WHERE user_id = 42",
    // both granularities must land on the plain filter result
    "ing_needle_uidlist" ->
      """SELECT event_id, 'uid' AS regime FROM events WHERE user_id = 42
        | UNION ALL
        | SELECT event_id, 'date' FROM events WHERE event_type = 'signup'""".stripMargin,
    "ing_metadata" ->
      s"""SELECT field, datatype, count(*) AS cnt,
         |   count(DISTINCT value) AS cardinality,
         |   strftime(MIN(shard_date), '%Y-%m-%d') AS first_date,
         |   strftime(MAX(shard_date), '%Y-%m-%d') AS last_date
         | FROM $longSql GROUP BY 1, 2""".stripMargin,
    "ing_data_dictionary" ->
      s"""SELECT field, datatype,
         |   field IN ('user_id', 'event_type', 'value') AS forward_indexed,
         |   field = 'event_type' AS reverse_indexed,
         |   field = 'props' AS tokenized,
         |   count(*) AS cnt, count(DISTINCT value) AS cardinality,
         |   strftime(MIN(shard_date), '%Y-%m-%d') AS first_date,
         |   strftime(MAX(shard_date), '%Y-%m-%d') AS last_date
         | FROM $longSql GROUP BY 1, 2""".stripMargin,
    // the index proves 'click' lives only in event_type, so the oracle is
    // the single-field equality the expansion compiles to
    "ing_unfielded_expand" ->
      "SELECT event_id, event_type FROM events WHERE event_type = 'click'",
    "shard_bounds" ->
      """SELECT event_id, user_id,
        |   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS datatype
        | FROM events
        | WHERE event_type = 'click' AND user_id % 2 = 0
        |   AND CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'""".stripMargin,
    "ing_json_reader" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        | FROM events
        | WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) > 80""".stripMargin,
    "handlers_dispatch" ->
      """WITH t AS (SELECT event_id,
        |   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS dt,
        |   event_type, value FROM events)
        |SELECT 'even' AS datatype, 0 AS handler_seq, count(*) AS cnt
        |  FROM t WHERE dt = 'even' AND event_type IS NOT NULL
        |UNION ALL SELECT 'even', 1, count(*)
        |  FROM t WHERE dt = 'even' AND value IS NOT NULL
        |UNION ALL SELECT 'odd', 0, count(*)
        |  FROM t WHERE dt = 'odd' AND event_type IS NOT NULL""".stripMargin,
    // hole fallback must find every match, including dates the partial
    // index never saw — the oracle is the full unpruned filter
    "ing_index_hole" ->
      "SELECT event_id, user_id FROM events WHERE user_id = 7",
    "ing_date_index" ->
      """SELECT DISTINCT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS shard_date
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE CAST(o_orderdate AS DATE)
        |   BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'""".stripMargin,
    "ing_error_channel" ->
      """SELECT event_id, event_type, props FROM events
        | WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) > 90""".stripMargin,
    "ing_uid_list" ->
      """SELECT event_type AS value, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |   count(*) AS cnt, LEAST(count(DISTINCT event_id), 20) AS uid_sample_size
        | FROM events GROUP BY 1, 2""".stripMargin,
    // the oracle replays the edits relationally: delete uid 12's
    // event_type wholesale, uid 17's 'view' value, insert the correction
    // update = delete(old)+insert(new); history trail rows are literal
    // (fixed user + timestamp in the gate)
    "mods_update_history" ->
      """WITH e AS (SELECT CAST(event_id AS VARCHAR) AS uid, event_type
        |  FROM events WHERE event_id IN (12, 17, 19))
        |SELECT uid, 'event_type' AS field, event_type AS value FROM e
        | WHERE NOT (uid = '12' AND event_type = 'click')
        |   AND NOT (uid = '17' AND event_type = 'view')
        |UNION ALL SELECT '12', 'event_type', 'corrected'
        |UNION ALL SELECT '19', 'event_type', 'flagged'
        |UNION ALL SELECT '12', 'HISTORY_event_type',
        |   '1700000000000:alice:click:delete'
        |UNION ALL SELECT '12', 'HISTORY_event_type',
        |   '1700000000000:alice:corrected:insert'
        |UNION ALL SELECT '17', 'HISTORY_event_type',
        |   '1700000000000:alice:view:delete'
        |UNION ALL SELECT '19', 'HISTORY_event_type',
        |   '1700000000000:alice:flagged:insert'""".stripMargin,
    "mods_applied" ->
      """WITH melt AS (
        |  SELECT CAST(event_id AS VARCHAR) AS uid, event_type AS value
        |    FROM events WHERE event_type IS NOT NULL),
        |edited AS (
        |  SELECT uid, value FROM melt
        |   WHERE uid <> '12' AND NOT (uid = '17' AND value = 'view')
        |  UNION ALL SELECT '12', 'corrected_click')
        |SELECT value, count(*) AS cnt, count(DISTINCT uid) AS n_uids
        |  FROM edited GROUP BY 1""".stripMargin,
    // REMOVEDUID netting: recompute the index from the edited event set —
    // the incremental patch must land on the same counts and uid sets
    "ing_uid_list_removed" ->
      """WITH melt AS (
        |  SELECT CAST(event_id AS VARCHAR) AS uid,
        |         CAST(user_id AS VARCHAR) AS value,
        |         CAST(ts AS DATE) AS shard_date
        |    FROM events WHERE user_id IS NOT NULL),
        |edited AS (
        |  SELECT * FROM melt WHERE CAST(uid AS BIGINT) NOT BETWEEN 1 AND 50
        |  UNION ALL SELECT '9000001', '42', DATE '2024-01-05'
        |  UNION ALL SELECT '9000002', '42', DATE '2024-01-05')
        |SELECT value, strftime(shard_date, '%Y-%m-%d') AS day,
        |       count(*) AS cnt, LEAST(count(DISTINCT uid), 20) AS uid_sample_size
        |  FROM edited WHERE value IN ('42', '7') GROUP BY 1, 2""".stripMargin,
    "feeds_atom" ->
      """SELECT 'event_type' AS category, event_type AS value,
        |   strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS latest_date,
        |   count(*) AS occurrences
        | FROM events GROUP BY 2""".stripMargin,
    "feeds_summary" ->
      """SELECT 'event' AS datatype, field, day, count(*) AS cnt,
        |   count(DISTINCT uid) AS distinct_events
        | FROM (
        |   SELECT 'user_id' AS field, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |       CAST(event_id AS VARCHAR) AS uid
        |     FROM events WHERE user_id IS NOT NULL
        |   UNION ALL
        |   SELECT 'event_type', strftime(CAST(ts AS DATE), '%Y-%m-%d'),
        |       CAST(event_id AS VARCHAR)
        |     FROM events WHERE event_type IS NOT NULL
        | ) GROUP BY 2, 3""".stripMargin,
  )
}
