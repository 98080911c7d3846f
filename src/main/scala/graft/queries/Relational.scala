package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational core: the DataWave query surface (SURVEY.md §2.2–§2.5)
  * re-expressed as declarative DataFrame plans.
  *
  * Mapping notes (reference file:line cited per query):
  *  - Equality/range/regex/negation predicates — JexlEvaluation.java:31,
  *    DatawaveArithmetic.java:24 → plain `Column` predicates, pushed to the
  *    parquet scan by Catalyst (verify with PushedFilters in explain).
  *  - Index-stream intersection/union (Intersection.java:81, Union.java:31)
  *    → joins / set ops on key sets.
  *  - #GROUPBY + aggregators (DocumentGrouper.java:118) → groupBy().agg()
  *    with partial (map-side) aggregation — the exact analog of DataWave's
  *    per-tserver batches merged client-side.
  *  - #UNIQUE (UniqueTransform.java:42) → exact dedup, no bloom filter
  *    false-negatives.
  *
  * Money math: inputs are parquet doubles; all SUMs go through
  * DECIMAL(18,2) so partial-aggregation order cannot perturb low bits
  * (bit-stable under any partitioning — required for a deterministic
  * result at any cluster size, and for the DuckDB oracle hash-compare).
  */
object Relational {
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Equality filter + projection (RETURN_FIELDS, QueryParameters.java:51).
    * Filter and 3-column projection both reach the scan. */
  def eqProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** Bounded range (LUCENE `F:[a TO b]` → `_Bounded_` JEXL,
    * BoundedRangeIndexExpansionVisitor) → native range predicates. */
  def rangeFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 10 && col("l_quantity") <= 15
        && col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

  /** Regex predicate (`=~`, RegexIndexExpansionVisitor.java:57) → rlike.
    * No index-expansion needed: the scan-side filter is already cheap;
    * a dictionary-accelerated rewrite is a perf option, not correctness. */
  def regexFilter(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").rlike("^(red|blue) (bolt|gear)$"))
      .select("p_partkey", "p_name", "p_brand")

  /** Negations (`!=`, NOT; ShardQueryLogic.java:140-146). Unlike the
    * reference, negations cost nothing special on a columnar scan. */
  def negFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "O" && !(col("o_orderpriority") === "1-URGENT"))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")

  /** Null semantics (`FIELD == null`, filter:isNull/isNotNull,
    * EvaluationPhaseFilterFunctions.java:142-178). Tables are null-free so
    * we derive a nullable column first (nullif), then test both sides. */
  def nullFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("status_nn", nullif(col("o_orderstatus"), lit("O")))
      .filter(col("status_nn").isNotNull)
      .groupBy("status_nn").agg(count(lit(1)).as("cnt"))

  /** Compound boolean logic ((a || b) && !c) — AndIterator/OrIterator
    * semantics (iterator/logic/) as codegen'd Column logic. */
  def boolMix(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter((col("l_returnflag") === "A" || col("l_returnflag") === "R")
        && !(col("l_linestatus") === "O") && col("l_discount") > lit(0.05))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_discount")

  /** f:length(F, lo, hi) (QueryFunctions.java:55-79). */
  def lengthFilter(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(length(col("p_name")).between(8, 10))
      .select("p_partkey", "p_name")

  /** filter:betweenDates (EvaluationPhaseFilterFunctions.java:417-1287) +
    * date-bound pruning every DataWave query carries (QueryParameters.java:8). */
  def dateBetween(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))

  /** #GROUPBY + #SUM/#MIN/#MAX/#COUNT/#AVERAGE (DocumentGrouper.java:118,
    * SumAggregator.java:18 etc.) — TPC-H Q1 shape. Partial agg on the map
    * side keeps the shuffle tiny (#groups × #cols), which is what makes
    * this safe at 100 TB. */
  def groupbyAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        (sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))).cast("double")).as("sum_disc_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))

  /** Dimension join chain — broadcast both small dims so the fact side
    * never shuffles (at 100 TB customer↔nation↔region stays broadcastable). */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))

  /** Fact-to-fact join (orders ⋈ lineitem) — shuffle join on the natural
    * key; both sides pre-filtered before the shuffle. */
  def joinFacts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** Index-stream intersection (Intersection.java:81, IndexInfo.intersect):
    * the uid-sets of two terms ANDed — as a set intersection of key sets. */
  def uidIntersect(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_returnflag") === "R").select("l_orderkey").distinct()
      .intersect(li.filter(col("l_discount") > 0.08).select("l_orderkey").distinct())
  }

  /** Index-stream union (Union.java:31). */
  def uidUnion(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_quantity") >= 49).select("l_orderkey")
      .union(li.filter(col("l_discount") >= 0.099).select("l_orderkey"))
      .distinct()
  }

  /** EXCEPT — negated stream subtraction (NegationFilter semantics). */
  def uidExcept(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_returnflag") === "A").select("l_orderkey").distinct()
      .except(li.filter(col("l_returnflag") === "R").select("l_orderkey").distinct())
  }

  /** Semi join — "documents having at least one matching child term";
    * Spark plans a left-semi hash join, no duplicate inflation. */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      .select("o_custkey")
    Tables.customer(s, d)
      .join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Anti join — standalone negation resolved as anti-join rather than the
    * reference's refused full-scan (full-table-scan policy gate kept as a
    * planner option, not a hard failure). */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Chained query logics (tables/chained/): query-1's result parameterizes
    * query-2 — here as a join against a derived key set (never collect()). */
  def chainedQuery(s: SparkSession, d: String): DataFrame = {
    val topNation = Tables.customer(s, d)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c_nationkey").asc).limit(1)
      .select(col("c_nationkey").as("top_nk"))
    Tables.customer(s, d)
      .join(broadcast(topNation), col("c_nationkey") === col("top_nk"))
      .select("c_custkey", "c_name", "c_nationkey")
  }

  /** Top-k (CachedResults ORDER BY + LIMIT, CachedRunningQuery.java:486-495).
    * Spark plans TakeOrderedAndProject: per-partition heap + driver merge —
    * no global sort at any scale. Tie-break on the unique key keeps the
    * result deterministic. */
  def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Window functions (net-new vs the reference — SURVEY §2.5): most recent
    * order per customer via row_number. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
  }

  /** #UNIQUE(F1..Fk) (UniqueTransform.java:42) — deterministic variant:
    * first (= min key) document per distinct value combination. Exact,
    * unlike the reference's bloom filter (500k, 1e-15). */
  def uniqueBy(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey", "o_orderstatus")
      .agg(min(col("o_orderkey")).as("first_orderkey"))

  /** #UNIQUE_BY_DAY (UniqueGranularity.java) — value-combination distinct
    * after truncating the time dimension to day granularity. */
  def uniqueByDay(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("active_users"))

  /** filter:occurrence(F, '>=', n) (EvaluationPhaseFilterFunctions.java:58-70)
    * lifted to entity level: keep customers with >= 5 orders. */
  def occurrence(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 5)

  /** CountingShardQueryLogic (ResultCountingIterator) — count only, no
    * documents cross the wire. */
  def countOnly(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .agg(count(lit(1)).as("cnt"))

  /** FieldIndexCountQueryLogic (tables/shard/FieldIndexCountQueryLogic.java:49):
    * counts per (field, value) without touching events — here a melt +
    * count over the column-as-field view. */
  def fieldIndexCount(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.select(lit("O_ORDERSTATUS").as("field"), col("o_orderstatus").as("value"))
      .union(o.select(lit("O_ORDERPRIORITY").as("field"), col("o_orderpriority").as("value")))
      .groupBy("field", "value").agg(count(lit(1)).as("cnt"))
  }

  /** DiscoveryLogic (discovery/DiscoveryLogic.java:71): per-term counts by
    * day — the global-index aggregate re-expressed. */
  def discovery(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type").as("term"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** IndexStatsQueryLogic (StatsJob.java:73): per-field selectivity =
    * unique values vs total observations. Exact here (the HLL++ variant is
    * `approx_count_distinct`, benchmarked separately — sketches can't be
    * hash-compared against an oracle). */
  def indexStats(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.select(lit("EVENT_TYPE").as("field"), col("event_type").as("value"))
      .union(e.select(lit("USER_ID").as("field"), col("user_id").cast("string").as("value")))
      .groupBy("field")
      .agg(countDistinct(col("value")).as("unique_values"),
        count(lit(1)).as("observations"))
  }

  /** FacetedQueryLogic (tables/facets/): field-value histogram for a query
    * predicate. */
  def facets(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("value") > 5)
      .groupBy(col("event_type").as("facet_value"))
      .agg(count(lit(1)).as("cnt"))

  /** Facet sketch interchange (FacetHandler.java:493-521): per-day ingest
    * batches each write a serialized HLL sketch per facet key; the read
    * side merges the batch sketches and estimates. The facet (event-type
    * diversity per user, ≤ 5) keeps every key in the sketch's exact
    * coupon regime at ANY scale, so the full serialize → union → estimate
    * path hash-matches the exact oracle while the machinery is the real
    * mergeable-sketch one. */
  def facetsSketch(s: SparkSession, d: String): DataFrame = {
    val batches = graft.ingest.Facets.sketchBatches(
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
      batchCol = "day", keyCol = "user_id", valCol = "event_type")
    graft.ingest.Facets.merge(batches, "user_id")
      .select(col("user_id"), col("cardinality"), col("cnt"))
  }

  /** The CountMinSketch half of FacetValue (FacetValue.java:16-25
    * carries HLL+ AND CMS): per-day CMS sketches of user cohorts under
    * each event type, serialized → unioned across the day batches →
    * probed for every cohort's frequency, touching only sketch bytes on
    * the read path. Estimates are deterministic given (eps, confidence,
    * seed) and exact for this bounded value domain (50 cohorts vs width
    * 400 × depth ≥4: a value inflates only by colliding in EVERY row),
    * so the oracle is the exact count per (event_type, cohort). */
  def facetsCms(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("cohort", (col("user_id") % 50).cast("string"))
    val batches = graft.ingest.Facets.cmsBatches(
      ev, batchCol = "day", keyCol = "event_type", valCol = "cohort")
    val merged = graft.ingest.Facets.cmsMerge(batches, "event_type")
    graft.ingest.Facets.cmsEstimates(merged, "event_type",
        (0 until 50).map(_.toString))
      .select(col("event_type"), col("value").as("cohort"), col("estimate"))
  }

  /** Paged results (RunningQuery.next()): deterministic ORDER BY + OFFSET +
    * LIMIT page. */
  def pagination(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_orderkey").asc)
      .offset(20).limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Grouping sets / rollup — net-new vs the reference (§2.4 "missing
    * natively"); free in Spark. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_eq_project" -> eqProject _,
    "rel_range" -> rangeFilter _,
    "rel_regex" -> regexFilter _,
    "rel_neg" -> negFilter _,
    "rel_null" -> nullFilter _,
    "rel_bool_mix" -> boolMix _,
    "rel_length" -> lengthFilter _,
    "rel_date_between" -> dateBetween _,
    "rel_groupby_agg" -> groupbyAgg _,
    "rel_join_broadcast" -> joinBroadcast _,
    "rel_join_facts" -> joinFacts _,
    "rel_uid_intersect" -> uidIntersect _,
    "rel_uid_union" -> uidUnion _,
    "rel_uid_except" -> uidExcept _,
    "rel_semi_join" -> semiJoin _,
    "rel_anti_join" -> antiJoin _,
    "rel_chained" -> chainedQuery _,
    "rel_topk" -> topK _,
    "rel_window_rank" -> windowRank _,
    "rel_unique_by" -> uniqueBy _,
    "rel_unique_by_day" -> uniqueByDay _,
    "rel_occurrence" -> occurrence _,
    "rel_count_only" -> countOnly _,
    "rel_field_index_count" -> fieldIndexCount _,
    "rel_discovery" -> discovery _,
    "rel_index_stats" -> indexStats _,
    "rel_facets" -> facets _,
    "rel_facets_sketch" -> facetsSketch _,
    "rel_facets_cms" -> facetsCms _,
    "rel_pagination" -> pagination _,
    "rel_rollup" -> rollupAgg _,
  )

  val oracleSql: Map[String, String] = Map(
    "rel_eq_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_returnflag = 'R' AND l_linestatus = 'F'""".stripMargin,
    "rel_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        | WHERE l_quantity >= 10 AND l_quantity <= 15
        |   AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'""".stripMargin,
    "rel_regex" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        | WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')""".stripMargin,
    "rel_neg" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        | WHERE o_orderstatus <> 'O' AND NOT (o_orderpriority = '1-URGENT')""".stripMargin,
    "rel_null" ->
      """SELECT nullif(o_orderstatus, 'O') AS status_nn, count(*) AS cnt FROM orders
        | WHERE nullif(o_orderstatus, 'O') IS NOT NULL GROUP BY 1""".stripMargin,
    "rel_bool_mix" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount FROM lineitem
        | WHERE (l_returnflag = 'A' OR l_returnflag = 'R')
        |   AND NOT (l_linestatus = 'O') AND l_discount > 0.05""".stripMargin,
    "rel_length" ->
      "SELECT p_partkey, p_name FROM part WHERE length(p_name) BETWEEN 8 AND 10",
    "rel_date_between" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        | GROUP BY 1""".stripMargin,
    "rel_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |   MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |   COUNT(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        | GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "rel_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS customers,
        |   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        |   JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name""".stripMargin,
    "rel_join_facts" ->
      """SELECT o_orderpriority,
        |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |   count(*) AS n_items
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        | WHERE o_orderstatus = 'F' AND l_returnflag = 'R'
        | GROUP BY o_orderpriority""".stripMargin,
    "rel_uid_intersect" ->
      """SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        | INTERSECT
        | SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount > 0.08""".stripMargin,
    "rel_uid_union" ->
      """SELECT DISTINCT l_orderkey FROM (
        |   SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
        |   UNION ALL
        |   SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.099)""".stripMargin,
    "rel_uid_except" ->
      """SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        | EXCEPT
        | SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,
    "rel_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin,
    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "rel_chained" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        | WHERE c_nationkey = (
        |   SELECT c_nationkey FROM customer GROUP BY c_nationkey
        |   ORDER BY count(*) DESC, c_nationkey ASC LIMIT 1)""".stripMargin,
    "rel_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "rel_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |   SELECT o_custkey, o_orderkey, o_orderdate,
        |     row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |   FROM orders) WHERE rn = 1""".stripMargin,
    "rel_unique_by" ->
      """SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_orderkey
        | FROM orders GROUP BY o_custkey, o_orderstatus""".stripMargin,
    "rel_unique_by_day" ->
      """SELECT day, count(*) AS active_users FROM (
        |   SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events)
        | GROUP BY day""".stripMargin,
    "rel_occurrence" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
        | GROUP BY o_custkey HAVING count(*) >= 5""".stripMargin,
    "rel_count_only" ->
      """SELECT count(*) AS cnt FROM lineitem
        | WHERE l_returnflag = 'R' AND l_quantity > 45""".stripMargin,
    "rel_field_index_count" ->
      """SELECT field, value, count(*) AS cnt FROM (
        |   SELECT 'O_ORDERSTATUS' AS field, o_orderstatus AS value FROM orders
        |   UNION ALL
        |   SELECT 'O_ORDERPRIORITY' AS field, o_orderpriority AS value FROM orders)
        | GROUP BY field, value""".stripMargin,
    "rel_discovery" ->
      """SELECT event_type AS term, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt
        | FROM events GROUP BY 1, 2""".stripMargin,
    "rel_index_stats" ->
      """SELECT field, count(DISTINCT value) AS unique_values, count(*) AS observations
        | FROM (
        |   SELECT 'EVENT_TYPE' AS field, event_type AS value FROM events
        |   UNION ALL
        |   SELECT 'USER_ID' AS field, CAST(user_id AS VARCHAR) AS value FROM events)
        | GROUP BY field""".stripMargin,
    "rel_facets_sketch" ->
      """SELECT user_id, count(DISTINCT event_type) AS cardinality,
        |   count(*) AS cnt
        | FROM events GROUP BY user_id""".stripMargin,
    "rel_facets" ->
      """SELECT event_type AS facet_value, count(*) AS cnt FROM events
        | WHERE value > 5 GROUP BY 1""".stripMargin,
    // CMS point estimates equal exact counts for this bounded domain
    // (see facetsCms scaladoc); every (event_type, cohort) pair probed,
    // absent pairs estimate 0
    "rel_facets_cms" ->
      """WITH et AS (SELECT DISTINCT event_type FROM events),
        |coh AS (SELECT CAST(c AS VARCHAR) AS cohort
        |        FROM (SELECT unnest(range(0, 50)) AS c)),
        |exact AS (SELECT event_type, CAST(user_id % 50 AS VARCHAR) AS cohort,
        |          count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT et.event_type, coh.cohort,
        |   CAST(COALESCE(exact.n, 0) AS BIGINT) AS estimate
        | FROM et CROSS JOIN coh
        | LEFT JOIN exact ON exact.event_type = et.event_type
        |   AND exact.cohort = coh.cohort""".stripMargin,
    "rel_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_orderkey ASC LIMIT 10 OFFSET 20""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
  )
}
