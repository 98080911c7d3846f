package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.jexl.{Compiler, LuceneParser, QueryModel, QueryModelLoader, QueryPolicy}

/** Queries driven through the JEXL/LUCENE front-end (SURVEY.md §3.1
  * "Spark shape": parse → translate to Column → Catalyst plans it).
  * Each has a hand-written SQL oracle asserting the translation is right.
  */
object JexlQueries {
  private val permissive = QueryPolicy(fullTableScanEnabled = true)

  /** JEXL eq+range conjunction on lineitem — the M1 "minimum query slice". */
  def jexlEqRange(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.lineitem(s, d),
      "L_RETURNFLAG == 'R' && L_QUANTITY >= 30 && L_QUANTITY <= 40")
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** JEXL with regex, OR, and negation. */
  def jexlRegexBool(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.part(s, d),
      "(P_NAME =~ '^red .*' || P_NAME =~ '^blue .*') && P_TYPE != 'PROMO'")
      .select("p_partkey", "p_name", "p_type")

  /** JEXL filter: function namespace. */
  def jexlFunctions(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.orders(s, d),
      "f:between(O_TOTALPRICE, 100000, 150000) && " +
        "filter:betweenDates(O_ORDERDATE, '1997-01-01', '1998-12-31') && " +
        "filter:includeRegex(O_ORDERPRIORITY, '^[12]-.*')")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")

  /** Query model aliasing: user field names mapped to physical columns —
    * QueryModelVisitor.java:58 semantics. */
  def jexlModel(s: SparkSession, d: String): DataFrame = {
    val model = QueryModel(Map(
      "SEGMENT" -> Seq("C_MKTSEGMENT"),
      "BALANCE" -> Seq("C_ACCTBAL")))
    Compiler.filter(Tables.customer(s, d),
      "SEGMENT == 'BUILDING' && BALANCE > 5000", model)
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** Model loaded from TABLE ROWS at query time (QueryModelLoader.java:
    * 107-133, ModelKeyParser rows → QueryModel; ShardQueryLogic
    * .initialize): forward alias→field resolution (incl. 1→N), db-field
    * normalizers from the type catalog (multi-normalizer ANY matching),
    * and REVERSE rows renaming result fields — the model is data, not
    * code. */
  def modelTableQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val modelRows = Seq(
      ("TPCH", "SEGMENT", "C_MKTSEGMENT", "FORWARD"),
      ("TPCH", "KEY", "C_CUSTKEY", "FORWARD"),   // 1→N: KEY expands to
      ("TPCH", "KEY", "C_NATIONKEY", "FORWARD"), //   custkey OR nationkey
      ("TPCH", "balance", "C_ACCTBAL", "REVERSE"), // result display name
      // another model's rows must NOT leak into TPCH resolution
      ("OTHER", "SEGMENT", "C_NAME", "FORWARD"))
      .toDF("model_name", "alias", "field", "direction")
    val typeRows = Seq( // catalog `t` rows: C_MKTSEGMENT matches under ANY
      ("C_MKTSEGMENT", "lcNoDiacritics"), ("C_MKTSEGMENT", "noop"))
      .toDF("field", "norm")
    val model = QueryModelLoader.load(modelRows, "tpch", Some(typeRows))
    val logic = new graft.query.ShardQueryLogic(model)
    logic.query(Tables.customer(s, d),
        "SEGMENT == 'building' && KEY == 13",
        graft.query.QueryParams(
          renameFields = QueryModelLoader.reverseRename(modelRows, "tpch")))
      .select("c_custkey", "c_name", "balance")
  }

  /** LUCENE front-end: ranges + boolean ops compile through the same AST. */
  def luceneQuery(s: SparkSession, d: String): DataFrame = {
    val ast = LuceneParser.parse(
      "L_RETURNFLAG:A L_QUANTITY:[45 TO 50] NOT L_LINESTATUS:O")
    val li = Tables.lineitem(s, d)
    li.filter(Compiler.compile(ast, li, QueryModel()))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** LUCENE wildcard → regex translation. */
  def luceneWildcard(s: SparkSession, d: String): DataFrame = {
    val ast = LuceneParser.parse("P_NAME:sma*")
    val p = Tables.part(s, d)
    p.filter(Compiler.compile(ast, p, QueryModel()))
      .select("p_partkey", "p_name")
  }

  /** Unfielded `_ANYFIELD_` expansion over the schema (the reference hits
    * the global index; we consult schema + let the scan filter). */
  def jexlAnyfield(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.orders(s, d), "_ANYFIELD_ == '1-URGENT'", QueryModel(), permissive)
      .select("o_orderkey", "o_orderpriority")

  /** LUCENE phrase → content:phrase scalar fallback on documents. */
  def lucenePhrase(s: SparkSession, d: String): DataFrame = {
    val ast = LuceneParser.parse("TEXT:\"fast scan\"")
    val docs = Tables.documents(s, d)
    docs.filter(Compiler.compile(ast, docs, QueryModel()))
      .select("doc_id")
  }

  /** Eval-phase filter functions: compare(ANY), value-function comparison
    * (getMaxTime), getAllMatches — EvaluationPhaseFilterFunctions
    * :343-415, :1447-1510, :1789. */
  def fltEvalFunctions(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.lineitem(s, d),
      "L_RETURNFLAG == 'R' && filter:compare(L_DISCOUNT, '>', 'ANY', L_TAX) && " +
        "filter:getMaxTime(L_SHIPDATE) >= 893980800000")
      .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")

  /** getAllMatches in predicate position + custom-format date function. */
  def fltGetAllMatches(s: SparkSession, d: String): DataFrame =
    Compiler.filter(Tables.orders(s, d),
      "filter:getAllMatches(O_ORDERPRIORITY, '[12]-.*') && " +
        "filter:afterDate(O_ORDERDATE, '19980301', 'yyyyMMdd')")
      .select("o_orderkey", "o_orderpriority")

  /** Leading wildcard via a reversed-value column: `P_NAME =~ '.*mint'`
    * compiles to a PREFIX predicate on P_NAME_REV — the shardReverseIndex
    * plan shape (ShardedDataTypeHandler.java:86-101) — instead of an
    * unanchored regex scan. */
  def revWildcard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, reverse}
    val p = Tables.part(s, d).withColumn("p_name_rev", reverse(col("p_name")))
    // '.*gear' matches hundreds of rows at every SF — the reverse-index
    // route must prove inclusion, not just exclude everything
    Compiler.filter(p, "P_NAME =~ '.*gear'")
      .select("p_partkey", "p_name")
  }

  /** filter:matchesAtLeastCountOf over a multi-valued field
    * (EvaluationPhaseFilterFunctions:223): at least 2 of the listed
    * words appear among the part-name words. */
  def fltMatchesCount(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, split}
    val p = Tables.part(s, d).withColumn("name_words", split(col("p_name"), " "))
    Compiler.filter(p,
      "filter:matchesAtLeastCountOf(2, NAME_WORDS, 'red', 'widget', 'bolt')")
      .select("p_partkey", "p_name")
  }

  /** filter:timeFunction (:1431): |ship - order| within 7 days, evaluated
    * on the joined frame. */
  def fltTimeFunction(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val j = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
    Compiler.filter(j,
      "L_RETURNFLAG == 'R' && " +
        "filter:timeFunction(L_SHIPDATE, O_ORDERDATE, '<', 604800000)")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
  }

  /** filter:compare ALL mode (:1789): every discount in the order below
    * every tax — forall × forall across the two value sets. */
  def fltCompareAll(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, collect_list}
    val byOrder = Tables.lineitem(s, d).groupBy("l_orderkey")
      .agg(collect_list(col("l_discount")).as("discounts"),
        collect_list(col("l_tax")).as("taxes"))
    Compiler.filter(byOrder,
      "filter:compare(DISCOUNTS, '<', 'ALL', TAXES)")
      .select("l_orderkey")
  }

  /** 600-branch OR of equalities — the reference's ivarator/FST envelope
    * (orExpansionThreshold; queries of this shape are routine there).
    * Compiles to ONE InSet probe + a single pushed In filter, not a
    * 600-node boolean tree (PlanSpec pins the shape). */
  def jexlLargeOr(s: SparkSession, d: String): DataFrame = {
    val q = (1 to 1199 by 2).map(k => s"O_CUSTKEY == $k").mkString(" || ")
    Compiler.filter(Tables.orders(s, d), q, QueryModel(), permissive)
      .select("o_orderkey", "o_custkey")
  }

  /** LUCENE phrase slop `"a b"~N` → content:within(N)
    * (SlopQueryNodeBuilder.java:44-47). */
  def luceneSlop(s: SparkSession, d: String): DataFrame = {
    val ast = LuceneParser.parse("TEXT:\"join merge\"~3")
    val docs = Tables.documents(s, d)
    docs.filter(Compiler.compile(ast, docs, QueryModel()))
      .select("doc_id")
  }

  /** Eval-phase # functions from a LUCENE string end-to-end: #COMPARE
    * carries FIELD args through the translation (functions/jexl/
    * Compare.java), composed with a fielded term. */
  def luceneEvalFuncs(s: SparkSession, d: String): DataFrame = {
    val ast = LuceneParser.parse(
      "L_RETURNFLAG:R AND #COMPARE(L_DISCOUNT, '>', 'ANY', L_TAX)")
    val li = Tables.lineitem(s, d)
    li.filter(Compiler.compile(ast, li, QueryModel()))
      .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
  }

  /** Function-namespace SPI (JexlFunctionNamespaceRegistry): a deployment
    * registers `ql:priceband(F, lo, hi)` and uses it in a query without
    * touching the compiler. */
  def spiFunction(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import graft.jexl.{FunctionRegistry, Node}
    FunctionRegistry.register("ql", "priceband", (ctx, args) => args match {
      case Node.FieldArg(f) :: Node.LitArg(lo) :: Node.LitArg(hi) :: Nil =>
        ctx.anyField(f)((c, _) =>
          c >= lit(lo.raw.toDouble) && c < lit(hi.raw.toDouble))
      case other => throw new graft.jexl.ParseException(s"bad args $other")
    })
    Compiler.filter(Tables.orders(s, d),
      "ql:priceband(O_TOTALPRICE, 200000, 250000) && O_ORDERSTATUS == 'F'")
      .select("o_orderkey", "o_totalprice")
  }

  /** LIMIT_FIELDS + HIT_LIST interplay (LimitFields.java: matched values
    * must survive the cap): quantities arrays capped to ONE value — the
    * hit (30.0) must be the survivor wherever the predicate matched. */
  def qsLimitHits(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, collect_list, element_at}
    val byOrder = Tables.lineitem(s, d).groupBy("l_orderkey")
      .agg(collect_list(col("l_quantity")).as("quantities"))
    val logic = new graft.query.ShardQueryLogic()
    logic.query(byOrder, "QUANTITIES == 30",
        graft.query.QueryParams(hitList = true,
          limitFieldValues = Map("QUANTITIES" -> 1)))
      .select(col("l_orderkey"),
        element_at(col("quantities"), 1).as("kept_value"))
  }

  /** normalize:ipv4 in PREDICATE position (NormalizationFunctions.java:
    * 20-53): the function canonicalizes mixed-format query literals —
    * leading-zero octets — at parse time; the data side carries already-
    * canonical dotted quads (a deterministic derivation, since the driver
    * tables have no IP column). Both disjuncts only match because the
    * canonicalizer strips the zeros. */
  def jexlNormalizeIpv4(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val withIp = Tables.events(s, d).withColumn("ip",
      concat_ws(".", lit(10), col("user_id") % 4, col("event_id") % 256, lit(1)))
    Compiler.filter(withIp,
        "IP == normalize:ipv4('010.002.017.001') || " +
          "IP == normalize:ipv4('10.003.200.1')",
        QueryModel(), permissive)
      .select("event_id", "user_id", "ip")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jexl_normalize_ipv4" -> jexlNormalizeIpv4 _,
    "lucene_eval_funcs" -> luceneEvalFuncs _,
    "lucene_slop" -> luceneSlop _,
    "spi_function" -> spiFunction _,
    "qs_limit_hits" -> qsLimitHits _,
    "jexl_large_or" -> jexlLargeOr _,
    "flt_matches_count" -> fltMatchesCount _,
    "flt_time_function" -> fltTimeFunction _,
    "flt_compare_all" -> fltCompareAll _,
    "rev_wildcard" -> revWildcard _,
    "flt_eval_functions" -> fltEvalFunctions _,
    "flt_getallmatches" -> fltGetAllMatches _,
    "jexl_eq_range" -> jexlEqRange _,
    "jexl_regex_bool" -> jexlRegexBool _,
    "jexl_functions" -> jexlFunctions _,
    "jexl_model" -> jexlModel _,
    "model_table" -> modelTableQuery _,
    "lucene_query" -> luceneQuery _,
    "lucene_wildcard" -> luceneWildcard _,
    "jexl_anyfield" -> jexlAnyfield _,
    "lucene_phrase" -> lucenePhrase _,
  )

  val oracleSql: Map[String, String] = Map(
    "jexl_normalize_ipv4" ->
      """SELECT event_id, user_id,
        |   '10.' || (user_id % 4) || '.' || (event_id % 256) || '.1' AS ip
        | FROM events
        | WHERE '10.' || (user_id % 4) || '.' || (event_id % 256) || '.1'
        |   IN ('10.2.17.1', '10.3.200.1')""".stripMargin,
    "lucene_eval_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem
        | WHERE l_returnflag = 'R' AND l_discount > l_tax""".stripMargin,
    "lucene_slop" -> {
      val pos =
        """(SELECT doc_id, unnest(toks) AS term, unnest(range(0, len(toks))) AS pos
          | FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
          |       FROM documents))""".stripMargin
      s"""SELECT DISTINCT a.doc_id FROM $pos a JOIN $pos b
         |   ON a.doc_id = b.doc_id
         | WHERE a.term = 'join' AND b.term = 'merge'
         |   AND abs(a.pos - b.pos) <= 3""".stripMargin
    },
    "spi_function" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        | WHERE o_totalprice >= 200000 AND o_totalprice < 250000
        |   AND o_orderstatus = 'F'""".stripMargin,
    // the matched value (30.0) must survive the 1-value cap on every
    // matched order — hits are kept first (LimitFields.java)
    "qs_limit_hits" ->
      """SELECT l_orderkey, 30.0 AS kept_value FROM lineitem
        | GROUP BY l_orderkey HAVING bool_or(l_quantity = 30)""".stripMargin,
    "jexl_large_or" ->
      """SELECT o_orderkey, o_custkey FROM orders
        | WHERE o_custkey % 2 = 1 AND o_custkey BETWEEN 1 AND 1199""".stripMargin,
    "flt_matches_count" ->
      """SELECT p_partkey, p_name FROM part
        | WHERE (CASE WHEN list_contains(string_split(p_name, ' '), 'red') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(string_split(p_name, ' '), 'widget') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(string_split(p_name, ' '), 'bolt') THEN 1 ELSE 0 END) >= 2""".stripMargin,
    "flt_time_function" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_returnflag = 'R'
        |   AND ABS(epoch_ms(l_shipdate) - epoch_ms(o_orderdate)) < 604800000""".stripMargin,
    "flt_compare_all" ->
      """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        | HAVING max(l_discount) < min(l_tax)""".stripMargin,
    "rev_wildcard" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%gear'",
    "flt_eval_functions" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem
        | WHERE l_returnflag = 'R' AND l_discount > l_tax
        |   AND epoch_ms(l_shipdate) >= 893980800000""".stripMargin,
    "flt_getallmatches" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        | WHERE regexp_full_match(o_orderpriority, '[12]-.*')
        |   AND o_orderdate > strptime('19980301', '%Y%m%d')""".stripMargin,
    "jexl_eq_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_quantity <= 40""".stripMargin,
    "jexl_regex_bool" ->
      """SELECT p_partkey, p_name, p_type FROM part
        | WHERE (regexp_full_match(p_name, '^red .*') OR regexp_full_match(p_name, '^blue .*'))
        |   AND p_type <> 'PROMO'""".stripMargin,
    "jexl_functions" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        | WHERE o_totalprice >= 100000 AND o_totalprice <= 150000
        |   AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
        |   AND regexp_full_match(o_orderpriority, '^[12]-.*')""".stripMargin,
    "jexl_model" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        | WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000""".stripMargin,
    // model from table rows: SEGMENT→C_MKTSEGMENT with (lcNoDiacritics,
    // noop) multi-normalizer ANY; KEY→(C_CUSTKEY|C_NATIONKEY) 1→N;
    // REVERSE row renames c_acctbal → balance
    "model_table" ->
      """SELECT c_custkey, c_name, c_acctbal AS balance FROM customer
        | WHERE (lower(c_mktsegment) = 'building' OR c_mktsegment = 'building')
        |   AND (c_custkey = 13 OR c_nationkey = 13)""".stripMargin,
    "lucene_query" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        | WHERE l_returnflag = 'A' AND l_quantity >= 45 AND l_quantity <= 50
        |   AND NOT l_linestatus = 'O'""".stripMargin,
    "lucene_wildcard" ->
      """SELECT p_partkey, p_name FROM part
        | WHERE regexp_full_match(p_name, 'sma.*')""".stripMargin,
    "jexl_anyfield" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        | WHERE o_orderstatus = '1-URGENT' OR o_orderpriority = '1-URGENT'""".stripMargin,
    // token-position phrase semantics (same tokenizer as the tf table —
    // the compiler evaluates content:phrase inline on the token stream,
    // not via a backtracking regex)
    "lucene_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id IN (
        | SELECT a.doc_id FROM
        |  (SELECT doc_id, unnest(toks) AS term, unnest(range(0, len(toks))) AS pos
        |   FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |         FROM documents)) a
        |  JOIN
        |  (SELECT doc_id, unnest(toks) AS term, unnest(range(0, len(toks))) AS pos
        |   FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |         FROM documents)) b
        |   ON a.doc_id = b.doc_id
        | WHERE a.term = 'fast' AND b.term = 'scan' AND b.pos = a.pos + 1)""".stripMargin,
  )
}
