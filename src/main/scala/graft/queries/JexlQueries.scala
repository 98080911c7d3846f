package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.jexl.{Compiler, LuceneParser, QueryModel, QueryPolicy}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jexl_eq_range" -> jexlEqRange _,
    "jexl_regex_bool" -> jexlRegexBool _,
    "jexl_functions" -> jexlFunctions _,
    "jexl_model" -> jexlModel _,
    "lucene_query" -> luceneQuery _,
    "lucene_wildcard" -> luceneWildcard _,
    "jexl_anyfield" -> jexlAnyfield _,
    "lucene_phrase" -> lucenePhrase _,
  )

  val oracleSql: Map[String, String] = Map(
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
    "lucene_phrase" ->
      """SELECT doc_id FROM documents
        | WHERE regexp_matches(lower(text), '(^|.*[^a-zA-Z0-9_])fast[^a-zA-Z0-9_]+scan([^a-zA-Z0-9_].*|$)')""".stripMargin,
  )
}
