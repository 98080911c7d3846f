package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.jexl.{Compiler, QueryModel}

/** Cardinality dashboard rollups (query/cardinality analog) and
  * multi-normalizer term matching (ExpandMultiNormalizedTerms.java:66).
  */
object StatsQueries {

  /** Per-result-tuple cardinality rollups over all grouping-set levels —
    * CUBE(segment, nation) with row and entity cardinalities
    * (CardinalityConfiguration semantics; exact counts, oracle-able —
    * the HLL variant is `approx_count_distinct` on the same plan). */
  def cardCube(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("c_custkey")).as("card"))

  /** Multi-normalizer match: P_TYPE declared LcNoDiacritics-normalized →
    * a lowercase query literal matches the uppercase stored values. */
  def jexlMultinorm(s: SparkSession, d: String): DataFrame = {
    val model = QueryModel(normalizers = Map("P_TYPE" -> Seq("lcNoDiacritics")))
    // lowercase literal vs uppercase stored 'MEDIUM' — matches ONLY
    // through the normalizer (hundreds of rows at every SF, so the gate
    // proves inclusion, not just exclusion)
    Compiler.filter(Tables.part(s, d), "P_TYPE == 'medium'", model)
      .select("p_partkey", "p_type")
  }

  /** CachedResults analog (CachedRunningQuery.java:399,486-495): a query
    * result registered as a temp view, then arbitrary Spark SQL over it —
    * what the reference ships pages to MySQL for, native here. */
  def cachedResultsSql(s: SparkSession, d: String): DataFrame = {
    val logic = new graft.query.ShardQueryLogic()
    logic.query(Tables.orders(s, d), "O_ORDERPRIORITY == '1-URGENT'")
      .createOrReplaceTempView("cached_q")
    s.sql("""SELECT o_orderstatus, count(*) AS cnt,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM cached_q GROUP BY o_orderstatus""".stripMargin)
  }

  /** HIT_TERM end-to-end: the evaluator reports WHY each document
    * matched — exploded to (uid, field, value) rows so the hit terms are
    * fully oracle-able, including the TYPED bounded-range leaf (a double
    * range must produce string hit values without null casts). */
  def hitTerms(s: SparkSession, d: String): DataFrame = {
    val logic = new graft.query.ShardQueryLogic()
    logic.query(Tables.orders(s, d),
        "O_ORDERPRIORITY == '1-URGENT' && O_TOTALPRICE >= 300000 && O_TOTALPRICE <= 400000",
        graft.query.QueryParams(hitList = true))
      .select(col("o_orderkey"), explode(col("HIT_TERM")).as("hit"))
      .select(col("o_orderkey"), col("hit.field").as("hit_field"),
        col("hit.value").as("hit_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "card_cube" -> cardCube _,
    "jexl_multinorm" -> jexlMultinorm _,
    "cached_results_sql" -> cachedResultsSql _,
    "hit_terms" -> hitTerms _,
  )

  val oracleSql: Map[String, String] = Map(
    "card_cube" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |   count(DISTINCT c_custkey) AS card
        | FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)""".stripMargin,
    "jexl_multinorm" ->
      """SELECT p_partkey, p_type FROM part
        | WHERE lower(p_type) = 'medium'""".stripMargin,
    "cached_results_sql" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        | FROM orders WHERE o_orderpriority = '1-URGENT'
        | GROUP BY o_orderstatus""".stripMargin,
    "hit_terms" ->
      """WITH m AS (SELECT * FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_totalprice >= 300000 AND o_totalprice <= 400000)
        |SELECT o_orderkey, 'O_ORDERPRIORITY' AS hit_field,
        |       o_orderpriority AS hit_value FROM m
        |UNION ALL
        |SELECT o_orderkey, 'O_TOTALPRICE',
        |       CAST(o_totalprice AS VARCHAR) FROM m""".stripMargin,
  )
}
