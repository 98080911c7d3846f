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
    Compiler.filter(Tables.part(s, d), "P_TYPE == 'promo burnished copper'", model)
      .select("p_partkey", "p_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "card_cube" -> cardCube _,
    "jexl_multinorm" -> jexlMultinorm _,
  )

  val oracleSql: Map[String, String] = Map(
    "card_cube" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |   count(DISTINCT c_custkey) AS card
        | FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)""".stripMargin,
    "jexl_multinorm" ->
      """SELECT p_partkey, p_type FROM part
        | WHERE lower(p_type) = 'promo burnished copper'""".stripMargin,
  )
}
