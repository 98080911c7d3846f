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

  /** Parent query: child matches resolve to their parent document;
    * top-level matches resolve to themselves (ParentQueryLogic /
    * ParentDocumentTransformer id rewrite). The predicate hits both
    * levels so the gate separates parent semantics from TLD (no
    * children returned) and Ancestor (matching children returned). */
  def parentQuery(s: SparkSession, d: String): DataFrame =
    DocumentTree.parentsOfMatches(treeDocs(s, d),
        (col("kind") === "line" && col("quantity") > 49) ||
          (col("kind") === "order" && col("priority") === "1-URGENT"))
      .select("uid", "kind")

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
  )

  val oracleSql: Map[String, String] = Map(
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
