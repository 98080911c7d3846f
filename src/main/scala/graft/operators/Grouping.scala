package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouping-context co-occurrence over the long (exploded) event layout
  * `(uid, field, group, value)` — the `grouping:` JEXL namespace
  * (GroupingRequiredFilterFunctions.java:45-371) and the pairing rules of
  * DocumentGrouper.java:88-117.
  *
  * A "group" is the instance suffix of a repeated field (`NAME.0`/`AGE.0`
  * pair within group "0"). matchesInGroup(F1==v1, F2==v2, ...) keeps uids
  * where all conditions hold within the SAME group instance.
  */
object Grouping {

  final case class FieldMatch(field: String, predicate: Column => Column)
  object FieldMatch {
    def eq(field: String, value: String): FieldMatch =
      FieldMatch(field, _ === value)
  }

  /** uids where every (field, predicate) matches within one shared group.
    * Plan: per-condition filtered scans of the long table, inner-joined on
    * (uid, group) — the reference's per-document merge join over `fi`
    * keys becomes a keyed join, co-partitioned on uid. */
  def matchesInGroup(long: DataFrame, conditions: Seq[FieldMatch]): DataFrame = {
    require(conditions.nonEmpty)
    conditions.zipWithIndex.map { case (c, i) =>
      long.filter(col("field") === c.field && c.predicate(col("value")))
        .select(col("uid"), col("group")).distinct()
    }.reduce((a, b) => a.join(b, Seq("uid", "group")))
      .select("uid").distinct()
  }

  /** grouping:getGroupsForMatchesInGroup — also return WHICH groups hit. */
  def groupsForMatches(long: DataFrame, conditions: Seq[FieldMatch]): DataFrame =
    conditions.zipWithIndex.map { case (c, i) =>
      long.filter(col("field") === c.field && c.predicate(col("value")))
        .select(col("uid"), col("group")).distinct()
    }.reduce((a, b) => a.join(b, Seq("uid", "group")))

  /** #GROUPBY with grouping-context pairing (DocumentGrouper.java:118):
    * group documents by the VALUES of `keyFields` paired per group
    * instance, aggregating `aggFields` — e.g. GROUPBY(NAME) SUM(AGE)
    * sums each AGE.n against its same-group NAME.n. */
  def groupByPaired(long: DataFrame, keyField: String, aggField: String): DataFrame = {
    val keys = long.filter(col("field") === keyField)
      .select(col("uid"), col("group"), col("value").as("group_key"))
    val vals = long.filter(col("field") === aggField)
      .select(col("uid"), col("group"), col("value").cast("double").as("agg_val"))
    keys.join(vals, Seq("uid", "group"))
      .groupBy("group_key")
      .agg(count(lit(1)).as("cnt"),
        sum(col("agg_val").cast("decimal(18,4)")).cast("double").as("sum_val"),
        min(col("agg_val")).as("min_val"),
        max(col("agg_val")).as("max_val"))
  }
}
