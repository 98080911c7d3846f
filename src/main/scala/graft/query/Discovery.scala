package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term discovery over the global index (discovery/DiscoveryLogic.java:71)
  * — literals, wildcard patterns, AND ranges, never touching events.
  *
  * Plan shapes (the reference's range construction re-expressed):
  *  - literal          → equality probe on the forward index;
  *  - `pre*`           → prefix scan on the forward index;
  *  - `*suf` (leading) → PREFIX scan on the REVERSE index — the
  *    shardReverseIndex table (ShardedDataTypeHandler.java:86-101,
  *    DiscoveryLogic reversed-pattern branch): values are stored
  *    reversed, so the unanchorable suffix probe becomes a sargable
  *    `startsWith(reverse(suf))` and never scans all values;
  *  - bounded range    → `BETWEEN` probe on the forward index;
  *  - anything else    → anchored regex on the forward index (the
  *    reference's full-regex fallback).
  */
object Discovery {

  sealed trait Term
  final case class Lit(value: String) extends Term
  /** `*`-wildcard pattern, the LUCENE discovery form. */
  final case class Pattern(pattern: String) extends Term
  final case class Bounds(lo: String, hi: String) extends Term

  /** Per-term counts by (value, field, day, datatype). `revIndex` is the
    * reversed-value aggregate ([[graft.ingest.Ingest.reverseGlobalIndex]])
    * — only evaluated for leading-wildcard terms. */
  def terms(index: DataFrame, revIndex: => DataFrame, term: Term,
            field: Option[String] = None): DataFrame = {
    def fieldPred(): Column =
      field.map(col("field") === _).getOrElse(lit(true))
    def shape(df: DataFrame, valueExpr: Column): DataFrame =
      df.select(valueExpr.as("value"), col("field"),
        col("shard_date"), col("datatype"), col("cnt"))
    term match {
      case Lit(v) =>
        shape(index.filter(fieldPred() && col("value") === v), col("value"))
      case Pattern(p) if p.startsWith("*") && !p.tail.contains("*") =>
        // leading wildcard: prefix probe on the stored-reversed value,
        // un-reversed on the way out
        shape(revIndex.filter(fieldPred() &&
            col("value").startsWith(p.tail.reverse)),
          reverse(col("value")))
      case Pattern(p) if p.endsWith("*") && !p.dropRight(1).contains("*") =>
        shape(index.filter(fieldPred() &&
          col("value").startsWith(p.dropRight(1))), col("value"))
      case Pattern(p) =>
        val rx = "^(?:" + p.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString(".*") + ")$"
        shape(index.filter(fieldPred() && col("value").rlike(rx)), col("value"))
      case Bounds(lo, hi) =>
        shape(index.filter(fieldPred() && col("value").between(lo, hi)),
          col("value"))
    }
  }
}
