package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Atom / Summary feed handlers (AtomDataTypeHandler.java:35-40,
  * SummaryDataTypeHandler / MetricsSummaryDataTypeHandler) — simple
  * aggregate sinks derived from the long event layout.
  */
object Feeds {

  /** Atom feed: per (category=field, value) entries ordered newest-first.
    * The reference's row key is `category\0(MAX-ts)` — an inverted-recency
    * sort key; here recency is an explicit order column and the
    * newest-first ordering is a plain ORDER BY at read time. */
  def atom(long: DataFrame): DataFrame =
    long.groupBy(col("field").as("category"), col("value"))
      .agg(max(col("shard_date")).as("latest_date"),
        count(lit(1)).as("occurrences"))

  /** Summary counts per (datatype, field, day) — the metrics-summary
    * rollup sink. */
  def summary(long: DataFrame): DataFrame =
    long.groupBy(col("datatype"), col("field"),
        date_format(col("shard_date"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("uid")).as("distinct_events"))
}
