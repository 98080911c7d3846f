package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Query metrics capture + query logic (QueryMetricQueryLogic,
  * warehouse/metrics-core analog): every executed query appends a metric
  * event; the metrics themselves are queryable as a DataFrame — the
  * reference ingests query metrics back into the shard schema and queries
  * them with the standard stack.
  */
final case class QueryMetric(
    queryId: String,
    query: String,
    syntax: String,
    beginMillis: Long,
    elapsedMillis: Long,
    resultRows: Long)

object QueryMetrics {
  private val buf = ArrayBuffer.empty[QueryMetric]

  def record(m: QueryMetric): Unit = synchronized { buf += m }
  def clear(): Unit = synchronized { buf.clear() }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized { buf.toList }.toDF()
  }

  /** Run a query through a logic while capturing a metric event (the
    * QueryMetricsBean per-page emission collapsed to per-query). */
  def instrumented(logic: ShardQueryLogic, queryId: String,
                   events: DataFrame, q: String,
                   params: QueryParams = QueryParams()): DataFrame = {
    val t0 = System.currentTimeMillis()
    val out = logic.query(events, q, params)
    val n = out.count()
    record(QueryMetric(queryId, q, params.syntax, t0,
      System.currentTimeMillis() - t0, n))
    out
  }
}
