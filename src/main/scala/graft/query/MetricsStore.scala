package graft.query

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Lake-backed query-metric store — the reference ingests query metrics
  * back into the shard schema and queries them with the standard stack
  * (query/metrics QueryMetricQueryLogic, warehouse/metrics-core), which
  * is what makes `/summary` meaningful across servers and restarts.
  * Here each server life appends its metric rows to two parquet tables
  * under `dir` (`queries`, `pages`); readers see pending ∪ table, so a
  * live server's rows are visible immediately while a restarted (or
  * sibling) server reads everything previous lives flushed.
  *
  * Write discipline: rows buffer in memory and flush as ONE append per
  * table per flush — never a parquet job per page. [[QueryServer]]
  * flushes on stop; a crash loses only the unflushed tail (the
  * reference's ingest-delay window has the same character).
  */
final class MetricsStore(dir: String) {
  private val pendingQ = ArrayBuffer.empty[QueryMetric]
  private val pendingP = ArrayBuffer.empty[PageMetric]

  def record(m: QueryMetric): Unit = synchronized { pendingQ += m }
  def recordPage(p: PageMetric): Unit = synchronized { pendingP += p }

  /** Drop one query's UNFLUSHED pages (a `/query/reset` restarts page
    * numbering — the fresh run's pages must not collide with the dead
    * run's in the live view). Already-flushed pages are history and
    * stay, like the reference's ingested metrics. */
  def clearPendingPages(queryId: String): Unit =
    synchronized { pendingP.filterInPlace(_.queryId != queryId) }

  /** Append the pending rows to the tables (one write per table). */
  def flush(spark: SparkSession): Unit = synchronized {
    import spark.implicits._
    if (pendingQ.nonEmpty) {
      spark.createDataset(pendingQ.toList).write.mode("append")
        .parquet(s"$dir/queries")
      pendingQ.clear()
    }
    if (pendingP.nonEmpty) {
      spark.createDataset(pendingP.toList).write.mode("append")
        .parquet(s"$dir/pages")
      pendingP.clear()
    }
  }

  private def tableDF[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, name: String): DataFrame = {
    val path = java.nio.file.Paths.get(dir, name)
    val enc = Encoders.product[T]
    if (java.nio.file.Files.exists(path))
      spark.read.schema(enc.schema).parquet(path.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], enc.schema)
  }

  /** Query metrics: pending ∪ flushed table. */
  def metricsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(synchronized(pendingQ.toList)).toDF()
      .unionByName(tableDF[QueryMetric](spark, "queries"))
  }

  /** Page metrics: pending ∪ flushed table. */
  def pagesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(synchronized(pendingP.toList)).toDF()
      .unionByName(tableDF[PageMetric](spark, "pages"))
  }

  /** One query's page ledger (the `/query/metrics?id=` surface), page
    * order. */
  def pages(spark: SparkSession, queryId: String): Seq[PageMetric] = {
    import spark.implicits._
    val flushed =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "pages")))
        tableDF[PageMetric](spark, "pages")
          .filter(org.apache.spark.sql.functions.col("queryId") === queryId)
          .as[PageMetric].collect().toSeq
      else Seq.empty
    (flushed ++ synchronized(pendingP.filter(_.queryId == queryId).toList))
      .sortBy(_.pageNum)
  }

  /** The query-metric history a [[Predict.HistoryPredictor]] predicts
    * from: most recent `limit` flushed rows plus everything pending —
    * a bounded model-sized collect (predictions rest on means, so a
    * capped recent window is the right estimator input at scale). */
  def history(spark: SparkSession, limit: Int = 10000): Seq[QueryMetric] = {
    import spark.implicits._
    val flushed =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "queries")))
        tableDF[QueryMetric](spark, "queries")
          .orderBy(org.apache.spark.sql.functions.col("beginMillis").desc)
          .limit(limit).as[QueryMetric].collect().toSeq
      else Seq.empty
    flushed ++ synchronized(pendingQ.toList)
  }
}
