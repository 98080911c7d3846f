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

  /** Part files of a table, enumerated UNDER the store lock: a reader
    * that snapshots pending and the file list in one critical section
    * can never race a flush into seeing a row both pending and flushed
    * (the append happens inside flush's own synchronized block). */
  private def tableFiles(name: String): Seq[String] = {
    val path = java.nio.file.Paths.get(dir, name)
    if (!java.nio.file.Files.exists(path)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(path).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    }
  }

  private def unionDF[T <: Product :
      scala.reflect.runtime.universe.TypeTag : org.apache.spark.sql.Encoder](
      spark: SparkSession, name: String, pending: => Seq[T],
      patch: DataFrame => DataFrame): DataFrame = synchronized {
    import spark.implicits._
    recoverTables() // a crashed compact must not read as an empty table
    val enc = Encoders.product[T]
    // read NULLABLE so part files written by an older schema (before a
    // column existed) decode; `patch` fills the defaults
    val readSchema = org.apache.spark.sql.types.StructType(
      enc.schema.map(_.copy(nullable = true)))
    val files = tableFiles(name)
    val table =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], enc.schema)
      else patch(spark.read.schema(readSchema).parquet(files: _*))
    spark.createDataset(pending).toDF().unionByName(table)
  }

  import org.apache.spark.sql.functions.{coalesce => fnCoalesce, col, lit}

  /** Query metrics: pending ∪ flushed table (consistent snapshot). */
  def metricsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    unionDF[QueryMetric](spark, "queries", pendingQ.toList,
      _.withColumn("logicName", fnCoalesce(col("logicName"), lit(""))))
  }

  /** Page metrics: pending ∪ flushed table (consistent snapshot).
    * Pre-attempt part files read as attempt 0 (one logical run). */
  def pagesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    unionDF[PageMetric](spark, "pages", pendingP.toList,
      _.withColumn("attempt", fnCoalesce(col("attempt"), lit(0L))))
  }

  /** One query's page ledger (the `/query/metrics?id=` surface):
    * the LATEST run's pages in page order — after a reset (or a reset
    * following a restart) earlier attempts' pages remain summary
    * history but drop out of the per-query view, exactly like the
    * pre-lake in-process ledger after clearPages. */
  def pages(spark: SparkSession, queryId: String): Seq[PageMetric] =
    synchronized { // collect under the lock: see [[readLocked]]
      import spark.implicits._
      val all = pagesDF(spark)
        .filter(org.apache.spark.sql.functions.col("queryId") === queryId)
        .as[PageMetric].collect().toSeq
      if (all.isEmpty) all
      else {
        val latest = all.map(_.attempt).max
        all.filter(_.attempt == latest).sortBy(_.pageNum)
      }
    }

  /** Compaction + retention for the lake tables: every flush appends a
    * part file, so a long-lived stateDir accumulates small files — the
    * same maintenance story as any append-only lake table (the
    * reference ages off metrics through its table age-off rules).
    * Rewrites each table as ONE file, keeping only query metrics with
    * `beginMillis >= retainAfterMillis` and the pages of retained
    * queries (a page's lifetime follows its query's). Runs under the
    * store lock: concurrent readers see either the old file set or the
    * new one, never a mix. */
  def compact(spark: SparkSession, retainAfterMillis: Long = 0L): Unit =
    synchronized {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      def rewrite[T <: Product :
          scala.reflect.runtime.universe.TypeTag : org.apache.spark.sql.Encoder](
          name: String, patch: DataFrame => DataFrame,
          keep: DataFrame => DataFrame): Unit = {
        val files = tableFiles(name)
        if (files.nonEmpty) {
          val path = java.nio.file.Paths.get(dir, name)
          val old = java.nio.file.Paths.get(dir, s".$name.old")
          val tmp = java.nio.file.Paths.get(dir, s".$name.compact")
          // same migration-tolerant read as unionDF: the encoder's
          // schema (nullable) + patched defaults, never a single part
          // file's footer — a mixed-schema table must not lose the
          // newer columns on rewrite
          val readSchema = org.apache.spark.sql.types.StructType(
            Encoders.product[T].schema.map(_.copy(nullable = true)))
          keep(patch(spark.read.schema(readSchema).parquet(files: _*)))
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          // crash-safe swap: old aside → new in → drop old. A crash
          // leaves either the original (before the first move) or the
          // compacted data (after the second); recoverTable() handles
          // the one window in between.
          graft.core.Fs.deleteRecursively(old)
          java.nio.file.Files.move(path, old)
          java.nio.file.Files.move(tmp, path)
          graft.core.Fs.deleteRecursively(old)
        }
      }
      recoverTables()
      rewrite[QueryMetric]("queries",
        _.withColumn("logicName", fnCoalesce(col("logicName"), lit(""))),
        _.filter(col("beginMillis") >= retainAfterMillis))
      val retained =
        if (tableFiles("queries").isEmpty) None
        else Some(spark.read.parquet(s"$dir/queries").select("queryId"))
      rewrite[PageMetric]("pages",
        _.withColumn("attempt", fnCoalesce(col("attempt"), lit(0L))),
        pages => retained.fold(pages)(q =>
          pages.join(broadcast(q), Seq("queryId"), "left_semi")))
    }

  /** Recover from a compact interrupted between its two moves: the
    * table dir is gone but `.name.old` still holds the pre-compact
    * data — move it back. Leftover `.compact` staging is discarded. */
  private def recoverTables(): Unit =
    Seq("queries", "pages").foreach { name =>
      val path = java.nio.file.Paths.get(dir, name)
      val old = java.nio.file.Paths.get(dir, s".$name.old")
      if (!java.nio.file.Files.exists(path) &&
          java.nio.file.Files.exists(old))
        java.nio.file.Files.move(old, path)
      graft.core.Fs.deleteRecursively(
        java.nio.file.Paths.get(dir, s".$name.compact"))
    }

  /** Run `f` holding the store lock: a reader that BUILDS and COLLECTS
    * its frames inside one locked section can never race a concurrent
    * [[compact]] into reading deleted part files or a half-old,
    * half-new view (unionDF pins the file LIST under the lock, but the
    * parquet read itself is lazy). */
  def readLocked[T](f: => T): T = synchronized(f)

  /** The query-metric history a [[Predict.HistoryPredictor]] predicts
    * from: the most recent `limit` query metrics with resultRows /
    * elapsedMillis RECONCILED against the page ledger (a created
    * query's metric starts at zero; what it actually returned lives in
    * its pages — the reference updates its BaseQueryMetric per page,
    * an append-only lake reconciles at read). Bounded model-sized
    * collect: predictions rest on means, so a capped recent window is
    * the right estimator input at scale. */
  def history(spark: SparkSession,
              limit: Int = 10000): Seq[QueryMetric] = synchronized {
    // build AND collect under the lock: see [[readLocked]]
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pages = pagesDF(spark)
    // only each query's LATEST attempt: a reset's re-drain must not
    // inflate the reconciled result count (pages() has the same rule)
    val latest = pages.groupBy("queryId")
      .agg(max("attempt").as("attempt"))
    val rollup = pages.join(latest, Seq("queryId", "attempt"))
      .groupBy("queryId")
      .agg(sum("rows").as("pr"), sum("elapsedMillis").as("pe"))
    metricsDF(spark).join(rollup, Seq("queryId"), "left")
      .select(col("queryId"), col("query"), col("syntax"),
        col("beginMillis"), greatest(col("elapsedMillis"),
          coalesce(col("pe"), lit(0L))).as("elapsedMillis"),
        greatest(col("resultRows"),
          coalesce(col("pr"), lit(0L))).as("resultRows"),
        col("error"), col("selectors"), col("user"), col("logicName"))
      .orderBy(col("beginMillis").desc)
      .limit(limit).as[QueryMetric].collect().toSeq
  }
}
