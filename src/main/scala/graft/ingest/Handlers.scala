package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataTypeHandler SPI + EventMapper dispatch (EventMapper.java:99,
  * contract :79-88; handler/ SPI): a registry maps each datatype to its
  * handler chain; one ingest job dispatches every record to all
  * registered handlers for its datatype, with per-record error isolation
  * (failed records land in the dead-letter frame, never abort the job).
  *
  * A handler is a declarative `DataFrame => DataFrame` stage, so the
  * whole fan-out stays one Catalyst job with a shared scan — the Spark
  * re-expression of the MapReduce handler chain.
  */
object Handlers {

  type Handler = DataFrame => DataFrame

  final case class Registry(byDatatype: Map[String, Seq[Handler]] = Map.empty) {
    def register(datatype: String, h: Handler): Registry =
      copy(byDatatype.updated(datatype,
        byDatatype.getOrElse(datatype, Nil) :+ h))
    def handlersFor(datatype: String): Seq[Handler] =
      byDatatype.getOrElse(datatype, Nil)
  }

  /** Dispatch one long-layout frame through the registry: each datatype's
    * slice runs its handler chain; outputs are tagged with the handler
    * index (the reference emits to several tables per handler — callers
    * route on `handler_seq`). Discard-interval filtering
    * (EventMapper.java:82-84) applies first when `maxAgeDays` is set. */
  def dispatch(long: DataFrame, registry: Registry,
               maxAgeDays: Option[Int] = None,
               asOf: Option[java.sql.Date] = None): Seq[(String, Int, DataFrame)] = {
    val aged = (maxAgeDays, asOf) match {
      case (Some(days), Some(ref)) =>
        long.filter(datediff(lit(ref), col("shard_date")) <= days)
      case _ => long
    }
    registry.byDatatype.toSeq.flatMap { case (dt, chain) =>
      val slice = aged.filter(col("datatype") === dt)
      chain.zipWithIndex.map { case (h, i) => (dt, i, h(slice)) }
    }
  }

  /** Single-job multi-sink write (ShardedDataTypeHandler.processBulk
    * fan-out: event + fi + global index + metadata from ONE pass): the
    * long frame is persisted once, each derived projection writes from
    * the cached scan. Returns the written paths.
    *
    * `stats = Some((statsDir, batchId))` folds this load's
    * [[Ingest.datatypeStats]] rows into the corpus's durable
    * [[MetadataStats]] store from the SAME cached scan
    * (EventMetadata.java:96-110 — statistics are an ingest output, not
    * a query-time backfill). The batch id travels WITH the dir so a
    * caller cannot accidentally default it: two different loads folding
    * into one store under the same id would silently REPLACE each
    * other's rows (overwrite is for re-runs of the SAME load — that is
    * what makes the fold idempotent instead of double-counting). */
  def writeAll(long: DataFrame, outDir: String,
               stats: Option[(String, Long)] = None): Seq[String] = {
    val cached = long.persist()
    try {
      val sinks: Seq[(String, DataFrame)] = Seq(
        "events" -> cached,
        "global_index" -> Ingest.globalIndex(cached),
        "metadata" -> Ingest.metadata(cached),
        "doc_view" -> Ingest.docView(cached))
      val paths = sinks.map { case (name, df) =>
        val path = s"$outDir/$name"
        df.write.mode("overwrite").parquet(path)
        path
      }
      stats.foreach { case (sd, batchId) => MetadataStats.updateBatch(
        sd, batchId, Ingest.datatypeStats(cached)) }
      paths
    } finally { cached.unpersist() }
  }
}
