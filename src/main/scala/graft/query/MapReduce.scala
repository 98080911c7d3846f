package graft.query

import org.apache.spark.sql.DataFrame
import java.util.concurrent.ConcurrentHashMap

/** The MapReduce/BulkResults export tier (web-services/map-reduce
  * MapReduceBean.java:181-988 + MapReduceStatePersisterBean) —
  * Spark-first: the reference ships a query into a MapReduce job whose
  * mappers serialize results to HDFS files; here the SAME lifecycle
  * (configured job catalog → submit with role + required-parameter
  * validation → async run → durable state machine → result-file
  * listing/retrieval → cancel/restart/remove) drives a distributed
  * `df.write` of the query's frame, and cancel is a real
  * `SparkContext.cancelJobGroup` — the job's running Spark stages abort,
  * not just a flag flip.
  *
  * Each job is durable under `dir/<jobId>/`: `state.properties` (the
  * MapReduceStatePersister record: job name, parameters, state,
  * timestamps) beside `results/` (the export files). A server restart
  * lists persisted jobs; an orphaned RUNNING job (its thread died with
  * the process) can be canceled or removed like the reference's
  * stale-state rows.
  */
object MapReduce {
  /** A configured job (MapReduceJobConfiguration.
    * getConfigurationDescription): the catalog entry `/listConfigurations`
    * reports and submit validates against. */
  final case class JobConfig(name: String, jobType: String,
                             description: String,
                             requiredRoles: Seq[String],
                             requiredParams: Seq[String])

  /** BulkResultsJob (MapReduceBean.java:376 submit path): export a
    * DEFINED query's full result as files; `queryId` names the durable
    * definition, `format` picks the file format. */
  val BulkResults: JobConfig = JobConfig("BulkResultsJob", "mapreduce",
    "Exports a defined query's results to files",
    requiredRoles = Seq("AuthorizedUser"),
    requiredParams = Seq("queryId", "format"))

  val States = Seq("RUNNING", "SUCCEEDED", "FAILED", "CANCELED")
  val Formats = Set("parquet", "json", "csv")
}

final class MapReduceManager(
    dir: String,
    configs: Seq[MapReduce.JobConfig] = Seq(MapReduce.BulkResults),
    runQuery: Map[String, String] => DataFrame) {
  import MapReduce._

  private val threads = new ConcurrentHashMap[String, Thread]()

  def listConfigurations(jobType: Option[String]): Seq[JobConfig] =
    configs.filter(c => jobType.forall(_ == c.jobType))

  private def jobDir(id: String) = java.nio.file.Paths.get(dir, id)
  private def stateFile(id: String) = jobDir(id).resolve("state.properties")

  private def writeState(id: String, jobName: String, params: String,
                         state: String, startTime: Long,
                         error: String = "", owner: String = ""): Unit =
      synchronized {
    // terminal states are STICKY: once a job left RUNNING, a racing
    // writer (a canceled run thread finishing its write anyway, or the
    // orphan path) must not flip it — the reference's state rows are
    // likewise terminal-once
    if (readState(id).exists(_.getProperty("state", "") != "RUNNING")) return
    val p = new java.util.Properties()
    p.setProperty("jobName", jobName)
    p.setProperty("parameters", params)
    // the submitting principal travels WITH the durable state row (the
    // reference's MapReduceStatePersister keys rows by user id) so a
    // restarted server still knows whose job this is
    if (owner.nonEmpty) p.setProperty("owner", owner)
    p.setProperty("state", state)
    p.setProperty("startTime", startTime.toString)
    if (state != "RUNNING")
      p.setProperty("endTime", System.currentTimeMillis().toString)
    if (error.nonEmpty) p.setProperty("error", error)
    java.nio.file.Files.createDirectories(jobDir(id))
    val tmp = jobDir(id).resolve(".state.tmp")
    val out = java.nio.file.Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    java.nio.file.Files.move(tmp, stateFile(id),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readState(id: String): Option[java.util.Properties] = {
    if (!java.nio.file.Files.exists(stateFile(id))) None
    else {
      val p = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(stateFile(id))
      try p.load(in) finally in.close()
      Some(p)
    }
  }

  /** `name:value;name:value` — the reference's runtime-parameter wire
    * form (MapReduceBean PARAMETER_SEPARATOR/PARAMETER_NAME_VALUE_
    * SEPARATOR). */
  def parseParams(raw: String): Map[String, String] =
    raw.split(';').toSeq.filter(_.nonEmpty).map { kv =>
      kv.split(":", 2) match {
        case Array(k, v) => k -> v
        case _ => throw new IllegalArgumentException(
          s"malformed parameter '$kv' (want name:value)")
      }
    }.toMap

  /** Submit: unknown job 400, missing role 401, missing required
    * runtime parameter 400 (the reference's canRunJob +
    * required-parameter walk), then the export runs ASYNC under a Spark
    * job group named by the jobId so cancel aborts its stages. */
  def submit(jobName: String, rawParams: String,
             userRoles: Set[String],
             owner: String = ""): Either[(Int, String), String] = {
    val cfg = configs.find(_.name == jobName).getOrElse(
      return Left((400, s"unknown job configuration '$jobName'")))
    if (cfg.requiredRoles.nonEmpty &&
        !cfg.requiredRoles.exists(userRoles.contains))
      return Left((401, s"requires one of: ${cfg.requiredRoles.mkString(", ")}"))
    val params =
      try parseParams(rawParams)
      catch { case e: IllegalArgumentException => return Left((400, e.getMessage)) }
    val missing = cfg.requiredParams.filterNot(params.contains)
    if (missing.nonEmpty)
      return Left((400, s"missing required parameter(s): ${missing.mkString(", ")}"))
    val fmt = params.getOrElse("format", "parquet").toLowerCase
    if (!Formats.contains(fmt))
      return Left((400, s"format must be one of ${Formats.mkString(", ")}"))
    val jobId = java.util.UUID.randomUUID().toString.replace("-", "")
    start(jobId, jobName, rawParams, params, fmt, owner)
    Right(jobId)
  }

  private def start(jobId: String, jobName: String, rawParams: String,
                    params: Map[String, String], fmt: String,
                    owner: String = ""): Unit = {
    writeState(jobId, jobName, rawParams, "RUNNING",
      System.currentTimeMillis(), owner = owner)
    val t = new Thread(() => {
      try {
        // group ALL of this job's Spark stages under the jobId —
        // cancel(jobId) aborts them mid-flight (the reference kills the
        // YARN application). The group is a THREAD-LOCAL of the
        // context, so set it before runQuery too: a query whose
        // CONSTRUCTION triggers jobs must not escape the cancelable
        // group. runQuery's own context is re-asserted after in case
        // it differs from the process default.
        def group(sc: org.apache.spark.SparkContext): Unit =
          sc.setJobGroup(jobId, s"bulk export $jobId",
            interruptOnCancel = true)
        sparkOf.map(_.sparkContext).foreach(group)
        val df = runQuery(params)
        val sc = df.sparkSession.sparkContext
        group(sc)
        try {
          val out = jobDir(jobId).resolve("results").toString
          val writer = df.write.mode("overwrite")
          (fmt match {
            case "json" => writer.json(out)
            case "csv" => writer.option("header", "true").csv(out)
            case _ => writer.parquet(out)
          })
          // a cancel() claims the job by removing it from `threads`
          // BEFORE interrupting; if the interrupt was swallowed and the
          // write completed anyway, the job is still CANCELED
          writeState(jobId, jobName, rawParams,
            if (threads.get(jobId) != null) "SUCCEEDED" else "CANCELED",
            startTimeOf(jobId), owner = owner)
        } finally sc.clearJobGroup()
      } catch {
        case _: InterruptedException =>
          writeState(jobId, jobName, rawParams, "CANCELED",
            startTimeOf(jobId), owner = owner)
        case e: Exception =>
          // a cancelJobGroup surfaces as a SparkException on the action
          val canceled = threads.get(jobId) == null ||
            Option(e.getMessage).exists(_.contains("cancelled"))
          writeState(jobId, jobName, rawParams,
            if (canceled) "CANCELED" else "FAILED", startTimeOf(jobId),
            error = Option(e.getMessage).getOrElse(e.getClass.getName),
            owner = owner)
      } finally threads.remove(jobId)
    }, s"graft-bulk-$jobId")
    t.setDaemon(true) // never block JVM exit; shutdown() handles live jobs
    threads.put(jobId, t)
    t.start()
  }

  /** Stop every live export (server teardown): cancel each running job
    * so its state records CANCELED and no thread keeps writing under a
    * state directory the caller is about to delete. */
  def shutdown(): Unit = {
    import scala.jdk.CollectionConverters._
    threads.keys.asScala.toSeq.foreach(cancel)
  }

  private def startTimeOf(id: String): Long =
    readState(id).map(_.getProperty("startTime", "0").toLong).getOrElse(0L)

  /** Job state + result files (MapReduceInfoResponse: state and the
    * result-file list with sizes). */
  def info(jobId: String): Option[(String, String, Seq[(String, Long)])] =
    readState(jobId).map { p =>
      val res = jobDir(jobId).resolve("results")
      val files =
        if (!java.nio.file.Files.exists(res)) Seq.empty
        else {
          import scala.jdk.CollectionConverters._
          val stream = java.nio.file.Files.list(res)
          try stream.iterator().asScala
            .filterNot(_.getFileName.toString.startsWith("."))
            .filterNot(_.getFileName.toString.startsWith("_"))
            .map(f => f.getFileName.toString -> java.nio.file.Files.size(f))
            .toSeq.sortBy(_._1)
          finally stream.close()
        }
      (p.getProperty("jobName", ""), p.getProperty("state", ""), files)
    }

  /** The principal recorded at submit ("" for ownerless/legacy jobs —
    * jobs from a registry-less deployment carry no owner and stay
    * capability-addressed). */
  def jobOwner(jobId: String): String =
    readState(jobId).map(_.getProperty("owner", "")).getOrElse("")

  def listJobIds: Seq[String] = {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val stream = java.nio.file.Files.list(d)
      try stream.iterator().asScala
        .filter(p => java.nio.file.Files.exists(p.resolve("state.properties")))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    }
  }

  /** Cancel: abort the job group's running stages (`/{jobId}/cancel` →
    * kill the running application). True if the job existed. */
  def cancel(jobId: String): Boolean = cancelJoined(jobId)._1

  /** [[cancel]] plus whether the run thread is KNOWN dead after the
    * join window — false means a write that ignored the interrupt may
    * still be running ([[remove]] refuses to delete under it). */
  private def cancelJoined(jobId: String): (Boolean, Boolean) =
    readState(jobId) match {
      case None => (false, true)
      case Some(p) =>
        val t = threads.remove(jobId) // marks "canceled" for the run thread
        if (t != null) {
          // any live frame of this job group aborts; the run thread
          // observes the SparkException and records CANCELED
          sparkOf.foreach(_.sparkContext.cancelJobGroup(jobId))
          t.interrupt()
          t.join(30000)
        }
        if (readState(jobId).exists(_.getProperty("state") == "RUNNING"))
          // orphaned RUNNING record (thread died with a previous server)
          writeState(jobId, p.getProperty("jobName", ""),
            p.getProperty("parameters", ""), "CANCELED",
            p.getProperty("startTime", "0").toLong,
            owner = p.getProperty("owner", ""))
        (true, t == null || !t.isAlive)
    }

  private def sparkOf: Option[org.apache.spark.sql.SparkSession] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)

  /** Restart (`/{jobId}/restart`): cancel the old run, then submit the
    * SAME job name + parameters as a NEW job id. */
  def restart(jobId: String): Either[(Int, String), String] =
    readState(jobId) match {
      case None => Left((404, s"unknown jobId '$jobId'"))
      case Some(p) =>
        cancel(jobId)
        val params = parseParams(p.getProperty("parameters", ""))
        val fmt = params.getOrElse("format", "parquet").toLowerCase
        val newId = java.util.UUID.randomUUID().toString.replace("-", "")
        // the restarted job belongs to the ORIGINAL submitter — restart
        // is already owner-gated, so the new id must not escape the gate
        start(newId, p.getProperty("jobName", ""),
          p.getProperty("parameters", ""), params, fmt,
          owner = p.getProperty("owner", ""))
        Right(newId)
    }

  /** Remove (`DELETE /{jobId}/remove`): cancel if running, then drop
    * state and files. If the run thread survives the cancel's join
    * window (a write ignoring the interrupt), the remove is REFUSED —
    * deleting under a live writer would race it recreating the job
    * directory with partial state after this returned true. */
  def remove(jobId: String): Boolean = {
    val existed = readState(jobId).isDefined
    if (existed) {
      val (_, dead) = cancelJoined(jobId)
      if (!dead) return false
      graft.core.Fs.deleteRecursively(jobDir(jobId))
    }
    existed
  }

  /** One result file's path, confined to the job's results directory
    * (`/{jobId}/getFile/{fileName}`). */
  def resultFile(jobId: String, name: String): Option[java.nio.file.Path] = {
    val res = jobDir(jobId).resolve("results").normalize()
    val f = res.resolve(name).normalize()
    if (f.startsWith(res) && java.nio.file.Files.isRegularFile(f)) Some(f)
    else None
  }

  /** Block until the job leaves RUNNING (test/gate helper — the
    * reference's callers poll list). */
  def await(jobId: String, timeoutMillis: Long = 120000L): String = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    var st = readState(jobId).map(_.getProperty("state", "")).getOrElse("")
    while (st == "RUNNING" && System.currentTimeMillis() < deadline) {
      Option(threads.get(jobId)).foreach(_.join(200))
      Thread.sleep(20)
      st = readState(jobId).map(_.getProperty("state", "")).getOrElse("")
    }
    st
  }
}
