package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe (guide §1): per-gate job/stage/task counts + wall time —
  * finds gates whose cost is pass count / job orchestration rather than
  * plan work. Args = gate names (empty = all), sorted output by jobs. */
object JobCountProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val verbose = sys.env.contains("SPARK_GRAFT_JOB_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          val desc = Option(j.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          System.err.println(s"[jobsite] ${j.jobId} $site | $desc")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val info = s.stageInfo
          val wall = (for {a <- info.completionTime; b <- info.submissionTime}
            yield a - b).getOrElse(-1L)
          System.err.println(f"[stage] ${info.stageId}%4d ${wall}%6d ms " +
            f"tasks=${info.numTasks}%-4d ${info.name.take(110)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val out = names.flatMap { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        Some((name, dt, jobs.get, stages.get, tasks.get))
      } catch { case e: Throwable =>
        System.err.println(s"[jobs] $name FAILED: ${e.getMessage}"); None
      } finally { spark.catalog.clearCache() }
    }
    out.sortBy(-_._2).foreach { case (n, dt, j, st, tk) =>
      System.err.println(f"[jobs] $n%-26s ${dt}%7.2f s  jobs=$j%-4d stages=$st%-4d tasks=$tk")
    }
    spark.stop()
  }
}
