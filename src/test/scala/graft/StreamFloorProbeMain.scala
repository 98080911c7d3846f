package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 probe (r9 verdict Next #7): the streaming-gate MACHINERY floor —
  * what a checkpointed 3-micro-batch AvailableNow stream costs with a
  * trivial per-batch body (count only, no writes) vs with per-batch
  * parquet emission, against the real stream_sessions gate time. The
  * decomposition separates "checkpoint+trigger+planning floor" from
  * "per-batch plan work" so streaming gates stop reading as plan
  * regressions in ratio tables. */
object StreamFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      System.err.println(f"[sfloor] $tag%-14s ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    def tmp(): String =
      java.nio.file.Files.createTempDirectory("graft-sfloor").toString

    // shared input: 3-file events slice, the stream_sessions shape
    val base0 = tmp()
    spark.read.parquet(s"$d/events.parquet")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .repartition(3).write.parquet(s"$base0/in")

    def noop(): Unit = {
      val b = tmp()
      spark.readStream.schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(s"$base0/in")
        .writeStream.option("checkpointLocation", s"$b/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.count(); ()
        }.start().awaitTermination()
    }

    def withWrite(): Unit = {
      val b = tmp()
      spark.readStream.schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(s"$base0/in")
        .writeStream.option("checkpointLocation", s"$b/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$b/out/batch=$id"); ()
        }.start().awaitTermination()
    }

    def gate(): Unit = {
      graft.queries.StreamingQueries.queries("stream_sessions")(spark, d).count()
      ()
    }

    time("warm_noop")(noop())
    time("warm_gate")(gate())
    for (r <- 1 to 3) {
      time(s"noop_$r")(noop())
      time(s"write_$r")(withWrite())
      time(s"gate_$r")(gate())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
