package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.Ingest

object ProfHoleMain {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { round =>
      System.err.println(s"--- round $round")
      val events = Tables.events(spark, d)
      val long = t("melt+persist") {
        val l = Ingest.toLong(graft.core.Spread(events), "event_id", "event", "ts")
          .filter(col("field") === "user_id").persist()
        l.count(); l
      }
      val freq = Ingest.fieldFrequency(long)
      val partialIndex = t("partialIndex") {
        val p = Ingest.globalIndex(long.filter(col("shard_date") < lit("2024-01-16")))
        p.count(); p
      }
      val out = t("prunedScan") {
        graft.query.IndexHoles.prunedScan(events, to_date(col("ts")),
            freq, partialIndex, "user_id", "7")
          .filter(col("user_id") === 7).select("event_id", "user_id").count()
      }
      System.err.println(s"rows=$out")
      long.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
