package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{Ingest, Modifications}

/** Dev harness: round-4 operator scaling probe — REMOVEDUID index
  * patching and Uid.List-granular needle scans on 1× (60k events,
  * sf0.1) vs 10× (600k, perturbed copies). Empirical check that the
  * patch cost tracks the EDIT BATCH (broadcast joins over the index),
  * and the needle scan tracks the index + pruned slice, not the event
  * count (SCALE.md "Measured scaling"). */
object ScaleProbe2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def longOf(events: DataFrame): DataFrame =
      Ingest.toLong(graft.core.Spread(events), uidCol = "event_id",
        datatype = "event", dateCol = "ts")

    val e1 = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
    // 10×: shifted ids so uid lists / values perturb rather than repeat
    val e10 = (0 until 10).map { i =>
      e1.withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", pmod(col("user_id") + lit(i * 37), lit(1000)))
    }.reduce(_ unionByName _)

    val edits: Seq[Modifications.FieldEdit] =
      (1 to 1000).map(i =>
        Modifications.DeleteField(i.toString, "event", "user_id"): Modifications.FieldEdit) ++
      (1 to 100).map(i => Modifications.PutField(s"${90000000L + i}", "event",
        "user_id", (i % 50).toString,
        shardDate = java.sql.Date.valueOf("2024-01-05")))

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scale2] $tag%-26s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      spark.catalog.clearCache()
    }

    Seq(("1x", e1), ("10x", e10)).foreach { case (tag, ev) =>
      val long = longOf(ev).persist()
      val idx = Ingest.globalIndex(long).persist()
      idx.count() // materialize the index (write path, not the probe)
      t(s"patchIndex-$tag") {
        Modifications.patchIndex(idx, long, edits).count()
      }
      t(s"needle-uid-$tag") {
        graft.query.NeedleScan.scan(ev, col("event_id").cast("string"),
          to_date(col("ts")), idx, "user_id", "42", col("user_id") === 42).count()
      }
      t(s"needle-date-$tag") {
        graft.query.NeedleScan.scan(ev, col("event_id").cast("string"),
          to_date(col("ts")), idx, "event_type", "signup",
          col("event_type") === "signup").count()
      }
      t(s"discovery-rev-$tag") {
        graft.query.Discovery.terms(idx, Ingest.reverseGlobalIndex(long),
          graft.query.Discovery.Pattern("*ick"), Some("event_type")).count()
      }
      long.unpersist(); idx.unpersist()
    }
    spark.stop()
  }
}
