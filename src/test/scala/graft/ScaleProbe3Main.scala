package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: round-5 operator scaling probe — mergeable facet
  * sketches and visibility-recombined groupBy on 1× (60k events, sf0.1)
  * vs 10× (600k, perturbed copies). Empirical check that the facet
  * write path scales with events (one shuffle), the facet READ path
  * scales with the sketch table (never re-reads events), and the
  * marking recombination adds only a map-side expression to the
  * aggregation. */
object ScaleProbe3Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e1 = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
    // 10× events AND 10× facet keys — shifted ids keep cardinality
    // growing with data, so the probe can't saturate the key space
    val e10 = (0 until 10).map { i =>
      e1.withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000L))
    }.reduce(_ unionByName _)

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scale3] $tag%-28s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    Seq(("1x", e1), ("10x", e10)).foreach { case (tag, ev) =>
      val withDay = ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      // write path: per-(day, user) sketches — scales with events
      val batches = graft.ingest.Facets.sketchBatches(
        withDay, "day", "user_id", "event_type").persist()
      t(s"facetSketchWrite-$tag") { batches.count() }
      // read path: merge + estimate over SKETCH BYTES only — must stay
      // index-sized (flat vs event count once the table is materialized)
      t(s"facetSketchRead-$tag") {
        graft.ingest.Facets.merge(batches, "user_id").count()
      }
      batches.unpersist()
      // marked groupBy: recombination = one more map-side expression
      val marked = ev.withColumn("visibility",
        when(col("event_type") === "click", "A")
          .when(col("event_type") === "view", "A|B")
          .otherwise("(A&B)|C"))
      t(s"groupByVisRecombine-$tag") {
        marked.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            graft.vis.Visibility.combineAgg(col("visibility")).as("visibility"))
          .count()
      }
      t(s"groupByPlain-$tag") {
        marked.groupBy("user_id").agg(count(lit(1)).as("cnt")).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
