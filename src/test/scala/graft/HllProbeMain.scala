package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is hll_sketch_estimate(hll_union_agg(per-batch sketches))
  * EXACT (== count distinct) for the facet cardinalities in the driver
  * tables at sf0.01 and sf0.1? DataSketches HLL stays in exact coupon
  * mode at low cardinality; the gate design needs to know the regime. */
object HllProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val ev = graft.core.Tables.events(spark, s"/root/testdata/$sf")
      val batches = ev.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val merged = batches.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("cd"))
      val bad = merged.join(exact, "event_type")
        .filter(col("est") =!= col("cd")).count()
      val mx = exact.agg(max("cd")).head().getLong(0)
      System.err.println(s"[hll] $sf maxDistinct=$mx mismatches=$bad")
    }
    spark.stop()
  }
}
