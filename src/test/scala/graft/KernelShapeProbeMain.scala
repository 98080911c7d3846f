package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print each warm-up kernel's taxed-shape combo. */
object KernelShapeProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Warmup.kernelFrames(spark).foreach { case (name, df) =>
      val shape = df.queryExecution.optimizedPlan.toString.toLowerCase
      val taxed = SparkEntry.taxedMarkers.exists(shape.contains)
      val combo = SparkEntry.shapeFeatures.filter(shape.contains).mkString("|")
      System.err.println(s"[kshape] $name taxed=$taxed combo=$combo")
    }
    spark.stop()
  }
}
