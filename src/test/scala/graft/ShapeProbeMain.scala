package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the taxed-shape feature combo of each named query
  * (the WarmupSpec coverage unit) so kernel warmers can be tuned to
  * match them exactly. */
object ShapeProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.warmupQueries
    names.foreach { name =>
      try {
        val shape = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.optimizedPlan.toString.toLowerCase
        val taxed = SparkEntry.taxedMarkers.exists(shape.contains)
        val combo = SparkEntry.shapeFeatures.filter(shape.contains).mkString("|")
        System.err.println(s"[shape] $name taxed=$taxed combo=$combo")
      } catch { case e: Throwable =>
        System.err.println(s"[shape] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
