package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: dump a subset of SparkEntry.queries (args = names) to
  * /tmp/gate_probe for tools/verify_local.py — iterate on one gate
  * without a full Verify run. */
object GateProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = "/tmp/gate_probe"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[probe] dumped $name")
    }
    Verify.writeOracles(outDir, SparkEntry.oracleSql)
    spark.stop()
  }
}
