package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: dump a SUBSET of SparkEntry queries (names in args) to
  * parquet for local DuckDB comparison — a faster loop than full Verify. */
object VerifySubsetMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/tmp/graft-verify")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        spark.catalog.clearCache()
        System.err.println(
          f"[subset] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    // driver-layout oracle dump (subset only) so tools/verify_local.py
    // runs directly on this outDir; shared escaper (Verify.writeOracles)
    Verify.writeOracles(outDir,
      SparkEntry.oracleSql.view.filterKeys(names.contains).toMap)
    spark.stop()
  }
}
