package graft

import org.apache.spark.sql.SparkSession

/** One-off gate probe (test scope): `sbt "Test/runMain graft.ProbeMain
  * <queryName> [sfDir]"` — prints the gate's row count and first rows.
  * Exists because `Test/console` can't evaluate typedLit-bearing code
  * across the REPL classloader.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProbeMain <query> [sfDir]"))
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sf)
    val n = df.count()
    println(f"PROBE $name rows=$n dt=${(System.nanoTime() - t0) / 1e9}%.2f s")
    df.show(10, false)
    spark.stop()
  }
}
