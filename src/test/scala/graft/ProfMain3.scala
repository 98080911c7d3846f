package graft

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.operators.Dedup

/** Fresh-JVM timing of the dedup hot spots (round-3 perf targets):
  * `sbt "Test/runMain graft.ProfMain3 [sfDir]"`. clearCache + GC between
  * queries so each number is isolated.
  */
object ProfMain3 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
    }
    val docs = Tables.documents(spark, sf)
    t("warmup")(docs.count())
    t("ngram_jaccard")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    t("simhash")(Dedup.simhashPairs(docs, 3, 0.8, 7).count())
    t("minhash_lsh")(Dedup.minhashLshPairs(docs, 3, 0.8).count())
    spark.stop()
  }
}
