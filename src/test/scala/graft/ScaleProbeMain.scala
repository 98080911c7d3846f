package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev harness: dedup-stack scaling probe on a 10× perturbed documents
  * table (50k docs, /tmp/scale10) vs the 5k sf0.1 baseline — empirical
  * check that candidate generation stays quasi-linear (SCALE.md). */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scale] $tag%-28s pairs=$n%8d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      spark.catalog.clearCache()
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = spark.read.parquet("/tmp/scale10/documents.parquet")
    // warmup (plan-shape JIT) on the small set
    t("warmup-ngram-5k") { Dedup.ngramJaccardPairs(base, 3, 0.8).count() }
    t("warmup-minhash-5k") { Dedup.minhashLshPairs(base, 3, 0.8).count() }
    t("warmup-simhash-5k") { Dedup.simhashPairs(base, 3, 0.8).count() }
    // timed: steady-state small then 10× large
    t("ngram-5k") { Dedup.ngramJaccardPairs(base, 3, 0.8).count() }
    t("ngram-50k") { Dedup.ngramJaccardPairs(big, 3, 0.8).count() }
    t("minhash-5k") { Dedup.minhashLshPairs(base, 3, 0.8).count() }
    t("minhash-50k") { Dedup.minhashLshPairs(big, 3, 0.8).count() }
    t("simhash-5k") { Dedup.simhashPairs(base, 3, 0.8).count() }
    t("simhash-50k") { Dedup.simhashPairs(big, 3, 0.8).count() }
    spark.stop()
  }
}
