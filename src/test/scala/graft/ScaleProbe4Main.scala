package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-5 wave-2 scaling probe — PII redaction, repetition
  * profiling, and the simhash needle-verify on 1× (5k docs, sf0.1) vs
  * 10× (50k, perturbed copies). Empirical check that redaction stays a
  * map-side projection (linear), repetition stays two shuffles over the
  * gram stream (near-linear), and the simhash verify stage scales with
  * the CANDIDATE count, not the corpus. */
object ScaleProbe4Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d1 = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    // 10× docs; every token gets a copy-specific prefix so shingle sets
    // are DISJOINT across copies — near-dup structure replicates within
    // each copy (pair count grows ~10×, like real corpus growth) instead
    // of the copies becoming 45 mutual near-dups per original (a naive
    // suffix perturbation measured 1000× pair growth, a different
    // problem size entirely)
    val d10 = (0 until 10).map { i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "([a-z0-9]+)", s"c$i$$1"))
    }.reduce(_ unionByName _)

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scale4] $tag%-24s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    Seq(("1x", d1), ("10x", d10)).foreach { case (tag, docs) =>
      t(s"redactPii-$tag") {
        docs.select(col("doc_id"),
          md5(graft.operators.TextOps.redactPii(col("text"))).as("m"))
          .agg(count(lit(1))).head().getLong(0)
      }
      t(s"repetition-$tag") {
        graft.operators.TextOps.repetition(graft.core.Spread(docs)).count()
      }
      t(s"simhashPairs-$tag") {
        graft.operators.Dedup.simhashPairs(docs, n = 3, threshold = 0.8).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
