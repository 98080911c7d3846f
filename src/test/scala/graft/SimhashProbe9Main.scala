package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r9 probe: where dedup_simhash spends at sf0.1 — the signature
  * projection (per-token md5 + 64-lane vote folds), the banded self
  * join, or the needle-shingle verify. */
object SimhashProbe9Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[sh9] $tag%-10s n=$n ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    val docs = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text")
    def sigOnly(): Long = graft.core.Spread(docs)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
      .count()
    def full(): Long = Dedup.simhashPairs(docs, 3, 0.8).count()
    time("warm")(full())
    for (r <- 1 to 3) {
      time(s"sig_$r")(sigOnly())
      time(s"full_$r")(full())
    }
    spark.stop()
  }
}
