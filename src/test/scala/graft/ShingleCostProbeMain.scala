package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): decompose the shingle pass — the front of every
  * jaccard/minhash/incremental dedup pipeline — into its regex base
  * cost vs the transform(xxhash64) HOF layer, to size a kernelization
  * before building it (guide §1: measure first). */
object ShingleCostProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Spread(
      spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text"))
      .persist()
    docs.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      System.err.println(f"[shingle] $tag%-18s ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm each shape once, then two timed reps
    val raw = docs.select(col("doc_id"),
      graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val hashed = docs.select(col("doc_id"),
      graft.operators.Dedup.hashedShingles(col("text"), 3).as("sh"))
    noop(raw); noop(hashed)
    for (r <- 1 to 3) {
      time(s"regex_only_$r")(noop(raw))
      time(s"hashed_hof_$r")(noop(hashed))
    }
    spark.stop()
  }
}
