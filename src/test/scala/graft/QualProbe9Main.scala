package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r9 probe: does pushing the quality-rules predicate into the stats
  * projection (Catalyst collapses them, textually duplicating each
  * HOF stat subtree into the CASE chain) actually cost repeated
  * evaluation, or does interpreted subexpression elimination dedupe?
  * Compare the shipped qualityFilter shape against a barriered form
  * (stats projected once, exchange, then a cheap column filter). */
object QualProbe9Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[qual9] $tag%-10s n=$n ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }

    val docs = graft.core.Tables.documents(spark, d)

    def fused(): Long =
      graft.operators.TextOps.qualityFilter(docs, minTokens = 40,
          maxTokens = 80, minMeanTokLen = 4.1, maxMeanTokLen = 4.8,
          minAlphaRatio = 0.82, minStopwordRatio = 0.05)
        .filter(col("keep")).select("doc_id").count()

    def barriered(): Long = {
      val stats = docs.select(Seq(col("doc_id")) ++
        graft.operators.TextOps.qualityColumns(col("text")): _*)
        .repartition(32)
      stats.filter(col("n_tokens") >= 40 && col("n_tokens") <= 80 &&
          col("mean_token_len") >= 4.1 && col("mean_token_len") <= 4.8 &&
          col("alpha_ratio") >= 0.82 && col("stopword_ratio") >= 0.05)
        .select("doc_id").count()
    }

    time("warm")(fused())
    for (r <- 1 to 3) {
      time(s"fused_$r")(fused())
      time(s"barrier_$r")(barriered())
    }
    spark.stop()
  }
}
