package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 dev probe: where corpus_pipeline_leakfree's time goes. */
object LeakFreeProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      System.err.println(f"[lf] $tag%-12s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }

    for (pass <- 1 to 2) {
      System.err.println(s"--- pass $pass")
      val docs = graft.core.Tables.documents(spark, d)
      val kept = graft.operators.TextOps.qualityFilter(docs, minTokens = 40,
          maxTokens = 80, minMeanTokLen = 4.1, maxMeanTokLen = 4.8,
          minAlphaRatio = 0.82, minStopwordRatio = 0.05,
          carry = Seq("source", "text"))
        .filter(col("keep"))
      val surv = graft.operators.Dedup.exactKeep(
        kept.select("doc_id", "source", "text")).select("doc_id", "source")
      val capped = graft.operators.Sampling.domainCapOnePass(
        surv, "source", cap = 10).persist()
      time("capped")(capped.count())
      val keptDocs = docs.join(
        broadcast(capped.select("doc_id")), Seq("doc_id"), "left_semi")
      val pairs = time("pairs")(
        graft.operators.Dedup.ngramJaccardPairs(keptDocs, 3, 0.8))
      val clusters = time("clusters") {
        val c = graft.operators.Dedup.clusters(pairs).persist(); c.count(); c
      }
      val out = graft.operators.Sampling.splitAssignLeakFree(capped, clusters,
        "doc_id", Seq("train" -> 0.96, "val" -> 0.02, "test" -> 0.02), "sp1")
      time("split")(out.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
