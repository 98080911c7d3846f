package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, VectorOps}

/** Ad-hoc stage profiler (test scope): `sbt "Test/runMain graft.ProfMain
  * [sfDir]"`. Times the similarity-stack stages individually — the
  * `Test/console` REPL can't be used for this (typedLit's TypeTag
  * reflection fails across the REPL classloader).
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, sf)
    t("warmup")(docs.count())
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    t("shingles")(withSh.count())
    val sig = withSh.withColumn("mh", Dedup.minhashSignature(col("sh"), 128))
    t("minhash_sig")(sig.count())
    t("minhash_pairs")(Dedup.minhashLshPairs(docs, 3, 0.8).count())
    val emb = Tables.embeddings(spark, sf)
    t("emb_neardup")(VectorOps.cosineNearDupPairs(emb, 0.45).count())
    t("ann_lsh")(VectorOps.lshTopK(emb, 0L, 10).count())
    t("ann_topk")(VectorOps.bruteForceTopK(emb, 0L, 10).count())
    t("ssdeep")(graft.queries.SSDeepQueries.ssdeepSimilarity(spark, sf).count())
    t("ngram_jaccard")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    t("simhash")(Dedup.simhashPairs(docs, 3, 0.8, 7).count())
    t("qs_content_within")(graft.queries.QueryStringQueries.qsContentWithin(spark, sf).count())
    t("lucene_phrase")(graft.queries.JexlQueries.lucenePhrase(spark, sf).count())
    spark.stop()
  }
}
