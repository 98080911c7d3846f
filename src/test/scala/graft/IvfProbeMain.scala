package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.VectorOps

/** Measure IVF recall@10 vs brute force for several nProbe settings. */
object IvfProbeMain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sf)
    val bf = VectorOps.bruteForceTopK(emb, 0L, 10).select("vec_id")
    for (np <- Seq(2, 4, 6, 8)) {
      val ivf = VectorOps.ivfTopK(emb, 0L, 10, nCells = 16, nProbe = np).select("vec_id")
      val hits = ivf.join(bf, Seq("vec_id")).count()
      println(s"IVF nProbe=$np hits=$hits/10")
    }
    spark.stop()
  }
}
