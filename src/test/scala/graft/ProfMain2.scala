package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Stage-level profile of minhashLshPairs: `sbt "Test/runMain graft.ProfMain2 [sfDir]"`. */
object ProfMain2 {
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
    }
    val docs = Tables.documents(spark, sf)
    t("warmup")(docs.count())
    val n = 3; val threshold = 0.8; val numHashes = 128; val bands = 32
    val rows = numHashes / bands
    val withSh = graft.core.Spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), Dedup.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    t("mh_withSh")(withSh.count())
    val sig = withSh.withColumn("mh", Dedup.minhashSignature(col("sh"), numHashes))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("mh"), b * rows + lit(1), lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist()
    t("mh_banded")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct().persist()
    t("mh_cand")(cand.count())
    val shA = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val ver = cand.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("uni") > 0 &&
        col("inter").cast("double") >= col("uni").cast("double") * threshold)
    t("mh_verify")(ver.count())
    spark.stop()
  }
}
