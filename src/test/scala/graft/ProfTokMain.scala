package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfTokMain {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/orders.parquet").count()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[tok] $tag%-28s n=$n%8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val raw = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")

    def tokensQ(rx: String): Long =
      raw.select(col("doc_id"),
          posexplode(filter(split(lower(col("text")), rx), t => t =!= ""))
            .as(Seq("pos", "term")))
        .groupBy("doc_id", "term").agg(count(lit(1))).count()

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("nocodegen-first") { tokensQ("[^a-z0-9]+") }
    time("nocodegen-second") { tokensQ("[^a-z0-9]+") }
    time("nocodegen-newplan") { tokensQ("[^a-z0-8]+") }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("codegen-first") { tokensQ("[^a-z0-9]+") }
    time("codegen-newplan") { tokensQ("[^a-z0-7]+") }
    time("codegen-newplan2") { tokensQ("[^a-z0-6]+") }
    spark.stop()
  }
}
