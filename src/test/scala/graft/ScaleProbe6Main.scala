package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-7 probe.
  *
  * 1. Span-dedup hot-span cap: a boilerplate k-token span whose df grows
  *    10× (5k → 50k header-only docs over a fixed real corpus). The
  *    claim: WITH the cap the hot span dies at the df aggregate (one row
  *    per distinct span), so wall stays ~flat; UNCAPPED the join fans
  *    out every occurrence and the skewed key serializes one reducer.
  * 2. repeatUpsample at 1×/10× corpus — map-side explode, no shuffle.
  * 3. trainingOrder at 1×/10× — bucket-count collect + broadcast offsets
  *    + per-bucket window.
  */
object ScaleProbe6Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[scale6] $tag%-34s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    val base = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val header = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def hotDocs(n: Int): org.apache.spark.sql.DataFrame =
      spark.range(n).select((col("id") + 10000000L).as("doc_id"),
        concat(lit(header + " uniq"), col("id").cast("string")).as("text"))

    // JIT/shape warmup so the first timed row isn't the compile cost
    graft.operators.Dedup.spanProfile(
      base.unionByName(hotDocs(500)).limit(2000), k = 10, hotSpanCap = 1000)
      .agg(sum("n_dup_spans")).head()

    for ((tag, n) <- Seq(("hot-df 50k", 50000), ("hot-df 500k", 500000))) {
      val docs = base.unionByName(hotDocs(n)).persist()
      docs.count()
      t(s"spanProfile UNCAPPED, $tag") {
        graft.operators.Dedup.spanProfile(docs, k = 10)
          .agg(sum("n_dup_spans")).head(); docs.count()
      }
      t(s"spanProfile capped, $tag") {
        graft.operators.Dedup.spanProfile(docs, k = 10, hotSpanCap = 1000)
          .agg(sum("n_dup_spans")).head(); docs.count()
      }
      docs.unpersist()
    }

    val d1 = base.withColumn("lang",
      when(col("doc_id") % 3 === 0, "en").otherwise("fr")).persist()
    d1.count()
    val d10 = (0 until 10).map(i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _).persist()
    d10.count()
    for ((tag, docs) <- Seq(("1x", d1), ("10x", d10))) {
      t(s"repeatUpsample $tag") {
        graft.operators.Sampling.repeatUpsample(docs, "doc_id", "lang",
          Map("en" -> 2.5), defaultWeight = 1.0).count()
      }
      t(s"trainingOrder $tag") {
        graft.operators.Sampling.trainingOrder(docs, "doc_id")
          .agg(max("pos")).head(); docs.count()
      }
    }
    spark.stop()
  }
}
