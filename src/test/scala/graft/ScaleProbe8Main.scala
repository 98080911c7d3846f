package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-7 wave-3 probe.
  *
  * 1. dsirSelect at 1×/10× corpus — the claim: the LM is bucket-sized
  *    regardless of corpus, wall tracks the bigram stream (two
  *    map-side-combinable passes, broadcast weight join).
  * 2. domainCap at 1× vs one domain made hot ×10 — the claim: only
  *    over-cap domains' rows reach the rank window, the hot domain
  *    emits exactly `cap` survivors, and the untouched domains' cost
  *    doesn't change.
  */
object ScaleProbe8Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[scale8] $tag%-28s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    val base = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang", "source")

    def times(k: Int): org.apache.spark.sql.DataFrame =
      (0 until k).map(i => base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"))).reduce(_ unionByName _)

    // shape warmup at the probed parameters
    graft.operators.Sampling.dsirSelect(base, col("lang") === "en",
      buckets = 256, k = 100).count()

    for ((tag, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
      val docs = times(k).persist()
      docs.count()
      t(s"dsirSelect $tag") {
        graft.operators.Sampling.dsirSelect(docs, col("lang") === "en",
          buckets = 256, k = 100).count()
      }
      docs.unpersist()
    }

    // spanScrub at 1×/10× VERBATIM copies (every span cross-doc — the
    // worst case: maximal duplicated-window coverage explode)
    graft.operators.Dedup.spanScrub(base.limit(500), k = 10)
      .agg(sum("n_removed")).head()
    for ((tag, k) <- Seq(("1x", 1), ("10x", 10))) {
      val docs = times(k).persist()
      docs.count()
      t(s"spanScrub $tag") {
        graft.operators.Dedup.spanScrub(docs, k = 10)
          .agg(sum("n_removed")).head().getLong(0)
      }
      docs.unpersist()
    }

    // domainCap: hot-domain probe — replicate ONE source's docs 10×,
    // leave the rest alone; survivors must stay at cap for every domain
    val hot = base.filter(col("source") === "src0")
    val hot10 = (0 until 10).map(i => hot.select(
      (col("doc_id") + lit((i + 1).toLong * 100000000L)).as("doc_id"),
      col("text"), col("lang"), col("source"))).reduce(_ unionByName _)
    val skewed = base.unionByName(hot10).persist()
    skewed.count()
    val flat = base.persist(); flat.count()
    t("domainCap 1x") {
      graft.operators.Sampling.domainCap(flat, "source", cap = 100).count()
    }
    t("domainCap hot-domain 11x") {
      val out = graft.operators.Sampling.domainCap(skewed, "source", cap = 100)
      val perDomain = out.groupBy("source").count()
        .agg(max("count")).head().getLong(0)
      require(perDomain <= 100, s"cap violated: $perDomain")
      out.count()
    }

    spark.stop()
  }
}
