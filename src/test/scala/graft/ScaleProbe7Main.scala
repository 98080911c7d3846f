package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-7 wave-2 probe.
  *
  * 1. lineDedup at 1×/10× corpus (docs replicated VERBATIM with shifted
  *    ids — every copied line collides, the boilerplate-heavy worst
  *    case, and the kept-line sum at 10× must equal the 1× run's) —
  *    the claim: two shuffles, wall tracks the line count.
  * 2. rankTfIdf at 1×/10× — the terms-filtered shuffle means wall tracks
  *    query-term instances, not corpus tokens.
  * 3. bpePairs at 1×/10× — the pair work is vocabulary-sized, so 10×
  *    corpus ≈ the same pair explode over the same vocab.
  */
object ScaleProbe7Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[scale7] $tag%-28s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    val base = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")

    def times(k: Int): org.apache.spark.sql.DataFrame =
      (0 until k).map(i => base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("text"))).reduce(_ unionByName _)

    // chunked "lines" via the SAME shared derivation the dedup_lines
    // gate uses (TextOps.chunkLines) — the probe measures what is gated
    def lined(docs: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"),
        graft.operators.TextOps.chunkLines(col("text")).as("text"))

    // shape warmup
    graft.operators.Dedup.lineDedup(lined(base.limit(500)))
      .agg(sum("n_kept")).head()
    graft.operators.TextOps.rankTfIdf(base.limit(500),
      Seq("join", "merge", "scan")).count()
    graft.operators.TextOps.bpePairs(base.limit(500)).count()

    for ((tag, k) <- Seq(("1x", 1), ("10x", 10))) {
      val docs = times(k).persist()
      docs.count()
      t(s"lineDedup $tag") {
        graft.operators.Dedup.lineDedup(lined(docs))
          .agg(sum("n_kept")).head().getLong(0)
      }
      t(s"rankTfIdf $tag") {
        graft.operators.TextOps.rankTfIdf(docs,
          Seq("join", "merge", "scan")).count()
      }
      t(s"bpePairs $tag") {
        graft.operators.TextOps.bpePairs(docs).count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
