package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-6 probe — token-budget corpus mixing, window form
  * vs the two-pass bucket-subtotal form, on 1× (sf0.1 documents) vs 10×.
  * The claim under test: the per-stratum global window serializes each
  * stratum through one task, so it scales with the LARGEST stratum; the
  * two-pass form's window runs per (stratum, coarse bucket) — parallel —
  * and its pass 1 is a map-side-combined aggregate. Budgets scale with
  * the corpus so both scales cut mid-stratum (the worst case: the
  * boundary window actually runs). */
object ScaleProbe5Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d1 = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("lang"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    val d10 = (0 until 10).map { i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[scale5] $tag%-24s rows=$n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }

    Seq(("1x", d1, 1L), ("10x", d10, 10L)).foreach { case (tag, docs0, m) =>
      // the mix step runs over a MATERIALIZED token-count column in any
      // real pipeline — persist so both forms time the operator, not
      // repeated tokenization (two-pass legitimately runs two jobs)
      val docs = docs0.persist()
      docs.count()
      val budgets = Map("en" -> 60000L * m)
      // two passes each, report the second (shapes JIT-warm)
      (1 to 2).foreach { i =>
        t(s"window-$tag-$i") {
          graft.operators.Sampling.tokenBudget(docs, "doc_id", "lang",
            "n_tokens", budgets, defaultBudget = 20000L * m).count()
        }
        t(s"twopass-$tag-$i") {
          graft.operators.Sampling.tokenBudgetTwoPass(docs, "doc_id", "lang",
            "n_tokens", budgets, defaultBudget = 20000L * m).count()
        }
      }
      spark.catalog.clearCache()
    }

    // the shape that actually kills the window form at 100 TB: ONE
    // dominant stratum — the per-stratum window serializes the whole
    // stratum through a single task's sort, while the two-pass boundary
    // window touches only corpus/coarseBuckets rows per task
    val dBig = (0 until 100).map { i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _).withColumn("lang", lit("en")).persist()
    dBig.count()
    (1 to 2).foreach { i =>
      t(s"window-1strat100x-$i") {
        graft.operators.Sampling.tokenBudget(dBig, "doc_id", "lang",
          "n_tokens", Map.empty, defaultBudget = 3000000L).count()
      }
      t(s"twopass-1strat100x-$i") {
        graft.operators.Sampling.tokenBudgetTwoPass(dBig, "doc_id", "lang",
          "n_tokens", Map.empty, defaultBudget = 3000000L).count()
      }
    }
    spark.stop()
  }
}
