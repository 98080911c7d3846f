package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: round-8 sf1 crossover probe (r7 verdict item 2).
  *
  * Round 7 found five material queries >2× their DuckDB oracle at
  * sf0.1, with the claim that the constant is multi-stage scheduling
  * floor, not plan shape — falsifiable by scaling the data 10×. This
  * main times the five on a 10× corpus (target/sf1: documents 50k
  * rows with per-replica-perturbed text, lineitem 6M rows) at
  * local[32]; tools/sf1_duckdb.py times the same oracles in DuckDB at
  * 32 threads. Two passes each; report both (pass 1 carries the
  * one-time expression-JIT bill, pass 2 is the steady state).
  */
object Sf1CrossoverMain {
  private val Five = Seq("corpus_dsir", "dedup_lines",
    "grouping_paired_agg", "analyzer_tokens", "tf_within")

  /** Round-9 list (r8 verdict Next #1-#3): the three material >2×
    * singles, the sub-second TF/content band, and span_scrub. */
  private val Round9 = Seq("decorated_fields", "qs_grouping_string",
    "corpus_pipeline", "ancestor_query", "lucene_slop",
    "qs_content_within", "tf_phrase", "tf_adjacent", "tf_within",
    "edge_build", "span_scrub")

  /** Round-10 list (r9 verdict Next #1): the four sf1 residuals after
    * this round's plan changes, plus tld_query's FIRST sf1 row. */
  private val Round10 = Seq("tld_query", "ancestor_query", "parent_query",
    "qs_grouping_string", "grouping_paired_agg", "edge_build")

  /** Round-11 list (r10 verdict Next #8): first sf1 rows for the r10
    * gates plus the parent_query depth-prune re-measure. text_winnow's
    * oracle is one of the quadratic DuckDB exclusions at sf1 — time the
    * Spark side anyway (absolute cost is the scale story). The media
    * tiers' fixture corpora don't scale with sf; their sf1 story is
    * ScaleProbe10Main's banding measurements, not a corpus row. */
  private val Round11 = Seq("parent_query", "text_winnow",
    "corpus_pipeline_leakfree")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val names = if (args.nonEmpty) args.toSeq
      else if (sys.env.get("SPARK_GRAFT_ROUND").contains("11")) Round11
      else if (sys.env.get("SPARK_GRAFT_ROUND").contains("10")) Round10
      else if (sys.env.get("SPARK_GRAFT_ROUND").contains("9")) Round9
      else Five
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Warmup.run(spark)
    for (name <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(f"[sf1] $name%-22s pass$pass rows=$n%8d " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
