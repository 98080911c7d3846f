package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: regenerate `target/sf1` — the 10× corpus the sf1
  * crossover probes (Sf1CrossoverMain, tools/sf1_duckdb.py) run on.
  * Deterministic ×10 replication of /root/testdata/sf0.1 with key
  * remapping so cross-table joins stay consistent:
  *
  *  - lineitem / orders: `*_orderkey += r * KeyStride` per replica r —
  *    a replicated line still joins its replicated order, and the
  *    dotted-uid document tree (TreeQueries) gets 10× distinct trees;
  *  - events: `event_id += r * KeyStride` (user_id kept: per-user
  *    fan-out grows with the corpus, as a real event log would);
  *  - documents: `doc_id += r * KeyStride`, and every text LINE gets a
  *    per-replica prefix token so cross-replica lines are NOT verbatim
  *    dups (line-dedup / near-dup structure replicates within a copy,
  *    not across copies — the r8 probe discipline, SCALE.md).
  *
  * Each table lands as ONE parquet FILE named `<table>.parquet`
  * (matching the testdata layout, so `Tables` and DuckDB's
  * read_parquet both just work; single files still split by row
  * group under spark.sql.files.maxPartitionBytes).
  */
object Sf1GenMain {
  private val KeyStride = 100000000L
  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a DIRECTORY named <table>.parquet with 16 part files: Spark reads
    // it like the testdata single-file layout, every scan gets 16 input
    // splits (a single 100MB file is ONE split under the default 128MB
    // maxPartitionBytes — measured serializing the whole probe), and
    // tools/sf1_duckdb.py globs directories as <dir>/*.parquet
    def replicated(table: String)(remap: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      val out = (0 until Replicas).map(r => remap(base, r))
        .reduce(_ unionByName _)
      graft.core.Fs.deleteRecursively(s"$outDir/$table.parquet")
      out.repartition(16).write.mode("overwrite")
        .parquet(s"$outDir/$table.parquet")
      System.err.println(s"[sf1gen] $table done")
    }

    replicated("lineitem") { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * KeyStride))
    }
    replicated("orders") { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * KeyStride))
    }
    replicated("events") { (df, r) =>
      df.withColumn("event_id", col("event_id") + lit(r * KeyStride))
    }
    replicated("documents") { (df, r) =>
      df.withColumn("doc_id", col("doc_id") + lit(r * KeyStride))
        .withColumn("text",
          concat(lit(s"rr$r "), regexp_replace(col("text"), "\n", s"\nrr$r ")))
        .withColumn("n_chars", length(col("text")))
    }
    // small dims copied verbatim so oracle SQL referencing them still runs
    for (t <- Seq("customer", "supplier", "part", "nation", "region", "embeddings"))
      replicated(t) { (df, r) => if (r == 0) df else df.limit(0) }
    spark.stop()
  }
}
