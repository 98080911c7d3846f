package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r9 probe (VERDICT r8 "what's wrong #2"): spanScrub regressed ~3× when
  * the window derivation moved to the overlapping-window regex (90ede05).
  * Head-to-head the two derivations, each with the windows frame derived
  * twice (the shipped shape — wins feeds the df-aggregate AND the
  * coverage join) vs persisted-once. Run with SPARK_GRAFT_SF_DIR. */
object SpanProbe9Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 10

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[span9] $tag%-12s n=$n ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }

    def scrub(winsOf: DataFrame => DataFrame, persistWins: Boolean): Long = {
      val docs = graft.core.Tables.documents(spark, d)
      val toks = graft.core.Spread(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          graft.operators.TextOps.tokens(col("text")).as("toks")).persist()
      val wins0 = winsOf(toks)
      val wins = if (persistWins) wins0.persist() else wins0
      val crossDoc = wins.groupBy("h")
        .agg(min("doc_id").as("d0"), max("doc_id").as("d1"),
          count(lit(1)).as("df"))
        .filter(col("d0") =!= col("d1")).select("h")
      val covered = wins.join(crossDoc, "h")
        .select(col("doc_id"),
          explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
        .distinct()
      val kept = toks
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .join(covered, Seq("doc_id", "pos"), "left_anti")
      val rebuilt = kept.groupBy("doc_id").agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("scrubbed_md5"))
      val out = toks
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
            .cast("long").as("n_removed"),
          coalesce(col("scrubbed_md5"), md5(lit(""))).as("scrubbed_md5"))
        .persist()
      val n = out.count()
      toks.unpersist(); if (persistWins) wins.unpersist(); out.unpersist()
      n
    }

    val regexWins = (toks: DataFrame) => toks
      .select(col("doc_id"), posexplode(
        regexp_extract_all(array_join(col("toks"), " "),
          lit(s"(?=\\b((?:[a-z0-9]+ ){${k - 1}}[a-z0-9]+))"),
          lit(1))).as(Seq("p", "w")))
      .select(col("doc_id"), col("p"), md5(col("w")).as("h"))

    val sliceWins = (toks: DataFrame) => toks
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => array_join(slice(col("toks"), i + 1, lit(k)), " ")))
        .as(Seq("p", "w")))
      .select(col("doc_id"), col("p"), md5(col("w")).as("h"))

    // the r7-era shape: md5 INSIDE the transform, so the explode carries
    // 16-byte hashes instead of k-token window strings
    val hashWins = (toks: DataFrame) => toks
      .select(col("doc_id"), posexplode(
        when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            p => md5(array_join(slice(col("toks"), p + lit(1), lit(k)), " "))))
          .otherwise(array().cast("array<string>"))).as(Seq("p", "h")))

    time("warm_regex")(scrub(regexWins, persistWins = false))
    for (round <- 1 to 3) {
      time(s"regex2x_$round")(scrub(regexWins, persistWins = false))
      time(s"slice2x_$round")(scrub(sliceWins, persistWins = false))
      time(s"hash2x_$round")(scrub(hashWins, persistWins = false))
      time(s"regex1x_$round")(scrub(regexWins, persistWins = true))
      time(s"hash1x_$round")(scrub(hashWins, persistWins = true))
    }
    spark.stop()
  }
}
