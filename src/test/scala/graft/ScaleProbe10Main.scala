package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r10 probe: band WIDTH is the scale lever of the media-tier
  * pigeonhole pair join. On hash-UNIFORM corpora (xxhash64 of the id
  * — worst case: no clustering for the buckets to exploit), the
  * 16×4-bit structure mandated by a hamming ≤ 15 guarantee collides
  * ~16/16 of random pairs into candidates (≈ all-pairs), while the
  * 8×8-bit structure (hamming ≤ 7 — wider than every true edit the
  * fixtures measure) collides ~8/256. Same operator, same corpus,
  * radius 10 vs 7 — the wall-clock gap IS the candidate-volume gap.
  * Twins are injected at hamming 2 so both radii return the same
  * non-empty true-pair set. */
object ScaleProbe10Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Int): DataFrame = {
      val base = spark.range(n.toLong).select(
        col("id").as("media_id"), expr("xxhash64(id)").as("phash"))
      // every 100th id gets a twin (id + n) at hamming 2
      val twins = spark.range(n.toLong).filter(col("id") % 100 === 0)
        .select((col("id") + n).as("media_id"),
          expr("xxhash64(id)")
            .bitwiseXOR(lit((1L << 3) | (1L << 37))).as("phash"))
      base.unionByName(twins)
    }

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val c = f
      System.err.println(f"[sp10] $tag%-18s pairs=$c%6d ${(System.nanoTime - t0) / 1e9}%7.2f s")
    }

    for (n <- Seq(10000, 40000); pass <- 1 to 2) {
      val c = corpus(n).persist(); c.count()
      time(s"h7_8x8_n${n}_$pass")(
        graft.operators.Multimodal.hashNearDupPairs(c, 7).count())
      if (n <= 10000 || pass == 1)
        time(s"h10_16x4_n${n}_$pass")(
          graft.operators.Multimodal.hashNearDupPairs(c, 10).count())
      c.unpersist()
    }
    spark.stop()
  }
}
