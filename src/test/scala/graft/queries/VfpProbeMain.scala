package graft.queries

import org.apache.spark.sql.SparkSession

/** r10 dev probe: the one-shot video-fingerprint pair set over the
  * stream_vfp corpus — the literal rows its oracle pins — plus the
  * full hamming matrix so family separation is visible. */
object VfpProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = StreamingQueries.vfpCorpus(spark)
    val hashes = graft.operators.Multimodal.videoFingerprints(corpus)
      .orderBy("media_id").collect()
    hashes.foreach(r => println(s"HASH ${r.getLong(0)} -> " +
      (if (r.isNullAt(1)) "null" else r.getLong(1).toHexString)))
    val hs = hashes.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1)))
    for (i <- hs.indices; j <- (i + 1) until hs.length)
      println(s"DIST (${hs(i)._1}, ${hs(j)._1}) = " +
        java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2))
    val pairs = graft.operators.Multimodal.videoNearDupPairs(corpus, maxHamming = 10)
      .orderBy("id_a", "id_b").collect()
    pairs.foreach(r => println(s"PAIR (${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})"))
    spark.stop()
  }
}
