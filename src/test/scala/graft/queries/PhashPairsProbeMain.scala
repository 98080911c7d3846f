package graft.queries

import org.apache.spark.sql.SparkSession

/** r9 dev probe: the one-shot pair set over the stream_phash corpus —
  * the literal rows its oracle pins. */
object PhashPairsProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = graft.operators.Multimodal.imageNearDupPairs(
        StreamingQueries.phashCorpus(spark), maxHamming = 10)
      .orderBy("id_a", "id_b").collect()
    pairs.foreach(r => println(s"PAIR (${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})"))
    spark.stop()
  }
}
