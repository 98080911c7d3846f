package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: batched-PQ per-probe recall vs brute force across
  * scale factors / shortlist sizes — measured before pinning the
  * ann_pq_batch gate's floor. */
object PqBatchProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VectorOps
    val probes = Seq(0L, 7L, 42L)
    for (sf <- Seq("0.01", "0.1")) {
      val emb = graft.core.Tables.embeddings(spark, s"/root/testdata/sf$sf")
      System.err.println(s"[pqb] sf$sf n=${emb.count()}")
      val dir = java.nio.file.Files.createTempDirectory("pqb").toString
      VectorOps.pqWriteIndex(emb, dir, m = 8, codeK = 32, iters = 2)
      val (codes, books) = VectorOps.pqReadIndex(spark, dir)
      for (sl <- Seq(100, 200, 400)) {
        val t0 = System.nanoTime()
        val approx = VectorOps.pqTopKBatch(emb, codes, books, probes,
          k = 10, shortlist = sl)
        val byProbe = approx.collect().groupBy(_.getLong(0))
          .view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val secs = (System.nanoTime() - t0) / 1e9
        val hits = probes.map { p =>
          val ex = VectorOps.bruteForceTopK(emb, p, 10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          s"$p:${(byProbe.getOrElse(p, Set.empty) & ex).size}"
        }
        System.err.println(
          f"[pqb] sf$sf shortlist=$sl hits ${hits.mkString(" ")} $secs%.1f s")
      }
    }
    spark.stop()
  }
}
