package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: PQ ADC recall vs brute force at sf0.001/sf0.01 across
  * several probes — measured before pinning the gate's recall floor. */
object PqProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VectorOps
    for (sf <- Seq("0.001", "0.01")) {
      val emb = graft.core.Tables.embeddings(spark, s"/root/testdata/sf$sf")
      for (probe <- Seq(0L, 7L, 42L)) {
        val exact = VectorOps.bruteForceTopK(emb, probe, 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        for ((m, ck, it) <- Seq((8, 16, 0), (8, 16, 1))) {
          val t0 = System.nanoTime()
          val rr = VectorOps.pqTopKReranked(emb, probe, 10, shortlist = 100,
            m = m, codeK = ck, iters = it)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val secs = (System.nanoTime() - t0) / 1e9
          System.err.println(
            f"[pq] sf$sf probe$probe m=$m ck=$ck it=$it reranked = " +
              f"${(rr & exact).size}/10 $secs%.1f s")
        }
      }
    }
    spark.stop()
  }
}
