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
    // 1x vs 10x scale probe (sf0.1 = 2000 vectors; 10x = 20k with
    // deterministic per-copy id shifts): training is model-sized, the
    // ADC scan is linear in codes — wall clock should grow far slower
    // than 10x (scheduling floor + model train amortize)
    {
      import org.apache.spark.sql.functions._
      val e1 = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
      val e10 = (0 until 10).map(i =>
        e1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
      for ((tag, e) <- Seq(("1x", e1), ("10x", e10)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = VectorOps.pqTopKReranked(e, probeId = 0L, k = 10,
          shortlist = 100, iters = 1).count()
        System.err.println(
          f"[pq-scale] $tag pass$pass rows=$n ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
