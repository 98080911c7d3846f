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
      val dir2 = java.nio.file.Files.createTempDirectory("ivfpqb").toString
      VectorOps.ivfPqWriteIndex(emb, dir2, nCells = 16, m = 8, codeK = 16,
        iters = 2)
      val (codes2, books2, cents) = VectorOps.ivfPqReadIndex(spark, dir2)
      for ((np, sl) <- Seq((4, 400), (6, 400), (8, 400))) {
        val t0 = System.nanoTime()
        val approx = VectorOps.ivfPqTopKBatch(emb, codes2, books2, cents,
          probes, k = 10, nProbe = np, shortlist = sl)
        val byProbe = approx.collect().groupBy(_.getLong(0))
          .view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val secs = (System.nanoTime() - t0) / 1e9
        val hits = probes.map { p =>
          val ex = VectorOps.bruteForceTopK(emb, p, 10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          s"$p:${(byProbe.getOrElse(p, Set.empty) & ex).size}"
        }
        // vs the exact answer RESTRICTED to the probed cells (isolates
        // PQ/pipeline correctness from coarse-quantizer recall)
        import org.apache.spark.sql.functions.{col, typedLit}
        val hitsCell = probes.map { p =>
          val pn = emb.filter(col("vec_id") === p)
            .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
          val cells = VectorOps.ivfProbeCells({
            val nrm = math.sqrt(pn.map(x => x*x).sum); pn.map(_/nrm)}, cents, np)
          val restricted = emb
            .withColumn("cell", VectorOps.ivfAssign(col("embedding"), cents))
            .filter(col("cell").isin(cells: _*) && col("vec_id") =!= p)
            .withColumn("sim", VectorOps.cosine(col("embedding"), typedLit(pn)))
            .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          s"$p:${(byProbe.getOrElse(p, Set.empty) & restricted).size}"
        }
        System.err.println(
          f"[ivfpqb] sf$sf nProbe=$np shortlist=$sl hits ${hits.mkString(" ")} cellhits ${hitsCell.mkString(" ")} $secs%.1f s")
      }
    }
    spark.stop()
  }
}
