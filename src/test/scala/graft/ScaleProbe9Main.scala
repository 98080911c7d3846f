package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: round-8 probe — batched-ANN probe fan-out after the
  * probes-as-data rewrite (r7 verdict item 1).
  *
  * The claim under test: the batch APIs' cost is FLAT per probe and the
  * physical plan is CONSTANT-SIZE in the batch width, because probes
  * join as broadcast data rows instead of N stacked literal expression
  * trees (which fell out of whole-stage codegen past a few dozen
  * probes). Measured: pqTopKBatch and ivfPqTopKBatch at N = 8/64/256
  * probes off one persisted index, plus the executed-plan length of the
  * shortlist stage at each width.
  */
object ScaleProbe9Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.VectorOps

    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .persist()
    val n = emb.count()
    System.err.println(s"[scale9] corpus n=$n")

    val dir = java.nio.file.Files.createTempDirectory("scale9-pq").toString
    VectorOps.pqWriteIndex(emb, dir, m = 8, codeK = 16, iters = 1)
    val (codes, books) = VectorOps.pqReadIndex(spark, dir)
    codes.persist().count()

    val dir2 = java.nio.file.Files.createTempDirectory("scale9-ivfpq").toString
    VectorOps.ivfPqWriteIndex(emb, dir2, nCells = 16, m = 8, codeK = 16,
      iters = 1, coarseIters = 1)
    val (codes2, books2, cents) = VectorOps.ivfPqReadIndex(spark, dir2)
    codes2.persist().count()

    def fetchNormed(ids: Seq[Long]): Seq[(Long, Seq[Double])] =
      emb.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map { r =>
          val v = r.getSeq[Double](1)
          val nrm = math.sqrt(v.map(x => x * x).sum)
          r.getLong(0) -> (if (nrm == 0) v else v.map(_ / nrm))
        }.toSeq

    // plan size must NOT grow with the batch: the shortlist stage's
    // executed-plan text at N=256 stays within noise of N=8, the dist
    // projection is the flat codegen-friendly GetArrayItem chain (no
    // interpreted HOF fold), and the rank filter is a WindowGroupLimit
    val planLens = Seq(8, 64, 256).map { w =>
      val probes = fetchNormed((0L until w.toLong).toSeq)
      val p = VectorOps.pqAdcShortlistBatch(codes, books, probes, 100)
        .queryExecution.executedPlan.toString
      w -> (p.length, p.contains("lut") && !p.contains("aggregate("),
        p.contains("WindowGroupLimit"))
    }
    planLens.foreach { case (w, (len, flat, wgl)) =>
      System.err.println(
        s"[scale9] shortlist plan N=$w len=$len flatDistChain=$flat windowGroupLimit=$wgl")
    }

    def t(tag: String, nProbes: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[scale9] $tag%-22s N=$nProbes%4d rows=$rows%7d $secs%7.1f s  (${secs / nProbes * 1000}%7.1f ms/probe)")
    }

    // shape warmup at the probed parameters
    VectorOps.pqTopKBatch(emb, codes, books, Seq(0L, 1L), k = 10,
      shortlist = 100).count()
    VectorOps.ivfPqTopKBatch(emb, codes2, books2, cents, Seq(0L, 1L),
      k = 10, nProbe = 4, shortlist = 100).count()

    for (w <- Seq(8, 64, 256)) {
      val ids = (0L until w.toLong).toSeq
      t("pqTopKBatch", w) {
        VectorOps.pqTopKBatch(emb, codes, books, ids, k = 10,
          shortlist = 100).count()
      }
    }
    for (w <- Seq(8, 64, 256)) {
      val ids = (0L until w.toLong).toSeq
      t("ivfPqTopKBatch", w) {
        VectorOps.ivfPqTopKBatch(emb, codes2, books2, cents, ids, k = 10,
          nProbe = 4, shortlist = 100).count()
      }
    }

    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir2))

    // k-NN join scaling: exact is O(n²d) spread over the cluster; the
    // cell path's quadratic term is Σ|cell|² — with nCells grown
    // proportionally to the corpus (the IVF deployment contract) the
    // per-cell population stays constant and cell work grows LINEARLY
    // while exact grows quadratically. Replicas are circular shifts of
    // the base vectors (distinct directions, norm-preserving): plain
    // id-shifted copies degenerate ivfCentroids' stride sample into k
    // copies of ONE vector, collapsing every assignment into 3 cells
    // (measured 215 s at 16× before this probe used shifts).
    import org.apache.spark.sql.functions.{col, concat, lit, slice}
    def embTimes(k: Int) = (0 until k).map { i =>
      val v = col("embedding")
      val shifted = if (i == 0) v
        else concat(slice(v, i + 1, 64 - i), slice(v, 1, i))
      emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        shifted.as("embedding"))
    }.reduce(_ unionByName _)
    for ((tag, k) <- Seq(("1x", 1), ("4x", 4), ("16x", 16))) {
      val e = embTimes(k).persist(); val ne = e.count()
      val t0 = System.nanoTime()
      val nex = VectorOps.knnJoinExact(e, 10).count()
      val tExact = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val ncl = VectorOps.knnJoinCell(e, 10, nCells = 16 * k, nAssign = 3)
        .count()
      val tCell = (System.nanoTime() - t1) / 1e9
      System.err.println(
        f"[scale9] knnJoin $tag n=$ne exact rows=$nex $tExact%6.1f s | cell nCells=${16 * k} rows=$ncl $tCell%6.1f s")
      e.unpersist()
    }
    spark.stop()
  }
}
