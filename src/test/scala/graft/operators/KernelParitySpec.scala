package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r13 optimization round moved the PQ/IVF corpus passes (normalize,
  * cell assign, encode) from interpreted HOF expressions into flat-loop
  * kernels (guide §4). Index bytes, search shortlists and every recall
  * gate's booleans stay identical ONLY if the kernels replicate the
  * expressions' IEEE evaluation order and tie-breaks bit-for-bit — this
  * spec pins that parity row-for-row on real data (sf0.001 embeddings)
  * plus the synthetic edge rows the corpus never exercises (zero vector,
  * exact centroid ties). */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("normalizeKernel is bit-equal to the pqNormalize expression (incl. the zero vector)") {
    val withZero = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((100000L, Array.fill(64)(0.0f)))
        .toDF("vec_id", "embedding"))
    val viaExpr = withZero
      .select(col("vec_id"), VectorOps.pqNormalize(col("embedding")).as("nv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaKernel = VectorOps.pqNormalized(withZero)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaKernel.keySet == viaExpr.keySet)
    viaExpr.foreach { case (id, e) =>
      val k = viaKernel(id)
      assert(k.size == e.size && k.indices.forall(i =>
        java.lang.Double.doubleToRawLongBits(k(i)) ==
          java.lang.Double.doubleToRawLongBits(e(i))), s"vec $id differs")
    }
  }

  test("pqEncodeKernel is bit-equal to the pqEncode expression on trained books") {
    val books = VectorOps.pqCodebooks(emb, m = 8, codeK = 16, iters = 2)
    val normed = VectorOps.pqNormalized(emb).persist()
    try {
      val viaExpr = normed
        .select(col("vec_id"), VectorOps.pqEncode(col("nv"), books).as("code"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val b = books.map(_.map(_.toArray).toArray).toArray
      val viaKernel = normed.as[(Long, Array[Double])]
        .collect().map { case (id, v) =>
          id -> VectorOps.pqEncodeKernel(v, b).toSeq }.toMap
      assert(viaKernel == viaExpr)
    } finally normed.unpersist()
  }

  test("pqEncodeKernel keeps the expression's tie-break (equidistant -> smaller code)") {
    // one subspace of dim 2, two centroids equidistant from the probe
    val books = Array(Array(Array(1.0, 0.0), Array(-1.0, 0.0)))
    assert(VectorOps.pqEncodeKernel(Array(0.0, 5.0), books).toSeq == Seq(0))
  }

  test("ivfAssignKernel is bit-equal to the ivfAssign expression on kmeans centroids") {
    val cents = VectorOps.kmeansCentroids(emb, nCells = 16, iters = 2)
    val viaExpr = emb
      .select(col("vec_id"),
        VectorOps.ivfAssign(col("embedding").cast("array<double>"), cents)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ca = cents.map(_.toArray).toArray
    val viaKernel = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .collect().map { case (id, v) =>
        id -> VectorOps.ivfAssignKernel(v, ca) }.toMap
    assert(viaKernel == viaExpr)
  }

  test("ivfAssignKernel keeps the expression's tie-break (equal dot -> larger cell)") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // v equidistant from both centroids: dot = 1.0 each
    assert(VectorOps.ivfAssignKernel(Array(1.0, 1.0), cents) == 1)
  }

  test("ivfAssignTopKernel is bit-equal to the ivfAssignTop expression (order included)") {
    val cents = VectorOps.ivfCentroids(emb, 16)
    val viaExpr = emb
      .select(col("vec_id"),
        VectorOps.ivfAssignTop(col("embedding"), cents, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val ca = cents.map(_.toArray).toArray
    val viaKernel = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .collect().map { case (id, v) =>
        id -> VectorOps.ivfAssignTopKernel(v, ca, 3).toSeq }.toMap
    assert(viaKernel == viaExpr)
  }

  test("ivfAssignTopKernel tie order matches reverse(array_sort): equal sims -> larger cell first") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.5, 0.5))
    // v = (1,1): dots = 1.0, 1.0, 1.0 — all tied
    assert(VectorOps.ivfAssignTopKernel(Array(1.0, 1.0), cents, 2).toSeq ==
      Seq(2, 1))
  }

  test("the brute-force kernel sims are bit-equal to the cosine expression") {
    val probeIds = Seq(0L, 7L, 42L)
    val fetched = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaKernel = VectorOps.bruteForceTopKBatch(emb, probeIds, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // expression replica of the old crossJoin + HOF-cosine leg
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id").asc)
    val probesDf = probeIds.map(p => p -> fetched(p)).toDF("probe_id", "pvec")
    val viaExpr = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(probesDf))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", VectorOps.cosine(col("embedding"), col("pvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("probe_id"), col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaKernel.keySet == viaExpr.keySet)
    viaExpr.foreach { case (k2, e) =>
      assert(java.lang.Double.doubleToRawLongBits(viaKernel(k2)) ==
        java.lang.Double.doubleToRawLongBits(e), s"$k2 differs")
    }
  }

  test("a written PQ index round-trips identical codes through the kernel path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kparity").toString
    try {
      val books = VectorOps.pqWriteIndex(emb, dir, m = 8, codeK = 16, iters = 1)
      val (codes, storedBooks) = VectorOps.pqReadIndex(spark, dir)
      assert(storedBooks == books)
      val normed = VectorOps.pqNormalized(emb)
      val viaExpr = normed
        .select(col("vec_id"), VectorOps.pqEncode(col("nv"), books).as("code"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val stored = codes.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(stored == viaExpr)
    } finally graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
