package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity operators for embedding columns (`ARRAY<FLOAT>`):
  * brute-force cosine top-k (exact baseline) and a random-hyperplane LSH
  * bucket path for scale.
  *
  * Everything is native Catalyst expressions (`zip_with` + `aggregate`) —
  * whole-stage-codegen'd, no UDFs, fully distributed. At 100 TB the exact
  * path is a single scan + TakeOrderedAndProject (per-partition top-k
  * heaps, driver merges k×partitions rows); the LSH path prunes the scan
  * to matching buckets first.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as a sequential left fold — deterministic evaluation order,
    * so results are bit-stable across partitionings and match any oracle
    * that folds left in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** All-pairs near-duplicates by cosine ≥ threshold. Exact; the O(n²)
    * block-nested-loop join is the correctness baseline — the LSH variant
    * below is the scale path (bucket-join instead of cross-join). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-1, 1] — no RNG, so signatures are stable
    * across runs and cluster layouts. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001)).cast("double") - 1000000.0) / 1000000.0

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * BIGINT. Vectors with high cosine similarity collide with high
    * probability; bucket-join replaces the cross-join at scale. */
  def lshSignature(vec: Column, planes: Int): Column = {
    require(planes <= 63, "signature packs into one BIGINT")
    val bits: Seq[Column] = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH prebucketing: candidates = vectors sharing at least one
    * band of the signature with the probe; exact cosine re-rank within
    * candidates. Approximate — recall measured in tests vs brute force. */
  def lshTopK(emb: DataFrame, probeId: Long, k: Int,
              planes: Int = 32, bands: Int = 16): DataFrame = {
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val withSig = emb.withColumn("sig", lshSignature(col("embedding"), planes))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
    }
    val exploded = withSig
      .withColumn("band_key", explode(array(bandCols: _*)))
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
  def ivfCellId(vec: Column, nCells: Int): Column = {
    val sims = (0 until nCells).map { c =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(1000 + c, i)),
        lit(0.0), (acc, x) => acc + x)
      struct(proj.as("sim"), lit(c).as("cell"))
    }
    greatest(sims: _*).getField("cell")
  }
}
