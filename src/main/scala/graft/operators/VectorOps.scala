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

  /** Kernel twin of the `cosine(embedding, pvec)` scoring leg: one
    * corpus scan emitting (probe_id, vec_id, sim) for every probe (self
    * excluded), probes riding in the task closure. sim folds exactly as
    * [[cosine]] does — dot left-to-right, then ÷ (‖a‖·‖b‖) — so every
    * double is bit-equal to the expression form (KernelParitySpec).
    * Probes arrive RAW (unnormalized); their norms precompute once per
    * task, which is the same fold the expression re-ran per row. */
  private def cosineSimsKernel(emb: DataFrame,
                               probes: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ps: Array[(Long, Array[Double], Double)] = probes.map { case (p, v) =>
      val a = v.toArray
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      (p, a, math.sqrt(s))
    }.toArray
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          var na = 0.0; var i = 0
          while (i < v.length) { na += v(i) * v(i); i += 1 }
          val sqna = math.sqrt(na)
          ps.iterator.filter(_._1 != id).map { case (pid, pv, pn) =>
            var d = 0.0; var j = 0
            while (j < v.length) { d += v(j) * pv(j); j += 1 }
            (pid, id, d / (sqna * pn))
          }
        }
      }.toDF("probe_id", "vec_id", "sim")
  }

  /** Exact top-k nearest neighbours of `probeId`'s vector by cosine.
    * Returns (vec_id, rank), rank 1..k, ties broken by vec_id.
    * One driver lookup fetches the probe, then a single distributed
    * scan scores the corpus through the cosine KERNEL (the interpreted
    * HOF form paid ~100× per row — guide §4); TakeOrderedAndProject
    * keeps the top-k without a global sort. */
  def bruteForceTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe: Seq[Double] = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    cosineSimsKernel(emb, Seq(probeId -> probe))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id").asc)).as("rank"))
  }

  /** Exact top-k for N probes in ONE corpus scan (the oracle side of
    * batched ANN gates, and the honest exact baseline for multi-needle
    * search). Probes travel in the scoring kernel's closure — constant
    * plan at any batch width, one flat-loop cosine per (row, probe)
    * (the broadcast-joined HOF-expression form this replaces paid the
    * interpreter per pair). Per-probe top-k via the same
    * WindowGroupLimit shape the PQ shortlist uses. Returns
    * (probe_id, vec_id, sim). */
  def bruteForceTopKBatch(emb: DataFrame, probeIds: Seq[Long],
                          k: Int): DataFrame = {
    require(probeIds.nonEmpty, "need at least one probe")
    val fetched = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](0 + 1)).toMap
    val missing = probeIds.filterNot(fetched.contains)
    require(missing.isEmpty, s"unknown probe id(s): ${missing.mkString(",")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id").asc)
    cosineSimsKernel(emb, probeIds.map(p => p -> fetched(p)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"))
  }

  /** All-pairs near-duplicates by cosine ≥ threshold. EXACT.
    *
    * An exact low-threshold cosine join is inherently quadratic in
    * candidate pairs (at θ=0.45 no LSH family separates true pairs from
    * the bulk with recall ≈ 1 — measured on this data: per-bit hyperplane
    * collision 0.65 for true pairs vs 0.53 for random ones). A
    * BroadcastNestedLoopJoin pays row-materialization per pair (two
    * 64-float arrays copied 2M times); the kernel below instead
    * broadcasts the vector matrix once and runs a tight flat-array loop
    * per DISTRIBUTED row — the dot-product kernel the codegen'd join
    * can't reach (~10× faster at n=2000).
    *
    * Scale envelope: the broadcast is n·d floats (~256 MB at n=1M,
    * d=64) — beyond that, exact all-pairs is infeasible ANYWHERE and the
    * scale path is per-[[ivfCellId]]-cell kernels or [[lshTopK]] with
    * measured recall. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs: Array[(Long, Array[Float])] = emb
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(vecs)
    val n = vecs.length
    val thr = threshold
    spark.range(0, n.toLong, 1,
        numPartitions = spark.sparkContext.defaultParallelism * 2)
      .mapPartitions { it =>
        val arr = bc.value
        val m = arr.length
        val dims = if (m == 0) 0 else arr(0)._2.length
        val norms = new Array[Double](m)
        var k = 0
        while (k < m) {
          val v = arr(k)._2
          var s = 0.0; var d = 0
          while (d < dims) { s += v(d).toDouble * v(d).toDouble; d += 1 }
          norms(k) = math.sqrt(s); k += 1
        }
        it.flatMap { iL =>
          val i = iL.toInt
          val vi = arr(i)._2
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var j = i + 1
          while (j < m) {
            val vj = arr(j)._2
            var s = 0.0; var d = 0
            while (d < dims) { s += vi(d).toDouble * vj(d).toDouble; d += 1 }
            if (s >= thr * norms(i) * norms(j)) out += ((arr(i)._1, arr(j)._1))
            j += 1
          }
          out
        }
      }.toDF("id_a", "id_b")
  }

  /** Pure-Catalyst variant of [[cosineNearDupPairs]] (BNLJ + static
    * codegen'd dot) — kept as a cross-check in tests. */
  def cosineNearDupPairsSql(emb: DataFrame, threshold: Double): DataFrame = {
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
    * across runs and cluster layouts. Computed driver-side into constant
    * array literals: a statically-expanded planes×dim expression tree
    * (2048 nodes at 32×64) blows up Janino codegen compile time, so the
    * signature instead folds a SMALL higher-order expression over one 2-D
    * constant — interpreted per row, which is the right trade for a
    * write-once signature column.
    *
    * md5-derived (first 60 bits of md5("plane:dim")) so any engine can
    * replicate the matrix exactly — the ann_lsh oracle rebuilds it in
    * DuckDB SQL, the same move that made dedup_simhash hash-matchable. */
  private[operators] def planeComponent(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$plane:$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.take(15), 16) // 60 bits, positive
    ((v % 2000001L).toDouble - 1000000.0) / 1000000.0
  }

  private def planeMatrix(planes: Int, dim: Int): Column =
    typedLit((0 until planes).map(p => (0 until dim).map(i => planeComponent(p, i))))

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * BIGINT. Vectors with high cosine similarity collide with high
    * probability; bucket-join replaces the cross-join at scale. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    require(planes <= 63, "signature packs into one BIGINT")
    val mat = planeMatrix(planes, dim)
    val bits = zip_with(mat, sequence(lit(0), lit(planes - 1)),
      (plane, p) => {
        val proj = aggregate(zip_with(vec, plane,
          (x, w) => x.cast("double") * w), lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      })
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Kernel twin of [[lshSignature]] (guide §4, same recipe as the PQ/IVF
    * kernels below): per plane a flat left-to-right dot product, sign bit
    * packed at position p — bit-equal to the expression incl. the
    * null/NaN edges: a zip_with length mismatch gives a null projection
    * (bit 0), and the `proj >= 0` comparison is Spark SQL's TOTAL double
    * ordering, where NaN ≥ 0 and -0.0 ≥ 0.0 are both true — `!(proj < 0)`
    * in primitive terms, NOT `proj >= 0` (KernelParitySpec edge rows). */
  private[operators] def lshSigKernel(v: Array[Double],
                                      mat: Array[Array[Double]]): Long = {
    if (v == null) return 0L
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val plane = mat(p)
      if (v.length == plane.length) { // zip_with length mismatch ⇒ null proj ⇒ bit 0
        var proj = 0.0; var i = 0
        while (i < plane.length) { proj += v(i) * plane(i); i += 1 }
        if (!(proj < 0)) sig |= 1L << p // Spark total ordering: NaN ≥ 0
      }
      p += 1
    }
    sig
  }

  /** (vec_id, embedding, sig) — the corpus-wide signature pass of
    * [[lshTopK]] through [[lshSigKernel]] instead of the per-row
    * interpreted `zip_with`/`aggregate` fold (guide §4: no non-codegen
    * expressions on corpus passes; the expression form stays for
    * needle-bounded use and the oracle-replayable tests). */
  private[operators] def lshSigned(emb: DataFrame, planes: Int,
                                   dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val mat = Array.tabulate(planes, dim)((p, i) => planeComponent(p, i))
    emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val dv = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { dv(i) = v(i).toDouble; i += 1 }
        (id, v, lshSigKernel(dv, mat))
      }).toDF("vec_id", "embedding", "sig")
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
    val withSig = lshSigned(emb, planes, dim)
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
    * (partition) key — the 100 TB layout story. Same constant-matrix
    * fold as [[lshSignature]] (write-once column; keep the tree small). */
  def ivfCellId(vec: Column, nCells: Int, dim: Int): Column = {
    val mat = typedLit((0 until nCells).map(c =>
      (0 until dim).map(i => planeComponent(1000 + c, i))))
    val scored = zip_with(mat, sequence(lit(0), lit(nCells - 1)),
      (centroid, c) => struct(
        aggregate(zip_with(vec, centroid, (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x).as("sim"),
        c.as("cell")))
    array_max(scored).getField("cell")
  }

  /** Data-sampled IVF centroids: every (n/nCells)-th vector by id,
    * L2-normalized — the deterministic zero-iteration coarse quantizer
    * (real deployments k-means these; sampling keeps the oracle exact and
    * already tracks the data distribution, unlike hash-derived
    * directions). Driver-side: nCells · dim doubles. */
  def ivfCentroids(emb: DataFrame, nCells: Int,
                   n0: Option[Long] = None): Seq[Seq[Double]] = {
    val n = n0.getOrElse(emb.count())
    val stride = math.max(1L, n / nCells)
    emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(nCells)
      .select(col("embedding").cast("array<double>")).collect()
      .map { r =>
        val v = r.getSeq[Double](0)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        if (nrm == 0) v else v.map(_ / nrm)
      }.toSeq
  }

  /** Cell assignment against explicit centroids (argmax cosine — the
    * centroids are unit vectors, so max dot suffices). */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val mat = typedLit(centroids)
    val scored = zip_with(mat, sequence(lit(0), lit(centroids.size - 1)),
      (centroid, c) => struct(
        aggregate(zip_with(vec, centroid, (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x).as("sim"),
        c.as("cell")))
    array_max(scored).getField("cell")
  }

  /** The probe's `nProbe` best cells — driver-side on the one probe
    * vector (the query-time half of the IVF protocol). */
  def ivfProbeCells(vec: Seq[Double], centroids: Seq[Seq[Double]],
                    nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (cen, c) =>
      (vec.indices.map(i => vec(i) * cen(i)).sum, c)
    }.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)

  /** Vectors every deterministic trainer sees: a stride sample of at
    * most `trainN` rows, id-ordered — the FAISS discipline (quantizers
    * train on a bounded sample, never the corpus), and the reason
    * training costs ZERO corpus passes beyond one bounded collect. */
  private def trainSample(df: DataFrame, vecExpr: Column,
                          trainN: Int,
                          n0: Option[Long] = None): Array[Array[Double]] = {
    val n = n0.getOrElse(df.count())
    val stride = math.max(1L, n / trainN)
    df.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(trainN)
      .select(vecExpr).collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Lloyd-refined centroids: the deterministic [[ivfCentroids]] seeds,
    * then `iters` k-means rounds DRIVER-SIDE over a bounded
    * [[trainSample]] — tight flat loops instead of one corpus-wide
    * assign + mean-aggregate JOB per round (r7 shape: at 100 TB that
    * was `iters` extra passes over the data for a model-sized
    * artifact; at gate scale it was most of the coarse-training wall).
    * Assignment replicates [[ivfAssign]] exactly: argmax dot with
    * left-to-right sums, ties to the LARGER cell. Empty cells keep
    * their previous centroid; means are L2-normalized. Refined
    * centroids raise cell recall (pinned in VectorOpsSpec) without
    * changing any plan shape — the engine-portable gates keep the
    * zero-iteration sample so their oracles stay exact. */
  def kmeansCentroids(emb: DataFrame, nCells: Int,
                      iters: Int = 2, trainN: Int = 16384): Seq[Seq[Double]] = {
    // one count serves both deterministic stride samplers (same frame,
    // same n — the second count job was pure repetition)
    val n = emb.count()
    var cen: Array[Array[Double]] =
      ivfCentroids(emb, nCells, Some(n)).map(_.toArray).toArray
    if (iters > 0) {
      val train = trainSample(emb, col("embedding").cast("array<double>"),
        trainN, Some(n))
      val dim = if (train.isEmpty) 0 else train.head.length
      for (_ <- 0 until iters) {
        val sums = Array.fill(cen.length, dim)(0.0)
        val cnts = new Array[Long](cen.length)
        train.foreach { v =>
          var best = 0; var bestS = Double.NegativeInfinity
          var c = 0
          while (c < cen.length) {
            var s = 0.0; var i = 0
            while (i < dim) { s += v(i) * cen(c)(i); i += 1 }
            if (s >= bestS) { bestS = s; best = c } // ties -> larger cell
            c += 1
          }
          var i = 0
          while (i < dim) { sums(best)(i) += v(i); i += 1 }
          cnts(best) += 1
        }
        cen = cen.zipWithIndex.map { case (old, c) =>
          if (cnts(c) == 0) old
          else {
            val mean = Array.tabulate(dim)(i => sums(c)(i) / cnts(c))
            val nrm = math.sqrt(mean.map(x => x * x).sum)
            if (nrm == 0) old else mean.map(_ / nrm)
          }
        }
      }
    }
    cen.map(_.toSeq).toSeq
  }

  /** The `nAssign` nearest cells per vector (multi-probe assignment):
    * sort the (sim, cell) structs descending — struct ordering makes
    * ties resolve to the larger cell, identical to [[ivfAssign]]'s
    * argmax — and keep the first `nAssign` cell ids. */
  def ivfAssignTop(vec: Column, centroids: Seq[Seq[Double]],
                   nAssign: Int): Column = {
    val mat = typedLit(centroids)
    val scored = zip_with(mat, sequence(lit(0), lit(centroids.size - 1)),
      (centroid, c) => struct(
        aggregate(zip_with(vec, centroid, (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x).as("sim"),
        c.as("cell")))
    transform(slice(reverse(array_sort(scored)), 1, nAssign),
      s => s.getField("cell"))
  }

  /** Cluster-bucketed embedding near-dup — the 100 TB scale path for
    * [[cosineNearDupPairs]] (SemDeDup's contract: semantic duplicates
    * share a coarse cluster, so pair search runs only WITHIN cells and
    * the quadratic term shrinks from n² to Σ|cell|²; nCells grows with
    * the corpus). Each vector lands in its `nAssign` nearest cells
    * (multi-probe — recovers boundary pairs the single-cell form loses;
    * work bound becomes nAssign²·n²/nCells for balanced cells).
    *
    * Assignment is one interpreted pass against deterministic
    * centroids — DEFAULT [[kmeansCentroids]] (Lloyd-refined; the raw
    * [[ivfCentroids]] stride sample is available via
    * `centroidsOverride` for engine-replayable oracles, but as a
    * DEPLOYMENT default it degenerates on replicated corpora: every
    * stride hit can land in one replica's direction and the cell split
    * collapses to 3·n² — SCALE.md measured 215.8 s vs 7.7 s on the
    * r8 k-NN probe); pairs are then resolved by ONE repartition on
    * the cell key and a per-partition flat-array dot kernel — the same
    * move as [[cosineNearDupPairs]], because a shuffle JOIN would copy
    * two 64-float arrays into every candidate pair row (measured 6 s
    * vs 1 s at 1M pairs). The kernel's fold order is identical to
    * [[dotN]]'s left-to-right double chain, so the pair set is
    * bit-equal to the declarative form and the DuckDB oracle. Memory
    * per task is the resident cells' vectors — bounded because nCells
    * grows with the corpus (the cell-fits-in-executor contract every
    * IVF layout already has). Pairs sharing no assigned cell are
    * forfeited by contract — recall vs the exact operator is pinned in
    * VectorOpsSpec, and the `emb_neardup_cell` gate replays the whole
    * pipeline (centroid choice, top-2 assignment, threshold) in the
    * oracle. Returns distinct (id_a, id_b). */
  def cellNearDupPairs(emb: DataFrame, threshold: Double,
                       nCells: Int = 16, nAssign: Int = 2,
                       centroidsOverride: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = centroidsOverride.getOrElse(kmeansCentroids(emb, nCells))
    val thr = threshold
    assignedCells(emb, centroids, nAssign)
      .repartition(col("cell"))
      .mapPartitions { it =>
        val byCell = scala.collection.mutable.LinkedHashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]]
        it.foreach { case (c, id, v) =>
          var s = 0.0; var d = 0
          while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
          byCell.getOrElseUpdate(c,
            scala.collection.mutable.ArrayBuffer.empty) += ((id, v, math.sqrt(s)))
        }
        byCell.valuesIterator.flatMap { buf =>
          val arr = buf.toArray
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var i = 0
          while (i < arr.length) {
            val (ida, va, na) = arr(i)
            var j = i + 1
            while (j < arr.length) {
              val (idb, vb, nb) = arr(j)
              var s = 0.0; var d = 0
              while (d < va.length) { s += va(d).toDouble * vb(d).toDouble; d += 1 }
              if (s >= thr * na * nb)
                out += (if (ida < idb) (ida, idb) else (idb, ida))
              j += 1
            }
            i += 1
          }
          out
        }
      }.toDF("id_a", "id_b").distinct()
  }

  /** Exact all-pairs k-NN JOIN: for EVERY vector its k nearest
    * neighbours by cosine — the SemDeDup / kNN-LM / retrieval-training
    * primitive where, unlike the probe searches above, every row is a
    * query. Same broadcast-matrix envelope as [[cosineNearDupPairs]]
    * (n·d floats broadcast once; beyond that the scale path is
    * [[knnJoinCell]]): per DISTRIBUTED row one flat dot loop over the
    * matrix with an O(k) insertion top-k — O(n²d) work spread over the
    * cluster, never materialized as pairs. The fold is the same
    * sequential s += vᵢ·vⱼ as every kernel here, so sims (and therefore
    * ranks, tie-broken by neighbour id) are bit-reproducible against a
    * left-folding oracle. Returns (vec_id, nb_id, rank), rank 1..k. */
  def knnJoinExact(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs: Array[(Long, Array[Float])] = emb
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(vecs)
    val kk = k
    spark.range(0, vecs.length.toLong, 1,
        numPartitions = spark.sparkContext.defaultParallelism * 2)
      .mapPartitions { it =>
        val arr = bc.value
        val m = arr.length
        val dims = if (m == 0) 0 else arr(0)._2.length
        val norms = new Array[Double](m)
        var t = 0
        while (t < m) {
          val v = arr(t)._2
          var s = 0.0; var d = 0
          while (d < dims) { s += v(d).toDouble * v(d).toDouble; d += 1 }
          norms(t) = math.sqrt(s); t += 1
        }
        it.flatMap { iL =>
          val i = iL.toInt
          val vi = arr(i)._2
          val bestSim = Array.fill(kk)(Double.NegativeInfinity)
          val bestId = Array.fill(kk)(Long.MaxValue)
          var j = 0
          while (j < m) {
            if (j != i) {
              val vj = arr(j)._2
              var s = 0.0; var d = 0
              while (d < dims) { s += vi(d).toDouble * vj(d).toDouble; d += 1 }
              val sim = s / (norms(i) * norms(j))
              val id = arr(j)._1
              // insertion by (sim desc, id asc)
              var p = kk - 1
              if (sim > bestSim(p) || (sim == bestSim(p) && id < bestId(p))) {
                while (p > 0 && (sim > bestSim(p - 1) ||
                    (sim == bestSim(p - 1) && id < bestId(p - 1)))) {
                  bestSim(p) = bestSim(p - 1); bestId(p) = bestId(p - 1)
                  p -= 1
                }
                bestSim(p) = sim; bestId(p) = id
              }
            }
            j += 1
          }
          (0 until kk).iterator
            .filter(r => bestSim(r) > Double.NegativeInfinity)
            .map(r => (arr(i)._1, bestId(r), (r + 1).toLong))
        }
      }.toDF("vec_id", "nb_id", "rank")
  }

  /** Cell-bucketed k-NN join — the 100 TB path past [[knnJoinExact]]'s
    * broadcast envelope (the same SemDeDup contract as
    * [[cellNearDupPairs]]: near neighbours share a coarse cell, so each
    * vector searches only its `nAssign` cells and work is
    * nAssign²·Σ|cell|², never n²). One explode + ONE cell-keyed
    * repartition + per-partition flat-array top-k kernels, then
    * per-vector candidates from different cells merge under one
    * (dedup → rank) window. Approximate: neighbours sharing no assigned
    * cell are forfeited — recall vs exact is measured and gated
    * (ann_knn_cell_recall) rather than assumed. Default centroids are
    * [[kmeansCentroids]] (Lloyd) — see [[cellNearDupPairs]] for why the
    * stride sample is an override, not a default. */
  def knnJoinCell(emb: DataFrame, k: Int, nCells: Int = 16,
                  nAssign: Int = 2,
                  centroidsOverride: Option[Seq[Seq[Double]]] = None)
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = centroidsOverride.getOrElse(kmeansCentroids(emb, nCells))
    val kk = k
    val perCell = assignedCells(emb, centroids, nAssign)
      .repartition(col("cell"))
      .mapPartitions { it =>
        val byCell = scala.collection.mutable.LinkedHashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]]
        it.foreach { case (c, id, v) =>
          var s = 0.0; var d = 0
          while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
          byCell.getOrElseUpdate(c,
            scala.collection.mutable.ArrayBuffer.empty) += ((id, v, math.sqrt(s)))
        }
        byCell.valuesIterator.flatMap { buf =>
          val arr = buf.toArray
          arr.indices.iterator.flatMap { i =>
            val (ida, va, na) = arr(i)
            val bestSim = Array.fill(kk)(Double.NegativeInfinity)
            val bestId = Array.fill(kk)(Long.MaxValue)
            var j = 0
            while (j < arr.length) {
              if (j != i) {
                val (idb, vb, nb) = arr(j)
                var s = 0.0; var d = 0
                while (d < va.length) { s += va(d).toDouble * vb(d).toDouble; d += 1 }
                val sim = s / (na * nb)
                var p = kk - 1
                if (sim > bestSim(p) || (sim == bestSim(p) && idb < bestId(p))) {
                  while (p > 0 && (sim > bestSim(p - 1) ||
                      (sim == bestSim(p - 1) && idb < bestId(p - 1)))) {
                    bestSim(p) = bestSim(p - 1); bestId(p) = bestId(p - 1)
                    p -= 1
                  }
                  bestSim(p) = sim; bestId(p) = idb
                }
              }
              j += 1
            }
            (0 until kk).iterator
              .filter(r => bestSim(r) > Double.NegativeInfinity)
              .map(r => (ida, bestId(r), bestSim(r)))
          }
        }
      }.toDF("vec_id", "nb_id", "sim")
    // a pair seen from two shared cells carries the SAME sim (identical
    // fold) — dedupe, then one global per-vector rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nb_id").asc)
    perCell.distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("nb_id"), col("rank").cast("long").as("rank"))
  }

  /** ANN via IVF cells: scan ONLY the probe's `nProbe` nearest cells
    * (partition pruning at the lake layout level — cell id is the
    * clustering key), exact cosine re-rank within them. Approximate:
    * recall depends on how many true neighbours land outside the probed
    * cells; gated as a recall row vs [[bruteForceTopK]]. */
  def ivfTopK(emb: DataFrame, probeId: Long, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = ivfCentroids(emb, nCells)
    val probe: Seq[Double] = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val cells = ivfProbeCells(probe, centroids, nProbe)
    cosineSimsKernel(
        withCellKernel(emb, centroids)
          .filter(col("cell").isin(cells: _*))
          .select("vec_id", "embedding"),
        Seq(probeId -> probe))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "sim")
  }

  // ---- Product quantization (PQ) ------------------------------------
  // The STORAGE half of billion-scale ANN: each dim-float vector is
  // written once as m small codes (argmin centroid per subspace), and
  // queries scan ONLY the code column with an asymmetric-distance (ADC)
  // lookup table — at dim=768/m=96 that is a 32× smaller scan than the
  // raw vectors, which is what makes exhaustive re-ranking affordable
  // at 100 TB. Vectors are L2-normalized first so subspace-L2 ADC ranks
  // like cosine (for unit vectors ‖a−b‖² = 2 − 2·cos).

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum

  private def normalizeVec(v: Seq[Double]): Seq[Double] = {
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0) v else v.map(_ / nrm)
  }

  /** Per-subspace codebooks: a deterministic stride sample seeds
    * `codeK` centroids per subspace (same scheme as [[ivfCentroids]]),
    * then `iters` Lloyd rounds refine EVERY subspace at once — one
    * (subspace, code, component)-keyed mean aggregate per round
    * (map-side combined; the collect is m·codeK·dsub doubles, a
    * model-sized materialization). Raw sampled centroids quantize badly
    * (measured recall 0.1-0.3); two Lloyd rounds are what make PQ
    * usable, exactly as in production PQ training. Empty codes keep
    * their previous centroid. */
  def pqCodebooks(emb: DataFrame, m: Int, codeK: Int,
                  iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val normed = pqNormalized(emb).persist()
    try pqCodebooksFromNormed(normed, m, codeK, iters)
    finally normed.unpersist()
  }

  /** Training over an already-materialized normalized frame — shared
    * with [[pqTopKReranked]] so one persisted pass feeds training AND
    * the code scan instead of re-shuffling the corpus per stage.
    *
    * Lloyd rounds run DRIVER-SIDE over a bounded [[trainSample]] (the
    * FAISS discipline; see [[kmeansCentroids]]): the r7 shape paid one
    * corpus-wide encode + (subspace, code, component)-mean JOB per
    * round for a model-sized artifact — at gate scale that was most of
    * every index build's wall, at 100 TB it is `iters` needless corpus
    * passes. Seeds are the same deterministic stride rows as before
    * (positions 0, n/codeK, … of the id-ordered sample — identical
    * vectors when ids are contiguous); per-round assignment replicates
    * [[pqEncode]] exactly (left-to-right (x−w)² sums, ties to the
    * smaller code); empty codes keep their previous centroid. */
  private def pqCodebooksFromNormed(normed: DataFrame, m: Int, codeK: Int,
                                    iters: Int,
                                    trainN: Int = 16384): Seq[Seq[Seq[Double]]] = {
    val train = trainSample(normed, col("nv"), trainN)
    require(train.nonEmpty, "empty embedding table")
    val dim = train.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val seedStride = math.max(1, train.length / codeK)
    val seeds = (0 until codeK).map(c =>
      train(math.min(c * seedStride, train.length - 1)))
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      seeds.map(v =>
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)).toArray)
    for (_ <- 0 until iters) {
      val sums = Array.fill(m, codeK, dsub)(0.0)
      val cnts = Array.fill(m, codeK)(0L)
      train.foreach { v =>
        var j = 0
        while (j < m) {
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < codeK) {
            var dd = 0.0; var i = 0
            while (i < dsub) {
              val d = v(j * dsub + i) - books(j)(c)(i); dd += d * d; i += 1
            }
            if (dd < bestD) { bestD = dd; best = c } // ties -> smaller code
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(j)(best)(i) += v(j * dsub + i); i += 1 }
          cnts(j)(best) += 1
          j += 1
        }
      }
      books = Array.tabulate(m)(j => Array.tabulate(codeK)(c =>
        if (cnts(j)(c) == 0) books(j)(c)
        else Array.tabulate(dsub)(i => sums(j)(c)(i) / cnts(j)(c))))
    }
    books.map(_.map(_.toSeq: Seq[Double]).toSeq: Seq[Seq[Double]]).toSeq
  }

  /** L2-normalization expression. CAUTION: never feed this directly
    * into the argmin trees below — interpreted HOF evaluation
    * re-computes the subtree once per centroid per subspace (measured:
    * ~0.5M redundant ops PER VECTOR), which is why the PQ paths
    * materialize the normalized column behind a shuffle barrier first
    * ([[pqNormalized]]). */
  private[operators] def pqNormalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    transform(vec,
      x => when(norm === 0.0, x.cast("double"))
        .otherwise(x.cast("double") / norm))
  }

  // ---- Kernel twins of the corpus-pass expressions -------------------
  // The HOF expressions above/below (pqNormalize / pqEncode / ivfAssign)
  // are the right tool on model-sized or needle-bounded frames, but on a
  // CORPUS-WIDE pass the per-row interpreter overhead dominates the
  // arithmetic by orders of magnitude (guide §4: keep non-codegen
  // expressions off hot paths; measured at sf0.1: the normalize stage of
  // one index build ran 1.8-4.2 s and the encode stage 0.6-0.7 s where
  // the same arithmetic in a flat-loop kernel is ~10 ms). Each kernel
  // replicates its expression twin's IEEE evaluation order EXACTLY
  // (left-to-right folds, identical tie-breaks: encode ties -> smaller
  // code, assign ties -> larger cell), so codes/cells/norms are
  // bit-equal — pinned row-for-row by KernelParitySpec.

  /** Kernel twin of [[pqNormalize]]: x / sqrt(Σx²), left-to-right sum,
    * zero-norm vectors pass through. */
  private[operators] def normalizeKernel(v: Array[Double]): Array[Double] = {
    if (v == null) return null
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(s)
    if (nrm == 0) v
    else {
      val out = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { out(j) = v(j) / nrm; j += 1 }
      out
    }
  }

  /** Kernel twin of [[pqEncode]] — the same per-subspace argmin loop
    * [[pqCodebooksFromNormed]] trains with. */
  private[operators] def pqEncodeKernel(
      v: Array[Double], books: Array[Array[Array[Double]]]): Array[Int] = {
    if (v == null) return null
    val m = books.length
    val dsub = books(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < books(j).length) {
        var dd = 0.0; var i = 0
        while (i < dsub) {
          val d = v(j * dsub + i) - books(j)(c)(i); dd += d * d; i += 1
        }
        if (dd < bestD) { bestD = dd; best = c } // ties -> smaller code
        c += 1
      }
      out(j) = best; j += 1
    }
    out
  }

  /** Kernel twin of [[ivfAssign]] — the same argmax-dot loop
    * [[kmeansCentroids]] refines with. Ordering is
    * java.lang.Double.compare (ties -> larger cell), matching array_max's
    * struct ordering exactly: NaN greatest and -0.0 < 0.0 — a primitive
    * `>=` would never select a NaN sim and would treat ±0.0 as a tie,
    * diverging from the expression on those edges (ADVICE r13). */
  private[operators] def ivfAssignKernel(
      v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestS = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * cents(c)(i); i += 1 }
      if (java.lang.Double.compare(s, bestS) >= 0) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Kernel twin of [[ivfAssignTop]]: the top-`nAssign` cells in
    * (sim desc, cell desc) order — exactly
    * `reverse(array_sort(struct(sim, cell)))`, including Spark's
    * NaN-greatest double ordering (java.lang.Double.compare). */
  private[operators] def ivfAssignTopKernel(
      v: Array[Double], cents: Array[Array[Double]],
      nAssign: Int): Array[Int] = {
    val n = cents.length
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * cents(c)(i); i += 1 }
      sims(c) = s; c += 1
    }
    Array.tabulate(n)(identity).sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(sims(a), sims(b))
      if (cmp != 0) cmp > 0 else a > b
    }.take(nAssign)
  }

  /** (cell, vec_id, v) multi-probe cell assignment as a corpus-pass
    * KERNEL — the explode([[ivfAssignTop]]) projection the cell-bucketed
    * ops (SemDeDup pairs, cell k-NN join) shuffle on, minus the
    * per-row HOF interpreter (guide §4). Emission order per vector is
    * the explode order (best cell first); assignments are bit-equal to
    * the expression (KernelParitySpec). */
  private def assignedCells(emb: DataFrame, centroids: Seq[Seq[Double]],
                            nAssign: Int)
      : org.apache.spark.sql.Dataset[(Int, Long, Array[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ca = centroids.map(_.toArray).toArray
    emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        val dv = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { dv(i) = v(i).toDouble; i += 1 }
        ivfAssignTopKernel(dv, ca, nAssign).iterator.map(c => (c, id, v))
      })
      .toDF("cell", "vec_id", "v")
      .as[(Int, Long, Array[Float])]
  }

  /** (vec_id, embedding, cell) — single-cell [[ivfAssign]] as a
    * corpus-pass KERNEL (the expression form stays for needle-bounded
    * frames and the oracle-replayable tests). */
  def withCellKernel(emb: DataFrame,
                     centroids: Seq[Seq[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ca = centroids.map(_.toArray).toArray
    emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val dv = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { dv(i) = v(i).toDouble; i += 1 }
        (id, v, ivfAssignKernel(dv, ca))
      }).toDF("vec_id", "embedding", "cell")
  }

  /** The stored-codes column from an already-normalized frame via the
    * encode KERNEL — one deserialized flat-array pass, shared by the
    * index writers and the on-the-fly ADC scan. Column layout and every
    * code value are identical to the old `select(pqEncode(nv))`
    * projection (KernelParitySpec). */
  private def encodedCodes(normed: DataFrame,
                           books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val spark = normed.sparkSession
    import spark.implicits._
    val b = books.map(_.map(_.toArray).toArray).toArray
    normed.as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, pqEncodeKernel(v, b)) })
      .toDF("vec_id", "code")
  }

  /** (vec_id, nv) with nv MATERIALIZED through a shuffle barrier — the
    * barrier stops projection collapse from re-inlining the
    * normalization into every downstream consumer, and (since the
    * kernel rework) puts the normalize pass ABOVE the exchange so it
    * runs at shuffle parallelism instead of single-file scan
    * parallelism. At scale this is the write-once normalized layout PQ
    * deployments store anyway. */
  private[operators] def pqNormalized(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .repartition(col("vec_id"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) => (id, normalizeKernel(v)) })
      .toDF("vec_id", "nv")
  }

  /** The m-code PQ column from an ALREADY-normalized vector: per
    * subspace the argmin-L2 centroid id; struct ordering over
    * (dist, id) makes ties resolve to the smaller id on every engine.
    * Cost per row is m·codeK·dsub multiply-adds — nothing recomputed. */
  def pqEncode(vn: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.size
    val dsub = codebooks.head.head.size
    val codes = (0 until m).map { j =>
      val sub = slice(vn, j * dsub + 1, dsub)
      val scored = zip_with(typedLit(codebooks(j)),
        sequence(lit(0), lit(codebooks(j).size - 1)),
        (cen, c) => struct(
          aggregate(zip_with(sub, cen, (x, w) => (x - w) * (x - w)),
            lit(0.0), (acc, x) => acc + x).as("dist"),
          c.as("c")))
      array_min(scored).getField("c")
    }
    array(codes: _*)
  }

  /** The ADC shortlist stage shared by [[pqTopK]] and
    * [[pqTopKReranked]]: probe's per-(subspace, centroid) squared
    * distances become a driver-side lookup table; each stored vector's
    * approximate distance is m table lookups summed over its codes —
    * the raw vectors are never read. TakeOrderedAndProject, ascending
    * distance. */
  private def pqAdcShortlist(normed: DataFrame, probeN: Seq[Double],
                             books: Seq[Seq[Seq[Double]]], probeId: Long,
                             n: Int): DataFrame = {
    val m = books.size
    val dsub = probeN.size / m
    val lut: Seq[Seq[Double]] = (0 until m).map(j =>
      books(j).map(cen => l2sq(probeN.slice(j * dsub, (j + 1) * dsub), cen)))
    val lutCol = typedLit(lut)
    val dist = aggregate(
      zip_with(col("code"), sequence(lit(0), lit(m - 1)),
        (c, j) => lutCol(j)(c)),
      lit(0.0), (acc, x) => acc + x)
    encodedCodes(normed, books)
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), dist.as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(n)
  }

  /** Probe vector fetch (one driver lookup, raw floats as doubles). */
  private def probeVec(emb: DataFrame, probeId: Long): Seq[Double] =
    emb.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  /** ADC top-k over CODES ONLY (the shortlist stage as a public
    * operator); use [[pqTopKReranked]] for the full search. */
  def pqTopK(emb: DataFrame, probeId: Long, k: Int, m: Int = 8,
             codeK: Int = 16,
             books0: Option[Seq[Seq[Seq[Double]]]] = None,
             iters: Int = 2): DataFrame = {
    val books = books0.getOrElse(pqCodebooks(emb, m, codeK, iters))
    pqAdcShortlist(pqNormalized(emb), normalizeVec(probeVec(emb, probeId)),
      books, probeId, k)
  }

  /** The full PQ search protocol: ADC over codes shortlists
    * `shortlist` candidates (the cheap pass that reads m bytes per
    * vector), then ONLY the shortlist's raw vectors are fetched for an
    * exact cosine re-rank — a broadcastable needle semi-join, the
    * standard billion-scale recipe (quantization noise decides the
    * shortlist boundary, never the final ranking). */
  def pqTopKReranked(emb: DataFrame, probeId: Long, k: Int,
                     shortlist: Int = 100, m: Int = 8,
                     codeK: Int = 16, iters: Int = 2): DataFrame = {
    // ONE persisted normalized pass feeds training and the ADC scan;
    // the shortlist collects eagerly (bounded by `shortlist` — the
    // needle-set contract), so the cache releases before return and the
    // returned frame depends only on the RAW table. The probe is
    // fetched ONCE (cosine is scale-invariant, so the normalized copy
    // serves both the ADC table and the exact re-rank).
    val probeN = normalizeVec(probeVec(emb, probeId))
    val normed = pqNormalized(emb).persist()
    val candIds: Seq[Long] =
      try {
        val books = pqCodebooksFromNormed(normed, m, codeK, iters)
        pqAdcShortlist(normed, probeN, books, probeId, shortlist)
          .select("vec_id").collect().map(_.getLong(0)).toSeq
      } finally normed.unpersist()
    emb.filter(col("vec_id").isin(candIds: _*))
      .withColumn("sim", cosine(col("embedding"), typedLit(probeN)))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "sim")
  }

  // ---- PQ as a persisted index + batched multi-probe search ---------
  // The search above retrains codebooks and re-encodes the corpus per
  // call — fine as a demo, wrong as a deployment. The production shape
  // (the reference's write-once global index consulted per query,
  // ShardedDataTypeHandler.java:86-101) is: train + encode ONCE, write
  // the codes and codebooks as tables, then serve every probe — and
  // every BATCH of probes — off the stored codes. A pipeline that
  // queries thousands of needles amortizes ONE code-column scan across
  // all of them: each probe is one broadcast DATA row carrying its
  // m×codeK ADC lookup table, the scan computes every probe's distance
  // in the same pass with a constant-size expression (the plan does not
  // grow with the batch), and a per-probe group-limit (Spark rewrites
  // the rank filter into WindowGroupLimit — a map-side local top-k
  // BEFORE the shuffle) keeps the shuffle at
  // O(partitions × probes × shortlist), never O(n × probes).

  /** Train codebooks and encode the corpus ONCE; write both as tables
    * under `dir` (`codes`: (vec_id, code ARRAY<INT>); `codebooks`:
    * (j, c, centroid ARRAY<DOUBLE>)). Returns the trained codebooks so
    * the writer can search immediately without re-reading. */
  /** Shared training half of the index writers: train codebooks over an
    * already-normalized persisted pass and write the codebooks table
    * (model-sized, m·codeK rows — one file). */
  private def trainAndWriteBooks(normed: DataFrame, dir: String, m: Int,
      codeK: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    val spark = normed.sparkSession
    import spark.implicits._
    val books = pqCodebooksFromNormed(normed, m, codeK, iters)
    val bookRows = for {
      (book, j) <- books.zipWithIndex; (cen, c) <- book.zipWithIndex
    } yield (j, c, cen)
    spark.createDataset(bookRows).toDF("j", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    books
  }

  /** Shared encode-and-write half of the flat-PQ writers: one pipeline,
    * parameterized by the codes target (`codes` flat vs `codes/batch=N`
    * streaming) and write mode, so the four writer entry points cannot
    * drift apart. */
  private def writePqCodes(normed: DataFrame, books: Seq[Seq[Seq[Double]]],
                           target: String, mode: String): Unit =
    encodedCodes(normed, books).write.mode(mode).parquet(target)

  def pqWriteIndex(emb: DataFrame, dir: String, m: Int = 8,
                   codeK: Int = 16, iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val normed = pqNormalized(emb).persist()
    try {
      val books = trainAndWriteBooks(normed, dir, m, codeK, iters)
      writePqCodes(normed, books, s"$dir/codes", "overwrite")
      books
    } finally normed.unpersist()
  }

  /** Incremental index maintenance: encode NEW vectors with the STORED
    * codebooks and append their codes — no retrain, no re-encode of the
    * existing corpus (the write-once contract under live ingest; the
    * reference's analog is new shards joining the global index without
    * rebuilding it). Quantization drift from a growing corpus is a
    * re-TRAIN decision made offline, not a side effect of appends. */
  def pqAppendToIndex(newVecs: DataFrame, dir: String): Unit = {
    val (_, books) = pqReadIndex(newVecs.sparkSession, dir)
    requireDimMatches(newVecs, books)
    writePqCodes(pqNormalized(newVecs), books, s"$dir/codes", "append")
  }

  /** [[pqWriteIndex]] in BATCH-PARTITIONED layout (`codes/batch=seed`)
    * for STREAMING maintenance: [[pqAppendToIndexBatch]] then OVERWRITES
    * its own `batch=N` partition per micro-batch, so a crash-replayed
    * batch replaces its codes instead of appending duplicates — the same
    * exactly-once move as [[graft.operators.Dedup.seedDedupStoreBatched]]
    * (the flat [[pqAppendToIndex]] is append-mode and relies on the
    * caller never re-appending). Readers see one extra `batch` partition
    * column; every search path projects it away. */
  def pqSeedIndexBatched(emb: DataFrame, dir: String, m: Int = 8,
                         codeK: Int = 16, iters: Int = 2)
      : Seq[Seq[Seq[Double]]] = {
    val normed = pqNormalized(emb).persist()
    try {
      val books = trainAndWriteBooks(normed, dir, m, codeK, iters)
      writePqCodes(normed, books, s"$dir/codes/batch=seed", "overwrite")
      books
    } finally normed.unpersist()
  }

  /** Register one micro-batch of new vectors in a [[pqSeedIndexBatched]]
    * index: encode with the STORED codebooks (no retrain — same contract
    * as [[pqAppendToIndex]]) and overwrite the batch's own partition, so
    * retries and crash-replays of the same batch id are idempotent. */
  def pqAppendToIndexBatch(newVecs: DataFrame, dir: String,
                           batchId: Long): Unit = {
    val (_, books) = pqReadIndex(newVecs.sparkSession, dir)
    requireDimMatches(newVecs, books)
    writePqCodes(pqNormalized(newVecs), books, s"$dir/codes/batch=$batchId",
      "overwrite")
  }

  /** Appending mismatched-dimension vectors would write garbage codes
    * into a write-once index — fail fast like the training path's
    * divisibility require (ingest schema drift is exactly where this
    * bites). */
  private def requireDimMatches(newVecs: DataFrame,
                                books: Seq[Seq[Seq[Double]]]): Unit = {
    val expected = books.size * books.head.head.size
    val got = embDim(newVecs)
    require(got == expected,
      s"appended vectors have dim $got but the stored codebooks encode dim $expected")
  }

  /** [[pqAppendToIndex]] for an IVF-PQ index: assign each new vector's
    * cell with the stored coarse centroids, encode with the stored
    * codebooks, append into the cell partitions. */
  def ivfPqAppendToIndex(newVecs: DataFrame, dir: String): Unit = {
    val (_, books, centroids) = ivfPqReadIndex(newVecs.sparkSession, dir)
    requireDimMatches(newVecs, books)
    writeIvfPqCodes(pqNormalized(newVecs), books, centroids,
      s"$dir/codes", "append")
  }

  /** Offline index maintenance — the explicit decision the append path
    * defers. Live appends write one part-file set per batch (write-once,
    * retry-safe), so a long-ingesting index splinters into many small
    * files and every probe's code scan pays per-file open overhead.
    * Compaction rewrites the code table into few large files: per CELL
    * for an IVF-PQ index (`partitionBy(cell)` is preserved, so
    * probe-time partition pruning still reads exactly its cells — back
    * to one file per cell), `files` total for a flat index. Codebooks
    * and centroids are untouched, codes are byte-identical rows, so
    * search results cannot change (pinned in PqIndexSpec). Write-to-temp
    * then RENAME-ONLY swap ([[graft.core.Fs.swapDir]] — no crash window
    * leaves `codes` absent; [[graft.core.Fs.recoverSwap]] restores a
    * half-swapped dir); run while no append is in flight (the reference's
    * analog is a major compaction — same offline discipline). For a
    * STREAMED index that discipline means: stream stopped AND its last
    * batch committed in the checkpoint — compacting a batch whose
    * commit never landed absorbs its codes into `batch=compacted`, and
    * the restart's replay then rewrites `batch=N` alongside them,
    * duplicating those vectors in every later shortlist.
    *
    * A quantization RETRAIN (fresh codebooks + full re-encode, when
    * drift from appended data degrades recall) is [[pqWriteIndex]] /
    * [[ivfPqWriteIndex]] over the current corpus — overwrite IS the
    * retrain; there is deliberately no half-retrain that would mix
    * codes from two codebook generations. */
  def pqCompactIndex(spark: SparkSession, dir: String,
                     files: Int = 1): Unit = {
    graft.core.Fs.recoverSwap(s"$dir/codes")
    val codes = spark.read.parquet(s"$dir/codes")
    val tmp = s"$dir/codes.compacting"
    // batched streaming layout: collapse every batch partition into ONE
    // `batch=compacted` partition DIR (not a data column), so later
    // [[pqAppendToIndexBatch]]/[[ivfPqAppendToIndexBatch]] calls keep a
    // consistent directory structure; cell stays a partition level
    val hasBatch = codes.columns.contains("batch")
    val body = if (hasBatch) codes.drop("batch") else codes
    val target = if (hasBatch) s"$tmp/batch=compacted" else tmp
    val writer =
      if (body.columns.contains("cell"))
        body.repartition(col("cell")).write.partitionBy("cell")
      else body.repartition(files).write
    writer.mode("overwrite").parquet(target)
    graft.core.Fs.swapDir(s"$dir/codes", tmp)
  }

  /** Load a written index: the codes FRAME (stays distributed — this is
    * the 32×-smaller column every search scans) and the codebooks as a
    * driver model (m·codeK·dsub doubles). */
  def pqReadIndex(spark: SparkSession, dir: String)
      : (DataFrame, Seq[Seq[Seq[Double]]]) = {
    // restore a half-swapped compaction before reading the codes table
    graft.core.Fs.recoverSwap(s"$dir/codes")
    val books = spark.read.parquet(s"$dir/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toSeq).toSeq)
    (spark.read.parquet(s"$dir/codes"), books)
  }

  /** One scan of the stored codes serving N probes, with probes as
    * DATA, not plan: each probe is one broadcast row carrying its
    * precomputed ADC lookup table (lut(j)(c) = ‖probe[j] −
    * centroid_{j,c}‖², m·codeK doubles) and — for the IVF composition —
    * its probed cells. The joined distance is ONE constant-size
    * fold over the m codes per (row, probe) pair, so the projection is
    * identical at N=3 and N=1000 and never leaves whole-stage codegen
    * (the stacked-literal form this replaces built N separate
    * aggregate trees and died at the 64KB codegen method limit;
    * ScaleProbe9Main pins flat per-probe cost at 256 probes). Then a
    * per-probe `shortlist`-limit. Returns (probe_id, vec_id, dist) —
    * the candidate set each probe re-ranks. Public so the plan shape is
    * assertable: reads ONLY the code column (no encode, no raw
    * vectors), and the rank filter must show as WindowGroupLimit. */
  def pqAdcShortlistBatch(codes: DataFrame,
                          books: Seq[Seq[Seq[Double]]],
                          probes: Seq[(Long, Seq[Double])],
                          shortlist: Int,
                          cellsOf: Option[Seq[Seq[Int]]] = None): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    val spark = codes.sparkSession
    import spark.implicits._
    val m = books.size
    val dsub = books.head.head.size
    val probeRows: Seq[(Long, Seq[Seq[Double]], Seq[Int])] =
      probes.zipWithIndex.map { case ((pid, pn), i) =>
        val lut = (0 until m).map(j =>
          books(j).map(cen =>
            l2sq(pn.slice(j * dsub, (j + 1) * dsub), cen)).toSeq)
        (pid, lut, cellsOf.fold(Seq.empty[Int])(_(i)))
      }
    val probesDf = spark.createDataset(probeRows).toDF("probe_id", "lut", "cells")
    // IVF composition: the join condition itself scopes each probe to
    // ITS cells (another probe's cells are non-joining rows, never
    // false candidates); the flat form is a broadcast cross join.
    val joined = cellsOf match {
      case Some(_) => codes.join(broadcast(probesDf),
        array_contains(col("cells"), col("cell")))
      case None => codes.crossJoin(broadcast(probesDf))
    }
    // every probe's distance from the SAME pass over the codes — m
    // 0-based lut lookups + adds per (row, probe), raw vectors never
    // read. m is statically known, so the sum is a flat chain of
    // GetArrayItem pairs (no higher-order function): it stays inside
    // whole-stage codegen, and its left-to-right order matches the
    // single-probe ADC fold so dist doubles are bit-equal (the fold's
    // 0.0 seed is absorbed: ADC terms are sums of squares, never -0.0)
    val dist = (0 until m).map(j => col("lut")(j)(col("code")(j)))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("dist").asc, col("vec_id").asc)
    joined
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), dist.as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
      .select(col("probe_id"), col("vec_id"), col("dist"))
  }

  /** Shared exact re-rank tail of the batched searches: fetch ONLY the
    * union shortlist's raw vectors (one InSet needle scan serves every
    * probe), score each (probe, candidate) pair by true cosine, keep
    * per-probe top-k. */
  private def rerankShortlist(emb: DataFrame, pairs: Seq[(Long, Long)],
                              probes: Seq[(Long, Seq[Double])],
                              k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val unionIds = pairs.map(_._2).distinct
    val pairsDf = spark.createDataset(pairs).toDF("probe_id", "vec_id")
    // probe vectors as a broadcast frame (not an N-entry literal map):
    // the scoring expression is one constant-size cosine against the
    // joined pvec column regardless of batch width
    val probesDf = spark.createDataset(probes).toDF("probe_id", "pvec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    // the isin compiles to ONE InSet expression (hash-set membership),
    // so the needle-bounded corpus scan stays cheap at any batch width
    emb.filter(col("vec_id").isin(unionIds: _*))
      .join(broadcast(pairsDf), Seq("vec_id"))
      .join(broadcast(probesDf), Seq("probe_id"))
      .withColumn("sim", cosine(col("embedding"), col("pvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"), col("sim"))
  }

  /** All probe vectors in ONE lookup job, L2-normalized, input order. */
  private def fetchProbes(emb: DataFrame,
                          probeIds: Seq[Long]): Seq[(Long, Seq[Double])] = {
    val fetched = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> normalizeVec(r.getSeq[Double](1)))
      .toMap
    val missing = probeIds.filterNot(fetched.contains)
    require(missing.isEmpty, s"unknown probe id(s): ${missing.mkString(",")}")
    probeIds.map(pid => pid -> fetched(pid))
  }

  /** Batched PQ search over a PERSISTED index: shortlist every probe
    * from one scan of the stored codes ([[pqAdcShortlistBatch]]), then
    * exact-cosine re-rank ONLY the union shortlist (one InSet needle
    * fetch of raw vectors serves all probes; per-probe top-k over
    * probes×shortlist rows is driver-bounded). Returns
    * (probe_id, vec_id, sim), k rows per probe. Zero training and zero
    * encode jobs — the index is read-only here, which is what lets a
    * second (and thousandth) batch reuse it. */
  def pqTopKBatch(emb: DataFrame, codes: DataFrame,
                  books: Seq[Seq[Seq[Double]]], probeIds: Seq[Long],
                  k: Int, shortlist: Int = 100): DataFrame = {
    val probes = fetchProbes(emb, probeIds)
    // the shortlist is the needle-set contract: ≤ probes×shortlist rows,
    // collected eagerly so the returned frame depends only on raw
    // vectors (the index files are not re-read at execution time)
    val pairs = pqAdcShortlistBatch(codes, books, probes, shortlist)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    rerankShortlist(emb, pairs, probes, k)
  }

  // ---- IVF-PQ: the composed billion-scale index -----------------------
  // The canonical layout (FAISS IndexIVFPQ shape): a coarse quantizer
  // splits the corpus into cells, PQ codes compress every vector, and
  // the codes table is WRITTEN PARTITIONED BY CELL — so a probe that
  // visits nProbe of nCells cells prunes (nCells−nProbe)/nCells of the
  // files before a byte is read (.explain shows PartitionFilters, the
  // same storage-side selection as the reference's sharded global
  // index). ADC + exact re-rank proceed exactly as in the flat PQ
  // path, but over the probed cells' codes only.

  /** Shared halves of the IVF-PQ writers — one centroid-table write and
    * one assign/encode/co-locate pipeline (cells repartitioned before
    * the partitioned write: one file per cell, the layout a probe's
    * partition-pruned read wants), parameterized by the codes target
    * (`codes` flat vs `codes/batch=N` streaming) and mode. */
  private def writeCentroids(spark: SparkSession, dir: String,
                             centroids: Seq[Seq[Double]]): Unit = {
    import spark.implicits._
    spark.createDataset(centroids.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  private def writeIvfPqCodes(normed: DataFrame,
                              books: Seq[Seq[Seq[Double]]],
                              centroids: Seq[Seq[Double]],
                              target: String, mode: String): Unit = {
    val spark = normed.sparkSession
    import spark.implicits._
    val b = books.map(_.map(_.toArray).toArray).toArray
    val cents = centroids.map(_.toArray).toArray
    normed.as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        (id, ivfAssignKernel(v, cents), pqEncodeKernel(v, b)) })
      .toDF("vec_id", "cell", "code")
      .repartition(col("cell"))
      .write.partitionBy("cell").mode(mode).parquet(target)
  }

  def ivfPqWriteIndex(emb: DataFrame, dir: String, nCells: Int = 16,
                      m: Int = 8, codeK: Int = 16, iters: Int = 2,
                      coarseIters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Lloyd-refined coarse quantizer: the raw stride sample misplaces
    // cell boundaries enough to strand true neighbours in unprobed
    // cells (measured: probe-42 recall 2/10 sampled vs green refined)
    val centroids = kmeansCentroids(emb, nCells, coarseIters)
    writeCentroids(spark, dir, centroids)
    val normed = pqNormalized(emb).persist()
    try {
      val books = trainAndWriteBooks(normed, dir, m, codeK, iters)
      writeIvfPqCodes(normed, books, centroids, s"$dir/codes", "overwrite")
      books
    } finally normed.unpersist()
  }

  /** [[ivfPqWriteIndex]] in BATCH-PARTITIONED layout
    * (`codes/batch=seed/cell=C`) for STREAMING maintenance — the IVF-PQ
    * twin of [[pqSeedIndexBatched]]. Cell stays a partition column at
    * the second level under every batch, so probe-time partition
    * pruning on cell is unchanged (pinned in PqIndexSpec); each
    * [[ivfPqAppendToIndexBatch]] overwrites its own `batch=N` subtree,
    * so crash-replays replace rather than duplicate codes. */
  def ivfPqSeedIndexBatched(emb: DataFrame, dir: String, nCells: Int = 16,
                            m: Int = 8, codeK: Int = 16, iters: Int = 2,
                            coarseIters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val spark = emb.sparkSession
    val centroids = kmeansCentroids(emb, nCells, coarseIters)
    writeCentroids(spark, dir, centroids)
    val normed = pqNormalized(emb).persist()
    try {
      val books = trainAndWriteBooks(normed, dir, m, codeK, iters)
      writeIvfPqCodes(normed, books, centroids,
        s"$dir/codes/batch=seed", "overwrite")
      books
    } finally normed.unpersist()
  }

  /** Register one micro-batch in a [[ivfPqSeedIndexBatched]] index:
    * assign cells with the STORED coarse centroids, encode with the
    * STORED codebooks, overwrite the batch's own cell-partitioned
    * subtree — idempotent under retry/replay like
    * [[pqAppendToIndexBatch]]. */
  def ivfPqAppendToIndexBatch(newVecs: DataFrame, dir: String,
                              batchId: Long): Unit = {
    val (_, books, centroids) = ivfPqReadIndex(newVecs.sparkSession, dir)
    requireDimMatches(newVecs, books)
    writeIvfPqCodes(pqNormalized(newVecs), books, centroids,
      s"$dir/codes/batch=$batchId", "overwrite")
  }

  /** Load an IVF-PQ index: the cell-partitioned codes FRAME plus the
    * two driver-side models (codebooks, coarse centroids). */
  def ivfPqReadIndex(spark: SparkSession, dir: String)
      : (DataFrame, Seq[Seq[Seq[Double]]], Seq[Seq[Double]]) = {
    val books = spark.read.parquet(s"$dir/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toSeq).toSeq)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).map(_._2).toSeq
    (spark.read.parquet(s"$dir/codes"), books, centroids)
  }

  /** Batched IVF-PQ search over a persisted index: each probe selects
    * its `nProbe` nearest cells on the driver; ONE scan of the UNION of
    * probed cells (partition-pruned — unprobed cells' files are never
    * read) computes every probe's ADC distance, a per-probe filter
    * keeps only rows in that probe's own cells, and the union shortlist
    * re-ranks exactly as in [[pqTopKBatch]]. */
  def ivfPqTopKBatch(emb: DataFrame, codes: DataFrame,
                     books: Seq[Seq[Seq[Double]]],
                     centroids: Seq[Seq[Double]], probeIds: Seq[Long],
                     k: Int, nProbe: Int = 4,
                     shortlist: Int = 100): DataFrame = {
    val probes = fetchProbes(emb, probeIds)
    val probeCells: Seq[Seq[Int]] =
      probes.map { case (_, pn) => ivfProbeCells(pn, centroids, nProbe) }
    val unionCells = probeCells.flatten.distinct
    val pairs = pqAdcShortlistBatch(
        // partition filter: only the probed cells' FILES are read
        codes.filter(col("cell").isin(unionCells: _*)),
        books, probes, shortlist, cellsOf = Some(probeCells))
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    rerankShortlist(emb, pairs, probes, k)
  }
}
