package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SSDeep (fuzzy-hash) similarity — the Spark re-expression of
  * SSDeepSimilarityQueryLogic.java:34 + NGramGenerator.java:16 +
  * SSDeepHashEditDistanceScorer.java:
  *
  *  1. parse `chunkSize:chunk:doubleChunk`, collapse >3-char runs
  *     (SSDeepHash.normalizeSSDeepChunk — runs carry no information);
  *  2. candidate pairs via shared 7-gram (chunkSize, gram) tuples — the
  *     bucketed ngram index join ("Optimizing ssDeep for use at Scale"),
  *     never all-pairs;
  *  3. exact integer score 0-100 via the reference's edit-distance
  *     arithmetic (Levenshtein is a Spark built-in), comparing
  *     equal-chunk-size chunks or the chunk↔doubleChunk cross when one
  *     size is twice the other.
  *
  * All integer arithmetic reproduces Java int division exactly (operands
  * are small non-negatives, so floor(double-div) is identical).
  */
object SSDeep {

  val ChunkLength = 64
  val MinChunkSize = 3
  val NGramSize = 7

  /** Collapse runs of more than 3 repeated characters to exactly 3. */
  def normalizeChunk(c: Column): Column =
    regexp_replace(c, "(.)\\1{3,}", "$1$1$1")

  /** (chunkSize, 7-gram) tuples of one chunk string. */
  def ngramTuples(cs: Column, chunk: Column, n: Int = NGramSize): Column =
    when(length(chunk) >= n,
      transform(sequence(lit(1), length(chunk) - (n - 1)),
        i => struct(cs.as("cs"), chunk.substr(i, lit(n)).as("gram"))))
      .otherwise(array().cast("array<struct<cs:int,gram:string>>"))

  /** SSDeepHashEditDistanceScorer.scoreChunks — exact integer replica. */
  def scoreChunks(s1: Column, s2: Column, cs: Column): Column = {
    val len1 = length(s1)
    val len2 = length(s2)
    val ed = levenshtein(s1, s2)
    val base = floor((ed * ChunkLength).cast("double") / (len1 + len2)).cast("int")
    val scaled = floor((base * 100).cast("double") / ChunkLength).cast("int")
    val threshold =
      floor(cs.cast("double") / MinChunkSize).cast("int") * least(len1, len2)
    when(len1 > ChunkLength || len2 > ChunkLength, 0)
      .when(scaled >= 100, 0)
      .otherwise(least(lit(100) - scaled, threshold))
  }

  /** Pair score: equal chunk sizes compare chunk↔chunk and double↔double
    * (max); a 2× size difference compares across; otherwise incomparable
    * (score 0). */
  def pairScore(cs1: Column, c1: Column, d1: Column,
                cs2: Column, c2: Column, d2: Column): Column =
    when(cs1 === cs2,
      greatest(scoreChunks(c1, c2, cs1), scoreChunks(d1, d2, cs1 * 2)))
      .when(cs1 === cs2 * 2, scoreChunks(c1, d2, cs1))
      .when(cs2 === cs1 * 2, scoreChunks(d1, c2, cs2))
      .otherwise(0)

  /** Chained discovery (SSDeepChainedDiscoveryQueryLogic.java): query 1
    * explodes the PROBE hash into its ngrams and discovers which corpus
    * hashes share them (with distinct-gram match counts); query 2 scores
    * the probe against each discovered hash. The probe row is a 1-row
    * driver lookup (the chain's query-1 output parameterizes query 2 —
    * same pattern as the reference's chained logic), and the probe's ≤60
    * grams ride into the scan filter as an IN list: the discovery is a
    * filtered index scan, never a join against all corpus grams. */
  def chainedDiscovery(hashes: DataFrame, probeId: Long,
                       idCol: String = "doc_id", hashCol: String = "ssdeep",
                       minScore: Int = 0): DataFrame = {
    val parsed = parseHashes(hashes, idCol, hashCol).persist()
    // one evaluation of the hash-derivation subtree: the probe lookup
    // below materializes only the partitions it touches, and the final
    // discover⋈parsed join's two stages would otherwise race the rest
    // of the cold cache (see Dedup.ngramJaccardPairs)
    parsed.count()
    val p = parsed.filter(col("id") === probeId)
      .select("cs", "chunk", "dchunk").head()
    val (pcs, pchunk, pdchunk) = (p.getInt(0), p.getString(1), p.getString(2))
    def gramsOf(cs: Int, chunk: String): Seq[String] =
      if (chunk.length < NGramSize) Nil
      else (0 to chunk.length - NGramSize).map(i =>
        s"$cs:${chunk.substring(i, i + NGramSize)}")
    val probeGrams = (gramsOf(pcs, pchunk) ++ gramsOf(pcs * 2, pdchunk)).distinct
    val corpusGrams = parsed.select(col("id"), explode(concat(
        ngramTuples(col("cs"), col("chunk")),
        ngramTuples(col("cs") * 2, col("dchunk")))).as("g"))
      .select(col("id"),
        concat(col("g.cs").cast("string"), lit(":"), col("g.gram")).as("key"))
    val discovered = corpusGrams
      .filter(col("id") =!= probeId && col("key").isin(probeGrams: _*))
      .groupBy(col("id"))
      .agg(countDistinct(col("key")).as("matches"))
    // CACHE CONTRACT (ADVICE r13, adjudicated r14): `parsed` rides in
    // the returned plan and releases with the caller's per-query
    // clearCache — the Dedup eagerRelease variant (materialize the
    // result, unpersist in-op) was built and MEASURED one extra
    // materializing job slower on both pair legs (ssdeep_similarity
    // +0.1..+0.3 s), so the riding-frame shape is the kept trade;
    // SSDeepSpec/CacheHygieneSpec pin the frame count so an embedding
    // caller knows what it holds.
    discovered.join(parsed, "id")
      .withColumn("score", pairScore(lit(pcs), lit(pchunk), lit(pdchunk),
        col("cs"), col("chunk"), col("dchunk")))
      .filter(col("score") >= minScore)
      .select(col("id").as("doc_id"), col("matches"), col("score"))
  }

  private def parseHashes(hashes: DataFrame, idCol: String,
                          hashCol: String): DataFrame = {
    val parts = split(col(hashCol), ":")
    hashes.select(col(idCol).as("id"),
      parts.getItem(0).cast("int").as("cs"),
      normalizeChunk(parts.getItem(1)).as("chunk"),
      normalizeChunk(parts.getItem(2)).as("dchunk"))
  }

  /** All pairs (idA < idB) scoring ≥ minScore. Candidates come from the
    * shared-ngram bucket join; parsed hashes are persisted so chunks are
    * normalized once, not once per join side. */
  def similarityPairs(hashes: DataFrame, idCol: String = "doc_id",
                      hashCol: String = "ssdeep", minScore: Int = 60): DataFrame = {
    val parsed = parseHashes(hashes, idCol, hashCol).persist()
    val grams = parsed.select(col("id"), explode(concat(
        ngramTuples(col("cs"), col("chunk")),
        ngramTuples(col("cs") * 2, col("dchunk")))).as("g"))
      .select(col("id"), col("g.cs").as("cs"), col("g.gram").as("gram"))
      .persist()
    // one pass populates parsed AND grams before the self-join's x/y
    // stages and the score join's a/b sides race on the cold caches —
    // the md5-derived hash subtree is the op's CPU bill (the
    // one-evaluation rule, see Dedup.ngramJaccardPairs). Both frames
    // ride in the returned plan and release with the caller's
    // per-query clearCache — the TWO-frame shape is deliberate and
    // spec-pinned; see the chainedDiscovery cache-contract note.
    grams.count()
    val cand = grams.as("x").join(grams.as("y"),
        col("x.cs") === col("y.cs") && col("x.gram") === col("y.gram") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val a = parsed.select(col("id").as("id_a"), col("cs").as("cs_a"),
      col("chunk").as("c_a"), col("dchunk").as("d_a"))
    val b = parsed.select(col("id").as("id_b"), col("cs").as("cs_b"),
      col("chunk").as("c_b"), col("dchunk").as("d_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("score", pairScore(col("cs_a"), col("c_a"), col("d_a"),
        col("cs_b"), col("c_b"), col("d_b")))
      .filter(col("score") >= minScore)
      .select("id_a", "id_b", "score")
  }
}
