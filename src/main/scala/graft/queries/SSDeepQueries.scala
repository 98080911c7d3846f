package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{SSDeep, TextOps}

/** SSDeep similarity gate. The container has no real ssdeep binaries, so
  * deterministic surrogate hashes are derived from document tokens with
  * md5-based chunk characters — EXACTLY mirrored in the DuckDB oracle —
  * and fed through the real ngram-bucket + edit-distance-scoring pipeline
  * (integer scores → fully oracle-able).
  */
object SSDeepQueries {

  private val Alpha =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
  private val alphaArr = typedLit(Alpha.map(_.toString))

  /** One base64-ish char per token from md5 hex digits p1,p2. */
  private def charFor(t: Column, p1: Int, p2: Int): Column =
    element_at(alphaArr,
      (pmod(ascii(substring(md5(t.cast("binary")), p1, 1)) * 16 +
        ascii(substring(md5(t.cast("binary")), p2, 1)), lit(64)) + 1).cast("int"))

  /** Surrogate `96:chunk:doubleChunk` per document (fixed chunk size —
    * valid: 96 = 3·2⁵): chunk = one char per token (first 48), double
    * chunk = chars from different md5 digits (first 24). Near-duplicate
    * documents share most tokens → similar chunks → high scores. */
  def ssdeepHashes(docs: DataFrame): DataFrame =
    graft.core.Spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("chunk",
        array_join(transform(slice(col("toks"), 1, 48), t => charFor(t, 1, 2)), ""))
      .withColumn("dchunk",
        array_join(transform(slice(col("toks"), 1, 24), t => charFor(t, 3, 4)), ""))
      .filter(length(col("chunk")) >= 7)
      .select(col("doc_id"),
        concat_ws(":", lit("96"), col("chunk"), col("dchunk")).as("ssdeep"))

  def ssdeepSimilarity(s: SparkSession, d: String): DataFrame =
    SSDeep.similarityPairs(ssdeepHashes(Tables.documents(s, d)), minScore = 60)

  /** Chained discovery: doc 72's hash is the probe — its ngrams discover
    * gram-sharing corpus hashes (with distinct-gram match counts), which
    * the second stage scores (SSDeepChainedDiscoveryQueryLogic chain). */
  def ssdeepChained(s: SparkSession, d: String): DataFrame =
    SSDeep.chainedDiscovery(ssdeepHashes(Tables.documents(s, d)), probeId = 72L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ssdeep_similarity" -> ssdeepSimilarity _,
    "ssdeep_chained" -> ssdeepChained _,
  )

  private val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  // RE2 has no backreferences, so run-collapse (normalizeSSDeepChunk) is
  // a list_reduce over the char list instead of a regex.
  private def collapseSql(lst: String) =
    s"list_reduce($lst, (acc, x) -> CASE WHEN right(acc, 3) = repeat(x, 3) THEN acc ELSE acc || x END)"
  private def charSql(p1: Int, p2: Int) =
    s"substr('$Alpha', ((ascii(substr(md5(t), $p1, 1)) * 16 + ascii(substr(md5(t), $p2, 1))) % 64) + 1, 1)"

  val oracleSql: Map[String, String] = Map(
    "ssdeep_similarity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |raw AS (
         |  SELECT doc_id,
         |    list_transform(toks[1:48], t -> ${charSql(1, 2)}) AS cl,
         |    list_transform(toks[1:24], t -> ${charSql(3, 4)}) AS dl
         |  FROM toks),
         |h AS (
         |  SELECT doc_id,
         |    ${collapseSql("cl")} AS chunk,
         |    ${collapseSql("dl")} AS dchunk
         |  FROM raw WHERE len(cl) >= 7),
         |g AS (
         |  SELECT doc_id, 96 AS cs,
         |    unnest(list_transform(range(1, len(chunk) - 5), i -> substr(chunk, i, 7))) AS gram
         |  FROM h WHERE len(chunk) >= 7
         |  UNION ALL
         |  SELECT doc_id, 192,
         |    unnest(list_transform(range(1, len(dchunk) - 5), i -> substr(dchunk, i, 7)))
         |  FROM h WHERE len(dchunk) >= 7),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.cs = b.cs AND a.gram = b.gram AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT id_a, id_b,
         |    greatest(
         |      CASE WHEN len(ha.chunk) > 64 OR len(hb.chunk) > 64 THEN 0
         |           WHEN (100 * ((levenshtein(ha.chunk, hb.chunk) * 64) // (len(ha.chunk) + len(hb.chunk)))) // 64 >= 100 THEN 0
         |           ELSE least(
         |             100 - (100 * ((levenshtein(ha.chunk, hb.chunk) * 64) // (len(ha.chunk) + len(hb.chunk)))) // 64,
         |             (96 // 3) * least(len(ha.chunk), len(hb.chunk))) END,
         |      CASE WHEN len(ha.dchunk) > 64 OR len(hb.dchunk) > 64 THEN 0
         |           WHEN (100 * ((levenshtein(ha.dchunk, hb.dchunk) * 64) // (len(ha.dchunk) + len(hb.dchunk)))) // 64 >= 100 THEN 0
         |           ELSE least(
         |             100 - (100 * ((levenshtein(ha.dchunk, hb.dchunk) * 64) // (len(ha.dchunk) + len(hb.dchunk)))) // 64,
         |             (192 // 3) * least(len(ha.dchunk), len(hb.dchunk))) END) AS score
         |  FROM cand JOIN h ha ON ha.doc_id = id_a JOIN h hb ON hb.doc_id = id_b)
         |SELECT id_a, id_b, score FROM scored WHERE score >= 60""".stripMargin,
    "ssdeep_chained" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |raw AS (
         |  SELECT doc_id,
         |    list_transform(toks[1:48], t -> ${charSql(1, 2)}) AS cl,
         |    list_transform(toks[1:24], t -> ${charSql(3, 4)}) AS dl
         |  FROM toks),
         |h AS (
         |  SELECT doc_id,
         |    ${collapseSql("cl")} AS chunk,
         |    ${collapseSql("dl")} AS dchunk
         |  FROM raw WHERE len(cl) >= 7),
         |g AS (
         |  SELECT doc_id, 96 AS cs,
         |    unnest(list_transform(range(1, len(chunk) - 5), i -> substr(chunk, i, 7))) AS gram
         |  FROM h WHERE len(chunk) >= 7
         |  UNION ALL
         |  SELECT doc_id, 192,
         |    unnest(list_transform(range(1, len(dchunk) - 5), i -> substr(dchunk, i, 7)))
         |  FROM h WHERE len(dchunk) >= 7),
         |pg AS (SELECT DISTINCT cs, gram FROM g WHERE doc_id = 72),
         |disc AS (
         |  SELECT g.doc_id,
         |    count(DISTINCT (CAST(g.cs AS VARCHAR) || ':' || g.gram)) AS matches
         |  FROM g JOIN pg ON g.cs = pg.cs AND g.gram = pg.gram
         |  WHERE g.doc_id <> 72 GROUP BY 1)
         |SELECT d.doc_id, d.matches,
         |  greatest(
         |    CASE WHEN len(ha.chunk) > 64 OR len(hb.chunk) > 64 THEN 0
         |         WHEN (100 * ((levenshtein(ha.chunk, hb.chunk) * 64) // (len(ha.chunk) + len(hb.chunk)))) // 64 >= 100 THEN 0
         |         ELSE least(
         |           100 - (100 * ((levenshtein(ha.chunk, hb.chunk) * 64) // (len(ha.chunk) + len(hb.chunk)))) // 64,
         |           (96 // 3) * least(len(ha.chunk), len(hb.chunk))) END,
         |    CASE WHEN len(ha.dchunk) > 64 OR len(hb.dchunk) > 64 THEN 0
         |         WHEN (100 * ((levenshtein(ha.dchunk, hb.dchunk) * 64) // (len(ha.dchunk) + len(hb.dchunk)))) // 64 >= 100 THEN 0
         |         ELSE least(
         |           100 - (100 * ((levenshtein(ha.dchunk, hb.dchunk) * 64) // (len(ha.dchunk) + len(hb.dchunk)))) // 64,
         |           (192 // 3) * least(len(ha.dchunk), len(hb.dchunk))) END) AS score
         |FROM disc d
         |JOIN h hb ON hb.doc_id = d.doc_id
         |CROSS JOIN (SELECT * FROM h WHERE doc_id = 72) ha""".stripMargin,
  )
}
