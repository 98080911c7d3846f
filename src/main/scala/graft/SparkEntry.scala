package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator's query + DuckDB oracle. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.groupbyAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ JexlQueries.queries ++ PipelineQueries.queries ++
      EventQueries.queries ++ QueryStringQueries.queries ++ GeoQueries.queries ++
      IngestQueries.queries ++ SSDeepQueries.queries ++ TreeQueries.queries ++
      StatsQueries.queries ++ ServiceQueries.queries ++ StreamingQueries.queries

  /** Warm-up representatives: one query per distinct taxed-expression
    * combination (HOF lambdas / generators / UDFs — the shapes whose
    * first execution pays a 30-110s one-time classload/JIT bill in a
    * fresh JVM). Bench executes ONLY these untimed before the timed
    * pass; constructing+planning all ~117 queries just to detect shapes
    * cost more than the warming itself. WarmupSpec re-derives the combo
    * set from the actual plans and fails if a combo loses coverage, so
    * the tag list cannot silently rot. */
  val warmupQueries: Seq[String] = Seq(
    "corpus_dsir", "dedup_lines", "edge_query",
    "flt_compare_all", "flt_eval_functions", "ing_date_index",
    "ing_uid_list_removed",
    "lucene_phrase", "mods_applied", "multimodal_probe",
    "qs_content_within", "qs_excerpt", "qs_limit_hits", "span_scrub",
    "ssdeep_chained",
    "text_analyze", "text_quality_filter", "text_tokens", "text_winnow",
    "tf_adjacent", "tf_excerpt", "tf_lookup", "whindex_remap")
  // ing_uid_list_removed joined in r12: the cache-hygiene rework
  // materializes its result in-op, so the RETURNED plan is an
  // InMemoryRelation over the patched-index subtree — a combo
  // (aggregate+explode+generate+collect_) no other tagged gate carries.
  // text_winnow joined in r10: the winnow min-per-window fold is the
  // sole carrier of the transform+aggregate+filter+explode combo.
  // text_quality_filter joined in r9: the qualityFilter lambda-let
  // rewrite (stats bound once per row) gave it the unique
  // transform+aggregate+filter combo.
  // span_scrub / tf_excerpt / multimodal_probe joined the list in r8:
  // the HOF-free tokens()/bigrams()/chunkLines() rewrite moved most
  // text gates OUT of the taxed-shape space entirely, which re-ranked
  // these three as the sole carriers of their residual HOF combos.
  // The five most expensive former representatives (analyzer_tokens,
  // ann_lsh, dedup_minhash_lsh, ann_ivf_recall, dedup_ngram_jaccard —
  // 5-20 s each at sf0.001) warm via graft.Warmup's tiny in-memory
  // kernels instead; WarmupSpec asserts the kernels reproduce their
  // combos exactly. ing_needle_uidlist left the list because its plan
  // carries no taxed shape at all (its warm cost was job orchestration,
  // which needs no warming).

  /** Taxed-shape detection shared by Bench (debug) and WarmupSpec. */
  val taxedMarkers: Seq[String] = Seq("lambdafunction", "explode", "generate", "udf(")
  val shapeFeatures: Seq[String] = Seq("transform(", "aggregate(", "zip_with(",
    "exists(", "filter(", "explode", "posexplode", "inline", "generate",
    "udf(", "map_from_entries", "collect_")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ JexlQueries.oracleSql ++ PipelineQueries.oracleSql ++
      EventQueries.oracleSql ++ QueryStringQueries.oracleSql ++ GeoQueries.oracleSql ++
      IngestQueries.oracleSql ++ SSDeepQueries.oracleSql ++ TreeQueries.oracleSql ++
      StatsQueries.oracleSql ++ ServiceQueries.oracleSql ++ StreamingQueries.oracleSql
}
