package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edge (graph) construction and query — the Spark re-expression of the
  * reference's edge table (ProtobufEdgeDataTypeHandler.java:82,
  * EdgeKey.java:21-43,496-566): pairwise relationships extracted from
  * event field pairs, with per-day activity counts and STATS rows.
  *
  * Layout: `edges(source, sink, edge_type, relationship, day, cnt,
  * weight)`; at 100 TB partition by day + bucket by source so
  * source-keyed queries prune and edge→event drillbacks co-locate.
  */
object Edges {

  /** One configured edge extraction (EdgeDefinition.java:24,309-318 +
    * EdgeDataBundle): beyond the positive field pair, a definition may
    * carry a JEXL `precondition` evaluated against the source EVENT
    * (EdgePreconditionJexlEvaluation — the edge is emitted only for rows
    * where it holds) and a `denylist` of vertex values that must never
    * become a source or sink. */
  final case class EdgeDefinition(
      sourceField: String, sinkField: String,
      edgeType: String, relationship: String,
      precondition: Option[String] = None,
      denylist: Set[String] = Set.empty)

  /** Build daily-aggregated edges from an event table per definitions —
    * `groupBy(source, sink, type, rel, day).count()` exactly as SURVEY
    * §2.1 maps the handler. Multiple definitions union before the single
    * aggregation so one shuffle covers all edge types. Preconditions and
    * denylists are per-definition row filters BELOW the union, so they
    * push to the shared scan and never reach the shuffle. */
  def build(events: DataFrame, defs: Seq[EdgeDefinition],
            tsCol: String = "ts", weightCol: Option[String] = None): DataFrame = {
    val perDef = defs.map { d =>
      val pre = d.precondition.fold(events) { p =>
        events.filter(graft.jexl.Compiler.compile(
          graft.jexl.JexlParser.parse(p), events, graft.jexl.QueryModel()))
      }
      val sel = pre.select(
        col(d.sourceField).cast("string").as("source"),
        col(d.sinkField).cast("string").as("sink"),
        lit(d.edgeType).as("edge_type"),
        lit(d.relationship).as("relationship"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"),
        weightCol.map(c => col(c)).getOrElse(lit(1.0)).as("w"))
      if (d.denylist.isEmpty) sel
      else {
        val dl = d.denylist.toSeq
        sel.filter(!col("source").isin(dl: _*) && !col("sink").isin(dl: _*))
      }
    }
    perDef.reduce(_ unionAll _)
      .groupBy("source", "sink", "edge_type", "relationship", "day")
      .agg(count(lit(1)).as("cnt"),
        sum(col("w").cast("decimal(18,2)")).cast("double").as("weight"))
  }

  /** STATS/ACTIVITY rows (EdgeKey.java:496-507): per-source daily activity
    * rollups that interleave with edges in the reference's table. */
  def activityStats(edges: DataFrame): DataFrame =
    edges.groupBy("source", "day")
      .agg(sum(col("cnt")).as("activity"),
        countDistinct(col("sink")).as("distinct_sinks"))

  /** Edge dictionary (EdgeDictionaryBean.java, edge-dictionary-core):
    * the deployment's edge catalog served over `/EdgeDictionary` — each
    * (type, relationship) with the field pair that generates it and the
    * observed stats (edge count, date bounds). Definition rows are a
    * tiny broadcast side; stats aggregate the already-built edge table. */
  def dictionary(edges: DataFrame, defs: Seq[EdgeDefinition]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val defRows = defs.map(d =>
        (d.edgeType, d.relationship, d.sourceField, d.sinkField))
      .toDF("edge_type", "relationship", "source_field", "sink_field")
    val stats = edges.groupBy("edge_type", "relationship")
      .agg(sum(col("cnt")).as("edge_count"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
    defRows.join(broadcast(stats), Seq("edge_type", "relationship"), "left")
  }

  /** Edge query (EdgeQueryLogic analog): JEXL over
    * EDGE_SOURCE/SINK/TYPE/RELATIONSHIP via the standard compiler with a
    * fixed model — source equality prunes first like the row-range build
    * (EdgeTableRangeBuildingVisitor). */
  def query(edges: DataFrame, jexl: String): DataFrame = {
    val model = graft.jexl.QueryModel(Map(
      "EDGE_SOURCE" -> Seq("source"),
      "EDGE_SINK" -> Seq("sink"),
      "EDGE_TYPE" -> Seq("edge_type"),
      "EDGE_RELATIONSHIP" -> Seq("relationship")))
    graft.jexl.Compiler.filter(edges, jexl, model)
  }

  /** Extended edge query, LIST input syntax (DefaultExtendedEdgeQueryLogic
    * .java:37-308): the "query" is a delimiter-separated list of source
    * vertex VALUES with no field names (EdgeExtendedSummaryConfiguration
    * LIST syntax), each optionally qualified `value<Qualifier>`
    * (normalizeQualifiedSource :219-244 — qualifier lowercases and rides
    * along). Values normalize through LcNoDiacritics (the reference's
    * default data type) before matching; an optional edgeTypes parameter
    * (EDGE_TYPES_PARAM :19) restricts the edge types returned; summary
    * output collapses per-day rows to one row per edge with totals and
    * the active-day span (the EdgeSummaryQueryMessage rollup).
    *
    * Spark shape: the source list is a pushed-down InSet on the layout's
    * leading column — the same pruning the reference gets from one scan
    * range per source; the summary is one groupBy over the pruned slice.
    * `storedNormalized` declares the reference's ingest invariant (edge
    * vertices are normalized when written — EdgeKeyUtil escaped ranges
    * assume it): the filter is then a bare-column InSet that reaches the
    * scan. With raw stored vertices the column normalizes per row first —
    * correct, but an expression filter the scan can't prune by. */
  def listQuery(edges: DataFrame, query: String, delimiter: Char = ',',
                edgeTypes: Seq[String] = Nil, summary: Boolean = false,
                storedNormalized: Boolean = true): DataFrame = {
    val sources = query.split(delimiter).iterator.map(_.trim).filter(_.nonEmpty)
      .map { q =>
        val qi = q.lastIndexOf('<')
        if (qi > 0)
          graft.functions.Normalizers.lcNoDiacriticsLiteral(q.substring(0, qi)) +
            q.substring(qi).toLowerCase
        else graft.functions.Normalizers.lcNoDiacriticsLiteral(q)
      }.toSeq.distinct
    require(sources.nonEmpty, "LIST edge query needs at least one source value")
    val sourceCol =
      if (storedNormalized) col("source")
      else graft.functions.Normalizers.lcNoDiacritics(col("source"))
    val bySource = edges.filter(sourceCol.isin(sources: _*))
    val typed =
      if (edgeTypes.isEmpty) bySource
      else bySource.filter(col("edge_type").isin(edgeTypes: _*))
    if (!summary) typed
    else typed.groupBy("source", "sink", "edge_type", "relationship")
      .agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("active_days"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
  }

  /** Edge→event drill-back (DefaultEdgeEventQueryLogic): map selected
    * edges back to the events that produced them. */
  def drillback(edges: DataFrame, events: DataFrame,
                d: EdgeDefinition, tsCol: String = "ts"): DataFrame =
    events.join(
      edges.filter(col("edge_type") === d.edgeType)
        .select(col("source"), col("sink"), col("day")),
      events(d.sourceField).cast("string") === col("source") &&
        events(d.sinkField).cast("string") === col("sink") &&
        date_format(events(tsCol), "yyyy-MM-dd") === col("day"))
}
