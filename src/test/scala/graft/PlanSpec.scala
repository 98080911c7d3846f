package graft

import graft.queries._

/** Plan-shape assertions: the point of compiling to declarative Catalyst
  * is that the RIGHT physical plan falls out — filters reach the parquet
  * scan, prefix predicates push down, small dimensions broadcast, top-k
  * never globally sorts. These guard against regressions that stay
  * correct but lose the 100×-scale plan.
  */
class PlanSpec extends SparkSpec {

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("JEXL comparison filters reach the parquet scan") {
    val plan = executed("jexl_eq_range")
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_qu"), plan.take(2000))
  }

  test("LUCENE prefix wildcard pushes StringStartsWith to parquet") {
    val plan = executed("lucene_wildcard")
    assert(plan.contains("StringStartsWith(p_name,sma"), plan.take(2000))
  }

  test("small dimension join broadcasts") {
    val plan = executed("rel_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = executed("rel_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("needle semi-join broadcasts the index-derived dates") {
    val plan = executed("ing_needle_semijoin")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan.take(3000))
  }

  test("600-branch OR collapses to one pushed In filter") {
    val plan = executed("jexl_large_or")
    assert(plan.contains("In(o_custkey"), plan.take(3000))
    // a 600-node boolean tree would overflow any single line; the
    // collapsed form keeps one predicate (InSet above 10 values)
    assert(!plan.contains("|| (o_custkey"), plan.take(3000))
  }

  test("index-hole fallback still prunes via a broadcast semi-join") {
    val plan = executed("ing_index_hole")
    // the (hit ∪ hole) date set broadcasts into a LeftSemi against the
    // event scan — partition pruning survives the hole fallback
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan.take(3000))
  }

  test("whindex remap consumes the marker term completely") {
    val plan = executed("whindex_remap")
    // the PLANET == 'MARS' marker was dropped with the field swap, so no
    // filter tests planet — Catalyst prunes the column out of the plan
    assert(!plan.toLowerCase.contains("planet"), plan.take(3000))
    // and the predicate runs on the value-specific field's (inlined)
    // defining expression: the JTS UDF over the custkey-gated point
    assert(plan.contains("UDF(CASE WHEN ((c_custkey"), plan.take(3000))
  }

  test("uid-list needle scan filters both granularities in one pass") {
    val plan = executed("ing_needle_uidlist")
    // the planner-side range materialization turns both regimes into
    // In-list predicates on a single event scan — no join, no shuffle
    // (the only acceptable Exchange-free shape; the broadcast-semi-join
    // fallback appears only past the maxDriverRanges policy bound)
    assert(!plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("leading-wildcard discovery prefix-probes the reverse index") {
    val plan = executed("ing_discovery_rev")
    // `*ick` = sargable StartsWith on the reversed value — never an
    // unanchored regex over the forward values
    assert(plan.contains("StartsWith"), plan.take(3000))
    assert(!plan.contains("RLike"), plan.take(3000))
  }

  test("index-driven unfielded expansion prunes to one pushed equality") {
    val plan = executed("ing_unfielded_expand")
    assert(plan.contains("EqualTo(event_type,click)"), plan.take(3000))
    // the index pruned the OR: no other string column is probed
    assert(!plan.contains("EqualTo(props,click)"), plan.take(3000))
  }

  test("LIST edge query pushes the source InSet to the scan") {
    val plan = executed("edge_list_summary")
    // a normalized-vertex layout (the ingest invariant) keeps the source
    // list a bare-column predicate — it must prune at the edge scan, the
    // analog of the reference's one-range-per-source seek
    assert(plan.contains("source#") && plan.contains("IN (42,7)") ||
      plan.contains("In(source"), plan.take(3000))
  }

  test("decontamination broadcasts the benchmark shingle set") {
    // the corpus side must never shuffle into a join — eval sets are
    // small by nature, so their distinct shingles ride a broadcast
    val plan = executed("decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("excerpt attachment stays a shuffle-free scan+filter+project") {
    // HIT_EXCERPT is per-row token arithmetic — a map-side projection.
    // Any Exchange here would mean the excerpt path grew a join/agg and
    // lost its trivially-scalable shape.
    val plan = executed("qs_excerpt")
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("normalize:ipv4 canonicalizes literals at parse time, in the plan") {
    // the predicate compares against the CANONICAL forms only — the
    // zero-padded query spellings must not survive into the plan
    val plan = executed("jexl_normalize_ipv4")
    assert(plan.contains("10.2.17.1") && plan.contains("10.3.200.1"),
      plan.take(3000))
    assert(!plan.contains("010.002.017.001") && !plan.contains("10.003.200.1"),
      plan.take(3000))
  }

  test("visibility-recombined groupBy pushes its filters to the scan") {
    val plan = executed("grouping_vis")
    assert(plan.contains("PushedFilters"), plan.take(3000))
    assert(plan.contains("In(event_type") || plan.contains("event_type,click"),
      plan.take(3000))
    // PushedFilters renders truncated; the data filter shows the rest
    assert(plan.contains("> 90.0"), plan.take(3000))
  }

  test("facet sketch merge is a two-level sketch aggregation, no raw re-read") {
    // write path: partial hll_sketch_agg per (batch, key); read path:
    // hll_union_agg over sketch bytes only. Exactly one parquet scan of
    // events may appear — a second would mean the merge re-reads raw data
    val plan = executed("rel_facets_sketch")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 raw scan, got $scans\n" + plan.take(3000))
    assert(plan.toLowerCase.contains("hllsketchagg") ||
      plan.toLowerCase.contains("hll_sketch_agg"), plan.take(3000))
    assert(plan.toLowerCase.contains("hllunionagg") ||
      plan.toLowerCase.contains("hll_union_agg"), plan.take(3000))
  }

  test("PII redaction is a shuffle-free projection") {
    // redact + per-kind counts are a regexp_replace/extract chain over
    // each row — any Exchange means the scrub grew a join/agg and lost
    // its map-side-only scale story
    val plan = executed("text_redact_pii")
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("surprisal scoring joins the token stream against a vocabulary-sized model") {
    // the LM model is a groupBy(token) aggregate and scoring is an
    // equi-join on token — never a cross join, never a per-row probe of
    // a collected vocabulary (the model can be billions of entries at
    // corpus scale)
    val plan = executed("text_surprisal")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(3000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("composed curation pipeline: one corpus scan, two window shuffles, no joins") {
    // the end-to-end chain must stay one declarative plan: the Gopher
    // rules and the dedup fingerprint evaluate INSIDE the one documents
    // scan's projection, stage hand-offs are window filters (no join
    // probes that would re-execute the upstream), and the only
    // exchanges are the fingerprint window and the domain-cap window
    val plan = executed("corpus_pipeline")
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans\n" + plan.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges\n" + plan.take(3000))
    // the md5 fingerprint projects BELOW the shuffle (partition key is
    // a plain attribute there, not an md5 call) and text prunes away:
    // no Exchange output schema may carry the text column
    assert(!plan.contains("Exchange hashpartitioning(md5"),
      plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("leak-free pipeline: the cluster frame is the only join back in") {
    // quality → dedup → cap stays the one-scan window pipeline (pinned
    // above for corpus_pipeline); the leak-free ending may add exactly
    // ONE equi-join — the pair-bounded cluster frame onto the capped
    // ids — and the capped stage is read back from its cache, never
    // re-derived, for the split output
    val plan = executed("corpus_pipeline_leakfree")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan.take(3000))
    // AQE prints the pre-adaptive plan after "== Initial Plan ==" —
    // count joins in the FINAL section only
    val finalPlan = plan.split("== Initial Plan ==").head
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(finalPlan).length
    assert(joins == 1, s"expected 1 join (clusters), got $joins\n" + plan.take(3000))
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
  }

  test("span dedup derives shingles once and reuses the persisted arrays") {
    // the k-token span arrays are the expensive interpreted subtree; both
    // consumers (df aggregate + per-doc count) must read the InMemory
    // relation, not re-shingle the text
    val plan = executed("span_dedup")
    val memScans = "InMemoryTableScan".r.findAllIn(plan).length
    assert(memScans >= 2, s"expected >=2 cache reads, got $memScans\n" + plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("token-budget mixing is one stratum-keyed window, no extra exchange") {
    // a budget cut is an order statistic per stratum: exactly one
    // shuffle (hashpartitioning on the stratum) feeds the running sum
    val plan = executed("corpus_mix")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n" + plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("two-pass token budget broadcasts its cut table and windows per (stratum, bucket)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    val plan = graft.operators.Sampling.tokenBudgetTwoPass(docs, "doc_id",
        "lang", "n_tokens", Map("en" -> 6000L), 2000L)
      .queryExecution.executedPlan.toString
    // the driver's cut/offset table joins via broadcast (never a shuffle
    // of the corpus against a strata×buckets-sized table)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the boundary window partitions by (stratum, bucket) — parallel —
    // not by stratum alone (the serialized shape this variant replaces)
    assert(plan.contains("Window") && plan.contains("__cb"), plan.take(3000))
  }

  test("CMS facet estimates stay two aggregates, no joins over raw events") {
    // write path: one (batch, key) aggregate; read path: one key
    // aggregate over sketch bytes; the probe explode is a projection
    val plan = executed("rel_facets_cms")
    assert(!plan.contains("Join"), plan.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n" +
      plan.take(3000))
  }

  test("PQ re-rank plans an InSet needle filter + top-k, never a join or global sort") {
    // the returned frame touches only the RAW table: shortlist ids as a
    // pushed-down membership filter, then TakeOrderedAndProject — no
    // join, no cached residue (the op released its persisted pass)
    spark.catalog.clearCache()
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val plan = graft.operators.VectorOps
      .pqTopKReranked(emb, probeId = 0L, k = 10, shortlist = 20, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("vec_id") &&
      (plan.contains("IN (") || plan.contains("INSET") || plan.contains("In(")),
      plan.take(2000))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the PQ op must release its persisted normalized pass")
  }

  test("repetition profiling reads the corpus once and aggregates twice") {
    // ONE tagged explode feeds both arities — a second Generate would
    // mean tokens and bigrams each re-tokenize the text (the two-pass
    // shape this operator replaced)
    val plan = executed("text_repetition")
    val explodes = "Generate explode".r.findAllIn(plan).length
    assert(explodes == 1, s"expected 1 explode, got $explodes\n" + plan.take(3000))
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs >= 4, plan.take(3000)) // 2 logical aggs × partial+final
  }

  test("TF-IDF ranking broadcasts the idf table and heaps the top-k") {
    val plan = executed("text_rank_tfidf")
    // the ≤|terms|-row idf side must broadcast onto tf…
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // …and the top-20 must be per-partition heaps + driver merge,
    // never a global sort of every scored document
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("GlobalLimit"), plan.take(3000))
  }

  test("line dedup: keeper is a map-side-combined min aggregate, never a window sort") {
    // the keeper decision must be a partial-combinable aggregate (one
    // candidate per distinct line per input partition reaches the
    // shuffle) — a Window/Sort over the exploded line set would
    // sort-shuffle every occurrence (measured 5.3× the oracle at sf1)
    val plan = executed("dedup_lines")
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("partial_min") || plan.contains("min("),
      plan.take(3000))
    // joins touch only per-doc result rows: every join input is an
    // aggregate output, never the raw exploded line set
    assert(!plan.contains("RunningWindowFunction"), plan.take(3000))
  }
}
