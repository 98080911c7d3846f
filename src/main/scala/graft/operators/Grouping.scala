package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouping-context co-occurrence over the long (exploded) event layout
  * `(uid, field, group, value)` — the `grouping:` JEXL namespace
  * (GroupingRequiredFilterFunctions.java:45-371) and the pairing rules of
  * DocumentGrouper.java:88-117.
  *
  * A "group" is the instance suffix of a repeated field (`NAME.0`/`AGE.0`
  * pair within group "0"). matchesInGroup(F1==v1, F2==v2, ...) keeps uids
  * where all conditions hold within the SAME group instance.
  */
object Grouping {

  final case class FieldMatch(field: String, predicate: Column => Column)
  object FieldMatch {
    def eq(field: String, value: String): FieldMatch =
      FieldMatch(field, _ === value)
  }

  /** uids where every (field, predicate) matches within one shared group.
    * Plan: ONE scan of the long table — see [[matchesInGroupKeyed]]. */
  def matchesInGroup(long: DataFrame, conditions: Seq[FieldMatch]): DataFrame =
    matchesInGroupKeyed(long, conditions,
      conditions.map(_ => (c: Column) => c))

  /** [[matchesInGroup]] with a per-condition group-identity transform.
    * Mirrors the reference's asymmetric position handling: the caller
    * passes the first field's pos-split identity and the remaining
    * fields' subgroup identity (GroupingRequiredFilterFunctions
    * .manageMatchesInGroupRemainingArgs).
    *
    * Plan: ONE scan — each row emits (condition-index, group-identity)
    * for every condition it satisfies (a conditional array + compact +
    * explode, all codegen'd), then a (uid, identity)-keyed aggregate
    * ORs the indices into a bitmask and keeps identities where EVERY
    * condition matched. Equivalent to inner-joining per-condition
    * filtered frames on (uid, identity) — the previous shape — but
    * without re-scanning the source once per condition (the source is
    * usually itself a union/explode pipeline, so each extra scan
    * re-executed that whole DAG). */
  def matchesInGroupKeyed(long: DataFrame, conditions: Seq[FieldMatch],
                          idents: Seq[Column => Column]): DataFrame =
    allMatched(long, conditions, idents).select("uid").distinct()

  /** [[matchesInGroupKeyed]] plus the HIT terms: one row per matching
    * uid with `HIT_TERM` = the distinct (FIELD, value) pairs that
    * satisfied conditions inside FULLY-matched groups (HitListArithmetic
    * records the matched terms; for grouping functions those are
    * exactly the keyed join's own matching rows). Same one-scan plan —
    * the per-group aggregate additionally collects the matching
    * (field, value) pairs, so hit emission costs one more aggregation
    * buffer over matching rows only, never a re-scan. */
  def matchesInGroupHits(long: DataFrame, conditions: Seq[FieldMatch],
                         idents: Seq[Column => Column]): DataFrame =
    allMatched(long, conditions, idents, withHits = true)
      .groupBy("uid")
      .agg(array_distinct(flatten(collect_list(col("_hits"))))
        .as("HIT_TERM"))

  /** grouping:getGroupsForMatchesInGroup — also return WHICH groups hit. */
  def groupsForMatches(long: DataFrame, conditions: Seq[FieldMatch]): DataFrame =
    allMatched(long, conditions, conditions.map(_ => (c: Column) => c))
      .select("uid", "group")

  /** Shared one-scan kernel: (uid, group-identity) pairs where all
    * `conditions` matched under their respective identities.
    * `withHits` adds a `_hits` column — the distinct (FIELD, value)
    * pairs that matched within the group — for [[matchesInGroupHits]]. */
  private def allMatched(long: DataFrame, conditions: Seq[FieldMatch],
                         idents: Seq[Column => Column],
                         withHits: Boolean = false): DataFrame = {
    require(conditions.nonEmpty && idents.size == conditions.size)
    require(conditions.size < 63, "more than 62 grouping conditions")
    val grp = col("group").cast("string")
    val hits = conditions.zip(idents).zipWithIndex.map {
      case ((c, ident), i) =>
        when(col("field") === c.field && c.predicate(col("value")),
          struct(lit(1L << i).as("mask"), ident(grp).as("g")))
    }
    // the any-condition disjunction pushes through a Union source and
    // constant-folds against literal `field` legs (the common way a
    // long view is built), so each leg scans with its own predicate
    // pushed down and the row-to-matches step only sees matching rows
    val any = conditions.map(c =>
      col("field") === c.field && c.predicate(col("value"))).reduce(_ || _)
    val hitTerm = struct(upper(col("field").cast("string")).as("field"),
      col("value").cast("string").as("value"))
    val matched =
      if (conditions.map(_.field).distinct.size == conditions.size)
        // distinct condition fields → a row matches at most ONE
        // condition: the when-chain IS the match row, no explode
        long.filter(any)
          .select(col("uid") +:
            hits.reduceRight((h, acc) => coalesce(h, acc)).as("m") +:
            (if (withHits) Seq(hitTerm.as("_h")) else Nil): _*)
      else
        long.filter(any)
          .select(col("uid") +:
            explode(array_compact(array(hits.toIndexedSeq: _*))).as("m") +:
            (if (withHits) Seq(hitTerm.as("_h")) else Nil): _*)
    val grouped = matched.filter(col("m.g").isNotNull)
      .groupBy(col("uid"), col("m.g").as("group"))
    (if (withHits)
      grouped.agg(bit_or(col("m.mask")).as("_mask"),
        array_distinct(collect_list(col("_h"))).as("_hits"))
    else grouped.agg(bit_or(col("m.mask")).as("_mask")))
      .filter(col("_mask") === (1L << conditions.size) - 1L)
  }

  /** Group identity under matchesInGroup: the LAST `pos`+1 dot-segments of
    * the grouping context (EvaluationPhaseFilterFunctions
    * .getMatchToRightOfPeriod:1692 — the field-name prefix contributes one
    * period, so the context alone needs ≥ pos+1 segments; null — never
    * matching — otherwise). pos=0 on `g_0.p_0.c_1` → `c_1`; on a simple
    * label `3` → `3` (identity). */
  def contextRight(label: Column, pos: Int): Column = {
    // pos=0 (the common case) is one codegen'd substring_index — no array
    // materialization; returns the whole label when it has no periods.
    if (pos == 0) substring_index(label, ".", -1)
    else {
      val parts = split(label, "\\.")
      when(size(parts) >= pos + 1,
        array_join(slice(parts, size(parts) - pos, lit(pos + 1)), "."))
    }
  }

  /** Group identity under matchesInGroupLeft: the context with its last
    * `pos`+1 segments removed (getMatchToLeftOfPeriod:1661) — siblings
    * under the same ancestor share an identity. Null when the context has
    * too few levels, so single-level groups (`NAME.0`) never co-occur
    * under Left, as in the reference. pos=0 on `g_0.p_0.c_1` → `g_0.p_0`;
    * pos=1 → `g_0`. */
  def contextLeft(label: Column, pos: Int): Column = {
    val parts = split(label, "\\.")
    when(size(parts) - pos - 1 >= 1,
      array_join(slice(parts, lit(1), size(parts) - pos - 1), "."))
  }

  /** #GROUPBY with grouping-context pairing (DocumentGrouper.java:118):
    * group documents by the VALUES of `keyFields` paired per group
    * instance, aggregating `aggFields` — e.g. GROUPBY(NAME) SUM(AGE)
    * sums each AGE.n against its same-group NAME.n. When the long frame
    * carries a `visibility` column, the group's output carries the
    * recombined marking of every contributing key AND value row
    * (GroupingUtils / MarkingFunctions analog — a reader of the
    * aggregate must satisfy each member's marking). */
  def groupByPaired(long: DataFrame, keyField: String, aggField: String): DataFrame = {
    val visCol = long.columns.find(_.equalsIgnoreCase("visibility"))
    def side(field: String, valueAs: Column => Column, v: String) =
      long.filter(col("field") === field)
        .select(Seq(col("uid"), col("group"), valueAs(col("value"))) ++
          visCol.map(c => col(c).as(s"vis_$v")): _*)
    val keys = side(keyField, _.as("group_key"), "k")
    val vals = side(aggField, _.cast("double").as("agg_val"), "v")
    val aggs = Seq(
      count(lit(1)).as("cnt"),
      sum(col("agg_val").cast("decimal(18,4)")).cast("double").as("sum_val"),
      min(col("agg_val")).as("min_val"),
      max(col("agg_val")).as("max_val")) ++
      visCol.map(_ => graft.vis.Visibility.combineAgg(
        graft.vis.Visibility.combineCols(col("vis_k"), col("vis_v")))
        .as("visibility"))
    // shuffled HASH join, not sort-merge: both sides arrive from plain
    // filtered scans with no useful ordering, the pairing key
    // (uid, group) is unique-ish per side (no skew fan-out), and the
    // downstream group-by neither needs nor reuses a sort — SMJ would
    // pay two full sorts of the paired stream for nothing (measured
    // ~35% of the gate's wall on the sf1 crossover probe)
    keys.hint("shuffle_hash").join(vals, Seq("uid", "group"))
      .groupBy("group_key")
      .agg(aggs.head, aggs.tail: _*)
  }
}
