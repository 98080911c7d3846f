package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based age-off (warehouse/age-off ConfigurableAgeOffFilter
  * .java:42-191): data survives if its age is younger than the TTL of the
  * FIRST rule that claims it (AppliedRule.isFilterRuleApplied — rules are
  * ordered, one winner); rows no rule claims fall to the default TTL
  * (accept:186-188), and rows newer than the short-circuit horizon pass
  * without consulting any rule (accept:170-172). The reference runs this
  * as a scan/compaction iterator; here it is one chained `when` predicate
  * — codegen'd, map-side, zero shuffle, so an age-off sweep over 100 TB
  * is a pure scan+filter write.
  *
  * Rule vocabulary (DataTypeAgeOffFilter, FieldAgeOffFilter,
  * ColumnVisibilityRegexFilter analogs) maps to `appliesTo` predicates
  * over the event layout's columns.
  */
object AgeOff {

  /** One ordered rule (AppliedRule): `appliesTo` decides whether the rule
    * CLAIMS a row; a claimed row survives iff newer than scanStart − ttl. */
  final case class Rule(appliesTo: Column, ttlMillis: Long)

  /** DataTypeAgeOffFilter: claim rows of the listed datatypes. */
  def dataTypeRule(dataTypes: Seq[String], ttlMillis: Long,
                   typeCol: String = "datatype"): Rule =
    Rule(col(typeCol).isin(dataTypes: _*), ttlMillis)

  /** ColumnVisibilityRegexFilter: claim rows whose marking matches. */
  def visibilityRule(pattern: String, ttlMillis: Long,
                     visCol: String = "visibility"): Rule =
    Rule(col(visCol).rlike(pattern), ttlMillis)

  /** ColumnVisibilityTokenizingFilter + TokenTtlTrie.scan(:40-84): the
    * marking is scanned for configured tokens and the FIRST-configured
    * token present decides the TTL (configuration order is priority).
    * One ordered Rule per token — the first-claim-wins chain IS the
    * trie's priority scan. Tokens match whole visibility atoms, not
    * substrings. */
  def visibilityTokenRules(specs: Seq[(String, Long)],
                           visCol: String = "visibility"): Seq[Rule] =
    specs.map { case (tok, ttl) =>
      Rule(col(visCol).rlike(
        "(^|[&|()])" + java.util.regex.Pattern.quote(tok) + "([&|()]|$)"), ttl)
    }

  /** The accept predicate (ConfigurableAgeOffFilter.accept:163-191). */
  def keepExpr(tsCol: String, scanStartMillis: Long, defaultTtlMillis: Long,
               rules: Seq[Rule],
               shortCircuitTtlMillis: Option[Long] = None): Column = {
    def newerThan(ttl: Long): Column =
      col(tsCol) > timestamp_millis(lit(scanStartMillis - ttl))
    val decided = rules.foldRight(newerThan(defaultTtlMillis)) { (r, rest) =>
      when(r.appliesTo, newerThan(r.ttlMillis)).otherwise(rest)
    }
    val full = shortCircuitTtlMillis.fold(decided)(sc => newerThan(sc) || decided)
    // Every branch of the rule chain requires ts > scanStart − ttl_branch,
    // so the whole predicate IMPLIES ts > scanStart − max(all TTLs).
    // Conjoin that bound explicitly: the when/OR chain itself cannot
    // translate to a parquet filter, but the redundant bare-column bound
    // can (guide §6 — an age-off sweep then row-group-skips everything
    // older than the longest TTL instead of post-filtering a full scan).
    // Row set is unchanged: the conjunct is true whenever `full` is.
    val maxTtl = (Seq(defaultTtlMillis) ++ rules.map(_.ttlMillis) ++
      shortCircuitTtlMillis.toSeq).max
    full && newerThan(maxTtl)
  }

  /** Surviving rows of an age-off sweep. */
  def filter(df: DataFrame, tsCol: String, scanStartMillis: Long,
             defaultTtlMillis: Long, rules: Seq[Rule],
             shortCircuitTtlMillis: Option[Long] = None): DataFrame =
    df.filter(keepExpr(tsCol, scanStartMillis, defaultTtlMillis, rules,
      shortCircuitTtlMillis))
}
