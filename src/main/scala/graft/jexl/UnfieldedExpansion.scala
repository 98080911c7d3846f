package graft.jexl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unfielded-term expansion driven by the GLOBAL INDEX
  * (UnfieldedIndexExpansionVisitor.java:40): `_ANYFIELD_ == 'v'` expands
  * to an OR over the fields the index says actually CONTAIN 'v', not over
  * every string column in the schema. On a wide dynamic schema the
  * difference is a 3-branch OR vs a 2,000-branch one — and the pruned OR
  * keeps parquet pushdown and column pruning effective.
  *
  * The index probe is a driver-side lookup whose answer is a handful of
  * FIELD NAMES — bounded by `threshold + 1` rows collected
  * (unfieldedExpansionThreshold, BASELINE.md); beyond the cap the query
  * is refused like the reference's fatal expansion overflow.
  */
object UnfieldedExpansion {

  private def isAny(f: String): Boolean = f.equalsIgnoreCase("_ANYFIELD_")

  /** Marker for "the index holds no field containing this literal": the
    * compiler resolves an unknown field to no columns, which evaluates to
    * false for positive leaves and true for NE — exactly the absent-term
    * semantics. */
  val NoIndexedField = "_NO_INDEXED_FIELD_"

  /** Rewrite `_ANYFIELD_` leaves through `fieldsFor(literalOrPattern,
    * isRegex)`. Non-unfielded nodes pass through untouched. */
  def rewrite(ast: Node, fieldsFor: (String, Boolean) => Seq[String],
              threshold: Int = 50): Node = {
    def expand(op: Node.FieldOp): Node = expandWith(
      fieldsFor(op.value.raw, false), f => op.copy(field = f))
    def expandRx(op: Node.RegexOp): Node = expandWith(
      fieldsFor(op.pattern, true), f => op.copy(field = f))
    def expandWith(fields: Seq[String], leaf: String => Node): Node = {
      if (fields.size > threshold)
        throw new PolicyException(
          s"unfielded term expands to ${fields.size} fields (max $threshold)")
      fields match {
        case Nil => leaf(NoIndexedField)
        case one :: Nil => leaf(one)
        case many => Node.Or(many.map(leaf).toList)
      }
    }
    def walk(n: Node): Node = n match {
      case Node.And(cs) => Node.And(cs.map(walk))
      case Node.Or(cs) => Node.Or(cs.map(walk))
      case Node.Not(c) => Node.Not(walk(c))
      case op @ Node.FieldOp(f, _, _) if isAny(f) => expand(op)
      case rx @ Node.RegexOp(f, _, _) if isAny(f) => expandRx(rx)
      case b @ Node.Bounded(f, _, _, _, _) if isAny(f) => b // range: not index-expandable
      case leaf => leaf
    }
    walk(ast)
  }

  /** Value→fields probe against an [[graft.ingest.Ingest.globalIndex]]
    * frame. The distinct-field projection is tiny (bounded by the field
    * inventory); the collect is capped at threshold + 1. */
  def indexLookup(globalIndex: DataFrame, threshold: Int = 50)
      : (String, Boolean) => Seq[String] = { (value, regex) =>
    val m = if (regex) col("value").rlike("^(?:" + value + ")$")
            else col("value") === lit(value)
    globalIndex.filter(m).select("field").distinct()
      .limit(threshold + 1).collect().map(_.getString(0)).toSeq.sorted
  }
}
