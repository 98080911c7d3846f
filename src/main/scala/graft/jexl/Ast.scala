package graft.jexl

/** JEXL query AST — the IR of the whole front-end, mirroring the shapes the
  * reference planner manipulates (ASTJexlScript; see SURVEY.md §2.2/§4.1).
  * LUCENE parses into the same AST (LuceneToJexlQueryParser.java:26 analog).
  */
sealed trait Node

object Node {
  // Leaves
  final case class FieldOp(field: String, op: CompareOp, value: Literal) extends Node
  final case class RegexOp(field: String, pattern: String, negated: Boolean) extends Node
  final case class NullCheck(field: String, isNull: Boolean) extends Node
  /** Bounded range `((_Bounded_ = true) && (F >= a && F <= b))` / LUCENE `F:[a TO b]`. */
  final case class Bounded(field: String, lo: Literal, hi: Literal,
                           loInc: Boolean = true, hiInc: Boolean = true) extends Node
  /** `filter:` / `f:` / `content:` / `grouping:` / `geo:` function call. */
  final case class Func(namespace: String, name: String, args: List[Arg]) extends Node
  /** Value-returning function compared to a literal:
    * `filter:getMaxTime(F) >= 123` (EvaluationPhaseFilterFunctions
    * getMinTime/getMaxTime/getMinValue/getMaxValue, :1447-1510). */
  final case class FuncCmp(func: Func, op: CompareOp, value: Literal) extends Node
  /** Field-to-field comparison (forced eval-only in the reference,
    * DefaultQueryPlanner.java:1536 — native for us). */
  final case class FieldToField(left: String, op: CompareOp, right: String) extends Node

  // Boolean structure
  final case class And(children: List[Node]) extends Node
  final case class Or(children: List[Node]) extends Node
  final case class Not(child: Node) extends Node

  sealed trait Arg
  final case class FieldArg(name: String) extends Arg
  final case class LitArg(lit: Literal) extends Arg
}

sealed trait CompareOp { def flip: CompareOp }
object CompareOp {
  case object Eq extends CompareOp { def flip = Eq }
  case object Ne extends CompareOp { def flip = Ne }
  case object Lt extends CompareOp { def flip = Gt }
  case object Le extends CompareOp { def flip = Ge }
  case object Gt extends CompareOp { def flip = Lt }
  case object Ge extends CompareOp { def flip = Le }
  def parse(s: String): CompareOp = s match {
    case "==" | "=" => Eq
    case "!=" => Ne
    case "<" => Lt
    case "<=" => Le
    case ">" => Gt
    case ">=" => Ge
    case other => throw new IllegalArgumentException(s"unknown operator $other")
  }
}

sealed trait Literal { def raw: String }
object Literal {
  final case class Str(value: String) extends Literal { def raw = value }
  final case class Num(value: BigDecimal) extends Literal { def raw = value.toString }
  case object Null extends Literal { def raw = "null" }
  final case class Bool(value: Boolean) extends Literal { def raw = value.toString }
}
