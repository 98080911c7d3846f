package graft.jexl

/** Canonical JEXL rendering of a parsed query tree — the textual form
  * the reference's LUCENE→JEXL translation layer emits (expectations in
  * TestLuceneToJexlQueryParser.java:156-312): single-quoted string
  * literals with backslash escaping, `&&`/`||` with parens only where
  * precedence demands them, `!(…)` negation, and the
  * `((_Bounded_ = true) && (F >= 'a' && F <= 'b'))` range marker.
  * Rendering is a display/provenance surface (the `/plan` endpoint, the
  * translation spec); execution compiles the tree itself to Catalyst
  * columns and never round-trips through this text. */
object JexlRender {

  private def q(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def lit(l: Literal): String = l match {
    case Literal.Str(v)  => q(v)
    case Literal.Num(v)  => v.bigDecimal.toPlainString
    case Literal.Null    => "null"
    case Literal.Bool(b) => b.toString
  }

  private def opStr(op: CompareOp): String = op match {
    case CompareOp.Eq => "=="
    case CompareOp.Ne => "!="
    case CompareOp.Lt => "<"
    case CompareOp.Le => "<="
    case CompareOp.Gt => ">"
    case CompareOp.Ge => ">="
  }

  private def arg(a: Node.Arg): String = a match {
    case Node.FieldArg(f) => f
    case Node.LitArg(l)   => lit(l)
  }

  def render(n: Node): String = n match {
    case Node.FieldOp(f, op, v)   => s"$f ${opStr(op)} ${lit(v)}"
    case Node.RegexOp(f, p, neg)  => s"$f ${if (neg) "!~" else "=~"} ${q(p)}"
    case Node.NullCheck(f, true)  => s"$f == null"
    case Node.NullCheck(f, false) => s"$f != null"
    case Node.Bounded(f, lo, hi, loInc, hiInc) =>
      s"((_Bounded_ = true) && ($f ${if (loInc) ">=" else ">"} ${lit(lo)} && " +
        s"$f ${if (hiInc) "<=" else "<"} ${lit(hi)}))"
    case Node.Func(ns, name, args) =>
      s"$ns:$name(${args.map(arg).mkString(", ")})"
    case Node.FuncCmp(f, op, v) => s"${render(f)} ${opStr(op)} ${lit(v)}"
    case Node.FieldToField(l, op, r) => s"$l ${opStr(op)} $r"
    case Node.And(cs) => cs.map(c => paren(c, underAnd = true)).mkString(" && ")
    case Node.Or(cs)  => cs.map(c => paren(c, underAnd = false)).mkString(" || ")
    case Node.Not(c)  => s"!(${render(c)})"
  }

  /** `&&` binds tighter than `||`: only an Or child under an And needs
    * parens (TestLuceneToJexlQueryParser:158-159 shows both directions). */
  private def paren(n: Node, underAnd: Boolean): String = n match {
    case _: Node.Or if underAnd => s"(${render(n)})"
    case _ => render(n)
  }
}
