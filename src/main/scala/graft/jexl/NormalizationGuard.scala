package graft.jexl

/** `#LENIENT` / `#STRICT` normalization-failure semantics
  * (ExpandMultiNormalizedTerms lenient markers): when a term's literal
  * normalizes under NONE of the field's declared normalizers,
  *
  *  - strict  → refuse the query (the reference's fatal term);
  *  - lenient → DROP the term from the tree (an AND keeps its other
  *    branches; an OR loses the branch);
  *  - neither → keep the term as-is (it matches under no normalizer at
  *    evaluation time — the compiled per-normalizer comparison fails
  *    safe), the engine's default.
  *
  * Only string literals on fields WITH declared normalizers are checked;
  * numeric/bool literals always normalize.
  */
object NormalizationGuard {

  def rewrite(ast: Node, model: QueryModel,
              lenient: Boolean, strict: Boolean): Node = {
    if (!lenient && !strict) return ast

    def normalizes(f: String, l: Literal): Boolean = {
      val norms = model.normalizersFor(f)
      norms.isEmpty || (l match {
        case Literal.Str(s) =>
          norms.exists(n => graft.functions.Normalizers.literalNormalizes(n, s))
        case _ => true
      })
    }
    def check(f: String, l: Literal): Boolean = {
      val ok = normalizes(f, l)
      if (!ok && strict)
        throw new PolicyException(
          s"strict: literal '${l.raw}' normalizes under none of " +
            s"$f's declared normalizers (${model.normalizersFor(f).mkString(",")})")
      ok
    }

    def visit(n: Node): Option[Node] = n match {
      case Node.And(cs) => cs.flatMap(visit) match {
        case Nil => None
        case one :: Nil => Some(one)
        case more => Some(Node.And(more))
      }
      case Node.Or(cs) => cs.flatMap(visit) match {
        case Nil => None
        case one :: Nil => Some(one)
        case more => Some(Node.Or(more))
      }
      case Node.Not(c) => visit(c).map(Node.Not.apply)
      case op @ Node.FieldOp(f, _, l) =>
        if (check(f, l)) Some(op) else None
      case b @ Node.Bounded(f, lo, hi, _, _) =>
        if (check(f, lo) && check(f, hi)) Some(b) else None
      case leaf => Some(leaf)
    }

    visit(ast).getOrElse(throw new PolicyException(
      "lenient normalization dropped every term (no evaluable predicate left)"))
  }
}
