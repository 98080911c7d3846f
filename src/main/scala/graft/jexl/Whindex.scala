package graft.jexl

/** Whindex rewrite (whindex/WhindexVisitor.java:58-71): value-specific
  * field remapping. When a query conjoins a function/predicate on a
  * generic field with a marker equality (e.g. `geowave:intersects(GEO, …)
  * && PLANET == 'MARS'`), and a mapping declares (GEO, PLANET=MARS) →
  * MARS_GEO, the generic field is swapped for the value-specific one and
  * the marker term is dropped — the value-specific field is a smaller,
  * pre-filtered index.
  */
object Whindex {

  /** (markerField, markerValue, genericField) → replacementField */
  final case class Mapping(markerField: String, markerValue: String,
                           genericField: String, replacement: String)

  def rewrite(ast: Node, mappings: Seq[Mapping]): Node = ast match {
    case Node.And(children) =>
      val markers = children.collect {
        case Node.FieldOp(f, CompareOp.Eq, l) => (f.toUpperCase, l.raw)
      }.toSet
      val applicable = mappings.filter(m =>
        markers.contains((m.markerField.toUpperCase, m.markerValue)))
      // a mapping only FIRES when a sibling term actually references its
      // generic field (WhindexVisitor rewrites the intersection of marker
      // and mappable term) — otherwise the marker is an ordinary
      // predicate the user wrote and MUST survive
      val effective = applicable.filter(m =>
        children.exists(references(_, m.genericField)))
      if (effective.isEmpty) Node.And(children.map(rewrite(_, mappings)))
      else {
        val rewritten = children.flatMap {
          case Node.FieldOp(f, CompareOp.Eq, l)
              if effective.exists(m =>
                m.markerField.equalsIgnoreCase(f) && m.markerValue == l.raw) =>
            None // drop the consumed marker term
          case other => Some(swapFields(rewrite(other, mappings), effective))
        }
        rewritten match {
          case one :: Nil => one
          case more => Node.And(more)
        }
      }
    case Node.Or(cs) => Node.Or(cs.map(rewrite(_, mappings)))
    case Node.Not(c) => Node.Not(rewrite(c, mappings))
    case leaf => leaf
  }

  /** Does any leaf under `n` reference `field`? */
  private def references(n: Node, field: String): Boolean = n match {
    case Node.And(cs) => cs.exists(references(_, field))
    case Node.Or(cs) => cs.exists(references(_, field))
    case Node.Not(c) => references(c, field)
    case Node.FieldOp(f, _, _) => f.equalsIgnoreCase(field)
    case Node.RegexOp(f, _, _) => f.equalsIgnoreCase(field)
    case Node.NullCheck(f, _) => f.equalsIgnoreCase(field)
    case Node.Bounded(f, _, _, _, _) => f.equalsIgnoreCase(field)
    case Node.Func(_, _, args) => args.exists {
      case Node.FieldArg(f) => f.equalsIgnoreCase(field)
      case _ => false
    }
    case Node.FuncCmp(fn, _, _) => references(fn, field)
    case Node.FieldToField(l, _, r) =>
      l.equalsIgnoreCase(field) || r.equalsIgnoreCase(field)
  }

  private def swapFields(n: Node, ms: Seq[Mapping]): Node = {
    def swap(f: String): String =
      ms.find(_.genericField.equalsIgnoreCase(f)).map(_.replacement).getOrElse(f)
    n match {
      // the swap must reach terms nested under boolean structure — the
      // marker is already consumed, so a missed leaf would query the
      // generic field the deployment no longer indexes for this value
      case Node.And(cs) => Node.And(cs.map(swapFields(_, ms)))
      case Node.Or(cs) => Node.Or(cs.map(swapFields(_, ms)))
      case Node.Not(c) => Node.Not(swapFields(c, ms))
      case Node.FieldOp(f, op, l) => Node.FieldOp(swap(f), op, l)
      case Node.RegexOp(f, p, neg) => Node.RegexOp(swap(f), p, neg)
      case Node.NullCheck(f, isNull) => Node.NullCheck(swap(f), isNull)
      case Node.Bounded(f, lo, hi, li, hi2) => Node.Bounded(swap(f), lo, hi, li, hi2)
      case Node.FieldToField(l, op, r) => Node.FieldToField(swap(l), op, swap(r))
      case Node.Func(ns, name, args) =>
        Node.Func(ns, name, args.map {
          case Node.FieldArg(f) => Node.FieldArg(swap(f))
          case a => a
        })
      case Node.FuncCmp(fn, op, v) =>
        swapFields(fn, ms) match {
          case f: Node.Func => Node.FuncCmp(f, op, v)
          case _ => n
        }
    }
  }
}
