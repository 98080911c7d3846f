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
      if (applicable.isEmpty) Node.And(children.map(rewrite(_, mappings)))
      else {
        val rewritten = children.flatMap {
          case fo @ Node.FieldOp(f, CompareOp.Eq, l)
              if applicable.exists(m =>
                m.markerField.equalsIgnoreCase(f) && m.markerValue == l.raw) =>
            None // drop the consumed marker term
          case other => Some(swapFields(rewrite(other, mappings), applicable))
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

  private def swapFields(n: Node, ms: Seq[Mapping]): Node = {
    def swap(f: String): String =
      ms.find(_.genericField.equalsIgnoreCase(f)).map(_.replacement).getOrElse(f)
    n match {
      case Node.FieldOp(f, op, l) => Node.FieldOp(swap(f), op, l)
      case Node.RegexOp(f, p, neg) => Node.RegexOp(swap(f), p, neg)
      case Node.Bounded(f, lo, hi, li, hi2) => Node.Bounded(swap(f), lo, hi, li, hi2)
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
      case other => other
    }
  }
}
