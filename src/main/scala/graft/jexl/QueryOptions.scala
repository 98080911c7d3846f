package graft.jexl

/** One #UNIQUE field with its temporal granularity
  * (UniqueFields.java / UniqueGranularity.java: `FIELD[DAY]` syntax). */
final case class UniqueField(field: String, granularity: String = "ALL")

/** Query options smuggled into the query expression as `f:` pseudo-
  * functions (QueryFunctions.java:26-41) — `#GROUPBY`, `#UNIQUE`, `#SUM`,
  * `f:options(...)`, etc. The planner strips them from the tree before
  * evaluation (QueryOptionsFromQueryVisitor.java, 418 LoC analog) and the
  * query logic consumes the struct as post-evaluation transforms.
  */
final case class QueryOptions(
    groupBy: Seq[String] = Nil,
    sum: Seq[String] = Nil,
    min: Seq[String] = Nil,
    max: Seq[String] = Nil,
    count: Seq[String] = Nil,
    average: Seq[String] = Nil,
    unique: Seq[UniqueField] = Nil,
    mostRecentUnique: Boolean = false,
    rename: Map[String, String] = Map.empty,
    excerptFields: Seq[String] = Nil,
    limitFields: Map[String, Int] = Map.empty,
    lenient: Boolean = false,
    strict: Boolean = false,
    noExpansion: Seq[String] = Nil,
    raw: Map[String, Seq[String]] = Map.empty) {
  def isEmpty: Boolean = this == QueryOptions()
}

object QueryOptions {

  /** Option pseudo-function names in the `f:` namespace. */
  private val ByGranularity =
    Set("day", "hour", "minute", "second", "millisecond", "month", "year",
      "tenth_of_hour")
  private def isOptionFn(name: String): Boolean =
    Set("options", "groupby", "group_by", "sum", "min", "max", "count",
      "average", "unique", "most_recent_unique", "rename", "excerpt_fields",
      "lenient", "strict", "noexpansion", "no_expansion", "limit_fields")
      .contains(name) || (name.startsWith("unique_by_") &&
        ByGranularity.contains(name.stripPrefix("unique_by_"))) ||
      (name.startsWith("most_recent_unique_by_") &&
        ByGranularity.contains(name.stripPrefix("most_recent_unique_by_")))

  private def argStrings(args: List[Node.Arg]): Seq[String] = args.map {
    case Node.FieldArg(f) => f
    case Node.LitArg(l) => l.raw
  }

  /** `FIELD` or `FIELD[DAY]` (UniqueFields syntax). */
  private def parseUnique(s: String, default: String): UniqueField = {
    val m = "(?i)^\\s*([^\\[\\]]+?)\\s*(?:\\[\\s*([A-Za-z_]+)\\s*\\])?\\s*$".r
    s match {
      case m(f, null) => UniqueField(f.toUpperCase, default)
      case m(f, g) => UniqueField(f.toUpperCase, g.toUpperCase)
      case other => UniqueField(other.trim.toUpperCase, default)
    }
  }

  /** Strip option pseudo-functions from the tree WHEREVER they occur,
    * collecting them (the reference's visitor does the same — LUCENE
    * trailing `#FUNCTIONS` attach to the last parsed branch). Returns
    * (remaining predicate — None if the whole tree was options — and the
    * collected options). A boolean branch that was only options is
    * dropped. */
  def extract(ast: Node): (Option[Node], QueryOptions) = {
    var o = QueryOptions()

    def collect(ns: String, name: String, args: List[Node.Arg]): Unit = {
      val vals = argStrings(args)
      name match {
        case "options" =>
          o = o.copy(raw = o.raw ++ vals.grouped(2).collect {
            case Seq(k, v) => k -> (o.raw.getOrElse(k, Nil) :+ v)
          })
        case "groupby" | "group_by" => o = o.copy(groupBy = o.groupBy ++ vals)
        case "sum" => o = o.copy(sum = o.sum ++ vals)
        case "min" => o = o.copy(min = o.min ++ vals)
        case "max" => o = o.copy(max = o.max ++ vals)
        case "count" => o = o.copy(count = o.count ++ vals)
        case "average" => o = o.copy(average = o.average ++ vals)
        case "unique" =>
          o = o.copy(unique = o.unique ++ vals.map(parseUnique(_, "ALL")))
        case "most_recent_unique" =>
          o = o.copy(unique = o.unique ++ vals.map(parseUnique(_, "ALL")),
            mostRecentUnique = true)
        case "rename" =>
          // args are 'OLD=NEW' pairs (QueryOptionsFromQueryVisitor RENAME)
          o = o.copy(rename = o.rename ++ vals.flatMap { v =>
            v.split("=", 2) match {
              case Array(a, b) => Some(a.trim -> b.trim)
              case _ => None
            }
          })
        case "excerpt_fields" => o = o.copy(excerptFields = o.excerptFields ++ vals)
        case "lenient" => o = o.copy(lenient = true)
        case "strict" => o = o.copy(strict = true)
        case "noexpansion" | "no_expansion" =>
          o = o.copy(noExpansion = o.noExpansion ++ vals)
        case "limit_fields" =>
          o = o.copy(limitFields = o.limitFields ++ vals.flatMap { v =>
            v.split("=", 2) match {
              case Array(f, n) => scala.util.Try(f.trim -> n.trim.toInt).toOption
              case _ => None
            }
          })
        case by if by.startsWith("unique_by_") =>
          val g = by.stripPrefix("unique_by_").toUpperCase
          o = o.copy(unique = o.unique ++ vals.map(parseUnique(_, g)))
        case by if by.startsWith("most_recent_unique_by_") =>
          val g = by.stripPrefix("most_recent_unique_by_").toUpperCase
          o = o.copy(unique = o.unique ++ vals.map(parseUnique(_, g)),
            mostRecentUnique = true)
        case _ => ()
      }
    }

    def visit(n: Node): Option[Node] = n match {
      case Node.Func("f" | "filter", name, args) if isOptionFn(name.toLowerCase) =>
        collect("f", name.toLowerCase, args)
        None
      case Node.And(cs) =>
        cs.flatMap(visit) match {
          case Nil => None
          case one :: Nil => Some(one)
          case more => Some(Node.And(more))
        }
      case Node.Or(cs) =>
        cs.flatMap(visit) match {
          case Nil => None
          case one :: Nil => Some(one)
          case more => Some(Node.Or(more))
        }
      case Node.Not(c) =>
        visit(c).map(Node.Not.apply)
      case other => Some(other)
    }

    val remaining = visit(ast)
    (remaining, o)
  }
}
