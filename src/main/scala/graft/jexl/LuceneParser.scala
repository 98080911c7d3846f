package graft.jexl

import scala.collection.mutable.ListBuffer

/** LUCENE front-end → the same JEXL AST (the reference compiles LUCENE to
  * JEXL: LuceneToJexlQueryParser.java:26; translation cases asserted in
  * TestLuceneToJexlQueryParser.java:53-159,305-312).
  *
  * Supported surface:
  *   FIELD:value                →  FIELD == 'value'
  *   FIELD:[a TO b] / {a TO b}  →  bounded range (inclusive/exclusive)
  *   FIELD:val* / va?ue         →  FIELD =~ 'val.*' / 'va.ue'  (wildcards)
  *   FIELD:"a b c"              →  content:phrase(FIELD, 'a','b','c')
  *   FIELD:"a b"~N              →  content:within(FIELD, N, 'a','b')  (slop)
  *   a AND b, a OR b, NOT a, ( ) — implicit conjunction = AND
  *   #ISNOTNULL(F) / #ISNULL(F) / #INCLUDE(F, rx) / #EXCLUDE(F, rx)
  *   #JEXL("...")               →  escape hatch, parsed as JEXL
  */
object LuceneParser {
  def parse(input: String): Node = new LuceneParser(input).parseQuery()

  /** Lucene wildcard → Java regex (TestLuceneToJexlQueryParser:305-312). */
  private[jexl] def wildcardToRegex(term: String): String = {
    val sb = new StringBuilder
    term.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }
}

private final class LuceneParser(input: String) {
  private var pos = 0
  private def eof = pos >= input.length
  private def skipWs(): Unit = while (!eof && input(pos).isWhitespace) pos += 1
  private def peekChar: Char = input(pos)

  def parseQuery(): Node = {
    val n = parseOr()
    skipWs()
    if (!eof) throw new ParseException(
      s"trailing LUCENE input at $pos: '${input.substring(pos).take(20)}'")
    n
  }

  private def parseOr(): Node = {
    val cs = ListBuffer(parseAnd())
    while (acceptWord("OR")) cs += parseAnd()
    if (cs.size == 1) cs.head else Node.Or(cs.toList)
  }

  private def parseAnd(): Node = {
    val cs = ListBuffer(parseUnary())
    var continue = true
    while (continue) {
      if (acceptWord("AND")) cs += parseUnary()
      else {
        // implicit conjunction: another clause follows without an operator
        skipWs()
        if (!eof && peekChar != ')' && !peeksWord("OR") && !peeksWord("AND"))
          cs += parseUnary()
        else continue = false
      }
    }
    if (cs.size == 1) cs.head else Node.And(cs.toList)
  }

  private def parseUnary(): Node = {
    skipWs()
    if (acceptWord("NOT")) return Node.Not(parseUnary())
    if (!eof && peekChar == '-') { pos += 1; return Node.Not(parseUnary()) }
    if (!eof && peekChar == '(') {
      pos += 1
      val n = parseOr()
      skipWs()
      if (eof || peekChar != ')') throw new ParseException(s"expected ')' at $pos")
      pos += 1
      return n
    }
    parseClause()
  }

  private def peeksWord(w: String): Boolean = {
    skipWs()
    input.startsWith(w, pos) &&
      (pos + w.length == input.length || !input(pos + w.length).isLetterOrDigit)
  }

  private def acceptWord(w: String): Boolean =
    if (peeksWord(w)) { pos += w.length; true } else false

  private def parseClause(): Node = {
    skipWs()
    if (!eof && peekChar == '#') return parseHashFunction()
    val field = parseTermText(stopAtColon = true)
    skipWs()
    if (!eof && peekChar == ':') {
      pos += 1
      parseValueFor(field)
    } else {
      // unfielded term — _ANYFIELD_ semantics (UnfieldedIndexExpansionVisitor)
      Node.FieldOp("_ANYFIELD_", CompareOp.Eq, Literal.Str(field))
    }
  }

  private def parseValueFor(field: String): Node = {
    skipWs()
    if (eof) throw new ParseException(s"expected value after '$field:'")
    peekChar match {
      case '[' | '{' =>
        val loInc = peekChar == '['
        pos += 1
        val lo = parseTermText()
        if (!acceptWord("TO")) throw new ParseException(s"expected TO in range at $pos")
        val hi = parseTermText()
        skipWs()
        val hiInc = !eof && peekChar == ']'
        if (eof || (peekChar != ']' && peekChar != '}'))
          throw new ParseException(s"expected ] or }} at $pos")
        pos += 1
        Node.Bounded(field, termLit(lo), termLit(hi), loInc, hiInc)
      case '"' =>
        pos += 1
        val start = pos
        while (!eof && peekChar != '"') pos += 1
        if (eof) throw new ParseException("unterminated phrase")
        val phrase = input.substring(start, pos)
        pos += 1
        val terms = phrase.split("\\s+").filter(_.nonEmpty).toList
        // phrase slop `FIELD:"a b"~N` → content:within(FIELD, N, terms)
        // (SlopQueryNodeBuilder.java:44-47: JexlPhraseNode + slop →
        // JexlWithinNode; a 1-term phrase ignores the slop)
        val slop: Option[Int] =
          if (!eof && peekChar == '~') {
            pos += 1
            val s = pos
            while (!eof && peekChar.isDigit) pos += 1
            if (pos == s) throw new ParseException(s"expected slop number at $pos")
            Some(input.substring(s, pos).toInt)
          } else None
        if (terms.size == 1) Node.FieldOp(field, CompareOp.Eq, Literal.Str(terms.head))
        else slop match {
          case Some(n) => Node.Func("content", "within",
            Node.FieldArg(field) :: Node.LitArg(Literal.Num(BigDecimal(n))) ::
              terms.map(t => Node.LitArg(Literal.Str(t))))
          case None => Node.Func("content", "phrase",
            Node.FieldArg(field) :: terms.map(t => Node.LitArg(Literal.Str(t))))
        }
      case _ =>
        val term = parseTermText()
        if (term.contains('*') || term.contains('?'))
          Node.RegexOp(field, LuceneParser.wildcardToRegex(term), negated = false)
        else Node.FieldOp(field, CompareOp.Eq, termLit(term))
    }
  }

  /** `#FUNC(arg, ...)` pseudo-functions. */
  private def parseHashFunction(): Node = {
    pos += 1 // '#'
    val name = parseTermText(stopAtColon = false, stopAtParen = true).toUpperCase
    skipWs()
    if (eof || peekChar != '(') throw new ParseException(s"expected ( after #$name")
    pos += 1
    val args = ListBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 1
    var inQuote = false
    while (!eof && depth > 0) {
      val c = peekChar
      if (inQuote) {
        if (c == '\'' || c == '"') inQuote = false
        sb += c
      } else c match {
        case '\'' | '"' => inQuote = true; sb += c
        case '(' => depth += 1; sb += c
        case ')' =>
          depth -= 1
          if (depth > 0) sb += c
        case ',' if depth == 1 => args += sb.toString.trim; sb.clear()
        case other => sb += other
      }
      pos += 1
    }
    if (depth != 0) throw new ParseException(s"unterminated #$name(")
    if (sb.toString.trim.nonEmpty) args += sb.toString.trim
    def unq(s: String): String =
      if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
        s.substring(1, s.length - 1) else s
    // #INCLUDE/#EXCLUDE/#TEXT multi-field form: `#INCLUDE(AND|OR, F1, v1,
    // F2, v2, ...)` → boolean combination of per-field calls
    // (TestLuceneToJexlQueryParser:99-103, AbstractEvaluationPhaseFunction)
    def pairCombo(fn: String): Node = {
      val (op, pairs) =
        if (args.head.equalsIgnoreCase("AND") || args.head.equalsIgnoreCase("OR"))
          (args.head.toUpperCase, args.tail.toList)
        else ("AND", args.toList)
      if (pairs.size % 2 != 0)
        throw new ParseException(s"#$name needs (field, value) pairs")
      val leaves = pairs.grouped(2).map { case List(f, v) =>
        Node.Func("filter", fn,
          List(Node.FieldArg(f), Node.LitArg(Literal.Str(unq(v))))): Node
      }.toList
      if (leaves.size == 1) leaves.head
      else if (op == "AND") Node.And(leaves) else Node.Or(leaves)
    }
    def lits(xs: Seq[String]): List[Node.Arg] =
      xs.toList.map(a => Node.LitArg(Literal.Str(unq(a))))
    name match {
      case "ISNULL" => Node.NullCheck(args.head, isNull = true)
      case "ISNOTNULL" => Node.NullCheck(args.head, isNull = false)
      case "INCLUDE" => pairCombo("includeRegex")
      case "EXCLUDE" => pairCombo("excludeRegex")
      // #TEXT → f:includeText with the same AND/OR pair form (Text.java)
      case "TEXT" => pairCombo("includeText")
      case "JEXL" => JexlParser.parse(unq(args.mkString(",")))
      // #EVALUATION_ONLY marks its subtree "evaluate, don't index-drive"
      // (EvaluationOnly.java) — every predicate here is evaluation, so
      // the marker reduces to parsing the embedded JEXL
      case "EVALUATION_ONLY" => JexlParser.parse(unq(args.mkString(",")))
      // eval-phase functions whose signatures carry FIELD arguments — the
      // generic all-literals fallback would fail to compile them
      // (functions/jexl/*.java toString() translations):
      case "GET_ALL_MATCHES" => Node.Func("filter", "getAllMatches",
        Node.FieldArg(args.head) :: lits(args.tail.toSeq))
      case "OCCURRENCE" => Node.Func("filter", "occurrence",
        Node.FieldArg(args.head) :: lits(args.tail.toSeq))
      case "COMPARE" => Node.Func("filter", "compare",
        List(Node.FieldArg(args.head), Node.LitArg(Literal.Str(unq(args(1)))),
          Node.LitArg(Literal.Str(unq(args(2)))), Node.FieldArg(args(3))))
      case "TIME_FUNCTION" => Node.Func("filter", "timeFunction",
        List(Node.FieldArg(args.head), Node.FieldArg(args(1)),
          Node.LitArg(Literal.Str(unq(args(2)))),
          Node.LitArg(Literal.Str(unq(args(3))))))
      case "MATCHES_AT_LEAST_COUNT_OF" => Node.Func("filter", "matchesAtLeastCountOf",
        Node.LitArg(Literal.Str(unq(args.head))) :: Node.FieldArg(args(1)) ::
          lits(args.drop(2).toSeq))
      case "MATCHES_IN_GROUP" | "MATCHES_IN_GROUP_LEFT" =>
        val fn = if (name == "MATCHES_IN_GROUP") "matchesInGroup"
                 else "matchesInGroupLeft"
        Node.Func("grouping", fn, args.toList.zipWithIndex.map {
          case (a, i) if i % 2 == 0 => Node.FieldArg(a): Node.Arg
          case (a, _) => Node.LitArg(Literal.Str(unq(a))): Node.Arg
        })
      case "ATOM_VALUES_MATCH" => Node.Func("grouping", "atomValuesMatch",
        args.toList.map(a => Node.FieldArg(a): Node.Arg))
      // #DATE(F, after|before|between, dates..[, fmt]) → filter:*Date[s];
      // an unrecognized type token defaults the op to betweenDates and is
      // PREPENDED as the first positional argument — i.e. the first DATE
      // (DateFunction.java:52-71 toString appends it before the rest);
      // downstream arity then decides whether a trailing token is a
      // format, matching the reference's overload resolution.
      case "DATE" =>
        val tpe = unq(args(1)).toLowerCase
        val known = Set("after", "before", "between").contains(tpe)
        val fn = (if (known) tpe else "between") +
          "Date" + (if (!known || tpe == "between") "s" else "")
        val rest = if (known) args.drop(2).toSeq else args.tail.toSeq
        Node.Func("filter", fn, Node.FieldArg(args.head) :: lits(rest))
      // #MATCHES → f:matchesRegex with the AND/OR pair form (Matches.java)
      case "MATCHES" => pairCombo("matchesRegex")
      // #LOADED(after|before|between, dates..) → filter:*LoadDate[s] on
      // the LOAD_DATE field (Loaded.java:55-73). An unknown first token
      // is the FIRST DATE of an implicit between (Loaded.toString
      // prepends it), so #LOADED(d1, d2) → betweenLoadDates(LOAD_DATE,
      // d1, d2) and the 1-arg #LOADED(d) → the single-date between form.
      case "LOADED" =>
        val tpe = unq(args.head).toLowerCase
        val known = Set("after", "before", "between").contains(tpe)
        val fn = (if (known) tpe else "between") +
          "LoadDate" + (if (!known || tpe == "between") "s" else "")
        val rest = if (known) args.tail.toSeq else args.toSeq
        Node.Func("filter", fn, Node.FieldArg("LOAD_DATE") :: lits(rest))
      // #GEO(bounding_box|circle, FIELD.., lits..) → geo:within_*
      // (GeoFunction.java:27-47: the 7-param bounding box carries TWO
      // field args, every other form one)
      case "GEO" =>
        val op = unq(args.head).toLowerCase
        val rest = args.tail.toList
        val mapped: List[Node.Arg] = (op, rest.size) match {
          case ("bounding_box", 6) =>
            Node.FieldArg(rest.head) :: Node.FieldArg(rest(1)) ::
              lits(rest.drop(2))
          case _ => Node.FieldArg(rest.head) :: lits(rest.tail)
        }
        Node.Func("geo", "within_" + op, mapped)
      // geowave topological predicates (Geowave.java:58-99)
      case "CONTAINS" | "COVERED_BY" | "COVERS" | "CROSSES" | "INTERSECTS" |
           "OVERLAPS" | "WITHIN" =>
        Node.Func("geowave", name.toLowerCase,
          Node.FieldArg(args.head) :: lits(args.tail.toSeq))
      case other => Node.Func("f", other.toLowerCase,
        args.toList.map(a => Node.LitArg(Literal.Str(unq(a)))))
    }
  }

  private def termLit(s: String): Literal =
    if (s.nonEmpty && s.forall(c => c.isDigit || c == '.' || c == '-') &&
        s.exists(_.isDigit) && !s.startsWith("-") || // plain number
        (s.startsWith("-") && s.length > 1 && s.drop(1).forall(c => c.isDigit || c == '.')))
      scala.util.Try(Literal.Num(BigDecimal(s))).getOrElse(Literal.Str(s))
    else if (s == "*") Literal.Str("*")
    else Literal.Str(s)

  private def parseTermText(stopAtColon: Boolean = false,
                            stopAtParen: Boolean = false): String = {
    skipWs()
    val start = pos
    while (!eof && !peekChar.isWhitespace && peekChar != ')' && peekChar != ']' &&
           peekChar != '}' && (!stopAtColon || peekChar != ':') &&
           (!stopAtParen || peekChar != '(')) pos += 1
    if (pos == start) throw new ParseException(s"expected term at $pos")
    input.substring(start, pos)
  }
}
