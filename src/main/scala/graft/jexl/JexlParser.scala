package graft.jexl

import scala.collection.mutable.ListBuffer

/** Recursive-descent parser for the JEXL query subset the reference's query
  * language uses (commons-jexl3 grammar, vendored in the reference at
  * query-core .../org/apache/commons/jexl3; operators per SURVEY.md §2.2):
  *
  *   expr    := orExpr
  *   orExpr  := andExpr ( '||' andExpr )*
  *   andExpr := unary ( '&&' unary )*
  *   unary   := '!' unary | '(' expr ')' | leaf
  *   leaf    := func | fieldCmp | fieldRegex | nullCmp
  *   func    := ident ':' ident '(' args ')'
  *
  * `v == FIELD` (literal-first) is canonicalized to `FIELD == v` like the
  * reference's InvertNodeVisitor (DefaultQueryPlanner.java:1264).
  * Bounded-range conjunctions `(F >= a && F <= b)` collapse to
  * Node.Bounded like the `_Bounded_` marker.
  */
final class ParseException(msg: String) extends RuntimeException(msg)

object JexlParser {
  def parse(input: String): Node = {
    val p = new JexlParser(input)
    val n = p.parseExpr()
    p.skipWs()
    if (!p.eof) throw new ParseException(s"trailing input at ${p.pos}: '${p.rest.take(20)}'")
    collapseBounded(n)
  }

  /** `F >= a && F <= b` (same field, both bounds) → Bounded(F, a, b) —
    * the `((_Bounded_ = true) && ...)` marker semantics. */
  private[jexl] def collapseBounded(n: Node): Node = n match {
    case Node.And(cs0) =>
      val cs = cs0.map(collapseBounded)
      val (los, rest1) = cs.partition {
        case Node.FieldOp(_, CompareOp.Ge | CompareOp.Gt, _) => true; case _ => false
      }
      val (his, rest2) = rest1.partition {
        case Node.FieldOp(_, CompareOp.Le | CompareOp.Lt, _) => true; case _ => false
      }
      val loByField = los.collect { case f: Node.FieldOp => f }.groupBy(_.field)
      val hiByField = his.collect { case f: Node.FieldOp => f }.groupBy(_.field)
      val paired = ListBuffer.empty[Node]
      val usedLo = ListBuffer.empty[Node.FieldOp]
      val usedHi = ListBuffer.empty[Node.FieldOp]
      for ((f, lops) <- loByField; hops <- hiByField.get(f)) {
        (lops.headOption, hops.headOption) match {
          case (Some(lo), Some(hi)) if lops.size == 1 && hops.size == 1 =>
            paired += Node.Bounded(f, lo.value, hi.value,
              loInc = lo.op == CompareOp.Ge, hiInc = hi.op == CompareOp.Le)
            usedLo += lo; usedHi += hi
          case _ => ()
        }
      }
      val remaining = cs.filterNot(c => usedLo.contains(c) || usedHi.contains(c))
        .filterNot(paired.contains)
      Node.And((remaining ++ paired).toList) match {
        case Node.And(single :: Nil) => single
        case other => other
      }
    case Node.Or(cs) => Node.Or(cs.map(collapseBounded))
    case Node.Not(c) => Node.Not(collapseBounded(c))
    case leaf => leaf
  }
}

private final class JexlParser(input: String) {
  var pos = 0
  def eof: Boolean = pos >= input.length
  def rest: String = input.substring(pos)
  def skipWs(): Unit = while (!eof && input(pos).isWhitespace) pos += 1

  private def peek(s: String): Boolean = { skipWs(); input.startsWith(s, pos) }
  private def accept(s: String): Boolean = { if (peek(s)) { pos += s.length; true } else false }
  private def expect(s: String): Unit =
    if (!accept(s)) throw new ParseException(s"expected '$s' at $pos: '${rest.take(20)}'")

  def parseExpr(): Node = {
    val children = ListBuffer(parseAnd())
    while (accept("||") || acceptWord("or")) children += parseAnd()
    if (children.size == 1) children.head else Node.Or(children.toList)
  }

  private def parseAnd(): Node = {
    val children = ListBuffer(parseUnary())
    while (accept("&&") || acceptWord("and")) children += parseUnary()
    if (children.size == 1) children.head else Node.And(children.toList)
  }

  private def acceptWord(w: String): Boolean = {
    skipWs()
    if (pos + w.length <= input.length &&
        input.substring(pos, pos + w.length).equalsIgnoreCase(w) &&
        (pos + w.length == input.length || !isIdentChar(input(pos + w.length)))) {
      pos += w.length; true
    } else false
  }

  private def parseUnary(): Node = {
    skipWs()
    // at unary position a bare '!' is always negation ('!=' only occurs
    // after a field identifier, inside parseLeaf)
    if (accept("!")) return Node.Not(parseUnary())
    if (accept("(")) {
      val e = parseExpr(); expect(")"); return e
    }
    parseLeaf()
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '$' || c == '@'

  private def parseIdent(): String = {
    skipWs()
    val start = pos
    while (!eof && isIdentChar(input(pos))) pos += 1
    if (pos == start) throw new ParseException(s"expected identifier at $pos: '${rest.take(20)}'")
    input.substring(start, pos)
  }

  private def parseLiteral(): Literal = {
    skipWs()
    if (eof) throw new ParseException("expected literal at end of input")
    input(pos) match {
      case '\'' | '"' =>
        val quote = input(pos); pos += 1
        val sb = new StringBuilder
        while (!eof && input(pos) != quote) {
          if (input(pos) == '\\' && pos + 1 < input.length) {
            pos += 1
            sb += (input(pos) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case c => c
            })
          } else sb += input(pos)
          pos += 1
        }
        if (eof) throw new ParseException("unterminated string literal")
        pos += 1
        Literal.Str(sb.toString)
      case c if c.isDigit || c == '-' || c == '+' =>
        val start = pos
        pos += 1
        while (!eof && (input(pos).isDigit || input(pos) == '.' ||
          input(pos) == 'e' || input(pos) == 'E' ||
          ((input(pos) == '-' || input(pos) == '+') &&
            (input(pos - 1) == 'e' || input(pos - 1) == 'E')))) pos += 1
        Literal.Num(BigDecimal(input.substring(start, pos)))
      case _ =>
        val id = parseIdent()
        id.toLowerCase match {
          case "null" => Literal.Null
          case "true" => Literal.Bool(true)
          case "false" => Literal.Bool(false)
          case _ => throw new ParseException(s"expected literal, got '$id'")
        }
    }
  }

  /** Literal-returning functions evaluated at parse time — the reference's
    * NormalizationFunctions (`IP == normalize:ipv4('010.001.002.003')`):
    * the function canonicalizes the query literal, not the data. */
  private def evalLiteralFunc(ns: String, name: String, l: Literal): Literal =
    (ns.toLowerCase, name.toLowerCase) match {
      case ("normalize", "ipv4") =>
        val parts = l.raw.split("\\.", -1)
        if (parts.length != 4 || parts.exists(p =>
            p.isEmpty || p.length > 3 || !p.forall(_.isDigit) || p.toInt > 255))
          throw new ParseException(s"invalid ipv4 literal '${l.raw}'")
        Literal.Str(parts.map(_.toInt.toString).mkString("."))
      case _ => throw new ParseException(s"unsupported literal function $ns:$name")
    }

  private def startsLiteral: Boolean = {
    skipWs()
    !eof && (input(pos) == '\'' || input(pos) == '"' || input(pos).isDigit ||
      ((input(pos) == '-' || input(pos) == '+') &&
        pos + 1 < input.length && input(pos + 1).isDigit))
  }

  private def parseCmpOp(): CompareOp =
    if (accept("==")) CompareOp.Eq
    else if (accept("!=")) CompareOp.Ne
    else if (accept("<=")) CompareOp.Le
    else if (accept(">=")) CompareOp.Ge
    else if (accept("<")) CompareOp.Lt
    else if (accept(">")) CompareOp.Gt
    else if (accept("=")) CompareOp.Eq
    else throw new ParseException(s"expected operator at $pos: '${rest.take(20)}'")

  private def parseLeaf(): Node = {
    // literal-first canonicalization: `'v' == FIELD` → `FIELD == 'v'`
    // (InvertNodeVisitor, DefaultQueryPlanner.java:1264)
    if (startsLiteral) {
      val l = parseLiteral()
      val op = parseCmpOp()
      val f = parseIdent()
      return Node.FieldOp(f, op.flip, l)
    }
    val ident = parseIdent()
    skipWs()
    // function call: ns:name(args)
    if (accept(":")) {
      val fname = parseIdent()
      expect("(")
      val args = ListBuffer.empty[Node.Arg]
      skipWs()
      if (!peek(")")) {
        args += parseArg()
        while (accept(",")) args += parseArg()
      }
      expect(")")
      val fn = Node.Func(ident.toLowerCase, fname, args.toList)
      // value-returning function in a comparison:
      // `filter:getMaxTime(F) >= 123`
      skipWs()
      val cmpAhead = !eof && (peek("==") || peek("!=") || peek("<=") ||
        peek(">=") || (peek("<") && !peek("<=")) || (peek(">") && !peek(">=")) ||
        (peek("=") && !peek("==") && !peek("=~")))
      if (cmpAhead) {
        val op = parseCmpOp()
        return Node.FuncCmp(fn, op, parseLiteral())
      }
      return fn
    }
    val op =
      if (accept("==")) CompareOp.Eq
      else if (accept("!=")) CompareOp.Ne
      else if (accept("=~")) return Node.RegexOp(ident, parseLiteral().raw, negated = false)
      else if (accept("!~")) return Node.RegexOp(ident, parseLiteral().raw, negated = true)
      else if (accept("<=")) CompareOp.Le
      else if (accept(">=")) CompareOp.Ge
      else if (accept("<")) CompareOp.Lt
      else if (accept(">")) CompareOp.Gt
      else if (accept("=")) CompareOp.Eq
      else throw new ParseException(s"expected operator after '$ident' at $pos")
    skipWs()
    // field-to-field: right side is an identifier that is not a literal word
    if (!eof && (input(pos).isLetter || input(pos) == '_')) {
      val rid = parseIdent()
      rid.toLowerCase match {
        case "null" => return Node.NullCheck(ident, isNull = op == CompareOp.Eq)
        case "true" => return Node.FieldOp(ident, op, Literal.Bool(true))
        case "false" => return Node.FieldOp(ident, op, Literal.Bool(false))
        case _ =>
          // literal-side function: `F == normalize:ipv4('010.1.2.3')`
          if (accept(":")) {
            val fname = parseIdent()
            expect("(")
            val l = parseLiteral()
            expect(")")
            return Node.FieldOp(ident, op, evalLiteralFunc(rid, fname, l))
          }
          return Node.FieldToField(ident, op, rid)
      }
    }
    Node.FieldOp(ident, op, parseLiteral())
  }

  private def parseArg(): Node.Arg = {
    skipWs()
    if (!eof && (input(pos).isLetter || input(pos) == '_')) {
      val id = parseIdent()
      id.toLowerCase match {
        case "null" => Node.LitArg(Literal.Null)
        case "true" => Node.LitArg(Literal.Bool(true))
        case "false" => Node.LitArg(Literal.Bool(false))
        case _ => Node.FieldArg(id)
      }
    } else Node.LitArg(parseLiteral())
  }
}
