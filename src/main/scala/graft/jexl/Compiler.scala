package graft.jexl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query model: user-facing field aliases → internal fields, 1→N expansion
  * (QueryModelVisitor.java:58 semantics), plus per-field normalizer names
  * (the DatawaveMetadata `t`/`n` codes: one field may carry SEVERAL
  * normalizers — ExpandMultiNormalizedTerms.java:66; a comparison matches
  * if it matches under ANY of them). Keys and values are case-insensitive
  * on the user side; resolution against the actual DataFrame schema
  * happens in [[Compiler]]. */
final case class QueryModel(
    forward: Map[String, Seq[String]] = Map.empty,
    normalizers: Map[String, Seq[String]] = Map.empty) {
  private val norm = forward.map { case (k, v) => k.toUpperCase -> v }
  private val normTypes = normalizers.map { case (k, v) => k.toUpperCase -> v }
  def expand(field: String): Seq[String] =
    norm.getOrElse(field.toUpperCase, Seq(field))
  def normalizersFor(field: String): Seq[String] =
    normTypes.getOrElse(field.toUpperCase, Nil)

  /** `#NO_EXPANSION(F...)` (QueryModelVisitor.applyModel:100-105,
    * NoExpansionTests): the listed fields keep their literal name — the
    * model must NOT expand them into aliases. */
  def withoutExpansion(fields: Seq[String]): QueryModel =
    if (fields.isEmpty) this
    else copy(forward = forward -- forward.keys.filter(k =>
      fields.exists(_.equalsIgnoreCase(k))))
}

/** Policy gates ported from the reference's operating envelope
  * (properties/default.properties:430-463; see BASELINE.md). */
final case class QueryPolicy(
    maxTerms: Int = 2000,
    maxDepth: Int = 2000,
    fullTableScanEnabled: Boolean = false,
    // result-volume caps (query.max.page.size / event.query.max.results)
    maxResults: Option[Long] = None)

final class PolicyException(msg: String) extends RuntimeException(msg)

/** JEXL AST → Catalyst `Column` compiler — the moral replacement for the
  * reference's whole visitor pipeline (DefaultQueryPlanner.java:182): model
  * application, literal normalization, and executability checks happen
  * here at translate time; everything downstream (pushdown, pruning,
  * reordering, codegen) is Catalyst's job.
  *
  * Multi-valued fields: if the resolved column is an ArrayType the
  * predicate compiles to `exists(arr, x -> p(x))` — DataWave's
  * exists-any semantics for repeated fields (DatawaveArithmetic.java:24).
  */
object Compiler {

  def filter(df: DataFrame, jexl: String,
             model: QueryModel = QueryModel(),
             policy: QueryPolicy = QueryPolicy()): DataFrame = {
    val ast = JexlParser.parse(jexl)
    enforce(ast, policy)
    df.filter(compile(ast, df, model))
  }

  def compile(ast: Node, df: DataFrame, model: QueryModel): Column =
    new CompileCtx(df, model).comp(ast)

  /** Term/depth caps + full-scan refusal (a query whose every leaf is a
    * negation can't be driven by any index — the reference refuses it
    * unless fullTableScanEnabled, ShardQueryLogic.java:140-146). */
  def enforce(ast: Node, policy: QueryPolicy): Unit = {
    val (terms, depth) = count(ast, 1)
    if (terms > policy.maxTerms)
      throw new PolicyException(s"query terms $terms exceed max ${policy.maxTerms}")
    if (depth > policy.maxDepth)
      throw new PolicyException(s"query depth $depth exceeds max ${policy.maxDepth}")
    if (!policy.fullTableScanEnabled && !hasPositiveLeaf(ast))
      throw new PolicyException(
        "query is purely negated/unbounded (full table scan); " +
          "set fullTableScanEnabled to allow")
  }

  private def count(n: Node, d: Int): (Int, Int) = n match {
    case Node.And(cs) =>
      val r = cs.map(count(_, d + 1)); (r.map(_._1).sum, r.map(_._2).max)
    case Node.Or(cs) =>
      val r = cs.map(count(_, d + 1)); (r.map(_._1).sum, r.map(_._2).max)
    case Node.Not(c) => count(c, d + 1)
    case _ => (1, d)
  }

  /** Typed literal for a comparison against a column of type `dt`.
    * Numeric literals NEVER round-trip through Double — an int64 key above
    * 2^53 must compare exactly. Exact literals plus Catalyst's
    * UnwrapCastInBinaryComparison keep parquet filter pushdown intact even
    * when the literal type is wider than the column's. */
  def litFor(l: Literal, dt: DataType): Column = (l, dt) match {
    case (Literal.Null, _) => lit(null)
    case (Literal.Num(v), nt: NumericType) => nt match {
      case DoubleType | FloatType => lit(v.toDouble).cast(nt)
      case _: DecimalType => lit(v.underlying)
      case _ if v.isValidLong => lit(v.toLongExact)
      case _ => lit(v.underlying) // fractional literal vs integral column
    }
    case (Literal.Num(v), _) => lit(v.toString)
    case (Literal.Str(s), TimestampType) => lit(s).cast(TimestampType)
    case (Literal.Str(s), DateType) => lit(s).cast(DateType)
    case (Literal.Str(s), nt: NumericType) => litFor(Literal.Num(BigDecimal(s)), nt)
    case (Literal.Str(s), _) => lit(s)
    case (Literal.Bool(b), _) => lit(b)
  }

  /** Match rule for grouping-function literals (GroupingRequiredFilter
    * semantics): regex metacharacters → anchored full-match regex, else
    * plain equality. Shared by the wide-array evaluator below and the
    * long-layout join route in ShardQueryLogic. */
  private val RegexMeta = "[\\\\.\\[\\]{}()*+?^$|]".r
  def literalPredicate(v: Literal): Column => Column = v match {
    case Literal.Str(x) if RegexMeta.findFirstIn(x).isDefined =>
      s => s.rlike("^(?:" + x + ")$")
    case other => s => s === lit(other.raw)
  }

  /** All field names a query references (FieldMissingFromSchemaVisitor
    * analog) — input to the nonexistent-field planner test. */
  def referencedFields(n: Node): Set[String] = n match {
    case Node.And(cs) => cs.flatMap(referencedFields).toSet
    case Node.Or(cs) => cs.flatMap(referencedFields).toSet
    case Node.Not(c) => referencedFields(c)
    case Node.FieldOp(f, _, _) => Set(f)
    case Node.RegexOp(f, _, _) => Set(f)
    case Node.NullCheck(f, _) => Set(f)
    case Node.Bounded(f, _, _, _, _) => Set(f)
    case Node.FieldToField(a, _, b) => Set(a, b)
    case Node.Func(_, _, args) =>
      args.collect { case Node.FieldArg(f) => f }.toSet
    case Node.FuncCmp(func, _, _) => referencedFields(func)
  }

  /** True if at least one branch is index-driveable (positive predicate). */
  private def hasPositiveLeaf(n: Node): Boolean = n match {
    case Node.And(cs) => cs.exists(hasPositiveLeaf)
    case Node.Or(cs) => cs.forall(hasPositiveLeaf) // OR needs every branch driveable
    case Node.Not(_) => false
    case Node.FieldOp(_, CompareOp.Ne, _) => false
    case Node.RegexOp(_, _, true) => false
    case Node.NullCheck(_, true) => false // FIELD == null can't drive an index
    case _ => true
  }
}

private final class CompileCtx(df: DataFrame, model: QueryModel)
    extends FunctionRegistry.FunctionContext {
  private val bySimpleName: Map[String, StructField] =
    df.schema.fields.map(f => f.name.toUpperCase -> f).toMap

  /** Resolve one user field through the model to concrete columns.
    * Unknown fields behave like DataWave's non-existent-field semantics:
    * never match (null), rather than fail — lenient mode.
    * `_ANYFIELD_` expands to every string-typed column (the unfielded-term
    * expansion, UnfieldedIndexExpansionVisitor.java:40 — we consult the
    * schema instead of the global index). */
  private def resolve(field: String): Seq[StructField] =
    if (field.equalsIgnoreCase("_ANYFIELD_"))
      df.schema.fields.toSeq.filter(f => f.dataType == StringType ||
        f.dataType.isInstanceOf[ArrayType])
    else model.expand(field).flatMap(f => bySimpleName.get(f.toUpperCase))

  private[jexl] def fullMatch(pat: String): String = "^(?:" + pat + ")$"

  private def isPlainLiteral(s: String): Boolean =
    s.nonEmpty && !s.exists(ch => "[]{}()*+?^$|\\.".contains(ch))

  /** `.*literal` → Some(literal) — the leading-wildcard shape. */
  private def suffixLiteral(pat: String): Option[String] =
    if (pat.startsWith(".*") && isPlainLiteral(pat.drop(2))) Some(pat.drop(2))
    else None

  /** Full-match regex compiled to sargable string predicates where the
    * pattern is a plain wildcard: contains/startsWith/endsWith are
    * codegen'd (no regex engine) and prefix predicates reach parquet
    * PushedFilters. General patterns fall back to anchored rlike. */
  private[jexl] def stringPattern(c: Column, pat: String): Column =
    if (pat.startsWith(".*") && pat.endsWith(".*") && pat.length > 4 &&
        isPlainLiteral(pat.drop(2).dropRight(2)))
      c.contains(pat.drop(2).dropRight(2))
    else if (pat.endsWith(".*") && isPlainLiteral(pat.dropRight(2)))
      c.startsWith(pat.dropRight(2))
    else if (pat.startsWith(".*") && isPlainLiteral(pat.drop(2)))
      c.endsWith(pat.drop(2))
    else c.rlike(fullMatch(pat))

  def comp(n: Node): Column = n match {
    case Node.And(cs) => cs.map(comp).reduce(_ && _)
    case Node.Or(cs) =>
      // Large-OR collapse — the ivarator/FST analog (beq.orExpansion
      // Threshold=500, PushdownLargeFieldedListsVisitor.java:62): an OR
      // of N same-field equalities evaluates N expression nodes per row
      // and defeats pushdown; runs of ≥10 (on fields without declared
      // normalizers — the normalizer path must keep its per-literal
      // rewrite) compile to ONE `isin`, which Catalyst plans as an
      // InSet hash probe and pushes to parquet as a single In filter.
      // At the reference's 2000-term envelope that is the difference
      // between a scan-dominated plan and a 2000-branch interpreter.
      val (eqs, rest) = cs.partitionMap {
        case Node.FieldOp(f, CompareOp.Eq, l)
            if l != Literal.Null && model.normalizersFor(f).isEmpty =>
          Left((f, l))
        case other => Right(other)
      }
      val (big, small) = eqs.groupBy(_._1.toUpperCase).values.toSeq
        .partition(_.size >= 10)
      val inCols = big.sortBy(_.head._1).map { grp =>
        anyField(grp.head._1)((c, dt) =>
          c.isin(grp.map(x => litFor(x._2, dt)): _*))
      }
      val restCols = small.flatten
        .map { case (f, l) => comp(Node.FieldOp(f, CompareOp.Eq, l)) } ++
        rest.map(comp)
      (inCols ++ restCols).reduce(_ || _)
    case Node.Not(c) => !comp(c)

    case Node.FieldOp(f, CompareOp.Ne, l) =>
      // JEXL NE is the negation of any-member-equals (DatawaveArithmetic
      // .equals over value sets): 'no element equals', with null/absent
      // fields matching (null != 'x' is true). The negation sits OUTSIDE
      // the exists — F != 'a' on F=['a','b'] is false, not 'some element
      // differs'. Mirrors the RegexOp negated path below.
      !coalesce(anyField(f)(fieldCmp(f, _, _, CompareOp.Eq, l)), lit(false))

    case Node.FieldOp(f, op, lit) => anyField(f)(fieldCmp(f, _, _, op, lit))

    case Node.RegexOp(f, pat, neg) =>
      // JEXL `=~` is a FULL-string match (JexlArithmetic.matches), while
      // Spark rlike is find-anywhere — anchor to preserve semantics.
      // Plan shapes: plain prefix/suffix/contains wildcards compile to
      // sargable string predicates (parquet-pushable), and a leading
      // wildcard routes through a `<FIELD>_REV` reversed-value column
      // when the schema has one — the shardReverseIndex plan
      // (ShardedDataTypeHandler.java:86-101): `*ing` becomes a prefix
      // scan on the reversed value instead of an unanchored regex.
      val fields = resolve(f)
      val m =
        if (fields.isEmpty) lit(false)
        else fields.map { sf =>
          val suffix = suffixLiteral(pat)
          val revCol = suffix.flatMap(_ =>
            bySimpleName.get(sf.name.toUpperCase + "_REV"))
          (sf.dataType, revCol) match {
            case (ArrayType(_, _), _) =>
              exists(col(sf.name), x => stringPattern(x.cast(StringType), pat))
            case (_, Some(rev)) =>
              col(rev.name).startsWith(suffix.get.reverse)
            case (_, None) =>
              stringPattern(col(sf.name).cast(StringType), pat)
          }
        }.reduce(_ || _)
      if (neg) !coalesce(m, lit(false)) else m

    case Node.NullCheck(f, isNull) =>
      val fields = resolve(f)
      if (fields.isEmpty) lit(isNull) // absent field counts as null
      else {
        val anyNotNull = fields.map { sf =>
          sf.dataType match {
            case _: ArrayType => size(col(sf.name)) > 0
            case _ => col(sf.name).isNotNull
          }
        }.reduce(_ || _)
        if (isNull) !anyNotNull else anyNotNull
      }

    case Node.Bounded(f, lo, hi, loInc, hiInc) =>
      anyField(f) { (c, dt) =>
        val l = litFor(lo, dt); val h = litFor(hi, dt)
        (if (loInc) c >= l else c > l) && (if (hiInc) c <= h else c < h)
      }

    case Node.FieldToField(l, op, r) =>
      val lc = single(l); val rc = single(r)
      op match {
        case CompareOp.Eq => lc === rc
        case CompareOp.Ne => lc =!= rc
        case CompareOp.Lt => lc < rc
        case CompareOp.Le => lc <= rc
        case CompareOp.Gt => lc > rc
        case CompareOp.Ge => lc >= rc
      }

    case Node.Func(ns, name, args) => Functions.compile(this, ns, name, args)

    case Node.FuncCmp(f, op, l) =>
      val (v, dt) = Functions.valueOf(this, f.namespace, f.name.toLowerCase, f.args)
      leafCmp(v, dt, op, l)
  }

  /** Exists-any over model expansion and (for arrays) element values. */
  def anyField(field: String)(pred: (Column, DataType) => Column): Column = {
    val fields = resolve(field)
    if (fields.isEmpty) lit(false)
    else fields.map { sf =>
      sf.dataType match {
        case ArrayType(et, _) => exists(col(sf.name), x => pred(x, et))
        case dt => pred(col(sf.name), dt)
      }
    }.reduce(_ || _)
  }

  /** First resolved scalar column for a field (field-to-field, functions). */
  def single(field: String): Column = {
    val fields = resolve(field)
    if (fields.isEmpty) lit(null)
    else col(fields.head.name)
  }

  def fieldType(field: String): Option[DataType] = resolve(field).headOption.map(_.dataType)

  /** Comparison for a named field: multi-normalizer semantics when the
    * model declares normalizers for it (ExpandMultiNormalizedTerms — the
    * term matches under ANY declared normalizer, literal normalized the
    * same way), plain typed comparison otherwise. */
  private def fieldCmp(f: String, c: Column, dt: DataType,
                       op: CompareOp, l: Literal): Column = {
    val norms = model.normalizersFor(f)
    if (norms.isEmpty || dt != StringType || l == Literal.Null)
      leafCmp(c, dt, op, l)
    else norms.map { nm =>
      val fn = graft.functions.Normalizers.byName(nm)
      val lc0 = fn(c)
      val ll = fn(lit(l.raw))
      op match {
        case CompareOp.Eq => lc0 === ll
        case CompareOp.Ne => lc0 =!= ll
        case CompareOp.Lt => lc0 < ll
        case CompareOp.Le => lc0 <= ll
        case CompareOp.Gt => lc0 > ll
        case CompareOp.Ge => lc0 >= ll
      }
    }.reduce(_ || _)
  }

  private def leafCmp(c: Column, dt: DataType, op: CompareOp, l: Literal): Column = {
    val v = litFor(l, dt)
    op match {
      case CompareOp.Eq => c === v
      case CompareOp.Ne => c =!= v
      case CompareOp.Lt => c < v
      case CompareOp.Le => c <= v
      case CompareOp.Gt => c > v
      case CompareOp.Ge => c >= v
    }
  }

  /** Literal normalization at translate time (the reference's
    * ExpandMultiNormalizedTerms analog, collapsed: our columns are typed
    * at ingest, so one cast per side suffices). */
  def litFor(l: Literal, dt: DataType): Column = Compiler.litFor(l, dt)
}

/** The `filter:` / `f:` / `normalize:` function namespaces
  * (EvaluationPhaseFilterFunctions.java, QueryFunctions.java:26-265,
  * NormalizationFunctions.java:20-53). `content:` and `grouping:` live in
  * graft.functions and need the tf/grouped layouts. */
private object Functions {
  import Node._

  def compile(ctx: CompileCtx, ns: String, name: String, args: List[Arg]): Column =
    (ns, name.toLowerCase, args) match {
      // filter:includeRegex(F, rx) / excludeRegex — EvaluationPhaseFilterFunctions.java:180-341
      case ("filter" | "f", "includeregex", FieldArg(f) :: LitArg(rx) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType).rlike(ctx.fullMatch(rx.raw)))
      case ("filter" | "f", "excluderegex", FieldArg(f) :: LitArg(rx) :: Nil) =>
        !ctx.anyField(f)((c, _) => c.cast(StringType).rlike(ctx.fullMatch(rx.raw)))
      // filter:isNull / isNotNull — :142-178
      case ("filter" | "f", "isnull", FieldArg(f) :: Nil) =>
        ctx.comp(NullCheck(f, isNull = true))
      case ("filter" | "f", "isnotnull", FieldArg(f) :: Nil) =>
        ctx.comp(NullCheck(f, isNull = false))
      // f:between(F, lo, hi) — QueryFunctions.java:81-183
      case ("filter" | "f", "between", FieldArg(f) :: LitArg(lo) :: LitArg(hi) :: Nil) =>
        ctx.comp(Bounded(f, lo, hi))
      // f:length(F, lo, hi) — QueryFunctions.java:55-79
      case ("filter" | "f", "length", FieldArg(f) :: LitArg(lo) :: LitArg(hi) :: Nil) =>
        ctx.anyField(f)((c, _) =>
          length(c.cast(StringType)).between(lo.raw.toInt, hi.raw.toInt))
      // f:matchRegex / f:includeText — QueryFunctions.java:199-265
      case ("filter" | "f", "matchregex" | "matchesregex", FieldArg(f) :: LitArg(rx) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType).rlike(ctx.fullMatch(rx.raw)))
      case ("filter" | "f", "includetext", FieldArg(f) :: LitArg(v) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType) === v.raw)
      // filter:afterDate / beforeDate / betweenDates (+ LoadDate aliases:
      // our engine takes the load-date field explicitly) — :417-1287
      case ("filter" | "f", "afterdate" | "afterloaddate", FieldArg(f) :: LitArg(d) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType) > lit(d.raw).cast(TimestampType))
      case ("filter" | "f", "beforedate" | "beforeloaddate", FieldArg(f) :: LitArg(d) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType) < lit(d.raw).cast(TimestampType))
      case ("filter" | "f", "betweendates" | "betweenloaddates",
          FieldArg(f) :: LitArg(a) :: LitArg(b) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType)
          .between(lit(a.raw).cast(TimestampType), lit(b.raw).cast(TimestampType)))
      // single-date between (#LOADED('20240101') — Loaded.validate
      // admits the 1-date form): the date's whole day [d, d+1d)
      case ("filter" | "f", "betweendates" | "betweenloaddates",
          FieldArg(f) :: LitArg(d) :: Nil) =>
        val lo = lit(d.raw).cast(TimestampType)
        ctx.anyField(f)((c, _) =>
          c.cast(TimestampType) >= lo &&
            c.cast(TimestampType) < lo + expr("INTERVAL 1 DAY"))
      // custom date-format variants: the literal (and the value) are
      // interpreted through the given pattern — :417-1287
      // the pattern re-parses STRING field values; typed date/timestamp
      // columns are already normalized (ingest-time typing) — only the
      // literal goes through the pattern for them
      case ("filter" | "f", "afterdate" | "afterloaddate",
          FieldArg(f) :: LitArg(d) :: LitArg(fmt) :: Nil) =>
        ctx.anyField(f)((c, dt) =>
          tsWithFormat(c, dt, fmt.raw) > to_timestamp(lit(d.raw), fmt.raw))
      case ("filter" | "f", "beforedate" | "beforeloaddate",
          FieldArg(f) :: LitArg(d) :: LitArg(fmt) :: Nil) =>
        ctx.anyField(f)((c, dt) =>
          tsWithFormat(c, dt, fmt.raw) < to_timestamp(lit(d.raw), fmt.raw))
      case ("filter" | "f", "betweendates" | "betweenloaddates",
          FieldArg(f) :: LitArg(a) :: LitArg(b) :: LitArg(fmt) :: Nil) =>
        ctx.anyField(f)((c, dt) => tsWithFormat(c, dt, fmt.raw)
          .between(to_timestamp(lit(a.raw), fmt.raw),
            to_timestamp(lit(b.raw), fmt.raw)))
      // 5-arg reference overload (EvaluationPhaseFilterFunctions:1255):
      // (F, valuePattern, start, end, rangePattern) — the field value is
      // parsed with valuePattern, the bounds with rangePattern
      case ("filter" | "f", "betweendates" | "betweenloaddates",
          FieldArg(f) :: LitArg(p) :: LitArg(a) :: LitArg(b) :: LitArg(rp) :: Nil) =>
        ctx.anyField(f)((c, dt) => tsWithFormat(c, dt, p.raw)
          .between(to_timestamp(lit(a.raw), rp.raw),
            to_timestamp(lit(b.raw), rp.raw)))
      // filter:getAllMatches(F, rx) — :343-415; in predicate position the
      // truth value is 'any value matches'
      case ("filter" | "f", "getallmatches", FieldArg(f) :: LitArg(rx) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType).rlike(ctx.fullMatch(rx.raw)))
      // filter:compare(F1, op, ANY|ALL, F2) — :1789
      case ("filter" | "f", "compare",
          FieldArg(f1) :: LitArg(Literal.Str(op)) :: LitArg(Literal.Str(mode))
            :: FieldArg(f2) :: Nil) =>
        compareFields(ctx, f1, op, mode.toUpperCase, f2)
      // filter:timeFunction(t1,t2,op,goal) — :1431 (|t1-t2| op goal millis)
      case ("filter" | "f", "timefunction",
          FieldArg(t1) :: FieldArg(t2) :: LitArg(Literal.Str(op)) :: LitArg(goal) :: Nil) =>
        val diff = abs(unix_millis(ctx.single(t1).cast(TimestampType)) -
          unix_millis(ctx.single(t2).cast(TimestampType)))
        cmp(diff, op, lit(goal.raw.toLong))
      // filter:occurrence(F, op, n) — :58-70 (count of instances of F)
      case ("filter" | "f", "occurrence",
          FieldArg(f) :: LitArg(Literal.Str(op)) :: LitArg(n) :: Nil) =>
        val cnt = ctx.fieldType(f) match {
          case Some(_: ArrayType) => size(ctx.single(f))
          case Some(_) => when(ctx.single(f).isNotNull, 1).otherwise(0)
          case None => lit(0)
        }
        cmp(cnt, op, lit(n.raw.toInt))
      // filter:matchesAtLeastCountOf(n, F, v1..vk) — :223
      case ("filter" | "f", "matchesatleastcountof", LitArg(n) :: FieldArg(f) :: vs) =>
        val values = vs.collect { case LitArg(l) => lit(l.raw) }
        val arr = ctx.fieldType(f) match {
          case Some(_: ArrayType) => ctx.single(f)
          case _ => array(ctx.single(f).cast(StringType))
        }
        size(array_intersect(arr, array(values: _*))) >= n.raw.toInt
      // normalize:ipv4 — NormalizationFunctions.java:20-53 — is a
      // LITERAL-side canonicalizer (`IP == normalize:ipv4('010.1.2.3')`),
      // evaluated at parse time (JexlParser.evalLiteralFunc). In predicate
      // position it has no boolean meaning: fail safe, don't match-all.

      // content: namespace — token/position semantics evaluated INLINE on
      // the text column (ContentFunctions.java:91-213): same results as
      // the tf-table plans in graft.content.Content, no tf join and no
      // backtracking regex. The reference's `termOffsetMap` pass-through
      // variable is accepted and ignored.
      case ("content", "phrase", args) =>
        val (zone, rest) = zoneAndArgs(args)
        ctx.anyField(zone)((c, _) => phrasePred(c, litTerms(rest, "content:phrase")))
      case ("content", "adjacent", args) =>
        val (zone, rest) = zoneAndArgs(args)
        val terms = litTerms(rest, "content:adjacent")
        ctx.anyField(zone)((c, _) => withinPred(c, terms.size - 1, terms))
      case ("content", "within", args) =>
        zoneAndArgs(args) match {
          case (zone, LitArg(d) :: rest) =>
            val terms = litTerms(rest, "content:within")
            ctx.anyField(zone)((c, _) =>
              withinPred(c, BigDecimal(d.raw).toInt, terms))
          case _ =>
            throw new ParseException("content:within(zone?, dist, terms...)")
        }
      // content:scoredPhrase(zone?, minScore, terms...) — phrase AND each
      // term's score (term frequency here, TermWeight analog) ≥ minScore
      case ("content", "scoredphrase", args) =>
        zoneAndArgs(args) match {
          case (zone, LitArg(ms) :: rest) =>
            val terms = litTerms(rest, "content:scoredPhrase")
            val minScore = BigDecimal(ms.raw).toInt
            ctx.anyField(zone) { (c, _) =>
              val toks = tokensOf(c)
              val scoresOk = terms.map(t =>
                size(filter(toks, x => x === lit(t.toLowerCase))) >= minScore)
                .reduce(_ && _)
              phrasePred(c, terms) && scoresOk
            }
          case _ =>
            throw new ParseException("content:scoredPhrase(zone?, minScore, terms...)")
        }

      // grouping: namespace — co-occurrence within one grouping-context
      // instance (GroupingRequiredFilterFunctions.java:45-371). Wide
      // layout: repeated-field instances are arrays aligned by group index.
      case ("grouping",
          gname @ ("matchesingroup" | "matchesingroupleft" |
            "getgroupsformatchesingroup"),
          args) =>
        val (pairs, pos) = groupingPairs(args)
        // matchesInGroup keys on the TRAILING segments of the grouping
        // context; matchesInGroupLeft on the ancestor PREFIX
        // (GroupingRequiredFilterFunctions.java:49,257: an odd trailing
        // integer argument is the zero-based split position). Left splits
        // BOTH sides at pos; Right is asymmetric — only the FIRST field is
        // split at pos, every later field compares its subgroup (last
        // segment, getSubgroup:141) against it, so pos>0 can only match
        // when the first field's split context is itself one segment.
        val left = gname == "matchesingroupleft"
        val identFirst: Column => Column =
          if (left) graft.operators.Grouping.contextLeft(_, pos)
          else graft.operators.Grouping.contextRight(_, pos)
        val identRest: Column => Column =
          if (left) identFirst
          else graft.operators.Grouping.contextRight(_, 0)
        matchesInGroup(ctx, pairs, identFirst, identRest)
      case ("grouping", "atomvaluesmatch", FieldArg(f1) :: FieldArg(f2) :: Nil) =>
        arrays_overlap(asStringArray(ctx, f1), asStringArray(ctx, f2))

      // geo: numeric lat/lon predicates — GeoFunctions.java:69-149.
      // 6-arg form is (lonField, latField, minLon, minLat, maxLon, maxLat).
      case ("geo", "within_bounding_box",
          FieldArg(lonF) :: FieldArg(latF) :: LitArg(minLon) :: LitArg(minLat)
            :: LitArg(maxLon) :: LitArg(maxLat) :: Nil) =>
        graft.functions.Geo.withinBoundingBox(
          ctx.single(lonF).cast("double"), ctx.single(latF).cast("double"),
          dbl(minLon), dbl(minLat), dbl(maxLon), dbl(maxLat))
      // 3-arg form: combined 'lat_lon' values, lower-left + upper-right
      case ("geo", "within_bounding_box",
          FieldArg(f) :: LitArg(ll) :: LitArg(ur) :: Nil) =>
        val c = ctx.single(f)
        val (llLat, llLon) = latLonOf(ll.raw)
        val (urLat, urLon) = latLonOf(ur.raw)
        graft.functions.Geo.withinBoundingBox(
          graft.functions.Geo.lonOf(c), graft.functions.Geo.latOf(c),
          llLon, llLat, urLon, urLat)
      case ("geo", "within_circle",
          FieldArg(f) :: LitArg(center) :: LitArg(r) :: Nil) =>
        val c = ctx.single(f)
        val (cLat, cLon) = latLonOf(center.raw)
        graft.functions.Geo.withinCircle(
          graft.functions.Geo.lonOf(c), graft.functions.Geo.latOf(c),
          cLat, cLon, dbl(r))

      // geowave: JTS topological predicates on WKT values —
      // GeoWaveFunctions.java:137-345
      case ("geowave", op, FieldArg(f) :: LitArg(wkt) :: Nil)
          if graft.functions.Geo.GeowaveOps.contains(op) =>
        graft.functions.Geo.geowavePredicate(op, wkt.raw)(
          ctx.single(f).cast(StringType))

      case _ =>
        // pluggable namespace SPI fallback (JexlFunctionNamespaceRegistry)
        FunctionRegistry.lookup(ns, name) match {
          case Some(h) => h(ctx, args)
          case None =>
            throw new ParseException(s"unsupported function $ns:$name/${args.size}")
        }
    }

  /** Value-returning eval-phase functions (getMinTime/getMaxTime/
    * getMinValue/getMaxValue — EvaluationPhaseFilterFunctions:1447-1510),
    * used by [[Node.FuncCmp]]. Returns the value column and the type the
    * comparison literal should normalize to. */
  def valueOf(ctx: CompileCtx, ns: String, name: String,
              args: List[Arg]): (Column, DataType) = (ns, name, args) match {
    case ("filter" | "f", "getmaxvalue", FieldArg(f) :: Nil) =>
      ctx.fieldType(f) match {
        case Some(ArrayType(et, _)) => (array_max(ctx.single(f)), et)
        case Some(dt) => (ctx.single(f), dt)
        case None => (lit(null), StringType)
      }
    case ("filter" | "f", "getminvalue", FieldArg(f) :: Nil) =>
      ctx.fieldType(f) match {
        case Some(ArrayType(et, _)) => (array_min(ctx.single(f)), et)
        case Some(dt) => (ctx.single(f), dt)
        case None => (lit(null), StringType)
      }
    case ("filter" | "f", "getmaxtime", FieldArg(f) :: Nil) =>
      ctx.fieldType(f) match {
        case Some(ArrayType(_, _)) => (array_max(transform(ctx.single(f),
          x => unix_millis(x.cast(TimestampType)))), LongType)
        case Some(_) => (unix_millis(ctx.single(f).cast(TimestampType)), LongType)
        case None => (lit(null), LongType)
      }
    case ("filter" | "f", "getmintime", FieldArg(f) :: Nil) =>
      ctx.fieldType(f) match {
        case Some(ArrayType(_, _)) => (array_min(transform(ctx.single(f),
          x => unix_millis(x.cast(TimestampType)))), LongType)
        case Some(_) => (unix_millis(ctx.single(f).cast(TimestampType)), LongType)
        case None => (lit(null), LongType)
      }
    case _ => throw new ParseException(s"unsupported value function $ns:$name")
  }

  /** filter:compare — every/any pair across the two fields' value sets. */
  private def compareFields(ctx: CompileCtx, f1: String, op: String,
                            mode: String, f2: String): Column = {
    def asArray(f: String): Column = ctx.fieldType(f) match {
      case Some(_: ArrayType) => ctx.single(f)
      case _ => array(ctx.single(f))
    }
    val a1 = asArray(f1)
    val a2 = asArray(f2)
    mode match {
      case "ANY" => exists(a1, x => exists(a2, y => cmp(x, op, y)))
      case "ALL" => forall(a1, x => forall(a2, y => cmp(x, op, y)))
      case other =>
        throw new ParseException(s"filter:compare mode must be ANY or ALL, got $other")
    }
  }

  private def tsWithFormat(c: Column, dt: DataType, fmt: String): Column = dt match {
    case StringType => try_to_timestamp(c, lit(fmt))
    case _ => c.cast(TimestampType)
  }

  private def dbl(l: Literal): Double = BigDecimal(l.raw).toDouble

  /** GeoNormalizer 'lat_lon' literal. */
  private def latLonOf(s: String): (Double, Double) = s.split("_") match {
    case Array(lat, lon) => (lat.toDouble, lon.toDouble)
    case _ => throw new ParseException(s"expected 'lat_lon' literal, got '$s'")
  }

  /** Strip the `termOffsetMap` pass-through; an optional leading FieldArg
    * is the zone. No zone → `_ANYFIELD_` (every text-bearing column). */
  private def zoneAndArgs(args: List[Arg]): (String, List[Arg]) = {
    val cleaned = args.filterNot {
      case FieldArg(f) => f.equalsIgnoreCase("termOffsetMap")
      case _ => false
    }
    cleaned match {
      case FieldArg(z) :: rest => (z, rest)
      case rest => ("_ANYFIELD_", rest)
    }
  }

  private def litTerms(args: List[Arg], fn: String): Seq[String] = {
    val ts = args.collect { case LitArg(l) => l.raw }
    if (ts.isEmpty) throw new ParseException(s"$fn needs at least one term")
    ts
  }

  private def tokensOf(c: Column): Column =
    graft.operators.TextOps.tokens(c.cast(StringType))

  /** The tokenizer's space-normalized string: tokens are [a-z0-9]+ runs
    * joined by single spaces, so token boundaries are exactly (^| ) and
    * ( |$) — position arithmetic over [[tokensOf]] becomes string
    * adjacency here. */
  private def normOf(c: Column): Column =
    trim(regexp_replace(lower(c.cast(StringType)), "[^a-z0-9]+", " "))

  private def quoteTerm(t: String): String =
    java.util.regex.Pattern.quote(t.toLowerCase)

  /** A term that IS a single token ([a-z0-9]+ after lowercasing). Any
    * other term can never equal a token of [[tokensOf]], so the
    * position-list predicates are constant-false for it — and the
    * regex forms below must NOT run on it (a quoted 'fast scan' would
    * otherwise match ACROSS a token boundary in the normalized string,
    * where the token-comparison semantics say no match). */
  private def plainToken(t: String): Boolean = {
    val l = t.toLowerCase
    l.nonEmpty && l.forall(ch =>
      (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9'))
  }

  /** Ordered-consecutive phrase over the token stream — identical
    * semantics to the tf-table plan (Content.phrase): each term must
    * equal one token at consecutive positions (a term that is not a
    * single [a-z0-9]+ token can never match — constant false).
    *
    * Consecutive token positions ⇔ the space-joined phrase occurs
    * between token boundaries of the normalized string, so the whole
    * predicate is ONE codegen'd regex — the previous form walked
    * element_at windows over a lambda-bound token array, interpreted
    * (raw text has one token per offset, so the tf-path's same-offset
    * synonym successor rule cannot fire here). */
  private def phrasePred(c: Column, terms: Seq[String]): Column =
    if (!terms.forall(plainToken)) lit(false) // non-token term: no match
    else normOf(c).rlike(
      terms.map(quoteTerm).mkString("(?:^| )", " ", "(?: |$)"))

  /** ∃ one position per term with max−min ≤ dist (content:within,
    * unordered).
    *
    * The dominant case — two distinct terms (every LUCENE slop pair
    * compiles here) — is ONE codegen'd regex on the normalized string:
    * |pa−pb| ≤ dist ⇔ the terms occur with at most dist−1 whole tokens
    * between them, in either order. The general k-term/repeated-term
    * case keeps the nested-exists enumeration over per-term position
    * lists (bound once per row via the 1-element lambda-let — an
    * unbound form re-derives each list for every outer candidate). */
  private def withinPred(c: Column, dist: Int, terms: Seq[String]): Column =
    terms.map(_.toLowerCase) match {
      case Seq(a, b) if a != b && dist >= 1 &&
          plainToken(a) && plainToken(b) =>
        val gap = s"(?: [a-z0-9]+){0,${dist - 1}} "
        normOf(c).rlike(
          s"(?:^| )(?:${quoteTerm(a)}$gap${quoteTerm(b)}" +
            s"|${quoteTerm(b)}$gap${quoteTerm(a)})(?: |$$)")
      case _ => withinPredGeneral(c, dist, terms)
    }

  private def withinPredGeneral(c: Column, dist: Int,
                                terms: Seq[String]): Column = {
    val toks = tokensOf(c)
    val indexed = zip_with(toks, sequence(lit(0), size(toks) - 1),
      (t, i) => struct(t.as("t"), i.as("p")))
    def posOf(t: String): Column =
      transform(filter(indexed, e => e.getField("t") === lit(t.toLowerCase)),
        e => e.getField("p"))
    val bound = struct(terms.zipWithIndex.map { case (t, i) =>
      posOf(t).as(s"p$i") }: _*)
    def nest(b: Column, i: Int, chosen: List[Column]): Column =
      if (i == terms.size) {
        val hi = chosen.reduce(greatest(_, _))
        val lo = chosen.reduce(least(_, _))
        (hi - lo) <= dist
      } else exists(b.getField(s"p$i"), x => nest(b, i + 1, x :: chosen))
    when(size(toks) > 0,
      exists(array(bound), b => nest(b, 0, Nil)))
      .otherwise(lit(false))
  }

  /** Split `grouping:` args into (field, value) pairs + the optional
    * trailing position integer (odd arg count,
    * GroupingRequiredFilterFunctions.java:49). Negative positions are
    * rejected loudly — the reference throws ArrayIndexOutOfBoundsException
    * from getMatchToRightOfPeriod on them; silently treating them as
    * "no context" would degrade the query to ungrouped co-occurrence. */
  private def groupingPairs(args: List[Arg]): (List[(String, Literal)], Int) = {
    val (pairArgs, pos) =
      if (args.length % 2 == 1) args.last match {
        case LitArg(p) =>
          (args.init,
            try p.raw.trim.toInt
            catch { case _: NumberFormatException => throw new ParseException(
              s"grouping: trailing position argument must be an integer, got '${p.raw}'") })
        case _ => throw new ParseException(
          "grouping: odd trailing argument must be the position integer")
      } else (args, 0)
    if (pos < 0) throw new ParseException(
      s"grouping: position argument must be >= 0, got $pos")
    val pairs = pairArgs.grouped(2).map {
      case List(FieldArg(f), LitArg(v)) => (f, v)
      case _ => throw new ParseException(
        "grouping:matchesInGroup expects (field, value) pairs")
    }.toList
    (pairs, pos)
  }

  /** All (field, value) conditions within the SAME grouping-context
    * instance. A group may hold SEVERAL instances of one field (NAME.3
    * twice), so this is existential per group label, not per array slot:
    * ∃ e₁ of F₁ matching v₁ such that every other Fₖ has a matching
    * instance with the same group label. `identFirst` keys the first
    * field's context, `identRest` the remaining fields' (the reference is
    * asymmetric under a position argument — see the dispatch site).
    *
    * Field encodings accepted:
    *  - `array<struct<group,value>>` — explicit grouping context;
    *  - plain `array<…>` — positional groups (slot i = group "i");
    *  - scalar — singleton group "0".
    * Values match as anchored regex when the literal carries regex
    * metacharacters, else as equality. */
  private def matchesInGroup(ctx: CompileCtx, pairs: List[(String, Literal)],
                             identFirst: Column => Column,
                             identRest: Column => Column): Column = {
    require(pairs.nonEmpty)
    def entries(f: String): Column = ctx.fieldType(f) match {
      case Some(ArrayType(st: StructType, _))
          if st.fieldNames.contains("group") && st.fieldNames.contains("value") =>
        transform(ctx.single(f), e => struct(
          e.getField("group").cast(StringType).as("group"),
          e.getField("value").cast(StringType).as("value")))
      case Some(ArrayType(_, _)) =>
        zip_with(ctx.single(f), sequence(lit(0), size(ctx.single(f)) - 1),
          (v, i) => struct(i.cast(StringType).as("group"),
            v.cast(StringType).as("value")))
      case _ =>
        array(struct(lit("0").as("group"), ctx.single(f).cast(StringType).as("value")))
    }
    val es = pairs.map { case (f, v) => (entries(f), v) }
    val (e1, v1) = es.head
    exists(e1, x => {
      val gx = identFirst(x.getField("group"))
      es.tail.foldLeft(valueMatch(x.getField("value"), v1) && gx.isNotNull) {
        case (acc, (ek, vk)) =>
          acc && exists(ek, y => valueMatch(y.getField("value"), vk) &&
            identRest(y.getField("group")) === gx)
      }
    })
  }

  private def valueMatch(s: Column, v: Literal): Column =
    Compiler.literalPredicate(v)(s)

  private def asStringArray(ctx: CompileCtx, f: String): Column =
    ctx.fieldType(f) match {
      case Some(_: ArrayType) => transform(ctx.single(f), _.cast(StringType))
      case _ => array(ctx.single(f).cast(StringType))
    }

  private def cmp(c: Column, op: String, v: Column): Column = op match {
    case "==" | "=" => c === v
    case "!=" => c =!= v
    case "<" => c < v
    case "<=" => c <= v
    case ">" => c > v
    case ">=" => c >= v
    case other => throw new ParseException(s"unknown comparison '$other'")
  }
}
