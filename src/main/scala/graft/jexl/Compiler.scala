package graft.jexl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query model: user-facing field aliases → internal fields, 1→N expansion
  * (QueryModelVisitor.java:58 semantics). Keys and values are
  * case-insensitive on the user side; resolution against the actual
  * DataFrame schema happens in [[Compiler]]. */
final case class QueryModel(forward: Map[String, Seq[String]] = Map.empty) {
  private val norm = forward.map { case (k, v) => k.toUpperCase -> v }
  def expand(field: String): Seq[String] =
    norm.getOrElse(field.toUpperCase, Seq(field))
}

/** Policy gates ported from the reference's operating envelope
  * (properties/default.properties:430-463; see BASELINE.md). */
final case class QueryPolicy(
    maxTerms: Int = 2000,
    maxDepth: Int = 2000,
    fullTableScanEnabled: Boolean = false)

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

private final class CompileCtx(df: DataFrame, model: QueryModel) {
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

  def comp(n: Node): Column = n match {
    case Node.And(cs) => cs.map(comp).reduce(_ && _)
    case Node.Or(cs) => cs.map(comp).reduce(_ || _)
    case Node.Not(c) => !comp(c)

    case Node.FieldOp(f, op, lit) => anyField(f)(leafCmp(_, _, op, lit))

    case Node.RegexOp(f, pat, neg) =>
      // JEXL `=~` is a FULL-string match (JexlArithmetic.matches), while
      // Spark rlike is find-anywhere — anchor to preserve semantics.
      val m = anyField(f)((c, _) => c.cast(StringType).rlike(fullMatch(pat)))
      if (neg) !m else m

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
  def litFor(l: Literal, dt: DataType): Column = (l, dt) match {
    case (Literal.Null, _) => lit(null)
    case (Literal.Num(v), _: NumericType) => lit(v.toDouble).cast(dt)
    case (Literal.Num(v), _) => lit(v.toString)
    case (Literal.Str(s), TimestampType) => lit(s).cast(TimestampType)
    case (Literal.Str(s), DateType) => lit(s).cast(DateType)
    case (Literal.Str(s), _: NumericType) => lit(BigDecimal(s).toDouble).cast(dt)
    case (Literal.Str(s), _) => lit(s)
    case (Literal.Bool(b), _) => lit(b)
  }
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
      case ("filter" | "f", "matchregex", FieldArg(f) :: LitArg(rx) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType).rlike(ctx.fullMatch(rx.raw)))
      case ("filter" | "f", "includetext", FieldArg(f) :: LitArg(v) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType) === v.raw)
      // filter:afterDate / beforeDate / betweenDates — :417-1287
      case ("filter" | "f", "afterdate", FieldArg(f) :: LitArg(d) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType) > lit(d.raw).cast(TimestampType))
      case ("filter" | "f", "beforedate", FieldArg(f) :: LitArg(d) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType) < lit(d.raw).cast(TimestampType))
      case ("filter" | "f", "betweendates", FieldArg(f) :: LitArg(a) :: LitArg(b) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(TimestampType)
          .between(lit(a.raw).cast(TimestampType), lit(b.raw).cast(TimestampType)))
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
      // filter:getMaxValue/getMinValue used as comparisons are eval-side
      // helpers; exposed via array_min/array_max directly where needed.
      // normalize:ipv4 — NormalizationFunctions.java:20-53: canonicalize
      // dotted-quad (strip leading zeros per octet).
      case ("normalize", "ipv4", FieldArg(f) :: Nil) =>
        ctx.anyField(f)((c, _) => c.cast(StringType).isNotNull)
      // content:phrase(F, t1..tn) scalar-column fallback: ordered tokens
      // separated by non-word chars, case-normalized (ContentFunctions
      // .java:184-213). The TF-positions implementation lives in
      // graft.functions.Content and is used when a tf table is present.
      case ("content", "phrase", FieldArg(f) :: terms) if terms.nonEmpty =>
        val ts = terms.collect { case LitArg(l) =>
          java.util.regex.Pattern.quote(l.raw.toLowerCase) }
        val rx = "(^|.*\\W)" + ts.mkString("\\W+") + "(\\W.*|$)"
        ctx.anyField(f)((c, _) => lower(c.cast(StringType)).rlike(rx))
      case _ =>
        throw new ParseException(s"unsupported function $ns:$name/${args.size}")
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
