package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexl._

/** Query parameters (QueryParameters.java analogs — SURVEY.md §2.2). */
final case class QueryParams(
    returnFields: Seq[String] = Nil,         // RETURN_FIELDS projection
    disallowedFields: Seq[String] = Nil,     // DISALLOWLISTED_FIELDS
    renameFields: Map[String, String] = Map.empty, // RENAME_FIELDS
    limitFieldValues: Map[String, Int] = Map.empty, // LIMIT_FIELDS (arrays)
    hitList: Boolean = false,                // HIT_LIST → HIT_TERM column
    auths: Option[Set[String]] = None,       // visibility enforcement
    visibilityCol: String = "visibility",
    beginDate: Option[String] = None,        // mandatory date bound analogs
    endDate: Option[String] = None,
    dateCol: String = "shard_date",
    datatypeFilter: Seq[String] = Nil,
    datatypeCol: String = "datatype",
    syntax: String = "JEXL")                 // or LUCENE

/** The event-query entry point — ShardQueryLogic re-expressed
  * (SURVEY.md §3.1 "Spark shape"): parse → translate → filter with
  * partition-prunable date/datatype bounds → project/limit/rename →
  * optional HIT_TERM annotation. Catalyst replaces planning steps 3-5 of
  * the reference lifecycle.
  */
final class ShardQueryLogic(
    model: QueryModel = QueryModel(),
    policy: QueryPolicy = QueryPolicy()) {

  def query(events: DataFrame, q: String,
            params: QueryParams = QueryParams()): DataFrame = {
    val ast = if (params.syntax.equalsIgnoreCase("LUCENE")) LuceneParser.parse(q)
              else JexlParser.parse(q)
    Compiler.enforce(ast, policy)

    // date + datatype bounds first: these are the partition-pruning
    // predicates (RangeStream analog — at scale they select partitions,
    // not rows)
    var df = events
    params.beginDate.foreach(b => df = df.filter(col(params.dateCol) >= lit(b)))
    params.endDate.foreach(e => df = df.filter(col(params.dateCol) <= lit(e)))
    if (params.datatypeFilter.nonEmpty && df.columns.contains(params.datatypeCol))
      df = df.filter(col(params.datatypeCol).isin(params.datatypeFilter: _*))
    params.auths.foreach { a =>
      if (df.columns.contains(params.visibilityCol))
        df = graft.vis.Visibility.enforce(df, params.visibilityCol, a)
    }

    df = df.filter(Compiler.compile(ast, df, model))

    if (params.hitList)
      df = df.withColumn("HIT_TERM", HitTerms.column(ast, df, model))

    // LIMIT_FIELDS: cap values per multi-valued field, hits kept first
    // (LimitFields.java semantics: matched values must survive the cap)
    for ((f, n) <- params.limitFieldValues) {
      df.schema.fields.find(_.name.equalsIgnoreCase(f)).foreach { sf =>
        sf.dataType match {
          case _: ArrayType if params.hitList =>
            val hitVals = filter(col("HIT_TERM"),
              h => h.getField("field") === sf.name.toUpperCase)
            val hits = transform(hitVals, h => h.getField("value"))
            df = df.withColumn(sf.name,
              slice(concat(
                filter(col(sf.name), v => array_contains(hits, v.cast("string"))),
                filter(col(sf.name), v => !array_contains(hits, v.cast("string")))),
                1, n))
          case _: ArrayType =>
            df = df.withColumn(sf.name, slice(col(sf.name), 1, n))
          case _ => ()
        }
      }
    }

    // projection / disallowlist / rename (DocumentProjection analog)
    if (params.returnFields.nonEmpty) {
      val keep = params.returnFields.map(_.toUpperCase).toSet ++
        (if (params.hitList) Set("HIT_TERM") else Set.empty)
      df = df.select(df.columns.filter(c => keep.contains(c.toUpperCase))
        .map(col): _*)
    }
    if (params.disallowedFields.nonEmpty) {
      val dropSet = params.disallowedFields.map(_.toUpperCase).toSet
      df = df.drop(df.columns.filter(c => dropSet.contains(c.toUpperCase)): _*)
    }
    for ((from, to) <- params.renameFields)
      df = df.withColumnRenamed(
        df.columns.find(_.equalsIgnoreCase(from)).getOrElse(from), to)
    df
  }
}

/** HIT_TERM machinery (SURVEY.md §7.4 hard part #1): evaluation reports
  * WHY a document matched — an array<struct<field,value>> of the leaf
  * (field, value) pairs that satisfied the query
  * (QueryParameters.java:191, JexlEvaluation HitListArithmetic).
  *
  * Composition rules: AND = union of child hits when all match; OR =
  * union of matching children's hits; NOT contributes no hits.
  */
object HitTerms {

  def column(ast: Node, df: DataFrame, model: QueryModel): Column =
    hits(ast, df, model)

  private def leafHits(df: DataFrame, model: QueryModel, field: String,
                       pred: (Column, DataType) => Column): Column = {
    val resolved = model.expand(field)
      .flatMap(f => df.schema.fields.find(_.name.equalsIgnoreCase(f)))
    if (resolved.isEmpty) array().cast("array<struct<field:string,value:string>>")
    else concat(resolved.map { sf =>
      sf.dataType match {
        case ArrayType(et, _) =>
          transform(filter(col(sf.name), v => pred(v, et)),
            v => struct(lit(sf.name.toUpperCase).as("field"),
              v.cast("string").as("value")))
        case dt =>
          when(pred(col(sf.name), dt),
            array(struct(lit(sf.name.toUpperCase).as("field"),
              col(sf.name).cast("string").as("value"))))
            .otherwise(array().cast("array<struct<field:string,value:string>>"))
      }
    }: _*)
  }

  private def hits(n: Node, df: DataFrame, model: QueryModel): Column = n match {
    case Node.And(cs) =>
      val childHits = cs.map(hits(_, df, model))
      val allMatch = cs.map(c => Compiler.compile(c, df, model)).reduce(_ && _)
      when(allMatch, concat(childHits: _*))
        .otherwise(array().cast("array<struct<field:string,value:string>>"))
    case Node.Or(cs) =>
      concat(cs.map(hits(_, df, model)): _*)
    case Node.Not(_) =>
      array().cast("array<struct<field:string,value:string>>")
    case Node.FieldOp(f, op, l) =>
      leafHits(df, model, f, (c, dt) => cmp(c, dt, op, l))
    case Node.RegexOp(f, pat, neg) =>
      if (neg) array().cast("array<struct<field:string,value:string>>")
      else leafHits(df, model, f,
        (c, _) => c.cast(StringType).rlike("^(?:" + pat + ")$"))
    case Node.Bounded(f, lo, hi, loInc, hiInc) =>
      leafHits(df, model, f, { (c, _) =>
        val cd = c.cast("double")
        val loC = lit(BigDecimal(lo.raw).toDouble)
        val hiC = lit(BigDecimal(hi.raw).toDouble)
        (if (loInc) cd >= loC else cd > loC) &&
          (if (hiInc) cd <= hiC else cd < hiC)
      })
    case _ => array().cast("array<struct<field:string,value:string>>")
  }

  private def cmp(c: Column, dt: DataType, op: CompareOp, l: Literal): Column = {
    val v: Column = l match {
      case Literal.Num(n) => dt match {
        case nt: NumericType => lit(n.toDouble).cast(nt)
        case _ => lit(n.toString)
      }
      case other => lit(other.raw)
    }
    op match {
      case CompareOp.Eq => c === v
      case CompareOp.Ne => c =!= v
      case CompareOp.Lt => c < v
      case CompareOp.Le => c <= v
      case CompareOp.Gt => c > v
      case CompareOp.Ge => c >= v
    }
  }
}
