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
    syntax: String = "JEXL",
    // IGNORE_NONEXISTENT_FIELDS (QueryParameters.java:202): by default a
    // query naming a field the schema has never seen is refused
    // (DefaultQueryPlanner.timedTestForNonExistentFields:884,1434)
    ignoreNonexistentFields: Boolean = false,                 // or LUCENE
    // Masked-field pairs (QueryParameters.java:61, MaskedFieldHelper):
    // unmasked column → masked sibling column. Unauthorized viewers see
    // the masked value; authorized viewers see the unmasked one (falling
    // back to masked where unmasked is absent).
    maskedFields: Map[String, String] = Map.empty,
    unmaskAuthorized: Boolean = false,
    // INCLUDE_DATATYPE_AS_FIELD / INCLUDE_RECORD_ID (QueryParameters
    // .java:72-78): decorate each returned document with its datatype
    // (EVENT_DATATYPE) and its full event key (RECORD_ID =
    // shardDate/datatype/uid) — the DocumentTransformer metadata
    // surfaced as fields. Both survive RETURN_FIELDS like HIT_TERM.
    includeDatatypeAsField: Boolean = false,
    includeRecordId: Boolean = false,
    uidCol: String = "uid")

/** The event-query entry point — ShardQueryLogic re-expressed
  * (SURVEY.md §3.1 "Spark shape"): parse → translate → filter with
  * partition-prunable date/datatype bounds → project/limit/rename →
  * optional HIT_TERM annotation. Catalyst replaces planning steps 3-5 of
  * the reference lifecycle.
  */
final class ShardQueryLogic(
    model: QueryModel = QueryModel(),
    policy: QueryPolicy = QueryPolicy(),
    // global-index frame for unfielded-term expansion
    // (UnfieldedIndexExpansionVisitor): absent → schema-wide fallback
    index: Option[DataFrame] = None,
    unfieldedThreshold: Int = 50,
    // value-specific field remappings (WhindexVisitor.java:58-71):
    // applied to the parsed tree before compilation — the marker term is
    // consumed and the generic field swaps for the value-specific one
    whindex: Seq[Whindex.Mapping] = Nil) {

  /** This logic with a different query model, all other configuration
    * (policy, index, whindex) retained — the reference's per-request
    * QUERY_MODEL parameter rebinding the model a logic resolves with. */
  def withModel(m: QueryModel): ShardQueryLogic =
    new ShardQueryLogic(m, policy, index, unfieldedThreshold, whindex)

  def query(events: DataFrame, q: String,
            params: QueryParams = QueryParams()): DataFrame = {
    val parsed = if (params.syntax.equalsIgnoreCase("LUCENE")) LuceneParser.parse(q)
                 else JexlParser.parse(q)
    // #GROUPBY/#UNIQUE/#SUM/f:options… pseudo-functions are stripped into
    // a QueryOptions struct (QueryOptionsFromQueryVisitor analog) and
    // applied as post-evaluation transforms at the end.
    val (remaining, opts) = QueryOptions.extract(parsed)
    val ast0 = remaining.getOrElse {
      if (!policy.fullTableScanEnabled)
        throw new PolicyException(
          "query contains only options (full table scan); set fullTableScanEnabled")
      null
    }
    // whindex value-trigger remap first: the marker equality is consumed
    // and the generic field swaps to the value-specific one, so every
    // later stage (expansion, normalization, compile) sees the remapped
    // tree (WhindexVisitor runs in the reference's planner pipeline)
    val astW = if (whindex.isEmpty || ast0 == null) ast0
               else Whindex.rewrite(ast0, whindex)
    // unfielded `_ANYFIELD_` terms consult the global index for which
    // fields actually contain the value BEFORE compiling the OR
    val ast1 = (astW, index) match {
      case (a, Some(gi)) if a != null => UnfieldedExpansion.rewrite(a,
        UnfieldedExpansion.indexLookup(gi, unfieldedThreshold), unfieldedThreshold)
      case (a, _) => a
    }
    // #NO_EXPANSION: listed fields are exempt from model alias expansion
    // (QueryModelVisitor.applyModel, NoExpansionTests)
    val effModel = model.withoutExpansion(opts.noExpansion)
    // #LENIENT/#STRICT normalization-failure semantics (drop vs refuse)
    val ast = if (ast1 != null)
      NormalizationGuard.rewrite(ast1, effModel, opts.lenient, opts.strict)
    else ast1
    if (ast != null) Compiler.enforce(ast, policy)

    // date + datatype bounds first: these are the partition-pruning
    // predicates (RangeStream analog — at scale they select partitions,
    // not rows)
    var df = events
    params.beginDate.foreach(b => df = df.filter(col(params.dateCol) >= lit(b)))
    params.endDate.foreach(e => df = df.filter(col(params.dateCol) <= lit(e)))
    // Fail CLOSED: a requested security/datatype filter whose column is
    // absent must refuse the query, not silently return everything — the
    // reference's Accumulo model can never skip visibility filtering.
    if (params.datatypeFilter.nonEmpty) {
      if (!df.columns.contains(params.datatypeCol))
        throw new PolicyException(
          s"datatype filter requested but column '${params.datatypeCol}' is absent")
      df = df.filter(col(params.datatypeCol).isin(params.datatypeFilter: _*))
    }
    params.auths.foreach { a =>
      if (!df.columns.contains(params.visibilityCol))
        throw new PolicyException(
          s"auths set but visibility column '${params.visibilityCol}' is absent — " +
            "refusing fail-open scan")
      df = graft.vis.Visibility.enforce(df, params.visibilityCol, a)
    }

    // masking happens BEFORE evaluation: predicates run on what the
    // viewer is allowed to see
    for ((field, maskedField) <- params.maskedFields) {
      val f = df.columns.find(_.equalsIgnoreCase(field))
      val m = df.columns.find(_.equalsIgnoreCase(maskedField))
      (f, m) match {
        case (Some(fc), Some(mc)) =>
          df =
            (if (params.unmaskAuthorized)
               df.withColumn(fc, coalesce(col(fc), col(mc)))
             else df.withColumn(fc, col(mc)))
            .drop(mc)
        case _ => ()
      }
    }

    if (ast != null) {
      longGroupingRoute(ast, df, params, opts) match {
        case Some(routed) => df = routed
        case None =>
          // nonexistent-field planner test (timedTestForNonExistentFields):
          // a field absent from the schema after model expansion refuses
          // the query unless IGNORE_NONEXISTENT_FIELDS. (The long-layout
          // grouping route above is exempt — its function fields are
          // VALUES of the `field` column, not columns.)
          if (!params.ignoreNonexistentFields) {
            val special = Set("_ANYFIELD_", "_NOFIELD_", "HIT_TERM", "TERMOFFSETMAP")
            val cols = df.columns.map(_.toUpperCase).toSet
            val missing = Compiler.referencedFields(ast)
              .filterNot(f => special.contains(f.toUpperCase))
              .filterNot(f => effModel.expand(f)
                .exists(e => cols.contains(e.toUpperCase)))
            if (missing.nonEmpty)
              throw new PolicyException(
                s"query references nonexistent field(s) ${missing.mkString(", ")}; " +
                  "set ignoreNonexistentFields to run anyway")
          }
          df = df.filter(Compiler.compile(ast, df, effModel))
          if (params.hitList)
            df = df.withColumn("HIT_TERM", HitTerms.column(ast, df, effModel))
      }
    }

    // Result decorations. Fail loudly when the frame lacks the key
    // columns — silently-absent metadata would defer the failure to
    // whatever consumes the record id downstream.
    if (params.includeDatatypeAsField) {
      val dt = df.columns.find(_.equalsIgnoreCase(params.datatypeCol)).getOrElse(
        throw new PolicyException(
          s"INCLUDE_DATATYPE_AS_FIELD requires column '${params.datatypeCol}'"))
      df = df.withColumn("EVENT_DATATYPE", col(dt))
    }
    if (params.includeRecordId) {
      def need(c: String): String = df.columns.find(_.equalsIgnoreCase(c))
        .getOrElse(throw new PolicyException(
          s"INCLUDE_RECORD_ID requires column '$c'"))
      df = df.withColumn("RECORD_ID", concat_ws("/",
        date_format(col(need(params.dateCol)).cast("date"), "yyyyMMdd"),
        col(need(params.datatypeCol)),
        col(need(params.uidCol)).cast("string")))
    }

    // #EXCERPT_FIELDS → HIT_EXCERPT (ExcerptTransform.java:53): slice the
    // phrase window out of each named text field. Runs after evaluation —
    // the reference's transform stage — and survives RETURN_FIELDS like
    // HIT_TERM does.
    if (opts.excerptFields.nonEmpty && ast != null)
      Excerpts.phraseTerms(ast).foreach { phrase =>
        val cols = Excerpts.parse(opts.excerptFields).flatMap { spec =>
          df.columns.find(_.equalsIgnoreCase(spec.field))
            .map(c => Excerpts.excerptCol(col(c), phrase, spec))
        }
        if (cols.nonEmpty)
          df = df.withColumn("HIT_EXCERPT",
            if (cols.size == 1) cols.head else array(cols: _*))
      }

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
        (if (params.hitList) Set("HIT_TERM") else Set.empty) ++
        (if (opts.excerptFields.nonEmpty) Set("HIT_EXCERPT") else Set.empty) ++
        (if (params.includeDatatypeAsField) Set("EVENT_DATATYPE") else Set.empty) ++
        (if (params.includeRecordId) Set("RECORD_ID") else Set.empty)
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

    df = applyOptions(df, opts, params.visibilityCol)
    // max-results policy cap (event.query.max.results analog)
    policy.maxResults.foreach(m => df = df.limit(m.toInt))
    df
  }

  /** Planner route for `grouping:` functions over the LONG layout: the
    * reference drives GroupingRequiredFilterFunctions from `fi` keys — a
    * keyed merge — not by reassembling wide documents. When the frame IS
    * the exploded `(uid, field, group, value)` layout and the whole query
    * is one matchesInGroup, compile it to Grouping.matchesInGroup's
    * codegen'd equi-join plan (per-condition filtered scans joined on
    * (uid, group), semi-join back) instead of the interpreted wide-array
    * exists — measured 4-8× faster at sf0.1 and shuffle-scalable: skew
    * dies with per-field selectivity, never with document width. */
  private def longGroupingRoute(ast: Node, df: DataFrame,
                                params: QueryParams,
                                opts: QueryOptions): Option[DataFrame] = ast match {
    case Node.Func("grouping", name, args)
        if Set("matchesingroup", "matchesingroupleft").contains(name.toLowerCase) &&
          Seq("uid", "field", "group", "value").forall(c =>
            df.columns.exists(_.equalsIgnoreCase(c))) =>
      // optional odd trailing integer = zero-based context split position
      // (GroupingRequiredFilterFunctions.java:49,257)
      val split: Option[(List[Node.Arg], Int)] =
        if (args.length % 2 == 0) Some((args, 0))
        else args.last match {
          case Node.LitArg(p) =>
            scala.util.Try(p.raw.trim.toInt).toOption.map(i => (args.init, i))
          case _ => None
        }
      split.flatMap { case (pairArgs, pos) =>
        val pairs = pairArgs.grouped(2).toList
        val conds = pairs.collect {
          case List(Node.FieldArg(f), Node.LitArg(v)) =>
            graft.operators.Grouping.FieldMatch(f, Compiler.literalPredicate(v))
        }
        if (conds.size != pairs.size) None
        else {
          if (pos < 0) throw new ParseException(
            s"grouping: position argument must be >= 0, got $pos")
          // Per-condition group identities, applied inside each condition's
          // filtered scan (never a whole-frame rekey): Left splits BOTH
          // sides at pos; Right is asymmetric per the reference — first
          // field at pos, later fields by subgroup (last segment).
          val left = name.equalsIgnoreCase("matchesingroupleft")
          val identFirst: Column => Column =
            if (left) graft.operators.Grouping.contextLeft(_, pos)
            else graft.operators.Grouping.contextRight(_, pos)
          val identRest: Column => Column =
            if (left) identFirst
            else graft.operators.Grouping.contextRight(_, 0)
          val idents = identFirst +: Seq.fill(conds.size - 1)(identRest)
          val uidCol = df.columns.find(_.equalsIgnoreCase("uid")).get
          // HIT_LIST rides the SAME keyed plan: the matching (field,
          // value) pairs of fully-matched groups are exactly the keyed
          // join's own output, so the per-group aggregate collects them
          // (one extra buffer over matching rows — never the wide
          // interpreted path this route replaced, r10 Next #7)
          if (params.hitList) {
            val hits = graft.operators.Grouping
              .matchesInGroupHits(df, conds, idents)
              .withColumnRenamed("uid", uidCol)
            // hits is one row per matching uid: the inner join is the
            // semi-join plus the HIT_TERM decoration, no fan-out
            if (params.returnFields.map(_.toUpperCase) == Seq("UID") &&
                params.disallowedFields.isEmpty &&
                params.limitFieldValues.isEmpty &&
                !params.includeRecordId && !params.includeDatatypeAsField &&
                opts.excerptFields.isEmpty)
              Some(hits)
            else
              Some(df.join(hits, Seq(uidCol), "inner"))
          } else {
          val uids = graft.operators.Grouping.matchesInGroupKeyed(df, conds, idents)
          // a uid-only projection is the matching-document ID SET — the
          // uids frame already IS that (one row per matching document,
          // the reference's document-level contract — DocumentGrouper
          // emits documents, not fi rows); semi-joining the long frame
          // back would re-scan it only to fan each document out to its
          // row count and project the id. Every option that decorates or
          // reshapes rows must route through the semi-join (the routed
          // frame has ONLY the uid column — RECORD_ID/EVENT_DATATYPE/
          // HIT_EXCERPT decorations would otherwise fail on it)
          if (params.returnFields.map(_.toUpperCase) == Seq("UID") &&
              params.disallowedFields.isEmpty &&
              params.limitFieldValues.isEmpty &&
              !params.includeRecordId && !params.includeDatatypeAsField &&
              opts.excerptFields.isEmpty)
            Some(uids.withColumnRenamed("uid", uidCol))
          else
            Some(df.join(uids.withColumnRenamed("uid", uidCol), Seq(uidCol), "left_semi"))
          }
        }
      }
    case _ => None
  }

  private def resolveCol(df: DataFrame, f: String): Column =
    df.columns.find(_.equalsIgnoreCase(f)) match {
      case Some(c) => col(c)
      case None => throw new ParseException(s"option field $f not in result schema")
    }

  /** #UNIQUE granularity truncation (UniqueGranularity.java). */
  private def granTrunc(c: Column, g: String): Column = g match {
    case "ALL" => c.cast("string")
    case "YEAR" => date_format(c.cast("timestamp"), "yyyy")
    case "MONTH" => date_format(c.cast("timestamp"), "yyyy-MM")
    case "DAY" => date_format(c.cast("timestamp"), "yyyy-MM-dd")
    case "HOUR" => date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH")
    case "TENTH_OF_HOUR" =>
      concat(date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:"),
        floor(minute(c.cast("timestamp")) / 10).cast("string"))
    case "MINUTE" => date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm")
    case "SECOND" => date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss")
    case "MILLISECOND" =>
      date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS")
    case other => throw new ParseException(s"unknown unique granularity $other")
  }

  /** Post-evaluation application of the option struct:
    *  - #UNIQUE → one deterministic survivor per truncated key combination
    *    (window row_number over all sortable columns — exact, no bloom
    *    false-negatives; most-recent variant flips the ordering);
    *  - #GROUPBY + #SUM/#MIN/#MAX/#COUNT/#AVERAGE → hash aggregation
    *    (partial+final, the reference's batch+merge). SUM/AVERAGE
    *    accumulate in decimal so results are bit-stable under any
    *    partitioning, then surface as double;
    *  - f:rename / f:limit_fields on the final frame. */
  private def applyOptions(df0: DataFrame, opts: QueryOptions,
                           visibilityCol: String = "visibility"): DataFrame = {
    var df = df0
    if (opts.unique.nonEmpty) {
      val keys = opts.unique.map(u => granTrunc(resolveCol(df, u.field), u.granularity))
      val sortable = df.schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }).map(f => col(f.name))
      val ordering = if (opts.mostRecentUnique) sortable.map(_.desc)
                     else sortable.map(_.asc)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys: _*).orderBy(ordering.toSeq: _*)
      df = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    if (opts.groupBy.nonEmpty) {
      val keys = opts.groupBy.map(resolveCol(df, _))
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("COUNT")) ++
        opts.sum.map(f => sum(resolveCol(df, f).cast("decimal(28,8)"))
          .cast("double").as(s"SUM_${f.toUpperCase}")) ++
        opts.min.map(f => min(resolveCol(df, f)).as(s"MIN_${f.toUpperCase}")) ++
        opts.max.map(f => max(resolveCol(df, f)).as(s"MAX_${f.toUpperCase}")) ++
        opts.count.map(f => count(resolveCol(df, f)).as(s"COUNT_${f.toUpperCase}")) ++
        // average = double division of the exact decimal sum — decimal
        // division scale rules differ across engines; double÷double of
        // identical operands is bit-stable everywhere
        opts.average.map(f => (sum(resolveCol(df, f).cast("decimal(28,8)")).cast("double") /
          count(resolveCol(df, f)).cast("double")).as(s"AVERAGE_${f.toUpperCase}"))
      // Visibility recombination on aggregation (GroupingUtils /
      // MarkingFunctions analog): a marked frame's grouped output carries
      // the lattice join of the member markings, never silently drops it.
      val visAgg = df.columns
        .find(c => c.equalsIgnoreCase(visibilityCol) &&
          !opts.groupBy.exists(_.equalsIgnoreCase(c)))
        .map(v => graft.vis.Visibility.combineAgg(col(v)).as("VISIBILITY")).toSeq
      df = df.groupBy(keys: _*).agg(aggs.head, (aggs.tail ++ visAgg): _*)
    }
    for ((from, to) <- opts.rename)
      df = df.withColumnRenamed(
        df.columns.find(_.equalsIgnoreCase(from)).getOrElse(from), to)
    for ((f, n) <- opts.limitFields)
      df.schema.fields.find(_.name.equalsIgnoreCase(f)).foreach { sf =>
        sf.dataType match {
          case _: ArrayType => df = df.withColumn(sf.name, slice(col(sf.name), 1, n))
          case _ => ()
        }
      }
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
    case Node.FieldOp(_, CompareOp.Ne, _) =>
      // negated leaves contribute no hits (HitListArithmetic)
      array().cast("array<struct<field:string,value:string>>")
    case Node.FieldOp(f, op, l) =>
      leafHits(df, model, f, (c, dt) => cmp(c, dt, op, l))
    case Node.RegexOp(f, pat, neg) =>
      if (neg) array().cast("array<struct<field:string,value:string>>")
      else leafHits(df, model, f,
        (c, _) => c.cast(StringType).rlike("^(?:" + pat + ")$"))
    case Node.Bounded(f, lo, hi, loInc, hiInc) =>
      // type-aware like the Compiler's own bounded compile — a string or
      // date bounded range must NOT be forced through double (that yields
      // null casts and empty hits while the filter itself matches)
      leafHits(df, model, f, { (c, dt) =>
        val loC = Compiler.litFor(lo, dt)
        val hiC = Compiler.litFor(hi, dt)
        (if (loInc) c >= loC else c > loC) &&
          (if (hiInc) c <= hiC else c < hiC)
      })
    case _ => array().cast("array<struct<field:string,value:string>>")
  }

  private def cmp(c: Column, dt: DataType, op: CompareOp, l: Literal): Column = {
    val v = Compiler.litFor(l, dt)
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
