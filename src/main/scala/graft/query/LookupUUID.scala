package graft.query

import org.apache.spark.sql.DataFrame
import graft.content.ContentStore
import graft.jexl.PolicyException

/** UUID lookup service — the reference's `/lookupUUID/{type}/{value}`
  * surface (LookupUUIDUtil.java:343-430; UUIDType.java:8-32): registered
  * UUID types map a field name to the query logic serving it; a lookup
  * validates its terms against the registry, builds a LUCENE-UUID
  * disjunction, and runs the resolved logic. `content.lookup` follows
  * the hits into the stored-document fetch (ContentQueryLogic).
  */
object LookupUUID {

  val DefaultLogic = "default"

  /** A registered UUID type (UUIDType.java:8-32). `allowWildcardAfter`
    * None forbids wildcards for the type; Some(n) allows them only
    * after n literal characters. */
  final case class UuidType(field: String,
                            logic: String = DefaultLogic,
                            allowWildcardAfter: Option[Int] = None)

  /** The deployment's UUID-type registry plus the batch-lookup cap
    * (LookupUUIDUtil batchLookupUpperLimit). */
  final case class Registry(types: Seq[UuidType], batchLookupLimit: Int = 100) {
    private val byField = types.map(t => t.field.toUpperCase -> t).toMap
    def resolve(uuidType: String): Option[UuidType] =
      byField.get(uuidType.toUpperCase)
  }

  /** Validate lookup terms and build the LUCENE-UUID query string
    * (LookupUUIDUtil.validateLookupCriteria semantics: unregistered
    * types are rejected, wildcards only past the type's allowed
    * position, batches capped). */
  def queryString(reg: Registry, terms: Seq[(String, String)]): String = {
    require(terms.nonEmpty, "no lookup terms")
    require(terms.size <= reg.batchLookupLimit,
      s"too many lookup UUIDs: ${terms.size} > ${reg.batchLookupLimit}")
    terms.map { case (uuidType, value) =>
      val t = reg.resolve(uuidType).getOrElse(
        throw new IllegalArgumentException(s"unregistered UUID type: $uuidType"))
      val wc = value.indexWhere(c => c == '*' || c == '?')
      if (wc >= 0) {
        val minPos = t.allowWildcardAfter.getOrElse(
          throw new IllegalArgumentException(
            s"wildcards not allowed for UUID type $uuidType"))
        require(wc >= minPos,
          s"wildcard in '$value' before position $minPos for $uuidType")
      }
      s"${t.field}:$value"
    }.mkString(" OR ")
  }

  /** Run a UUID lookup: build the disjunction, resolve the (single)
    * logic for the batch, and execute it LUCENE-syntax against the
    * logic's table. Delegate tables are supplied by name — the Spark
    * analog of the executor's logic-name dispatch. */
  def lookup(reg: Registry, terms: Seq[(String, String)],
             tables: Map[String, DataFrame],
             logic: ShardQueryLogic = new ShardQueryLogic(),
             params: QueryParams = QueryParams()): DataFrame = {
    val logics = terms.flatMap { case (t, _) => reg.resolve(t).map(_.logic) }.distinct
    require(logics.size == 1,
      s"batched lookup terms must share one query logic, got: $logics")
    val table = tables.getOrElse(logics.head,
      throw new IllegalArgumentException(s"no table for logic '${logics.head}'"))
    logic.query(table, queryString(reg, terms),
      params.copy(syntax = "LUCENE"))
  }

  /** ID translation (IdTranslatorBean.java:155-231, buildQuery:213-227):
    * the caller does NOT know an id's type, so each id is probed against
    * EVERY registered UUID type — quoted LUCENE terms, crossed over
    * types, OR'd into one disjunction (a 1-term quoted phrase is plain
    * equality). The reference runs it as a single query whose first page
    * is the answer and auto-closes it (callers never call next/close). */
  def translateQueryString(reg: Registry, ids: Seq[String]): String = {
    require(ids.nonEmpty, "no ids to translate")
    require(reg.types.nonEmpty, "no UUID types registered")
    require(ids.size <= reg.batchLookupLimit,
      s"too many ids: ${ids.size} > ${reg.batchLookupLimit}")
    // the ids land inside LUCENE quotes — a quote (or backslash) in an
    // id would break out of the phrase and inject extra query terms
    ids.foreach(id => require(!id.exists(c => c == '"' || c == '\\'),
      s"invalid characters in id '$id'"))
    ids.flatMap(id => reg.types.map(t => s"""${t.field}:"$id""""))
      .mkString(" OR ")
  }

  /** Run an id translation against the registry's (single) logic table. */
  def translate(reg: Registry, ids: Seq[String],
                tables: Map[String, DataFrame],
                logic: ShardQueryLogic = new ShardQueryLogic(),
                params: QueryParams = QueryParams()): DataFrame = {
    val logics = reg.types.map(_.logic).distinct
    require(logics.size == 1,
      s"id translation requires one query logic, got: $logics")
    val table = tables.getOrElse(logics.head,
      throw new IllegalArgumentException(s"no table for logic '${logics.head}'"))
    logic.query(table, translateQueryString(reg, ids),
      params.copy(syntax = "LUCENE"))
  }

  /** UID lookup (lookup/uid/LookupUIDQueryLogic.java:12-38): terms
    * keyed `event` carry result UIDs directly — each value is a
    * space-separated UID list (UID_TERM_SEPARATOR) — and when EVERY
    * term is an event term the event-query step is skipped entirely
    * (isEventLookupRequired == false): the UIDs go straight to the
    * stored-document fetch. Mixed batches run the event lookup for the
    * REGISTERED terms (event terms are not a queryable field) and fetch
    * the union of its hit uids and the direct event uids. */
  /** Visibility enforcement on the stored-content frame itself: the
    * direct event-uid path never runs a query, so the resolved auths
    * must gate the `d`-section rows here exactly as Accumulo's scan-time
    * visibility gates the reference's content keys. Fail CLOSED — auths
    * set against a content table without a visibility column refuses
    * the fetch rather than serving unfiltered documents. */
  private def enforced(content: DataFrame, params: QueryParams): DataFrame =
    params.auths match {
      case None => content
      case Some(a) =>
        if (!content.columns.contains(params.visibilityCol))
          throw new PolicyException(
            s"auths set but content table lacks visibility column " +
              s"'${params.visibilityCol}' — refusing fail-open fetch")
        graft.vis.Visibility.enforce(content, params.visibilityCol, a)
    }

  def lookupUid(reg: Registry, terms: Seq[(String, String)],
                tables: Map[String, DataFrame], content: DataFrame,
                logic: ShardQueryLogic = new ShardQueryLogic(),
                params: QueryParams = QueryParams(),
                uidCol: String = "uid", maxDocs: Int = 1000): DataFrame = {
    require(terms.nonEmpty, "no lookup terms")
    val (eventTerms, rest) = terms.partition(_._1.equalsIgnoreCase("event"))
    // dedup the uid list: a repeated UID in a batch ('7 7') must not
    // duplicate its document in the all-event path
    val uids = eventTerms.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    // the batch cap covers the WHOLE batch — direct event uids plus
    // registered lookup terms — not just the event leg
    require(uids.size + rest.size <= reg.batchLookupLimit,
      s"too many lookup terms: ${uids.size + rest.size} > ${reg.batchLookupLimit}")
    val visContent = enforced(content, params)
    val direct =
      if (uids.isEmpty) None
      else Some(ContentStore.decoded(ContentStore.fetchByRefs(visContent,
        uids.map(u => ContentStore.DocRef(None, None, u)))))
    val fromEvents =
      if (rest.isEmpty) None
      else Some(contentLookup(content, lookup(reg, rest, tables, logic, params),
        uidCol = uidCol, maxDocs = maxDocs, params = params))
    (direct, fromEvents) match {
      case (Some(d), Some(e)) => d.unionByName(e).distinct()
      case (Some(d), None) => d
      case (None, Some(e)) => e
      case (None, None) =>
        throw new IllegalArgumentException("no lookup terms")
    }
  }

  /** `content.lookup=true` follow-up (LookupUUIDUtil.java:424-430 →
    * ContentQueryLogic): fetch the stored documents for the hit uids.
    * The driver-side collect is policy-bounded like the reference's
    * paged response (`maxDocs`, default one page) — a UUID lookup's hit
    * set is a needle set by construction. */
  def contentLookup(content: DataFrame, hits: DataFrame,
                    uidCol: String = "uid", maxDocs: Int = 1000,
                    params: QueryParams = QueryParams()): DataFrame = {
    val uids = hits.select(uidCol).distinct().limit(maxDocs + 1).collect()
    require(uids.length <= maxDocs,
      s"content lookup exceeds $maxDocs documents; page the query instead")
    val refs = uids.toSeq
      .map(r => ContentStore.DocRef(None, None, String.valueOf(r.get(0))))
    ContentStore.decoded(ContentStore.fetchByRefs(enforced(content, params), refs))
  }
}
