package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** Remote query delegation — the reference's `RemoteQueryLogic` family
  * (BaseRemoteQueryLogic.java:31, RemoteEventQueryLogic,
  * RemoteEdgeQueryLogic; service contract RemoteQueryService.java):
  * a query logic whose execution happens in ANOTHER deployment, reached
  * through its REST tier. Locally it creates the remote query, drains
  * `next` pages until the remote answers NO_CONTENT (204), and surfaces
  * the rows as a DataFrame; `plan`/`close` delegate likewise.
  *
  * The transport is the reference's own lifecycle verbs against
  * [[QueryServer]]'s endpoints, JDK `HttpURLConnection` only — no client
  * library. Row payloads are the server's `toJSON` documents; they are
  * re-parsed by `spark.read.json`, so the remote logic composes with
  * every local transform (and with [[Composite]] — a remote leg can sit
  * beside local legs exactly as in the reference).
  */
final class RemoteQueryService(baseUrl: String) {

  private def http(method: String, pathAndQuery: String): (Int, String) = {
    val conn = new URL(baseUrl + pathAndQuery)
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    try {
      val status = conn.getResponseCode
      val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (status == 204 || stream == null) ""
        else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      (status, body)
    } finally conn.disconnect()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def extract(field: String, json: String): String = {
    val m = ("\"" + field + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse(
      throw new IllegalStateException(s"no '$field' in remote response: $json"))
  }

  /** Split a JSON array body into its top-level elements (the page's row
    * documents) without a JSON library: strip the array's own brackets,
    * then depth-scan for the element objects, respecting strings and
    * escapes. */
  private[query] def splitTopLevel(arrayBody: String): Seq[String] = {
    val s = arrayBody.trim
    // the final ']' closes the array: element strings all precede it
    val body = if (s.startsWith("[")) s.substring(1, s.lastIndexOf(']')) else s
    val out = Seq.newBuilder[String]
    var depth = 0; var start = -1; var inStr = false; var esc = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => if (depth == 0) start = i; depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) { out += body.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** The named top-level array of a JSON body, element strings. */
  def arrayOf(field: String, json: String): Seq[String] = {
    val ix = json.indexOf("\"" + field + "\"")
    if (ix < 0) Seq.empty
    else splitTopLevel(json.substring(json.indexOf('[', ix)))
  }

  /** The `"rows"` array of a page-shaped JSON body, element strings. */
  def rowsOf(pageJson: String): Seq[String] = arrayOf("rows", pageJson)

  /** Raw verb passthrough returning (status, body) — for endpoints
    * where a non-200 status is a meaningful terminal, e.g. the atom
    * feed's 204 end-of-feed. */
  def httpStatus(method: String, pathAndQuery: String): (Int, String) =
    http(method, pathAndQuery)

  /** Raw verb passthrough for endpoints without a typed helper; the
    * response body, throwing on any non-200 status. */
  def http0(method: String, pathAndQuery: String): String = {
    val (status, body) = http(method, pathAndQuery)
    if (status != 200)
      throw new IllegalStateException(
        s"remote $pathAndQuery failed ($status): $body")
    body
  }

  /** `createQuery` (RemoteQueryService.createQuery) → remote query id. */
  def createQuery(table: String, query: String, syntax: String = "JEXL",
                  pageSize: Int = 100, orderBy: Seq[String] = Seq.empty,
                  user: String = "",
                  proxiedEntities: Seq[String] = Seq.empty): String = {
    val order = if (orderBy.isEmpty) ""
                else s"&orderBy=${enc(orderBy.mkString(","))}"
    val who = if (user.isEmpty) "" else s"&user=${enc(user)}"
    val chain = if (proxiedEntities.isEmpty) ""
                else s"&proxiedEntities=${enc(proxiedEntities.mkString(","))}"
    val (status, body) = http("POST",
      s"/query/create?table=${enc(table)}&query=${enc(query)}" +
        s"&syntax=${enc(syntax)}&pageSize=$pageSize$order$who$chain")
    if (status != 200)
      throw new IllegalStateException(s"remote create failed ($status): $body")
    extract("queryId", body)
  }

  /** `createAndNext` (QueryExecutorBean's primary verb): create + first
    * page in one round trip. None = the query had no results (the
    * server closed it and returned 204). */
  def createAndNext(table: String, query: String, syntax: String = "JEXL",
                    pageSize: Int = 100, orderBy: Seq[String] = Seq.empty)
      : Option[(String, Seq[String])] = {
    val order = if (orderBy.isEmpty) ""
                else s"&orderBy=${enc(orderBy.mkString(","))}"
    val (status, body) = http("POST",
      s"/query/createAndNext?table=${enc(table)}&query=${enc(query)}" +
        s"&syntax=${enc(syntax)}&pageSize=$pageSize$order")
    if (status == 204) None
    else if (status != 200)
      throw new IllegalStateException(s"remote createAndNext failed ($status): $body")
    else Some((extract("queryId", body), rowsOf(body)))
  }

  /** `&user=` suffix for principal-bound verbs (empty = anonymous). */
  private def who(user: String): String =
    if (user.isEmpty) "" else s"&user=${enc(user)}"

  /** One `next` call; None at the remote NO_CONTENT (exhausted).
    * Ownership-gated servers require the creating `user`. */
  def nextPage(id: String, user: String = ""): Option[Seq[String]] = {
    val (status, body) = http("GET", s"/query/next?id=${enc(id)}${who(user)}")
    if (status == 204) None
    else if (status != 200)
      throw new IllegalStateException(s"remote next failed ($status): $body")
    else Some(rowsOf(body))
  }

  def plan(id: String): String = http("GET", s"/query/plan?id=${enc(id)}")._2

  def close(id: String, user: String = ""): Unit =
    http("POST", s"/query/close?id=${enc(id)}${who(user)}")

  /** `duplicate` (QueryExecutorBean `/{id}/duplicate`) → the NEW id. */
  def duplicate(id: String): String = {
    val (status, body) = http("POST", s"/query/duplicate?id=${enc(id)}")
    if (status != 200)
      throw new IllegalStateException(s"remote duplicate failed ($status): $body")
    extract("queryId", body)
  }

  /** `reset` (QueryExecutorBean `/{id}/reset`): same id, paging restarts. */
  def reset(id: String): Unit = {
    val (status, body) = http("POST", s"/query/reset?id=${enc(id)}")
    if (status != 200)
      throw new IllegalStateException(s"remote reset failed ($status): $body")
  }

  /** Batched `lookupUUID` (createUUIDQueryAndNext: create + first page in
    * one call) → (queryId, first-page row documents); drain the rest with
    * [[nextPage]]. */
  def lookupUUID(terms: Seq[(String, String)], pageSize: Int = 100,
                 user: String = "anonymous"): (String, Seq[String]) = {
    val t = terms.map { case (k, v) => s"$k:$v" }.mkString(",")
    val (status, body) = http("GET",
      s"/lookupUUID?terms=${enc(t)}&pageSize=$pageSize&user=${enc(user)}")
    if (status != 200)
      throw new IllegalStateException(s"remote lookupUUID failed ($status): $body")
    (extract("queryId", body), rowsOf(body))
  }

  /** CachedResults `load` (CachedResultsBean): expose a finished query's
    * results as a named view for SQL retrieval. */
  def loadCachedResults(id: String, alias: String): Unit = {
    val (status, body) = http("POST",
      s"/cachedresults/load?id=${enc(id)}&alias=${enc(alias)}")
    if (status != 200)
      throw new IllegalStateException(s"remote load failed ($status): $body")
  }

  /** CachedResults SQL retrieval: one bounded page of row documents. */
  def cachedSql(sql: String, pageSize: Int = 100): Seq[String] = {
    val (status, body) = http("GET",
      s"/cachedresults/sql?sql=${enc(sql)}&pageSize=$pageSize")
    if (status != 200)
      throw new IllegalStateException(s"remote sql failed ($status): $body")
    rowsOf(body)
  }

  /** `lookupUID` batch (LookupUIDQueryLogic): all-event uid batches skip
    * the event query and fetch stored documents directly; the first page
    * rides the create. Returns (queryId, first-page rows). */
  def lookupUid(uids: Seq[String], pageSize: Int = 100): (String, Seq[String]) = {
    val (status, body) = http("GET",
      s"/lookupUID?uids=${enc(uids.mkString(","))}&pageSize=$pageSize")
    if (status != 200)
      throw new IllegalStateException(s"remote lookupUID failed ($status): $body")
    (extract("queryId", body), rowsOf(body))
  }

  /** `translateIDs` (IdTranslatorBean): probe ids against every
    * registered UUID type; the first page IS the answer (auto-closed
    * remotely). Returns the row documents; empty on remote 204. */
  def translateIds(ids: Seq[String], pageSize: Int = 100): Seq[String] = {
    val (status, body) = http("GET",
      s"/translateIDs?ids=${enc(ids.mkString(","))}&pageSize=$pageSize")
    if (status == 204) Seq.empty
    else if (status != 200)
      throw new IllegalStateException(s"remote translateIDs failed ($status): $body")
    else rowsOf(body)
  }

  /** `/query/metrics/summary` (QueryMetricsBean `/summary/all` +
    * `/summary/user`): the nine ordered time-window buckets as row
    * documents. */
  def metricsSummary(end: Option[Long] = None,
                     user: Option[String] = None): Seq[String] = {
    val qs = Seq(end.map(e => s"end=$e"), user.map(u => s"user=${enc(u)}"))
      .flatten.mkString("&")
    val (status, body) = http("GET",
      "/query/metrics/summary" + (if (qs.isEmpty) "" else s"?$qs"))
    if (status != 200)
      throw new IllegalStateException(s"remote summary failed ($status): $body")
    splitTopLevel(body.substring(body.indexOf('[') + 1, body.lastIndexOf(']')))
  }

  /** `predict` (QueryExecutorBean `/{logicName}/predict`): named cost
    * predictions for an unexecuted query, raw JSON body. */
  def predict(table: String, query: String, syntax: String = "JEXL"): String = {
    val (status, body) = http("GET",
      s"/query/predict?table=${enc(table)}&query=${enc(query)}&syntax=${enc(syntax)}")
    if (status != 200)
      throw new IllegalStateException(s"remote predict failed ($status): $body")
    body
  }
}

object RemoteQueryLogic {

  /** Run `query` on the remote deployment and return the full result:
    * create → drain pages (each page is one remote job; the page loop is
    * the reference's iterator) → close → re-parse the row documents.
    * The driver holds one page at a time plus the accumulated row
    * strings — remote logics are for federating MODERATE result sets
    * across deployments (the reference's use), not for bulk export;
    * `maxRows` guards the accumulation like every other driver-side
    * materialization in this library. */
  def query(spark: SparkSession, service: RemoteQueryService, table: String,
            q: String, syntax: String = "JEXL", pageSize: Int = 1000,
            orderBy: Seq[String] = Seq.empty,
            maxRows: Long = 1000000L,
            schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val id = service.createQuery(table, q, syntax, pageSize, orderBy)
    val rows = Seq.newBuilder[String]
    var n = 0L
    try {
      var page = service.nextPage(id)
      while (page.nonEmpty) {
        val batch = page.get
        n += batch.size
        if (n > maxRows) throw new IllegalStateException(
          s"remote result exceeds maxRows=$maxRows; page through " +
            "RemoteQueryService.nextPage instead of materializing")
        rows ++= batch
        page = service.nextPage(id)
      }
    } finally service.close(id)
    import spark.implicits._
    // schema-less JSON inference on ZERO rows yields a zero-column
    // frame any downstream column reference breaks on — callers that
    // can see empty remotes pass the expected schema
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    reader.json(spark.createDataset(rows.result()))
  }
}
