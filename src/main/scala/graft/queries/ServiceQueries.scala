package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.query._

/** Gates for the query-service machinery: resumable cursor pages,
  * per-page metrics (RunningQuery), the instrumented query-metrics logic,
  * the DocumentTransform chain, and the analyzer SPI — each against a
  * plain-SQL oracle so the service layer is hash-checked, not just
  * unit-tested.
  */
object ServiceQueries {

  private def tempStateDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cursor").toString

  /** Resumable paged cursor (CheckpointableQueryLogic `next(queryId)`):
    * two next() calls land on the SECOND page — the offset survived in
    * durable state, not driver memory. */
  def cursorPage(s: SparkSession, d: String): DataFrame = {
    val cursor = new QueryCursor(tempStateDir())
    val df = Tables.customer(s, d).select("c_custkey", "c_name")
    cursor.next("cp1", df, Seq("c_custkey"), pageSize = 10)
    cursor.next("cp1", df, Seq("c_custkey"), pageSize = 10)
  }

  /** Per-page metrics (RunningQuery / QueryMetric.PageMetric:331): drive
    * a paged query to completion; the metric rows (page sizes + statuses)
    * are the result. */
  def queryPages(s: SparkSession, d: String): DataFrame = {
    QueryMetrics.clear()
    // paging re-plans the frame once per page — persist it so 50 pages
    // hit cached partitions, the pattern real callers use (QueryCursor
    // scaladoc); at scale the page offsets stream from the persisted sort
    val df = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").persist()
    df.count()
    new RunningQuery(new QueryCursor(tempStateDir()), "pq1", df,
      Seq("o_orderkey"), pageSize = 1000).run()
    df.unpersist()
    QueryMetrics.pagesDF(s)
      .select(col("queryId"), col("pageNum"), col("rows"), col("status"))
  }

  /** CompositeQueryLogic parallel mode: one entity question fanned out
    * to two delegate logics over different tables, responses merged
    * (name-sorted delegates, shared response shape). */
  def compositeQuery(s: SparkSession, d: String): DataFrame = {
    val logic = new ShardQueryLogic()
    val events = logic.query(Tables.events(s, d),
        "USER_ID == 42 && EVENT_TYPE == 'purchase'",
        QueryParams(returnFields = Seq("event_id")))
      .select(col("event_id").cast("string").as("id"),
        lit("events").as("logic_name"))
    val orders = logic.query(Tables.orders(s, d), "O_CUSTKEY == 42",
        QueryParams(returnFields = Seq("o_orderkey")))
      .select(col("o_orderkey").cast("string").as("id"),
        lit("orders").as("logic_name"))
    Composite.union(Seq("orders" -> orders, "events" -> events))
  }

  /** UUID lookup: registered types resolve fields + logic; a batched
    * two-term lookup compiles to a LUCENE disjunction on the events
    * logic (LookupUUIDUtil.createUUIDQueryAndNext). */
  def lookupUuid(s: SparkSession, d: String): DataFrame = {
    val reg = LookupUUID.Registry(Seq(
      LookupUUID.UuidType("EVENT_ID", logic = "events"),
      LookupUUID.UuidType("USER_ID", logic = "events")))
    LookupUUID.lookup(reg,
        Seq("EVENT_ID" -> "5", "EVENT_ID" -> "6", "USER_ID" -> "42"),
        Map("events" -> Tables.events(s, d)),
        params = QueryParams(returnFields =
          Seq("event_id", "user_id", "event_type")))
      .select("event_id", "user_id", "event_type")
  }

  /** FilteredQueryLogic (logic/filtered/FilteredQueryLogic.java:23):
    * composite of two filtered delegates — the events leg passes its
    * opt-in parameter filter; the orders leg requires a SECRET auth the
    * caller's chain lacks and is filtered out (returns no results, runs
    * no job). Result = the passing leg only. */
  def filteredQuery(s: SparkSession, d: String): DataFrame = {
    val params = Map("include.events" -> "true")
    val auths = Seq(Set("PUBLIC"), Set("PUBLIC", "OPS")) // user, then proxy
    val logic = new ShardQueryLogic()
    val events = Filtered.query(
        Filtered.ByParameter("include.events"), params, auths) {
      logic.query(Tables.events(s, d), "EVENT_TYPE == 'click'",
          QueryParams(returnFields = Seq("event_id")))
        .select(col("event_id").cast("string").as("id"),
          lit("events").as("logic_name"))
    }
    val orders = Filtered.query(
        Filtered.ByAuth("SECRET"), params, auths) {
      logic.query(Tables.orders(s, d), "O_ORDERSTATUS == 'F'",
          QueryParams(returnFields = Seq("o_orderkey")))
        .select(col("o_orderkey").cast("string").as("id"),
          lit("orders").as("logic_name"))
    }
    Composite.union(Seq("events" -> events, "orders" -> orders))
  }

  /** RemoteEventQueryLogic (BaseRemoteQueryLogic.java:31): the query runs
    * in a REMOTE deployment reached through its REST tier — here a real
    * [[QueryServer]] on an ephemeral port — and the local logic is
    * create → drain pages until 204 → close → re-parse rows. The gate
    * proves the full HTTP round-trip reproduces the local result. */
  def remoteQuery(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("events" -> Tables.events(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      RemoteQueryLogic.query(s, svc, "events",
          "EVENT_TYPE == 'click' && USER_ID < 50",
          pageSize = 500, orderBy = Seq("event_id"))
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
    } finally server.stop()
  }

  /** The audit TABLE (Auditor / QueryExecutorBean.java:704-740 audit-
    * before-execute): a live server under ACTIVE auditing serves a
    * create and a batched lookupUUID; the gate returns the audit frame —
    * user, logic, type, syntax, the audited query, and the selectors the
    * extractor pulled (JEXL-then-LUCENE walk with negation parity,
    * DatawaveSelectorExtractor.java:22-52). The oracle is the literal
    * expected records, so the security-relevant surface is hash-checked
    * end-to-end over HTTP, not just spec-covered. */
  def auditTable(s: SparkSession, d: String): DataFrame = {
    val auditor = new Audit.CollectingAuditor
    val server = new QueryServer(Map("events" -> Tables.events(s, d)),
      uuidTypes = Seq(
        LookupUUID.UuidType("EVENT_ID", logic = "events"),
        LookupUUID.UuidType("USER_ID", logic = "events")),
      auditor = auditor, auditType = Audit.Active)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val id = svc.createQuery("events",
        "EVENT_TYPE == 'click' && USER_ID == 42", orderBy = Seq("event_id"))
      svc.close(id)
      val (lid, _) = svc.lookupUUID(Seq("EVENT_ID" -> "5", "USER_ID" -> "42"))
      svc.close(lid)
      auditor.toDF(s).select(col("user"),
        col("logicName").as("logic_name"),
        col("auditType").as("audit_type"), col("syntax"), col("query"),
        concat_ws(",", col("selectors")).as("selectors"))
    } finally server.stop()
  }

  /** Lifecycle verbs under the oracle (QueryExecutorBean `/duplicate`,
    * `/reset`, `/cancel`, `/close`): create → duplicate (shared persisted
    * frame, NEW id, page 1) → drain BOTH sessions fully → reset the
    * duplicate and re-drain it → close both. Result = the union of the
    * three drains tagged by leg, so the ref-counted shared-frame release
    * and the reset ledger produce driver-visible rows (= the base query's
    * result three times over). */
  def queryLifecycle(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("events" -> Tables.events(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      // pageSize sized so the sf0.1 drains stay ~a dozen page jobs each
      val id = svc.createQuery("events", "EVENT_TYPE == 'click' && USER_ID < 50",
        pageSize = 2000, orderBy = Seq("event_id"))
      val dupId = svc.duplicate(id)
      def drain(qid: String): Seq[String] = {
        val out = Seq.newBuilder[String]
        var page = svc.nextPage(qid)
        while (page.nonEmpty) { out ++= page.get; page = svc.nextPage(qid) }
        out.result()
      }
      val orig = drain(id)
      val dup = drain(dupId)
      svc.reset(dupId)
      val redrained = drain(dupId)
      svc.close(id)
      svc.close(dupId)
      import s.implicits._
      def parse(rows: Seq[String], leg: String): DataFrame =
        s.read.json(s.createDataset(rows))
          .select(col("event_id").cast("long").as("event_id"),
            col("user_id").cast("long").as("user_id"), col("event_type"),
            lit(leg).as("leg"))
      parse(orig, "orig").unionByName(parse(dup, "dup"))
        .unionByName(parse(redrained, "reset"))
    } finally server.stop()
  }

  /** `/query/predict` (QueryExecutorBean.java:990-1054 + QueryPredictor
    * SPI): seed the metric history with two instrumented queries of known
    * result counts, then predict a NEW query without executing it. The
    * gate returns the history predictor's deterministic predictions
    * (mean rows over non-error history + sample count); the plan-stats
    * predictor and the HTTP endpoint shape are pinned by PredictSpec
    * (size estimates are engine-internal, so they stay out of the
    * oracle). */
  def queryPredict(s: SparkSession, d: String): DataFrame = {
    QueryMetrics.clear()
    val logic = new ShardQueryLogic()
    val ev = Tables.events(s, d)
    QueryMetrics.instrumented(logic, "qp1", ev, "EVENT_TYPE == 'click'",
      logicName = "events")
    QueryMetrics.instrumented(logic, "qp2", ev, "EVENT_TYPE == 'view'",
      logicName = "events")
    // a different logic's history must NOT leak into the prediction —
    // the oracle's mean is over the two events runs only, so a
    // cross-logic mean (÷3) would hash-mismatch
    QueryMetrics.instrumented(logic, "qp3", Tables.orders(s, d),
      "O_ORDERSTATUS == 'F'", logicName = "orders")
    val planned = logic.query(ev, "EVENT_TYPE == 'purchase'")
    val preds = Predict.predict(planned, "events",
      Seq(new Predict.HistoryPredictor(() => QueryMetrics.all)))
      .filter(p => p.name == "PREDICTED_ROWS" || p.name == "HISTORY_SAMPLES")
    Predict.toDF(s, preds)
  }

  /** Query-metrics logic (QueryMetricQueryLogic): run an instrumented
    * query, then query the metrics store itself. */
  def queryMetrics(s: SparkSession, d: String): DataFrame = {
    QueryMetrics.clear()
    val logic = new ShardQueryLogic()
    QueryMetrics.instrumented(logic, "qm1", Tables.events(s, d),
      "EVENT_TYPE == 'click'")
    QueryMetrics.toDF(s)
      .select(col("queryId"), col("query"), col("syntax"), col("resultRows"))
  }

  /** LookupUID over live HTTP (LookupUIDQueryLogic.java:12-38): an
    * all-event uid batch skips the event query entirely — the stored
    * documents for the uids page straight back. The batch repeats uid 7,
    * which must NOT duplicate its document (the uid list dedups). */
  def lookupUid(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("content" ->
      graft.content.ContentStore.contentTable(Tables.documents(s, d))),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val (id, first) = svc.lookupUid(Seq("3", "7", "11", "7"), pageSize = 100)
      val rows = Seq.newBuilder[String]
      rows ++= first
      var page = svc.nextPage(id)
      while (page.nonEmpty) { rows ++= page.get; page = svc.nextPage(id) }
      svc.close(id)
      import s.implicits._
      s.read.json(s.createDataset(rows.result()))
        .select(col("uid"), col("view_name"), col("text"),
          col("content_length").cast("long").as("content_length"))
    } finally server.stop()
  }

  private val crCtr = new java.util.concurrent.atomic.AtomicInteger()

  /** CachedResults over HTTP (CachedResultsBean load → SQL retrieval):
    * a finished query's frame loads as a named view, then the caller
    * runs SQL against it — the reference ships result pages to MySQL to
    * get this; here the persisted frame serves the SQL natively. The
    * alias is uniqued per invocation so repeated bench passes never
    * collide. */
  def cachedResultsLoad(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("events" -> Tables.events(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val id = svc.createQuery("events", "EVENT_TYPE == 'view'",
        orderBy = Seq("event_id"))
      val alias = s"graft_cr_${crCtr.incrementAndGet()}"
      svc.loadCachedResults(id, alias)
      val rows = svc.cachedSql(
        s"SELECT user_id, count(*) AS cnt FROM $alias GROUP BY user_id",
        pageSize = 1000000)
      // create-from-alias (CachedResultsBean.create): the SAME aggregate
      // defined as a DERIVED cached-results view via field/grouping
      // parameters, then read back — both legs must agree
      val enc = (v: String) => java.net.URLEncoder.encode(v, "UTF-8")
      svc.http0("POST", s"/cachedresults/create?alias=$alias" +
        s"&view=${alias}_agg" +
        s"&fields=${enc("user_id, count(*) AS cnt")}" +
        s"&grouping=user_id")
      val created = svc.cachedSql(
        s"SELECT user_id, cnt FROM ${alias}_agg", pageSize = 1000000)
      svc.close(id)
      import s.implicits._
      def leg(name: String, rs: Seq[String]): DataFrame =
        s.read.json(s.createDataset(rs))
          .select(lit(name).as("leg"),
            col("user_id").cast("long").as("user_id"),
            col("cnt").cast("long").as("cnt"))
      leg("sql", rows).unionByName(leg("created", created))
    } finally server.stop()
  }

  /** ID translation over HTTP (IdTranslatorBean `/translateIDs`): the
    * ids are probed against BOTH registered types — the caller doesn't
    * know whether 7 or 42 is an event id or a user id, so the rendered
    * LUCENE disjunction crosses ids × types — and the first page is the
    * whole auto-closed answer. */
  /** Server-side authorization resolution through the principal
    * registry (the reference's DatawaveUser → Authorizations chain,
    * web-services/security): the caller names ONLY `user=alice` — no
    * caller-asserted auths — and the server resolves alice's granted
    * {A} and applies fail-closed visibility enforcement at plan time.
    * Same row set as the vis_filter gate, proving the registry path
    * and the direct-auths path enforce identically. */
  def visRegistry(s: SparkSession, d: String): DataFrame = {
    val ev = EventQueries.withVisibility(Tables.events(s, d))
    val server = new QueryServer(Map("events" -> ev),
      users = Map("alice" -> Set("A"), "root" -> Set("A", "B", "C")),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val id = svc.createQuery("events",
        "EVENT_TYPE == 'click' || EVENT_TYPE == 'view' || " +
          "EVENT_TYPE == 'purchase' || EVENT_TYPE == 'signup'",
        pageSize = 5000, orderBy = Seq("event_id"), user = "alice")
      val rows = Seq.newBuilder[String]
      // paging is principal-bound: the owner names themselves on next
      var page = svc.nextPage(id, user = "alice")
      while (page.nonEmpty) {
        rows ++= page.get; page = svc.nextPage(id, user = "alice")
      }
      svc.close(id, user = "alice")
      import s.implicits._
      s.read.json(s.createDataset(rows.result()))
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("visibility"))
    } finally server.stop()
  }

  /** Proxy-chain resolution (WSAuthorizationsUtil.mergePrincipals,
    * web-services/common-util security/util/WSAuthorizationsUtil
    * .java:23, consumed at CompositeQueryLogic.java:236): the request
    * arrives as `user=root` THROUGH two proxying entities, and the
    * effective grant is the chain-wide INTERSECTION {A,B,C} ∩ {A,B} ∩
    * {A} = {A} — root's own clearance never rides past a
    * less-cleared hop. Same row set as vis_registry: the chain
    * minimum enforces exactly like alice querying directly. */
  def visChain(s: SparkSession, d: String): DataFrame = {
    val ev = EventQueries.withVisibility(Tables.events(s, d))
    val server = new QueryServer(Map("events" -> ev),
      users = Map("alice" -> Set("A"), "gateway" -> Set("A", "B"),
        "root" -> Set("A", "B", "C")),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val id = svc.createQuery("events",
        "EVENT_TYPE == 'click' || EVENT_TYPE == 'view' || " +
          "EVENT_TYPE == 'purchase' || EVENT_TYPE == 'signup'",
        pageSize = 5000, orderBy = Seq("event_id"), user = "root",
        proxiedEntities = Seq("gateway", "alice"))
      val rows = Seq.newBuilder[String]
      var page = svc.nextPage(id, user = "root")
      while (page.nonEmpty) {
        rows ++= page.get; page = svc.nextPage(id, user = "root")
      }
      svc.close(id, user = "root")
      import s.implicits._
      s.read.json(s.createDataset(rows.result()))
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("visibility"))
    } finally server.stop()
  }

  /** Principal-bound OBJECT ownership (QueryExecutorBean.java:1094-1095
    * QUERY_OWNER_MISMATCH; CachedResultsBean.java:342 owner-keyed rows):
    * alice creates the session; bob — a REGISTERED principal holding the
    * very same {A} grant, so row-level visibility alone would admit him —
    * is refused on /query/next with QUERY_OWNER_MISMATCH (live-HTTP
    * assertion). The gate then RESTARTS the server: ownership is durable
    * (the owner travels with the stored definition), so the resumed
    * server refuses bob identically and only alice drains her pages.
    * Same row set as vis_registry: ownership is enforcement ON TOP of
    * the identical visibility filtering. */
  def visOwner(s: SparkSession, d: String): DataFrame = {
    val ev = EventQueries.withVisibility(Tables.events(s, d))
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-visowner").toString
    def mkServer() = new QueryServer(Map("events" -> ev),
      stateDir = stateDir,
      users = Map("alice" -> Set("A"), "bob" -> Set("A")),
      metricsFlush = false)
    val server = mkServer()
    val port = server.start()
    val id = try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val qid = svc.createQuery("events",
        "EVENT_TYPE == 'click' || EVENT_TYPE == 'view' || " +
          "EVENT_TYPE == 'purchase' || EVENT_TYPE == 'signup'",
        pageSize = 5000, orderBy = Seq("event_id"), user = "alice")
      // bob cannot drain alice's session even with an equal grant —
      // the refusal is part of the gate's contract
      val (st, body) = svc.httpStatus("GET", s"/query/next?id=$qid&user=bob")
      require(st == 401 && body.contains("QUERY_OWNER_MISMATCH"),
        s"expected QUERY_OWNER_MISMATCH for bob, got $st: $body")
      qid
    } finally server.stop()
    // restart: the durable definition carries the owner — bob stays
    // refused BEFORE any page is served by the resumed server
    val server2 = mkServer()
    val port2 = server2.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port2")
      val (st2, body2) = svc.httpStatus("GET", s"/query/next?id=$id&user=bob")
      require(st2 == 401 && body2.contains("QUERY_OWNER_MISMATCH"),
        s"expected durable QUERY_OWNER_MISMATCH post-restart, got $st2: $body2")
      val rows = Seq.newBuilder[String]
      var page = svc.nextPage(id, user = "alice")
      while (page.nonEmpty) {
        rows ++= page.get; page = svc.nextPage(id, user = "alice")
      }
      svc.close(id, user = "alice")
      import s.implicits._
      s.read.json(s.createDataset(rows.result()))
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"), col("visibility"))
    } finally server2.stop()
  }

  /** The state-expiration tier driven END-TO-END over live HTTP
    * (QueryExpirationBean.java:39 idle-session eviction +
    * CachedResultsExpirationBean.java:37-95 `daysToLive` cleanup of
    * cached-result tables, the machinery that keeps a production
    * server's durable state from growing without bound): three
    * sessions — one idle (its durable definition's last-use an hour
    * old), one actively paging, one holding a loaded CachedResults
    * alias with durably materialized rows. A non-admin's sweep is
    * refused. Sweep 1 (real clock) evicts exactly the idle session;
    * the alias-holding one is fresh and the alias HOLDS it regardless.
    * Sweep 2 (asOf past daysToLive) evicts the alias — its rows dir
    * deleted from stateDir — and the now-unheld idle sessions. The
    * server then RESTARTS over the same stateDir: the evictions are
    * durable (the 404s repeat) and new work still serves. Observed
    * codes/counts return as literal rows. */
  def queryExpiration(s: SparkSession, d: String): DataFrame = {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-expgate").toString
    val orders = Tables.orders(s, d).withColumn("visibility", lit("A"))
    def mkServer() = new QueryServer(Map("orders" -> orders),
      stateDir = stateDir,
      users = Map("alice" -> Set("A"), "bob" -> Set("A"),
        "root" -> Set("A")),
      adminUsers = Set("root"),
      metricsFlush = false)
    val out = Seq.newBuilder[(String, Int)]
    def count(field: String, body: String): Int =
      ("\"" + field + "\": (\\d+)").r.findFirstMatchIn(body).get.group(1).toInt
    val rowsDir =
      java.nio.file.Paths.get(stateDir, "cachedrows", "expgate_rows")
    val server0 = mkServer()
    val port0 = server0.start()
    val (qIdle, qLive) = try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port0")
      def mkQuery() = svc.createQuery("orders", "O_ORDERSTATUS == 'F'",
        pageSize = 100, orderBy = Seq("o_orderkey"), user = "alice")
      val qIdle = mkQuery(); val qAlias = mkQuery(); val qLive = mkQuery()
      require(svc.httpStatus("POST",
        s"/cachedresults/load?id=$qAlias&alias=expgate_rows&user=alice")
        ._1 == 200, "load failed")
      require(svc.nextPage(qLive, user = "alice").nonEmpty)
      (qIdle, qLive)
    } finally server0.stop()
    // real idleness spans a restart (the in-memory touch dies with the
    // server): the definition file's mtime IS the durable last-use
    // record — age the idle one past the 15-minute default
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(stateDir, "sessions", s"$qIdle.properties"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60L * 60 * 1000))
    // drop the shared-session temp view so the restarted servers walk
    // the real fresh-catalog restore path
    try s.catalog.dropTempView("expgate_rows")
    catch { case _: Exception => () }
    val server = mkServer()
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      out += (("sweep_non_admin",
        svc.httpStatus("POST", "/admin/expire?user=bob")._1))
      val s1 = svc.httpStatus("POST", "/admin/expire?user=root")._2
      out += (("sweep1_expired_queries", count("expiredQueries", s1)))
      out += (("sweep1_expired_aliases", count("expiredAliases", s1)))
      out += (("idle_next_after_sweep",
        svc.httpStatus("GET", s"/query/next?id=$qIdle&user=alice")._1))
      out += (("live_next_after_sweep",
        svc.httpStatus("GET", s"/query/next?id=$qLive&user=alice")._1))
      out += (("held_getrows_after_sweep", svc.httpStatus("GET",
        "/cachedresults/getRows?alias=expgate_rows&rowBegin=1&rowEnd=2&user=alice")._1))
      // past daysToLive: the alias (rows dir and all) and, unheld, the
      // remaining idle sessions
      val asOf = System.currentTimeMillis() + 25L * 3600 * 1000
      val s2 = svc.httpStatus("POST", s"/admin/expire?user=root&asOf=$asOf")._2
      out += (("sweep2_expired_queries", count("expiredQueries", s2)))
      out += (("sweep2_expired_aliases", count("expiredAliases", s2)))
      out += (("expired_getrows", svc.httpStatus("GET",
        "/cachedresults/getRows?alias=expgate_rows&rowBegin=1&rowEnd=2&user=alice")._1))
      out += (("rows_dir_gone",
        if (java.nio.file.Files.exists(rowsDir)) 0 else 1))
    } finally server.stop()
    val server2 = mkServer()
    val port2 = server2.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port2")
      out += (("restart_idle_next",
        svc.httpStatus("GET", s"/query/next?id=$qIdle&user=alice")._1))
      out += (("restart_live_next",
        svc.httpStatus("GET", s"/query/next?id=$qLive&user=alice")._1))
      out += (("restart_getrows", svc.httpStatus("GET",
        "/cachedresults/getRows?alias=expgate_rows&rowBegin=1&rowEnd=2&user=alice")._1))
      val fresh = svc.createQuery("orders", "O_ORDERSTATUS == 'F'",
        pageSize = 100, orderBy = Seq("o_orderkey"), user = "alice")
      out += (("restart_new_query_next",
        svc.httpStatus("GET", s"/query/next?id=$fresh&user=alice")._1))
      svc.close(fresh, user = "alice")
    } finally server2.stop()
    import s.implicits._
    out.result().toDF("step", "code")
  }

  def translateId(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("events" -> Tables.events(s, d)),
      uuidTypes = Seq(
        LookupUUID.UuidType("EVENT_ID", logic = "events"),
        LookupUUID.UuidType("USER_ID", logic = "events")))
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val rows = svc.translateIds(Seq("7", "42"), pageSize = 100000)
      import s.implicits._
      s.read.json(s.createDataset(rows))
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
    } finally server.stop()
  }

  /** Time-bucketed metrics summary (QueryMetricsBean `/summary/all`,
    * BaseQueryMetricHandler.binSummary): three REAL paged runs over
    * orders, their create times pinned into different windows relative
    * to a fixed end — 30 min (every bucket), 7 h (hour12 outward), 2 d
    * (day7 outward) — then the nine-bucket summary. Page counts and
    * page-result totals derive from the data (pageSize-10000 ledgers),
    * so the oracle recomputes them from the orders counts. */
  def queryMetricsSummary(s: SparkSession, d: String): DataFrame = {
    QueryMetrics.clear()
    val end = 100L * 86400000L // fixed synthetic "now"
    val logic = new ShardQueryLogic()
    def pagedRun(id: String, beginOffset: Long, status: String): Unit = {
      val df = logic.query(Tables.orders(s, d),
        s"O_ORDERSTATUS == '$status'").select("o_orderkey").persist()
      df.count()
      new RunningQuery(new QueryCursor(tempStateDir()), id, df,
        Seq("o_orderkey"), pageSize = 10000).run()
      df.unpersist()
      QueryMetrics.record(QueryMetric(id, s"O_ORDERSTATUS == '$status'",
        "JEXL", end - beginOffset, 1L, 0L))
    }
    pagedRun("ms1", 30L * 60000L, "F")
    pagedRun("ms2", 7L * 3600000L, "O")
    pagedRun("ms3", 2L * 86400000L, "P")
    QueryMetrics.summary(s, end)
  }

  /** Metrics survive the process (warehouse/metrics-core: the reference
    * ingests query metrics into the shard schema, so `/summary` reads
    * ONE history across servers and restarts): server 1 creates and
    * fully drains a paged query, then STOPS — flushing its metric
    * ledger to the lake tables under stateDir. A BRAND-NEW server over
    * the same stateDir serves `/query/metrics/summary` from the table:
    * the dead server's query, page count, and page rows are all there.
    * Deterministic because the query was created "now" relative to the
    * summary end — it lands in every window bucket. */
  def queryMetricsDurable(s: SparkSession, d: String): DataFrame = {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-metrics")
    val tables = Map("orders" -> Tables.orders(s, d))
    val srv1 = new QueryServer(tables, stateDir = stateDir.toString)
    val p1 = srv1.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$p1")
      val qid = svc.createQuery("orders", "O_ORDERSTATUS == 'F'",
        pageSize = 10000, orderBy = Seq("o_orderkey"))
      var page = svc.nextPage(qid)
      while (page.nonEmpty) page = svc.nextPage(qid)
    } finally srv1.stop() // flush: pending metric rows become the table;
                          // stop() also releases the cached frame
    val srv2 = new QueryServer(tables, stateDir = stateDir.toString)
    val p2 = srv2.start()
    try {
      val svc2 = new RemoteQueryService(s"http://127.0.0.1:$p2")
      val rows = svc2.metricsSummary()
      import s.implicits._
      s.read.json(s.createDataset(rows))
        .select(col("bucket"), col("ord").cast("int").as("ord"),
          col("queryCount").cast("long").as("queryCount"),
          col("pageCount").cast("long").as("pageCount"),
          col("pageRows").cast("long").as("pageRows"))
    } finally {
      srv2.stop()
      // rows are collected strings — the state (cursor files, session
      // definition, metric tables) can all go
      graft.core.Fs.deleteRecursively(stateDir)
    }
  }

  /** DashboardQueryLogic: three instrumented queries (one selector, two
    * selectors, and a zero-result probe) roll up into one bucketed
    * DashboardSummary row. Latency buckets are runtime-dependent and are
    * unit-tested instead; the gate checks the deterministic counts. */
  def dashboardQuery(s: SparkSession, d: String): DataFrame = {
    QueryMetrics.clear()
    val logic = new ShardQueryLogic()
    val ev = Tables.events(s, d)
    QueryMetrics.instrumented(logic, "dq1", ev, "EVENT_TYPE == 'click'")
    QueryMetrics.instrumented(logic, "dq2", ev,
      "EVENT_TYPE == 'click' || EVENT_TYPE == 'view'", selectors = 2)
    QueryMetrics.instrumented(logic, "dq3", ev, "EVENT_TYPE == 'absent'")
    QueryMetrics.dashboardSummary(s)
      .select("queryCount", "errorCount", "resultCount", "selectorCount",
        "zeroResults", "upTo10KResults", "upTo1MResults",
        "oneTerm", "upTo16Terms")
  }

  /** DocumentTransform chain (transformer/DocumentTransform.java):
    * enrich → filter → project → rename → dedup as one composed stage
    * pipeline. */
  def transformsChain(s: SparkSession, d: String): DataFrame =
    Transforms.chain(Seq(
      Transforms.enrich(Map("BAL_TIER" -> floor(col("c_acctbal") / 1000))),
      Transforms.where(col("c_mktsegment") === "BUILDING"),
      Transforms.project(Seq("c_custkey", "c_name", "BAL_TIER")),
      Transforms.rename(Map("c_name" -> "customer_name")),
      Transforms.dedup(Seq("c_custkey"))
    ))(Tables.customer(s, d))

  /** Result decoration (EventQueryDataDecorator / its transformer):
    * two decorator stages over the events long layout — `event_uri` is
    * the APPEND leg (field absent, so every document gains a row built
    * from the first matching pattern; the dead `missing_field` pattern
    * proves ordered fallback), `props` is the OVERWRITE leg (existing
    * rows rewritten in place from `user_id`). DecorateSpec pins the
    * marking-inheritance and multi-value rules the oracle can't see. */
  def decoratedFields(s: SparkSession, d: String): DataFrame = {
    val long = graft.ingest.Ingest.toLong(
      graft.core.Spread(Tables.events(s, d)),
      uidCol = "event_id", datatype = "event", dateCol = "ts")
      // project to the fields the decorators read/write before the
      // chain (what a real caller's RETURN_FIELDS would have done) —
      // the dropped fields could only ever land in the `rest` branch
      // this gate filters away below
      .filter(col("field").isin("missing_field", "event_type", "user_id", "props"))
    Transforms.chain(Seq(
      Transforms.decorate("event_uri", Seq(
        "missing_field" -> "m:@field_value@",
        "event_type" -> "https://ex.org/t/@field_value@")),
      Transforms.decorate("props", Seq("user_id" -> "u:@field_value@"))
    ))(long)
      .filter(col("field").isin("event_uri", "props"))
      .select(col("uid"), col("field"), col("value"))
  }

  /** Analyzer SPI (StandardAnalyzer + TokenSearchSynonymFilter + ngram
    * truncation): tf build where 'fast' also emits synonym 'quick' at the
    * same position and tokens truncate to 8 chars. */
  def analyzerTokens(s: SparkSession, d: String): DataFrame = {
    val an = graft.content.Analyzer(
      synonyms = Map("fast" -> Seq("quick")), maxTokenLength = 8)
    // single-row-group parquet → one split; the tokenize+explode must not
    // run in a lone task (see graft.core.Spread)
    val docs = graft.core.Spread(Tables.documents(s, d).select("doc_id", "text"))
    graft.content.AnalyzedContent.buildTfWith(docs, an)
      .select(col("doc_id"), col("term"),
        size(col("positions")).cast("long").as("occurrences"),
        element_at(col("positions"), 1).cast("long").as("first_pos"))
  }

  /** The reference's PRIMARY verb — `/query/createAndNext`
    * (QueryExecutorBean.java:616, the §3.1 main path): create + FIRST
    * page in one round trip, then `/query/next` to exhaustion. Also
    * pins the no-results contract: an empty query auto-closes on the
    * server and answers 204, leaving no session behind. */
  def createAndNext(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("orders" -> Tables.orders(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val (id, first) = svc.createAndNext("orders",
        "O_ORDERSTATUS == 'F' && O_ORDERPRIORITY == '1-URGENT'",
        pageSize = 2000, orderBy = Seq("o_orderkey"))
        .getOrElse(throw new IllegalStateException("expected results"))
      val out = Seq.newBuilder[String]
      out ++= first
      var page = svc.nextPage(id)
      while (page.nonEmpty) { out ++= page.get; page = svc.nextPage(id) }
      svc.close(id)
      // the no-results branch: 204, query auto-closed server-side
      if (svc.createAndNext("orders",
          "O_ORDERSTATUS == 'NO_SUCH_STATUS'").nonEmpty)
        throw new IllegalStateException("empty query must answer 204")
      import s.implicits._
      s.read.json(s.createDataset(out.result()))
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"))
    } finally server.stop()
  }

  /** QueryMetricQueryLogic (reference query/metrics): query metrics are
    * DATA — ingested into the lake and queried through the standard JEXL
    * stack like any shard table. Two live queries run against a server;
    * after stop() flushes the durable store, a ShardQueryLogic JEXL
    * query over the metrics TABLE returns their definitions. */
  def queryMetricsLogic(s: SparkSession, d: String): DataFrame = {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-metrics")
    // the temp state must go even when the live-server phase throws —
    // ONE outer finally owns the cleanup
    try {
      val server = new QueryServer(Map(
        "orders" -> Tables.orders(s, d),
        "customer" -> Tables.customer(s, d)), stateDir = stateDir.toString)
      val port = server.start()
      try {
        val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
        val id1 = svc.createQuery("orders", "O_ORDERSTATUS == 'F'",
          pageSize = 1000000, orderBy = Seq("o_orderkey"))
        svc.nextPage(id1)
        val id2 = svc.createQuery("customer", "C_MKTSEGMENT == 'BUILDING'",
          pageSize = 1000000, orderBy = Seq("c_custkey"))
        svc.nextPage(id2)
      } finally server.stop() // flush: the durable metrics table appears
      val store = new MetricsStore(s"$stateDir/metrics")
      val out = new ShardQueryLogic().query(store.metricsDF(s),
          "LOGICNAME == 'orders' || LOGICNAME == 'customer'",
          QueryParams(returnFields =
            Seq("QUERY", "SYNTAX", "LOGICNAME", "USER")))
        .select(col("query").as("query_text"), col("syntax"),
          col("logicName").as("logic_name"), col("user").as("user_name"))
      // localize before the backing files go away (two rows)
      s.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally graft.core.Fs.deleteRecursively(stateDir)
  }

  /** The remaining executor verbs under the oracle: `/query/define`
    * persists a definition WITHOUT executing (the defined query then
    * pages through the restart-resume path on first `/query/next`), and
    * `/query/execute` streams the full result in one chunked response
    * with no session or cache left behind. Both legs must equal the
    * plain filter. */
  def queryExecute(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("orders" -> Tables.orders(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val enc = (v: String) => java.net.URLEncoder.encode(v, "UTF-8")
      val q = "O_ORDERSTATUS == 'P'"
      // leg 1: define → drain via next (first next resumes the
      // definition exactly like a restarted server would)
      val defBody = svc.http0("POST",
        s"/query/define?table=orders&query=${enc(q)}" +
          "&pageSize=5000&orderBy=o_orderkey")
      val id = "\"queryId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(defBody).get.group(1)
      val defined = Seq.newBuilder[String]
      var page = svc.nextPage(id)
      while (page.nonEmpty) { defined ++= page.get; page = svc.nextPage(id) }
      svc.close(id)
      // leg 2: the streamed execute verb, one response
      val exeBody = svc.http0("POST",
        s"/query/execute?table=orders&query=${enc(q)}&orderBy=o_orderkey")
      val executed = svc.rowsOf(exeBody)
      import s.implicits._
      def parse(rows: Seq[String], leg: String): DataFrame =
        s.read.json(s.createDataset(rows))
          .select(col("o_orderkey").cast("long").as("o_orderkey"),
            col("o_orderstatus"), lit(leg).as("leg"))
      parse(defined.result(), "defined").unionByName(parse(executed, "executed"))
    } finally server.stop()
  }

  /** Model management under the oracle (ModelBean.java:124-478): import
    * → clone → insert-mapping → delete over live HTTP, then a query
    * resolved through the STORED surviving model (forward 1→N alias
    * expansion + reverse display rename — the reference's QUERY_MODEL
    * parameter against the metadata table). Legs: the final
    * `/model/list` catalog and the model-resolved rows, both vs plain
    * SQL. */
  def modelCrud(s: SparkSession, d: String): DataFrame = {
    val server = new QueryServer(Map("customer" -> Tables.customer(s, d)),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val enc = (v: String) => java.net.URLEncoder.encode(v, "UTF-8")
      svc.http0("POST", "/model/import?name=TPCH&mappings=" +
        enc("SEGMENT:C_MKTSEGMENT:FORWARD;KEY:C_CUSTKEY:FORWARD;" +
          "KEY:C_NATIONKEY:FORWARD;balance:C_ACCTBAL:REVERSE"))
      svc.http0("POST", "/model/clone?name=TPCH&newName=TPCH2")
      svc.http0("POST", "/model/insert?name=TPCH2&mappings=" +
        enc("NATION:C_NATIONKEY:FORWARD"))
      svc.http0("POST", "/model/delete?name=TPCH")
      val listBody = svc.http0("GET", "/model/list")
      val names = "\"([A-Za-z0-9_]+)\"".r
        .findAllMatchIn(listBody.substring(listBody.indexOf('[')))
        .map(_.group(1)).toSeq
      // the query names ALIASES of the surviving clone: SEGMENT expands
      // to c_mktsegment, KEY to (c_custkey OR c_nationkey), and the
      // REVERSE row renames c_acctbal → balance in the result
      val exeBody = svc.http0("POST",
        "/query/execute?table=customer&model=TPCH2" +
          s"&query=${enc("SEGMENT == 'BUILDING' && KEY == 13")}" +
          "&orderBy=c_custkey")
      import s.implicits._
      val rowsDf = s.read.json(s.createDataset(svc.rowsOf(exeBody)))
        .select(lit("rows").as("leg"),
          col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("balance").cast("double").as("balance"))
      val namesDf = names.toDF("c_name")
        .select(lit("list").as("leg"),
          lit(null).cast("long").as("c_custkey"), col("c_name"),
          lit(null).cast("double").as("balance"))
      rowsDf.unionByName(namesDf)
    } finally server.stop()
  }

  /** The Modification service tier under the oracle
    * (ModificationBean.java:88-134 + ModificationService.java:58-130):
    * `/listConfigurations` reports the registered services, and three
    * `/submit` calls (update, value-specific delete, insert) flow
    * through request-class + role + mutable-field validation into the
    * SERVED table — a follow-up `/query/execute` reads the edited rows
    * with their HISTORY_ trail. Legs: the configuration catalog and the
    * replayed edit result. */
  def modificationService(s: SparkSession, d: String): DataFrame = {
    val long = graft.ingest.Ingest.toLong(
      graft.core.Spread(Tables.events(s, d)),
      uidCol = "event_id", datatype = "event", dateCol = "ts")
    val cfgs = Seq(
      ModificationRegistry.ServiceConfig("MutableMetadataUpdateService",
        "field edits with a HISTORY_ trail", "DefaultModificationRequest",
        Seq("AuthorizedUser")),
      ModificationRegistry.ServiceConfig("PurgeService",
        "history-free field removal", "DefaultModificationRequest",
        Seq("Administrator"), insertHistory = false))
    val server = new QueryServer(Map("events_long" -> long),
      modificationServices = cfgs,
      mutableFields = () => Seq(("event", "event_type")),
      metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val enc = (v: String) => java.net.URLEncoder.encode(v, "UTF-8")
      val confBody = svc.http0("GET", "/modification/listConfigurations")
      val common = "service=MutableMetadataUpdateService" +
        "&requestClass=DefaultModificationRequest&roles=AuthorizedUser" +
        "&user=alice&ts=1700000000000&table=events_long&datatype=event" +
        "&field=event_type"
      svc.http0("POST", s"/modification/submit?$common&mode=UPDATE&uid=12" +
        "&oldValue=click&newValue=corrected&shardDate=2024-01-05")
      svc.http0("POST",
        s"/modification/submit?$common&mode=DELETE&uid=17&value=view")
      svc.http0("POST", s"/modification/submit?$common&mode=INSERT&uid=19" +
        "&value=flagged&shardDate=2024-01-05")
      val exeBody = svc.http0("POST", "/query/execute?table=events_long" +
        s"&query=${enc("(UID == '12' || UID == '17' || UID == '19') && " +
          "(FIELD == 'event_type' || FIELD == 'HISTORY_event_type')")}" +
        "&orderBy=uid,field,value")
      import s.implicits._
      val rowsDf = s.read.json(s.createDataset(svc.rowsOf(exeBody)))
        .select(lit("rows").as("leg"), col("uid"), col("field"),
          col("value"))
      val confDf = s.read.json(s.createDataset(Seq(confBody)))
        .select(lit("config").as("leg"), col("name").as("uid"),
          col("requestClass").as("field"),
          concat_ws(",", col("authorizedRoles")).as("value"))
      rowsDf.unionByName(confDf)
    } finally server.stop()
  }

  /** The Atom feed service tier under the oracle (web-services/atom
    * AtomServiceBean.java: getCategories/getFeed/getEntry): the
    * category-names document, one category paged to EXHAUSTION with the
    * opaque strictly-after cursor (pagesize 2, so every entry crosses a
    * page boundary at least once — a dropped or duplicated entry at any
    * boundary breaks the hash), and a single-entry fetch by encoded id.
    * Legs: categories / the reassembled feed / the entry. */
  def atomFeed(s: SparkSession, d: String): DataFrame = {
    val long = graft.ingest.Ingest.toLong(
      graft.core.Spread(Tables.events(s, d)),
      uidCol = "event_id", datatype = "event", dateCol = "ts")
    // the server runs one job per feed page / entry / categories verb
    // against this frame — persist it so the melt+aggregate subtree
    // evaluates once, not once per HTTP call (the result legs below are
    // collected strings, so the cache releases before return)
    val atom = graft.ingest.Feeds.atom(long).persist()
    val server = new QueryServer(Map("events_long" -> long),
      atomTable = Some(atom), metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val catsBody = svc.http0("GET", "/atom/categories")
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      var cursor = ""
      var more = true
      while (more) {
        val l = if (cursor.isEmpty) ""
          else s"&l=${java.net.URLEncoder.encode(cursor, "UTF-8")}"
        val (status, body) = svc.httpStatus("GET",
          s"/atom/feed?category=event_type&pagesize=2$l")
        if (status == 204) more = false
        else {
          require(status == 200, s"feed page failed ($status): $body")
          entries ++= svc.arrayOf("entries", body)
          cursor = "\"next\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse(sys.error(s"no next cursor: $body"))
        }
      }
      val entryBody = svc.http0("GET", "/atom/entry?category=event_type" +
        s"&id=${graft.query.AtomFeed.encodeId("click")}")
      import s.implicits._
      def leg(name: String, rows: Seq[String]): DataFrame =
        s.read.json(s.createDataset(rows))
          .select(lit(name).as("leg"), lit("event_type").as("category"),
            col("title").as("value"), col("updated").as("latest_date"),
            col("occurrences").cast("long").as("occurrences"))
      // the categories document is an array of plain strings (no
      // objects), so slice the bracketed list directly
      val catNames = catsBody.substring(catsBody.indexOf('[') + 1,
          catsBody.lastIndexOf(']'))
        .split(',').map(_.trim).filter(_.nonEmpty)
        .map(c => c.substring(1, c.length - 1)).toSeq
      val catsDf = s.createDataset(catNames).toDF("category")
        .select(lit("categories").as("leg"), col("category"),
          lit(null).cast("string").as("value"),
          lit(null).cast("string").as("latest_date"),
          lit(null).cast("long").as("occurrences"))
      leg("feed", entries.toSeq)
        .unionByName(leg("entry", Seq(entryBody)))
        .unionByName(catsDf)
    } finally { server.stop(); atom.unpersist() }
  }

  /** The bulk-export job tier under the oracle (MapReduceBean.java:
    * 181-988, BulkResultsJob): define a query, ship it into the
    * configured job over live HTTP, poll the durable state machine to
    * SUCCEEDED, stream every result file back through `/getFile`, and
    * union the parsed export with the job-state leg. The export itself
    * is a distributed `df.write` (the reference's MR mappers →
    * Spark-native file sink). */
  def bulkExport(s: SparkSession, d: String): DataFrame = {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-bulk-gate").toString
    val server = new QueryServer(Map("orders" -> Tables.orders(s, d)),
      stateDir = stateDir, metricsFlush = false)
    val port = server.start()
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      val enc = (v: String) => java.net.URLEncoder.encode(v, "UTF-8")
      val defBody = svc.http0("POST", "/query/define?table=orders" +
        s"&query=${enc("O_ORDERSTATUS == 'F' && O_TOTALPRICE > 300000.0")}")
      val qid = "\"queryId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(defBody).get.group(1)
      val subBody = svc.http0("POST",
        "/mapreduce/submit?jobName=BulkResultsJob&roles=AuthorizedUser" +
          s"&parameters=${enc(s"queryId:$qid;format:json")}")
      val jobId = "\"jobId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(subBody).get.group(1)
      var state = "RUNNING"
      val deadline = System.currentTimeMillis() + 120000
      var listBody = ""
      while (state == "RUNNING" && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        listBody = svc.http0("GET", s"/mapreduce/list?jobId=$jobId")
        state = "\"state\": \"([A-Z]+)\"".r
          .findFirstMatchIn(listBody).map(_.group(1)).getOrElse("RUNNING")
      }
      require(state == "SUCCEEDED", s"bulk export ended $state")
      val parts = "\"name\": \"([^\"]+)\"".r.findAllMatchIn(listBody)
        .map(_.group(1)).toSeq.filter(_.endsWith(".json"))
      val lines = parts.flatMap(n => svc.http0("GET",
          s"/mapreduce/getFile?jobId=$jobId&fileName=$n")
        .split('\n').toSeq.filter(_.nonEmpty))
      import s.implicits._
      val rowsDf = s.read.json(s.createDataset(lines))
        .select(lit("rows").as("leg"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          lit(null).cast("string").as("info"))
      val jobDf = Seq(s"BulkResultsJob:$state").toDF("info")
        .select(lit("job").as("leg"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"), col("info"))
      rowsDf.unionByName(jobDf)
    } finally {
      server.stop()
      graft.core.Fs.deleteRecursively(stateDir)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "atom_feed" -> atomFeed _,
    "bulk_export" -> bulkExport _,
    "modification_service" -> modificationService _,
    "model_crud" -> modelCrud _,
    "query_execute" -> queryExecute _,
    "create_and_next" -> createAndNext _,
    "query_metrics_logic" -> queryMetricsLogic _,
    "cursor_page" -> cursorPage _,
    "query_pages" -> queryPages _,
    "query_metrics" -> queryMetrics _,
    "query_metrics_summary" -> queryMetricsSummary _,
    "query_metrics_durable" -> queryMetricsDurable _,
    "dashboard_query" -> dashboardQuery _,
    "composite_query" -> compositeQuery _,
    "filtered_query" -> filteredQuery _,
    "remote_query" -> remoteQuery _,
    "audit_table" -> auditTable _,
    "query_lifecycle" -> queryLifecycle _,
    "query_predict" -> queryPredict _,
    "lookup_uuid" -> lookupUuid _,
    "lookup_uid" -> lookupUid _,
    "translate_id" -> translateId _,
    "vis_registry" -> visRegistry _,
    "vis_chain" -> visChain _,
    "vis_owner" -> visOwner _,
    "query_expiration" -> queryExpiration _,
    "cached_results_load" -> cachedResultsLoad _,
    "transforms_chain" -> transformsChain _,
    "decorated_fields" -> decoratedFields _,
    "analyzer_tokens" -> analyzerTokens _,
  )

  val oracleSql: Map[String, String] = Map(
    // the paged feed reassembles the whole category's aggregate; the
    // entry leg is one value; categories = the melt's four fields
    "atom_feed" ->
      """WITH atom AS (
        |  SELECT 'event_type' AS category, event_type AS value,
        |         strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS latest_date,
        |         count(*) AS occurrences
        |    FROM events GROUP BY 2)
        |SELECT 'feed' AS leg, category, value, latest_date, occurrences
        |  FROM atom
        |UNION ALL
        |SELECT 'entry', category, value, latest_date, occurrences
        |  FROM atom WHERE value = 'click'
        |UNION ALL
        |SELECT 'categories', c, CAST(NULL AS VARCHAR),
        |       CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  FROM (VALUES ('event_type'), ('props'), ('user_id'), ('value'))
        |       AS t(c)""".stripMargin,
    // the streamed-back export must equal the defined query's full
    // result; the job leg pins the state machine's terminal state
    "bulk_export" ->
      """SELECT 'rows' AS leg, o_orderkey, o_totalprice,
        |       CAST(NULL AS VARCHAR) AS info
        |  FROM orders
        | WHERE o_orderstatus = 'F' AND o_totalprice > 300000.0
        |UNION ALL
        |SELECT 'job', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |       'BulkResultsJob:SUCCEEDED'""".stripMargin,
    // rows leg replays the three submits relationally (update =
    // delete(old)+insert(new); literal history trail — fixed user+ts);
    // config leg = the registered service catalog
    "modification_service" ->
      """WITH e AS (SELECT CAST(event_id AS VARCHAR) AS uid, event_type
        |  FROM events WHERE event_id IN (12, 17, 19))
        |SELECT 'rows' AS leg, uid, 'event_type' AS field,
        |       event_type AS value FROM e
        | WHERE NOT (uid = '12' AND event_type = 'click')
        |   AND NOT (uid = '17' AND event_type = 'view')
        |UNION ALL SELECT 'rows', '12', 'event_type', 'corrected'
        |UNION ALL SELECT 'rows', '19', 'event_type', 'flagged'
        |UNION ALL SELECT 'rows', '12', 'HISTORY_event_type',
        |   '1700000000000:alice:click:delete'
        |UNION ALL SELECT 'rows', '12', 'HISTORY_event_type',
        |   '1700000000000:alice:corrected:insert'
        |UNION ALL SELECT 'rows', '17', 'HISTORY_event_type',
        |   '1700000000000:alice:view:delete'
        |UNION ALL SELECT 'rows', '19', 'HISTORY_event_type',
        |   '1700000000000:alice:flagged:insert'
        |UNION ALL SELECT 'config', 'MutableMetadataUpdateService',
        |   'DefaultModificationRequest', 'AuthorizedUser'
        |UNION ALL SELECT 'config', 'PurgeService',
        |   'DefaultModificationRequest', 'Administrator'""".stripMargin,
    // rows leg = the model-resolved query (SEGMENT→c_mktsegment,
    // KEY→custkey|nationkey, REVERSE rename to balance); list leg = the
    // surviving model catalog after import→clone→delete
    "model_crud" ->
      """SELECT 'rows' AS leg, c_custkey, c_name, c_acctbal AS balance
        |  FROM customer
        | WHERE c_mktsegment = 'BUILDING'
        |   AND (c_custkey = 13 OR c_nationkey = 13)
        |UNION ALL
        |SELECT 'list', CAST(NULL AS BIGINT), 'TPCH2', CAST(NULL AS DOUBLE)
        |""".stripMargin,
    // both verbs (define→resume-drain, streamed execute) must equal the
    // plain filter — one leg each
    "query_execute" ->
      """SELECT o_orderkey, o_orderstatus, leg FROM orders,
        |  (VALUES ('defined'), ('executed')) AS l(leg)
        |WHERE o_orderstatus = 'P'""".stripMargin,
    // the paged union over HTTP must equal the plain filter
    "create_and_next" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderpriority = '1-URGENT'""".stripMargin,
    // the two created queries' definitions, read back from the durable
    // metrics table through the standard JEXL stack — literal rows
    "query_metrics_logic" ->
      """SELECT query_text, syntax, logic_name, user_name FROM (VALUES
        |  ('O_ORDERSTATUS == ''F''', 'JEXL', 'orders', 'anonymous'),
        |  ('C_MKTSEGMENT == ''BUILDING''', 'JEXL', 'customer', 'anonymous')
        |) AS t(query_text, syntax, logic_name, user_name)""".stripMargin,
    // every event gains an appended event_uri row (first live pattern:
    // event_type) and its props row is overwritten from user_id
    "decorated_fields" ->
      """SELECT CAST(event_id AS VARCHAR) AS uid, 'event_uri' AS field,
        |   'https://ex.org/t/' || event_type AS value FROM events
        |UNION ALL
        |SELECT CAST(event_id AS VARCHAR), 'props',
        |   'u:' || CAST(user_id AS VARCHAR) FROM events""".stripMargin,
    "cursor_page" ->
      """SELECT c_custkey, c_name FROM customer
        | ORDER BY c_custkey OFFSET 10 LIMIT 10""".stripMargin,
    // page ledger derived from the filtered count: full pages COMPLETE,
    // the short tail page PARTIAL
    "query_pages" ->
      """WITH n AS (SELECT count(*) AS c FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'pq1' AS "queryId", CAST(p AS BIGINT) AS "pageNum",
        |   CAST(LEAST(1000, c - (p - 1) * 1000) AS BIGINT) AS "rows",
        |   CASE WHEN c - (p - 1) * 1000 < 1000 THEN 'PARTIAL' ELSE 'COMPLETE' END AS status
        | FROM n, unnest(range(1, CAST(CEIL(c / 1000.0) AS INT) + 1)) AS t(p)""".stripMargin,
    "query_metrics" ->
      """SELECT 'qm1' AS "queryId", 'EVENT_TYPE == ''click''' AS query,
        |   'JEXL' AS syntax, CAST(count(*) AS BIGINT) AS "resultRows"
        | FROM events WHERE event_type = 'click'""".stripMargin,
    // nine windows; membership: ms1 (30 min) everywhere, ms2 (7 h) from
    // hour12 outward, ms3 (2 d) from day7 outward; page ledgers are
    // ceil(count/10000) pages carrying count rows
    "query_metrics_summary" ->
      """WITH c AS (SELECT
        |   (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS f,
        |   (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS o,
        |   (SELECT count(*) FROM orders WHERE o_orderstatus = 'P') AS p),
        |pc AS (SELECT f, o, p,
        |   CAST(CEIL(f / 10000.0) AS BIGINT) AS pf,
        |   CAST(CEIL(o / 10000.0) AS BIGINT) AS po,
        |   CAST(CEIL(p / 10000.0) AS BIGINT) AS pp FROM c)
        |SELECT 'hour1' AS bucket, CAST(1 AS INT) AS ord,
        |   CAST(1 AS BIGINT) AS "queryCount", pf AS "pageCount",
        |   CAST(f AS BIGINT) AS "pageRows" FROM pc
        |UNION ALL SELECT 'hour6', 2, 1, pf, f FROM pc
        |UNION ALL SELECT 'hour12', 3, 2, pf + po, f + o FROM pc
        |UNION ALL SELECT 'day1', 4, 2, pf + po, f + o FROM pc
        |UNION ALL SELECT 'day7', 5, 3, pf + po + pp, f + o + p FROM pc
        |UNION ALL SELECT 'day30', 6, 3, pf + po + pp, f + o + p FROM pc
        |UNION ALL SELECT 'day60', 7, 3, pf + po + pp, f + o + p FROM pc
        |UNION ALL SELECT 'day90', 8, 3, pf + po + pp, f + o + p FROM pc
        |UNION ALL SELECT 'all', 9, 3, pf + po + pp, f + o + p FROM pc""".stripMargin,
    // the restarted server reports the dead server's one query in every
    // bucket (created "now" relative to the summary end)
    "query_metrics_durable" ->
      """WITH n AS (SELECT count(*) AS c FROM orders
        |  WHERE o_orderstatus = 'F')
        |SELECT t.bucket, CAST(t.ord AS INT) AS ord,
        |   CAST(1 AS BIGINT) AS "queryCount",
        |   CAST(CEIL(c / 10000.0) AS BIGINT) AS "pageCount",
        |   CAST(c AS BIGINT) AS "pageRows"
        |FROM (VALUES ('hour1', 1), ('hour6', 2), ('hour12', 3),
        |   ('day1', 4), ('day7', 5), ('day30', 6), ('day60', 7),
        |   ('day90', 8), ('all', 9)) AS t(bucket, ord), n""".stripMargin,
    // bucket arithmetic over the three probes' deterministic result counts
    "dashboard_query" ->
      """WITH c AS (
        | SELECT (SELECT count(*) FROM events WHERE event_type = 'click') AS r1,
        |        (SELECT count(*) FROM events
        |          WHERE event_type IN ('click', 'view')) AS r2)
        |SELECT CAST(3 AS BIGINT) AS "queryCount",
        |   CAST(0 AS BIGINT) AS "errorCount",
        |   CAST(r1 + r2 AS BIGINT) AS "resultCount",
        |   CAST(4 AS BIGINT) AS "selectorCount",
        |   CAST(1 AS BIGINT) AS "zeroResults",
        |   CAST((CASE WHEN r1 > 0 AND r1 < 10000 THEN 1 ELSE 0 END)
        |      + (CASE WHEN r2 > 0 AND r2 < 10000 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS "upTo10KResults",
        |   CAST((CASE WHEN r1 >= 10000 AND r1 < 1000000 THEN 1 ELSE 0 END)
        |      + (CASE WHEN r2 >= 10000 AND r2 < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS "upTo1MResults",
        |   CAST(2 AS BIGINT) AS "oneTerm",
        |   CAST(1 AS BIGINT) AS "upTo16Terms"
        | FROM c""".stripMargin,
    "composite_query" ->
      """SELECT CAST(event_id AS VARCHAR) AS id, 'events' AS logic_name
        | FROM events WHERE user_id = 42 AND event_type = 'purchase'
        |UNION ALL
        |SELECT CAST(o_orderkey AS VARCHAR), 'orders'
        | FROM orders WHERE o_custkey = 42""".stripMargin,
    // the orders leg is filtered out by auth → only the events leg's rows
    "filtered_query" ->
      """SELECT CAST(event_id AS VARCHAR) AS id, 'events' AS logic_name
        | FROM events WHERE event_type = 'click'""".stripMargin,
    "remote_query" ->
      """SELECT event_id, user_id, event_type FROM events
        | WHERE event_type = 'click' AND user_id < 50""".stripMargin,
    // the literal audit records the two server calls must produce
    "audit_table" ->
      """SELECT 'anonymous' AS "user", 'events' AS logic_name,
        |   'ACTIVE' AS audit_type, 'JEXL' AS syntax,
        |   'EVENT_TYPE == ''click'' && USER_ID == 42' AS query,
        |   'click,42' AS selectors
        |UNION ALL
        |SELECT 'anonymous', 'lookupUUID', 'ACTIVE', 'LUCENE',
        |   'EVENT_ID:5 OR USER_ID:42', '5,42'""".stripMargin,
    // three full drains (original, duplicate, post-reset duplicate) of
    // the same base query
    "query_lifecycle" ->
      """WITH base AS (SELECT event_id, user_id, event_type FROM events
        |   WHERE event_type = 'click' AND user_id < 50)
        |SELECT event_id, user_id, event_type, leg FROM base
        | CROSS JOIN (VALUES ('orig'), ('dup'), ('reset')) l(leg)""".stripMargin,
    // history predictor: mean result rows over the two seeded queries
    "query_predict" ->
      """WITH c AS (SELECT
        |   (SELECT count(*) FROM events WHERE event_type = 'click') AS r1,
        |   (SELECT count(*) FROM events WHERE event_type = 'view') AS r2)
        |SELECT 'PREDICTED_ROWS' AS name, (r1 + r2) / 2.0 AS value FROM c
        |UNION ALL
        |SELECT 'HISTORY_SAMPLES', 2.0 FROM c""".stripMargin,
    "lookup_uuid" ->
      """SELECT event_id, user_id, event_type FROM events
        | WHERE event_id IN (5, 6) OR user_id = 42""".stripMargin,
    "cached_results_load" ->
      """WITH agg AS (
        |  SELECT user_id, count(*) AS cnt FROM events
        |   WHERE event_type = 'view' GROUP BY user_id)
        |SELECT 'sql' AS leg, user_id, cnt FROM agg
        |UNION ALL
        |SELECT 'created', user_id, cnt FROM agg""".stripMargin,
    // uid batch {3,7,11,7}: the repeat must not duplicate doc 7
    "lookup_uid" ->
      """SELECT CAST(doc_id AS VARCHAR) AS uid, 'RAW' AS view_name, text,
        |   CAST(length(text) AS BIGINT) AS content_length
        | FROM documents WHERE doc_id IN (3, 7, 11)""".stripMargin,
    // every id probed against every type: ids {7,42} x {EVENT_ID, USER_ID}
    // the registry-resolved {A} admits exactly the rows vis_filter does:
    // click (A) and view (A|B); purchase (A&B) and signup (C) fail closed
    "vis_registry" ->
      """SELECT event_id, event_type,
        |   CASE event_type WHEN 'click' THEN 'A' WHEN 'view' THEN 'A|B'
        |     WHEN 'purchase' THEN 'A&B' WHEN 'signup' THEN 'C'
        |     ELSE '(A&B)|C' END AS visibility
        | FROM events WHERE event_type IN ('click', 'view')""".stripMargin,
    // ownership gates bob OUT (asserted live in the query); what alice
    // pages is exactly vis_registry's {A}-visible set
    "vis_owner" ->
      """SELECT event_id, event_type,
        |   CASE event_type WHEN 'click' THEN 'A' WHEN 'view' THEN 'A|B'
        |     WHEN 'purchase' THEN 'A&B' WHEN 'signup' THEN 'C'
        |     ELSE '(A&B)|C' END AS visibility
        | FROM events WHERE event_type IN ('click', 'view')""".stripMargin,
    // literal rows: the expiration tier's observed statuses — the idle
    // session evicts (404 thereafter, durably), the TTL'd alias drops
    // with its materialized rows dir, survivors keep serving, and the
    // non-admin sweep attempt is refused
    "query_expiration" ->
      """SELECT step, CAST(code AS INT) AS code FROM (VALUES
        |  ('sweep_non_admin', 401), ('sweep1_expired_queries', 1),
        |  ('sweep1_expired_aliases', 0), ('idle_next_after_sweep', 404),
        |  ('live_next_after_sweep', 200), ('held_getrows_after_sweep', 200),
        |  ('sweep2_expired_queries', 2), ('sweep2_expired_aliases', 1),
        |  ('expired_getrows', 404), ('rows_dir_gone', 1),
        |  ('restart_idle_next', 404), ('restart_live_next', 404),
        |  ('restart_getrows', 404), ('restart_new_query_next', 200))
        |  AS t(step, code)""".stripMargin,
    // the chain minimum {A} admits exactly what alice sees directly
    "vis_chain" ->
      """SELECT event_id, event_type,
        |   CASE event_type WHEN 'click' THEN 'A' WHEN 'view' THEN 'A|B'
        |     WHEN 'purchase' THEN 'A&B' WHEN 'signup' THEN 'C'
        |     ELSE '(A&B)|C' END AS visibility
        | FROM events WHERE event_type IN ('click', 'view')""".stripMargin,
    "translate_id" ->
      """SELECT event_id, user_id, event_type FROM events
        | WHERE event_id IN (7, 42) OR user_id IN (7, 42)""".stripMargin,
    "transforms_chain" ->
      """SELECT c_custkey, c_name AS customer_name,
        |   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS "BAL_TIER"
        | FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "analyzer_tokens" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(l) AS tok, unnest(range(0, len(l))) AS pos
        | FROM (SELECT doc_id,
        |         list_transform(
        |           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                       x -> x <> ''),
        |           x -> x[1:8]) AS l
        |       FROM documents)
        |), with_syn AS (
        | SELECT doc_id, tok AS term, pos FROM toks
        | UNION ALL
        | SELECT doc_id, 'quick', pos FROM toks WHERE tok = 'fast'
        |)
        |SELECT doc_id, term, count(*) AS occurrences,
        |   CAST(min(pos) AS BIGINT) AS first_pos
        | FROM with_syn GROUP BY 1, 2""".stripMargin,
  )
}
