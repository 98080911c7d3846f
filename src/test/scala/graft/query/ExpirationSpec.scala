package graft.query

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The state-expiration tier (QueryExpirationBean.java:39 idle-session
  * eviction + CachedResultsExpirationBean.java:37-95 daysToLive cleanup
  * of cached-result tables): durable sessions, alias bindings, and
  * materialized row stores must not accumulate forever when clients
  * never close. Every leg asserts the DURABLE side — a restart after
  * the sweep stays expired — and that non-expired objects survive. */
class ExpirationSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
  private def idOf(body: String): String =
    "\"queryId\": \"([0-9a-f]+)\"".r.findFirstMatchIn(body).get.group(1)

  private def peopleDf =
    (1 to 20).map(i => (i.toLong, s"n_$i", if (i % 2 == 0) "A" else "B", "A"))
      .toDF("id", "name", "grp", "visibility")

  private def backdateSession(stateDir: String, id: String,
                              byMillis: Long): Unit = {
    val f = java.nio.file.Paths.get(stateDir, "sessions", s"$id.properties")
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - byMillis))
  }

  test("idle sessions expire durably; recently-used ones survive the sweep") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-exp1").toString
    val auditor = new Audit.CollectingAuditor
    def mk() = new QueryServer(Map("people" -> peopleDf),
      stateDir = stateDir, auditor = auditor,
      users = Map("alice" -> Set("A"), "root" -> Set("A")),
      adminUsers = Set("root"), metricsFlush = false)
    val srv0 = mk(); val port0 = srv0.start()
    val (idIdle, idLive) = try {
      val base = s"http://127.0.0.1:$port0"
      val q = java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")
      val i = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id&user=alice").body())
      val l = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id&user=alice").body())
      assert(get(s"$base/query/next?id=$l&user=alice").statusCode() == 200)
      (i, l)
    } finally srv0.stop()
    // real idleness spans a restart: the in-memory touch dies with the
    // server and the definition mtime IS the durable last-use record —
    // age the idle one past the 15-minute default
    backdateSession(stateDir, idIdle, 60L * 60 * 1000)
    val srv = mk(); val port = srv.start()
    val (idle, live) = try {
      val base = s"http://127.0.0.1:$port"
      val swept = post(s"$base/admin/expire?user=root")
      assert(swept.statusCode() == 200, swept.body())
      assert(swept.body().contains("\"expiredQueries\": 1"), swept.body())
      // expired = the closed-session contract on every later verb
      assert(get(s"$base/query/next?id=$idIdle&user=alice").statusCode() == 404)
      assert(post(s"$base/query/close?id=$idIdle&user=alice").statusCode() == 404)
      // the survivor keeps paging
      assert(get(s"$base/query/next?id=$idLive&user=alice").statusCode() == 200)
      // the eviction is audited
      assert(auditor.records.exists(r =>
        r.logicName == "expire" && r.auditId == idIdle), auditor.records)
      (idIdle, idLive)
    } finally srv.stop()
    // durable: a restarted server stays expired; the survivor resumes
    val srv2 = mk(); val port2 = srv2.start()
    try {
      val base = s"http://127.0.0.1:$port2"
      assert(get(s"$base/query/next?id=$idle&user=alice").statusCode() == 404)
      // the survivor RESUMES (200 with rows, or 204 exhausted-but-known
      // — both prove the definition outlived the sweep); only the
      // closed-session 404 would mean it was wrongly evicted
      assert(get(s"$base/query/next?id=$live&user=alice").statusCode() != 404)
    } finally srv2.stop()
  }

  test("alias TTL: a loaded alias holds its owning session; past daysToLive both evict, rows dir gone, durably") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-exp2").toString
    def mk() = new QueryServer(Map("people" -> peopleDf),
      stateDir = stateDir, metricsFlush = false)
    val srv = mk(); val port = srv.start()
    val alias = "expview"
    try {
      val base = s"http://127.0.0.1:$port"
      val q = java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")
      val id = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id").body())
      assert(post(s"$base/cachedresults/load?id=$id&alias=$alias")
        .statusCode() == 200)
      val rowsDir = java.nio.file.Paths.get(stateDir, "cachedrows", alias)
      assert(java.nio.file.Files.exists(rowsDir), "rows must materialize")
      val now = System.currentTimeMillis()
      // 16 minutes out: the session is idle past its 15-minute timeout
      // but the alias (fresh, 24h TTL) HOLDS it — neither may evict,
      // or the alias would be orphaned/laundered ownerless
      val sweep1 = post(s"$base/admin/expire?asOf=${now + 16L * 60 * 1000}")
      assert(sweep1.body().contains("\"expiredQueries\": 0") &&
        sweep1.body().contains("\"expiredAliases\": 0"), sweep1.body())
      assert(get(s"$base/cachedresults/getRows?alias=$alias&rowBegin=1&rowEnd=3")
        .statusCode() == 200)
      // past daysToLive: ONE sweep evicts the alias (pass 1) and with
      // the hold released the idle session too (pass 2)
      val sweep2 = post(s"$base/admin/expire?asOf=${now + 25L * 3600 * 1000}")
      assert(sweep2.body().contains("\"expiredQueries\": 1") &&
        sweep2.body().contains("\"expiredAliases\": 1"), sweep2.body())
      assert(get(s"$base/cachedresults/getRows?alias=$alias&rowBegin=1&rowEnd=3")
        .statusCode() == 404)
      val sql = java.net.URLEncoder.encode(s"SELECT * FROM $alias", "UTF-8")
      assert(get(s"$base/cachedresults/sql?sql=$sql").statusCode() != 200)
      assert(!java.nio.file.Files.exists(rowsDir),
        "the materialized rows must be deleted with the alias")
      assert(get(s"$base/query/next?id=$id").statusCode() == 404)
    } finally srv.stop()
    // durable: the restarted server has neither the binding nor the rows
    val srv2 = mk(); val port2 = srv2.start()
    try {
      val base = s"http://127.0.0.1:$port2"
      assert(get(s"$base/cachedresults/getRows?alias=$alias&rowBegin=1&rowEnd=3")
        .statusCode() == 404)
    } finally srv2.stop()
  }

  test("/admin/expire is admin-gated under a registry; open without one") {
    val gated = new QueryServer(Map("people" -> peopleDf),
      users = Map("alice" -> Set.empty[String], "root" -> Set.empty[String]),
      adminUsers = Set("root"), metricsFlush = false)
    val p1 = gated.start()
    try {
      assert(post(s"http://127.0.0.1:$p1/admin/expire?user=nobody")
        .statusCode() == 401)
      assert(post(s"http://127.0.0.1:$p1/admin/expire?user=alice")
        .statusCode() == 401)
      assert(post(s"http://127.0.0.1:$p1/admin/expire?user=root")
        .statusCode() == 200)
    } finally gated.stop()
    val open = new QueryServer(Map("people" -> peopleDf),
      metricsFlush = false)
    val p2 = open.start()
    try assert(post(s"http://127.0.0.1:$p2/admin/expire").statusCode() == 200)
    finally open.stop()
  }

  test("the timer sweep evicts without any verb traffic") {
    val srv = new QueryServer(Map("people" -> peopleDf),
      metricsFlush = false,
      queryIdleTimeoutMillis = 1L,
      expirationSweepMillis = Some(100L))
    val port = srv.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val q = java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")
      val id = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id").body())
      val deadline = System.currentTimeMillis() + 15000
      var st = 0
      while (st != 404 && System.currentTimeMillis() < deadline) {
        Thread.sleep(150)
        st = get(s"$base/query/next?id=$id").statusCode()
      }
      assert(st == 404, s"timer never evicted the idle session (last $st)")
    } finally srv.stop()
  }

  test("rows-store generation stamp: a binding re-pointed before its rows landed never serves the previous query's rows") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-exp3").toString
    def mk() = new QueryServer(Map("people" -> peopleDf),
      stateDir = stateDir, metricsFlush = false)
    val srv = mk(); val port = srv.start()
    val alias = "stampview"
    val (qa, qb) = try {
      val base = s"http://127.0.0.1:$port"
      val qA = java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")
      val qB = java.net.URLEncoder.encode("GRP == 'B'", "UTF-8")
      val idA = idOf(post(s"$base/query/create?table=people&query=$qA" +
        "&pageSize=5&orderBy=id").body())
      val idB = idOf(post(s"$base/query/create?table=people&query=$qB" +
        "&pageSize=5&orderBy=id").body())
      // A's rows materialize durably under the alias, stamped with idA
      assert(post(s"$base/cachedresults/load?id=$idA&alias=$alias")
        .statusCode() == 200)
      (idA, idB)
    } finally srv.stop()
    // the ADVICE crash window: phase 1 of a re-point committed the
    // binding (alias → qb) but the server died before phase 2 wrote
    // qb's rows — qa's COMMITTED store is still on disk
    val af = java.nio.file.Paths.get(stateDir, "aliases.properties")
    val props = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(af)
    try props.load(in) finally in.close()
    assert(props.getProperty(alias) == qa)
    props.setProperty(alias, qb)
    val out = java.nio.file.Files.newOutputStream(af)
    try props.store(out, null) finally out.close()
    // the spec's servers share one SparkSession — drop the live temp
    // view so the restore exercises the REAL restart path (a fresh
    // JVM's catalog has no views) instead of short-circuiting on it
    spark.catalog.dropTempView(alias)
    // restore: the stamp (qa) mismatches the binding (qb) — the server
    // must resume qb and serve ITS rows, never qa's stored generation
    val srv2 = mk(); val port2 = srv2.start()
    try {
      val base = s"http://127.0.0.1:$port2"
      val sql = java.net.URLEncoder.encode(
        s"SELECT grp FROM $alias", "UTF-8")
      val got = get(s"$base/cachedresults/sql?sql=$sql&pageSize=100")
      assert(got.statusCode() == 200, got.body())
      assert(got.body().contains("\"B\"") && !got.body().contains("\"A\""),
        s"restore served the stale generation: ${got.body().take(300)}")
    } finally srv2.stop()
  }

  test("/accumulo/validateVisibilities: per-expression parse verdicts") {
    val srv = new QueryServer(Map("people" -> peopleDf),
      metricsFlush = false)
    val port = srv.start()
    try {
      val base = s"http://127.0.0.1:$port/accumulo/validateVisibilities"
      val vis = java.net.URLEncoder.encode("A&B,A|(B&C),A&", "UTF-8")
      val resp = post(s"$base?visibilities=$vis")
      assert(resp.statusCode() == 200, resp.body())
      assert(resp.body().contains(
        """{"visibility": "A&B", "valid": true}"""), resp.body())
      assert(resp.body().contains(
        """{"visibility": "A|(B&C)", "valid": true}"""), resp.body())
      assert(resp.body().contains(
        """{"visibility": "A&", "valid": false}"""), resp.body())
      assert(post(s"$base?visibilities=").statusCode() == 400)
      assert(post(base).statusCode() == 400)
    } finally srv.stop()
  }

  test("an alias expired mid-loadAsync leaves no ghost: no catalog view, no LOADED status, no rows store") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-exp6").toString
    // one partition + a per-row sleep keeps the background
    // materialization busy long enough for the sweep to land under it
    val slowDf = {
      val slow = org.apache.spark.sql.functions.udf(
        (i: Long) => { Thread.sleep(40); i })
      (1 to 30).map(i => (i.toLong, s"n_$i", "A", "A"))
        .toDF("id", "name", "grp", "visibility")
        .repartition(1)
        .withColumn("id", slow(org.apache.spark.sql.functions.col("id")))
    }
    val srv = new QueryServer(Map("people" -> slowDf), stateDir = stateDir,
      users = Map("alice" -> Set("A"), "root" -> Set("A")),
      adminUsers = Set("root"), metricsFlush = false)
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    try {
      val q = java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")
      val id = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id&user=alice").body())
      assert(post(s"$base/cachedresults/loadAsync?id=$id&alias=ghostly" +
        "&user=alice").statusCode() == 200)
      // the sweep evicts the LOADING alias (and its idle owner) while
      // the background loader is still resuming/materializing
      val far = System.currentTimeMillis() + 365L * 86400 * 1000
      assert(post(s"$base/admin/expire?user=root&asOf=$far")
        .statusCode() == 200)
      // wait out the loser: the background thread must finish and
      // leave the winner's (empty) state alone
      import scala.jdk.CollectionConverters._
      def loaderAlive = Thread.getAllStackTraces.keySet.asScala
        .exists(t => t.getName == "graft-crload-ghostly" && t.isAlive)
      val deadline = System.currentTimeMillis() + 30000
      while (loaderAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!loaderAlive, "background loader wedged")
      assert(get(s"$base/cachedresults/status?alias=ghostly&user=alice")
        .statusCode() == 404)
      assert(!spark.catalog.tableExists("ghostly"),
        "ghost view survived in the shared catalog")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(stateDir, "cachedrows", "ghostly")),
        "orphan rows store survived")
      // the name is free for a fresh bind, which serves normally
      val id2 = idOf(post(s"$base/query/create?table=people&query=$q" +
        "&pageSize=5&orderBy=id&user=alice").body())
      assert(post(s"$base/cachedresults/load?id=$id2&alias=ghostly" +
        "&user=alice").statusCode() == 200)
      assert(get(s"$base/cachedresults/getRows?alias=ghostly&rowBegin=1" +
        "&rowEnd=3&user=alice").statusCode() == 200)
    } finally srv.stop()
  }
}
