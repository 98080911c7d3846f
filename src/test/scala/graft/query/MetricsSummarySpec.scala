package graft.query

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Time-bucketed metrics summary (QueryMetricsBean `/summary/all` +
  * `/summary/user`; BaseQueryMetricHandler.binSummary): window
  * membership, per-page accumulation, the always-present-nine-buckets
  * shape, the user filter, and the HTTP endpoint. */
class MetricsSummarySpec extends SparkSpec {
  import spark.implicits._

  private def byBucket(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("a query lands in EVERY window its create time falls inside; empty buckets stay present") {
    QueryMetrics.clear()
    val end = 1000L * 86400000L
    QueryMetrics.record(QueryMetric("a", "q1", "JEXL", end - 60000L, 1L, 5L,
      user = "alice"))
    QueryMetrics.recordPage(PageMetric("a", 1L, 5L, 1L, "PARTIAL"))
    QueryMetrics.record(QueryMetric("b", "q2", "JEXL",
      end - 3L * 86400000L, 1L, 7L, user = "bob"))
    QueryMetrics.recordPage(PageMetric("b", 1L, 4L, 1L, "COMPLETE"))
    QueryMetrics.recordPage(PageMetric("b", 2L, 3L, 1L, "PARTIAL"))
    val m = byBucket(QueryMetrics.summary(spark, end))
    assert(m.size == 9, "all nine buckets present")
    // a (1 min old): everywhere; b (3 days old): day7 outward only
    assert(m("hour1") == ((1L, 1L, 5L)) && m("hour12") == ((1L, 1L, 5L)) &&
      m("day1") == ((1L, 1L, 5L)))
    assert(m("day7") == ((2L, 3L, 12L)) && m("day90") == ((2L, 3L, 12L)) &&
      m("all") == ((2L, 3L, 12L)))
    // the /summary/user variant narrows to one caller
    val alice = byBucket(QueryMetrics.summary(spark, end, Some("alice")))
    assert(alice("all") == ((1L, 1L, 5L)) && alice("day7") == ((1L, 1L, 5L)))
    val nobody = byBucket(QueryMetrics.summary(spark, end, Some("nobody")))
    assert(nobody("all") == ((0L, 0L, 0L)) && nobody.size == 9)
    QueryMetrics.clear()
  }

  test("metrics summary over HTTP reads the server's own durable store, user filter") {
    val df = (1 to 12).map(i => (i.toLong, "A")).toDF("id", "grp")
    val srv = new QueryServer(tables = Map("people" -> df))
    val port = srv.start()
    val client = HttpClient.newHttpClient()
    def get(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    def post(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      // one real paged run AS carol — the summary must come from the
      // server's metric store, not the JVM-wide test ledger
      val created = post(s"http://127.0.0.1:$port/query/create?table=people" +
        "&query=" + java.net.URLEncoder.encode("ID >= 1", "UTF-8") +
        "&pageSize=20&user=carol")
      assert(created.statusCode() == 200, created.body())
      val id = "\"queryId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(created.body()).get.group(1)
      assert(get(s"http://127.0.0.1:$port/query/next?id=$id").statusCode() == 200)
      val r = get(s"http://127.0.0.1:$port/query/metrics/summary")
      assert(r.statusCode() == 200, r.body())
      assert("\"bucket\":".r.findAllIn(r.body()).size == 9, r.body())
      assert(r.body().indexOf("hour1") < r.body().indexOf("day90"),
        "buckets ordered by window")
      // created "now": the query and its 12-row page land in EVERY bucket
      assert("\"queryCount\":1".r.findAllIn(r.body()).size == 9, r.body())
      assert("\"pageRows\":12".r.findAllIn(r.body()).size == 9, r.body())
      val ru = get(
        s"http://127.0.0.1:$port/query/metrics/summary?user=nobody")
      assert(ru.statusCode() == 200 &&
        "\"queryCount\":0".r.findAllIn(ru.body()).size == 9, ru.body())
    } finally srv.stop()
  }

  test("history reconciles page rows; duplicates count; per-id metrics and reset survive a restart") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-msum2").toString
    val df = (1 to 10).map(i => (i.toLong, "A")).toDF("id", "grp")
    val tables = Map("people" -> df)
    val client = HttpClient.newHttpClient()
    def get(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    def post(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    val srv1 = new QueryServer(tables, stateDir = stateDir)
    val p1 = srv1.start()
    val created = post(s"http://127.0.0.1:$p1/query/create?table=people" +
      "&query=" + java.net.URLEncoder.encode("ID >= 1", "UTF-8") + "&pageSize=10")
    val id = "\"queryId\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(created.body()).get.group(1)
    assert(get(s"http://127.0.0.1:$p1/query/next?id=$id").statusCode() == 200)
    // a created-then-paged query predicts its REAL row count, not the
    // create-time zero (history reconciles the page ledger)
    val pred = get(s"http://127.0.0.1:$p1/query/predict?table=people&query=" +
      java.net.URLEncoder.encode("ID >= 1", "UTF-8"))
    assert(pred.body().contains("\"name\": \"PREDICTED_ROWS\", \"value\": 10"),
      pred.body())
    // a duplicate's pages must be COUNTED by the summary (it has its
    // own metric row)
    val dup = post(s"http://127.0.0.1:$p1/query/duplicate?id=$id")
    val dupId = "\"queryId\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(dup.body()).get.group(1)
    assert(get(s"http://127.0.0.1:$p1/query/next?id=$dupId").statusCode() == 200)
    val sum1 = get(s"http://127.0.0.1:$p1/query/metrics/summary")
    assert("\"queryCount\":2".r.findAllIn(sum1.body()).size == 9, sum1.body())
    assert("\"pageRows\":20".r.findAllIn(sum1.body()).size == 9, sum1.body())
    srv1.stop()
    val srv2 = new QueryServer(tables, stateDir = stateDir)
    val p2 = srv2.start()
    try {
      // per-id metrics survive the restart (no resident session needed)
      val m = get(s"http://127.0.0.1:$p2/query/metrics?id=$id")
      assert(m.statusCode() == 200 &&
        "\"page\": 1".r.findAllIn(m.body()).size == 1, m.body())
      // reset AFTER a restart: the fresh run re-pages 1..N on the next
      // attempt — the per-id view shows ONE page 1, never a collision
      // with the dead run's flushed ledger
      assert(post(s"http://127.0.0.1:$p2/query/reset?id=$id").statusCode() == 200)
      assert(get(s"http://127.0.0.1:$p2/query/next?id=$id").statusCode() == 200)
      val m2 = get(s"http://127.0.0.1:$p2/query/metrics?id=$id")
      assert("\"page\": 1".r.findAllIn(m2.body()).size == 1, m2.body())
      // the summary keeps ALL served pages (2 queries, 3 served pages)
      val sum2 = get(s"http://127.0.0.1:$p2/query/metrics/summary")
      assert("\"queryCount\":2".r.findAllIn(sum2.body()).size == 9, sum2.body())
      assert("\"pageRows\":30".r.findAllIn(sum2.body()).size == 9, sum2.body())
      // …but the HISTORY reconciles per-query rows over the LATEST
      // attempt only: a reset's re-drain must not inflate the
      // prediction (10 per query, never 20)
      val pred = get(s"http://127.0.0.1:$p2/query/predict?table=people&query=" +
        java.net.URLEncoder.encode("ID >= 1", "UTF-8"))
      assert(pred.body().contains("\"name\": \"PREDICTED_ROWS\", \"value\": 10"),
        pred.body())
      // an id nothing knows stays 404
      assert(get(s"http://127.0.0.1:$p2/query/metrics?id=unknowable")
        .statusCode() == 404)
    } finally srv2.stop()
  }

  test("a reset that served no page before a restart still resumes on its own attempt") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-msum3").toString
    val df = (1 to 6).map(i => (i.toLong, "A")).toDF("id", "grp")
    val tables = Map("people" -> df)
    val client = HttpClient.newHttpClient()
    def get(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    def post(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    val srv1 = new QueryServer(tables, stateDir = stateDir)
    val p1 = srv1.start()
    val created = post(s"http://127.0.0.1:$p1/query/create?table=people" +
      "&query=" + java.net.URLEncoder.encode("ID >= 1", "UTF-8"))
    val id = "\"queryId\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(created.body()).get.group(1)
    assert(get(s"http://127.0.0.1:$p1/query/next?id=$id").statusCode() == 200)
    srv1.stop() // attempt-0 page 1 flushed
    val srv2 = new QueryServer(tables, stateDir = stateDir)
    val p2 = srv2.start()
    // reset bumps to attempt 1 and PERSISTS it — then the server dies
    // before any attempt-1 page exists in the ledger
    assert(post(s"http://127.0.0.1:$p2/query/reset?id=$id").statusCode() == 200)
    srv2.stop()
    val srv3 = new QueryServer(tables, stateDir = stateDir)
    val p3 = srv3.start()
    try {
      assert(get(s"http://127.0.0.1:$p3/query/next?id=$id").statusCode() == 200)
      // the resumed run serves page 1 on attempt 1 — ONE page 1 in the
      // per-id view, never a collision with the dead attempt-0 ledger
      val m = get(s"http://127.0.0.1:$p3/query/metrics?id=$id")
      assert("\"page\": 1".r.findAllIn(m.body()).size == 1, m.body())
    } finally srv3.stop()
  }

  test("summary survives a server restart over the same stateDir, with no double count") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-msum").toString
    val df = (1 to 7).map(i => (i.toLong, "A")).toDF("id", "grp")
    val tables = Map("people" -> df)
    val client = HttpClient.newHttpClient()
    def get(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    def post(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    val srv1 = new QueryServer(tables, stateDir = stateDir)
    val p1 = srv1.start()
    val created = post(s"http://127.0.0.1:$p1/query/create?table=people" +
      "&query=" + java.net.URLEncoder.encode("ID >= 1", "UTF-8"))
    val id = "\"queryId\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(created.body()).get.group(1)
    assert(get(s"http://127.0.0.1:$p1/query/next?id=$id").statusCode() == 200)
    srv1.stop() // flushes the ledger to the lake tables
    val srv2 = new QueryServer(tables, stateDir = stateDir)
    val p2 = srv2.start()
    try {
      val r = get(s"http://127.0.0.1:$p2/query/metrics/summary")
      // the dead server's query + its 7-row page, exactly once
      assert("\"queryCount\":1".r.findAllIn(r.body()).size == 9, r.body())
      assert("\"pageRows\":7".r.findAllIn(r.body()).size == 9, r.body())
    } finally srv2.stop()
  }
}
