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

  test("metrics summary over HTTP: nine ordered buckets, user filter") {
    QueryMetrics.clear()
    val end = 1000L * 86400000L
    QueryMetrics.record(QueryMetric("h1", "q", "JEXL", end - 1000L, 1L, 2L,
      user = "carol"))
    val df = Seq((1L, "A")).toDF("id", "grp")
    val srv = new QueryServer(tables = Map("people" -> df))
    val port = srv.start()
    val client = HttpClient.newHttpClient()
    def get(url: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      val r = get(s"http://127.0.0.1:$port/query/metrics/summary?end=$end")
      assert(r.statusCode() == 200, r.body())
      assert("\"bucket\":".r.findAllIn(r.body()).size == 9, r.body())
      assert(r.body().indexOf("hour1") < r.body().indexOf("day90"),
        "buckets ordered by window")
      val ru = get(
        s"http://127.0.0.1:$port/query/metrics/summary?end=$end&user=nobody")
      assert(ru.statusCode() == 200 &&
        "\"queryCount\":0".r.findAllIn(ru.body()).size == 9, ru.body())
    } finally { srv.stop(); QueryMetrics.clear() }
  }
}
