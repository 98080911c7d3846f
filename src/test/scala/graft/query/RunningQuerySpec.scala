package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-page metrics + page-timeout short-circuit (RunningQuery,
  * QueryMetric.PageMetric, query.execution.page.timeout —
  * default.properties:250-258). */
class RunningQuerySpec extends SparkSpec {
  import spark.implicits._

  private def freshCursor() = new QueryCursor(
    java.nio.file.Files.createTempDirectory("rq").toString)

  test("run() pages to exhaustion with per-page metrics") {
    QueryMetrics.clear()
    val df = (1 to 25).toDF("n")
    val rq = new RunningQuery(freshCursor(), "rq1", df, Seq("n"), pageSize = 10)
    assert(rq.run() == 3)
    val pages = QueryMetrics.pagesDF(spark)
      .orderBy("pageNum")
      .select("pageNum", "rows", "status")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(pages.toSeq == Seq((1L, 10L, "COMPLETE"), (2L, 10L, "COMPLETE"),
      (3L, 5L, "PARTIAL")))
  }

  test("page timeout short-circuits further pages") {
    QueryMetrics.clear()
    val df = (1 to 100).toDF("n")
    // timeout of 0 ms: the first page always exceeds it
    val rq = new RunningQuery(freshCursor(), "rq2", df, Seq("n"),
      pageSize = 10, pageTimeoutMillis = 0)
    val first = rq.nextPage()
    assert(first.nonEmpty) // the partial page assembled by the deadline IS returned
    assert(rq.isTimedOut)
    assert(rq.nextPage().isEmpty) // short-circuit: no further pages
    val statuses = QueryMetrics.pagesDF(spark)
      .filter(col("queryId") === "rq2")
      .select("status").collect().map(_.getString(0))
    assert(statuses.toSeq == Seq("TIMEOUT"))
  }

  test("zero-row exhaustion probe emits no page metric") {
    QueryMetrics.clear()
    val df = (1 to 10).toDF("n")
    val rq = new RunningQuery(freshCursor(), "rq3", df, Seq("n"), pageSize = 10)
    assert(rq.run() == 1)
    val pages = QueryMetrics.pagesDF(spark)
      .filter(col("queryId") === "rq3").collect()
    assert(pages.length == 1) // the full page only, not the empty probe
  }
}
