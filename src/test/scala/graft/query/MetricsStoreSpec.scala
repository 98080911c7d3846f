package graft.query

import graft.SparkSpec

/** Lake-table maintenance for the metric store: compaction rewrites the
  * accumulated per-flush part files as one, retention drops old queries
  * AND their pages together, and readers see identical rows before and
  * after. */
class MetricsStoreSpec extends SparkSpec {

  private def pageFiles(dir: String, name: String): Int = {
    val p = new java.io.File(s"$dir/$name")
    if (!p.exists()) 0
    else p.listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("compact rewrites many flush files as one with identical rows; retention follows the query") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mstore").toString
    val store = new MetricsStore(dir)
    // three server lives, one flush each → three part files per table
    for (life <- 1 to 3) {
      store.record(QueryMetric(s"q$life", "Q", "JEXL",
        beginMillis = life * 1000L, elapsedMillis = 1L, resultRows = 0L))
      store.recordPage(PageMetric(s"q$life", 1L, 10L * life, 1L, "PARTIAL"))
      store.flush(spark)
    }
    assert(pageFiles(dir, "queries") == 3 && pageFiles(dir, "pages") == 3)
    val before = store.history(spark).map(m => (m.queryId, m.resultRows)).toSet

    store.compact(spark)
    assert(pageFiles(dir, "queries") == 1 && pageFiles(dir, "pages") == 1)
    assert(store.history(spark).map(m => (m.queryId, m.resultRows)).toSet
      == before)

    // retention: drop queries older than t=1500 — q1 AND its page go
    store.compact(spark, retainAfterMillis = 1500L)
    val after = store.history(spark)
    assert(after.map(_.queryId).toSet == Set("q2", "q3"))
    assert(store.pages(spark, "q1").isEmpty)
    assert(store.pages(spark, "q2").map(_.rows) == Seq(20L))

    // a compact that crashed between its two moves (table dir gone,
    // .old still holding the data) recovers on the next read
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "queries"),
      java.nio.file.Paths.get(dir, ".queries.old"))
    assert(store.history(spark).map(_.queryId).toSet == Set("q2", "q3"))
  }
}
