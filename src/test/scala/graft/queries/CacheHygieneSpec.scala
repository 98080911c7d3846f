package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cache hygiene over the gate families that persist internally: a gate
  * either releases every internal persist before returning, or returns
  * exactly ONE persisted frame whose unpersist the CALLER owns (the
  * winnowedOverlapPairs contract). A long-lived session importing the
  * library must be able to drain the cache to zero by unpersisting only
  * what it was handed — hidden entries would accumulate across queries
  * until the executors spill (the driver mains mask this with a
  * clearCache per query; library users have no such luck). */
class CacheHygieneSpec extends SparkSpec {

  private def cached: Int = spark.sparkContext.getPersistentRDDs.size

  /** Run a gate, consume it, unpersist the returned frame, and assert
    * the cache is back at baseline — and that while held, at most the
    * returned frame itself was cached. */
  private def drains(name: String)(gate: => DataFrame): Unit = {
    spark.catalog.clearCache()
    val base = cached
    val out = gate
    out.count() // the driver's one consuming action
    assert(cached <= base + 1,
      s"$name left ${cached - base} cache entries while held (max 1, the returned frame)")
    out.unpersist(true)
    assert(cached == base, s"$name: cache did not drain after unpersist")
  }

  test("pipeline gates: leak-free corpus pipeline and media pipeline drain to baseline") {
    drains("corpus_pipeline_leakfree")(
      PipelineQueries.corpusPipelineLeakFree(spark, sf001))
    drains("media_pipeline")(PipelineQueries.mediaPipeline(spark, sf001))
    drains("corpus_pipeline")(PipelineQueries.corpusPipeline(spark, sf001))
  }

  test("winnow gate: the returned pair frame is the only cache entry") {
    drains("text_winnow")(PipelineQueries.textWinnow(spark, sf001))
  }

  test("tree gates: parent/ancestor/tld cache nothing at all") {
    drains("parent_query")(TreeQueries.parentQuery(spark, sf001))
    drains("ancestor_query")(TreeQueries.ancestorQuery(spark, sf001))
    drains("tld_query")(TreeQueries.tldQuery(spark, sf001))
  }

  test("ingest gates with shared-melt persists release the melt before returning") {
    drains("ing_index_hole")(IngestQueries.ingIndexHole(spark, sf001))
    drains("ing_uid_list_removed")(
      IngestQueries.ingUidListRemoved(spark, sf001))
    drains("ing_needle_uidlist")(IngestQueries.ingNeedleUidList(spark, sf001))
  }
}
