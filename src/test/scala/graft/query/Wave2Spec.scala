package graft.query

import graft.SparkSpec
import graft.core.Tables
import graft.content.{Analyzer, AnalyzedContent, Content, ContentStore}
import graft.ingest.{Feeds, Ingest}
import graft.jexl.QueryPolicy
import graft.operators.DocumentTree
import org.apache.spark.sql.functions._

class QueryCursorSpec extends SparkSpec {
  import spark.implicits._

  test("paged cursor is deterministic, durable, resumable") {
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("cursor").toString
    val cur = new QueryCursor(dir)
    val p1 = cur.next("q1", df, Seq("id"), 4).select("id").collect().map(_.getLong(0))
    assert(p1.toSeq == Seq(1L, 2L, 3L, 4L))
    // a NEW cursor instance over the same state dir resumes at page 2
    val cur2 = new QueryCursor(dir)
    val p2 = cur2.next("q1", df, Seq("id"), 4).select("id").collect().map(_.getLong(0))
    assert(p2.toSeq == Seq(5L, 6L, 7L, 8L))
    val p3 = cur2.next("q1", df, Seq("id"), 4).select("id").collect().map(_.getLong(0))
    assert(p3.toSeq == Seq(9L, 10L))
    cur2.close("q1")
    assert(cur2.currentOffset("q1") == 0L)
  }
}

class FeedsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val long = Ingest.toLong(
    Seq((1L, "2024-01-02 00:00:00", "a", 1.0),
        (2L, "2024-01-03 00:00:00", "a", 2.0),
        (3L, "2024-01-01 00:00:00", "b", 3.0))
      .toDF("id", "ts", "cat", "num")
      .withColumn("ts", col("ts").cast("timestamp")),
    uidCol = "id", datatype = "t", dateCol = "ts")

  test("atom feed keeps latest date per (category, value)") {
    val atom = Feeds.atom(long).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDate(2).toString, r.getLong(3))).toMap
    assert(atom(("cat", "a")) == ("2024-01-03", 2L))
    assert(atom(("cat", "b")) == ("2024-01-01", 1L))
  }

  test("summary rollup counts per datatype/field/day") {
    val sum = Feeds.summary(long).filter(col("field") === "cat").collect()
    assert(sum.map(_.getAs[Long]("cnt")).sum == 3L)
  }
}

class QueryMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("instrumented queries are captured and queryable") {
    QueryMetrics.clear()
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val logic = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
    QueryMetrics.instrumented(logic, "q-1", df, "K == 'a'")
    val m = QueryMetrics.toDF(spark).collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("queryId") == "q-1")
    assert(m.head.getAs[Long]("resultRows") == 1L)
  }
}

class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("synonym tokens share positions; truncation applies") {
    val docs = Seq((1L, "the quick fox")).toDF("doc_id", "text")
    val tf = AnalyzedContent.buildTfWith(docs,
      Analyzer(synonyms = Map("quick" -> Seq("fast"))))
    val byTerm = tf.collect().map(r =>
      r.getString(1) -> r.getSeq[Int](2)).toMap
    assert(byTerm("quick") == Seq(1))
    assert(byTerm("fast") == Seq(1)) // same position as source token
    val trunc = AnalyzedContent.buildTfWith(docs, Analyzer(maxTokenLength = 3))
    val terms = trunc.select("term").collect().map(_.getString(0)).toSet
    assert(terms == Set("the", "qui", "fox"))
  }
}

class ContentStoreSpec extends SparkSpec {
  import spark.implicits._

  test("content table round-trips document bytes by uid") {
    val docs = Seq((7L, "hello world"), (8L, "bye")).toDF("doc_id", "text")
    val table = ContentStore.contentTable(docs)
    val got = ContentStore.decoded(ContentStore.fetch(table, Seq("7")))
      .select("uid", "text").collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "hello world")
  }

  test("DOCUMENT: query terms parse shard/datatype/uid shapes") {
    val refs = ContentStore.parseDocumentQuery(
      "DOCUMENT:s01/document/42 DOCUMENT:document/43 DOCUMENT:44")
    assert(refs == Seq(
      ContentStore.DocRef(Some("s01"), Some("document"), "42"),
      ContentStore.DocRef(None, Some("document"), "43"),
      ContentStore.DocRef(None, None, "44")))
  }

  test("fetchByRefs: viewAll widens a uid to its dotted descendants") {
    val docs = Seq(("9", "root"), ("9.1", "child"), ("9.1.2", "grand"),
      ("90", "other")).toDF("doc_id", "text")
    val table = ContentStore.contentTable(docs)
    val refs = ContentStore.parseDocumentQuery("DOCUMENT:s01/document/9")
    val parentOnly = ContentStore.fetchByRefs(table, refs)
      .select("uid").collect().map(_.getString(0)).toSet
    assert(parentOnly == Set("9"))
    val all = ContentStore.fetchByRefs(table, refs, viewAll = true)
      .select("uid").collect().map(_.getString(0)).toSet
    assert(all == Set("9", "9.1", "9.1.2")) // '90' must NOT leak in
  }
}

class CompositeSpec extends SparkSpec {
  import spark.implicits._

  test("parallel mode merges name-sorted delegates; shape mismatch fails") {
    val a = Seq(("1", "a")).toDF("id", "src")
    val b = Seq(("2", "b")).toDF("id", "src")
    val got = Composite.union(Seq("zeta" -> b, "alpha" -> a))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1", "2")) // alpha's rows lead despite order given
    val bad = Seq((3, "c")).toDF("n", "src")
    intercept[IllegalArgumentException] {
      Composite.union(Seq("alpha" -> a, "bad" -> bad))
    }
  }

  test("sequential mode short-circuits at the first non-empty delegate") {
    val empty = Seq.empty[(String, String)].toDF("id", "src")
    val hit = Seq(("9", "h")).toDF("id", "src")
    val later = Seq(("8", "l")).toDF("id", "src")
    val got = Composite.firstNonEmpty(
      Seq("c_later" -> later, "a_empty" -> empty, "b_hit" -> hit))
    assert(got.collect().map(_.getString(0)).toSeq == Seq("9"))
    // all empty → empty frame of the shared shape
    assert(Composite.firstNonEmpty(Seq("a" -> empty)).isEmpty)
  }
}

class LookupUUIDSpec extends SparkSpec {
  import spark.implicits._

  private val reg = LookupUUID.Registry(Seq(
    LookupUUID.UuidType("PAGE_ID", logic = "pages",
      allowWildcardAfter = Some(3)),
    LookupUUID.UuidType("DOC_ID", logic = "docs")),
    batchLookupLimit = 3)

  test("query string builds a validated LUCENE disjunction") {
    assert(LookupUUID.queryString(reg,
      Seq("PAGE_ID" -> "abc1", "doc_id" -> "7")) == "PAGE_ID:abc1 OR DOC_ID:7")
    intercept[IllegalArgumentException] {
      LookupUUID.queryString(reg, Seq("NOPE" -> "x")) // unregistered type
    }
    intercept[IllegalArgumentException] {
      LookupUUID.queryString(reg, Seq("DOC_ID" -> "a*")) // wildcard forbidden
    }
    intercept[IllegalArgumentException] {
      LookupUUID.queryString(reg, Seq("PAGE_ID" -> "ab*")) // too early
    }
    assert(LookupUUID.queryString(reg, Seq("PAGE_ID" -> "abc*"))
      == "PAGE_ID:abc*")
    intercept[IllegalArgumentException] { // batch cap
      LookupUUID.queryString(reg,
        (1 to 4).map(i => "DOC_ID" -> i.toString))
    }
  }

  test("lookup executes the resolved logic; content.lookup follows hits") {
    val docs = Seq((7L, "seven text"), (8L, "eight text")).toDF("doc_id", "text")
    val hits = LookupUUID.lookup(reg, Seq("DOC_ID" -> "7"),
      Map("docs" -> docs),
      params = QueryParams(returnFields = Seq("doc_id")))
    assert(hits.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(7L))
    // mixed-logic batch refused (the reference dispatches ONE logic)
    intercept[IllegalArgumentException] {
      LookupUUID.lookup(reg, Seq("DOC_ID" -> "7", "PAGE_ID" -> "abc"),
        Map("docs" -> docs))
    }
    val content = graft.content.ContentStore.contentTable(docs)
    val fetched = LookupUUID.contentLookup(content,
      hits.select(col("doc_id").cast("string").as("uid")))
    assert(fetched.select("text").collect().map(_.getString(0)).toSeq
      == Seq("seven text"))
  }

  test("UID lookup: all-event terms skip the event query entirely") {
    val docs = Seq((7L, "seven text"), (8L, "eight text"), (9L, "nine text"))
      .toDF("doc_id", "text")
    val content = graft.content.ContentStore.contentTable(docs)
    // space-separated UID list in one term (UID_TERM_SEPARATOR)
    val out = LookupUUID.lookupUid(reg, Seq("event" -> "7 9"),
      tables = Map.empty, content = content)
    assert(out.select("uid").collect().map(_.getString(0)).sorted.toSeq
      == Seq("7", "9"))
    // non-event keys mean the event lookup IS required — and must
    // resolve against the registry
    intercept[IllegalArgumentException] {
      LookupUUID.lookupUid(reg, Seq("NOPE" -> "x"),
        tables = Map.empty, content = content).collect()
    }
    // batch cap applies to the flattened UID list
    intercept[IllegalArgumentException] {
      LookupUUID.lookupUid(reg, Seq("event" -> "1 2 3 4"),
        tables = Map.empty, content = content)
    }
    // mixed batch: registered terms run the event lookup, event terms
    // fetch directly, results union
    val mixed = LookupUUID.lookupUid(reg,
      Seq("DOC_ID" -> "8", "event" -> "7"),
      tables = Map("docs" -> docs.withColumn("uid",
        col("doc_id").cast("string"))),
      content = content)
    assert(mixed.select("uid").collect().map(_.getString(0)).sorted.toSeq
      == Seq("7", "8"))
  }
}

class TfLookupSpec extends SparkSpec {
  import spark.implicits._

  test("tf lookup returns per-position rows for the requested docs only") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("doc_id", "text")
    val got = Content.tfLookup(docs, Seq(1L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "alpha", 0), (1L, "beta", 1), (1L, "alpha", 2)))
    val filtered = Content.tfLookup(docs, Seq(1L), matchTerm = Some("beta"))
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(filtered == Set(("beta", 1)))
  }
}

class FacetSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch-backed facet view: HLL cardinality + count-min counts") {
    // the FacetHandler's HLL+/CMS pre-aggregation (FacetValue.java:16-25)
    // maps to approx_count_distinct + count_min_sketch built-ins
    val events = Tables.events(spark, sf001)
    val facet = events.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        count_min_sketch(col("user_id"), lit(0.01), lit(0.99), lit(42))
          .as("cms"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"))
    val joined = facet.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exactN = r.getAs[Long]("users").toDouble
      assert(math.abs(approx - exactN) / exactN < 0.15,
        s"HLL too far off: $approx vs $exactN")
      assert(r.getAs[Array[Byte]]("cms").nonEmpty) // mergeable sketch bytes
    }
  }
}

class DocumentTreeSpec extends SparkSpec {
  import spark.implicits._

  test("uid tree derivations") {
    val df = Seq("r1", "r1.1", "r1.1.2", "r2").toDF("uid")
      .select(col("uid"), DocumentTree.tldUid(col("uid")).as("tld"),
        DocumentTree.parentUid(col("uid")).as("parent"))
    val m = df.collect().map(r => r.getString(0) ->
      (r.getString(1), Option(r.getString(2)))).toMap
    assert(m("r1") == ("r1", None))
    assert(m("r1.1") == ("r1", Some("r1")))
    assert(m("r1.1.2") == ("r1", Some("r1.1")))
  }

  test("tld query returns whole trees; ancestor query returns root paths") {
    val docs = Seq(
      ("r1", 0), ("r1.1", 5), ("r1.2", 0),
      ("r2", 0), ("r2.1", 0))
      .toDF("uid", "score")
    val tld = DocumentTree.tldQuery(docs, col("score") > 3)
      .select("uid").collect().map(_.getString(0)).toSet
    assert(tld == Set("r1", "r1.1", "r1.2"))
    val anc = DocumentTree.ancestorsOfMatches(docs, col("score") > 3)
      .select("uid").collect().map(_.getString(0)).toSet
    assert(anc == Set("r1", "r1.1"))
  }

  test("parent query maps child matches to parents, roots to themselves") {
    val docs = Seq(
      ("r1", 0), ("r1.1", 5), ("r1.2", 0),
      ("r2", 9), ("r2.1", 0), ("r3", 0), ("r3.1.2", 7))
      .toDF("uid", "score")
    val parents = DocumentTree.parentsOfMatches(docs, col("score") > 3)
      .select("uid").collect().map(_.getString(0)).toSet
    // r1.1 → r1; r2 (root match) → r2; r3.1.2 → r3.1 (absent from the
    // corpus, so nothing returned for it — same as a reference fetch of
    // a parent pointer whose document is gone)
    assert(parents == Set("r1", "r2"))
    // the depth-statistic prune preserves the result set exactly: at
    // this corpus's true depth (3), parents can sit at depth ≤ 2, so
    // nothing the un-pruned query returns is lost
    val depth = DocumentTree.maxTreeDepth(docs)
    assert(depth == 3)
    val pruned = DocumentTree.parentsOfMatches(docs, col("score") > 3,
        maxTreeDepth = Some(depth))
      .select("uid").collect().map(_.getString(0)).toSet
    assert(pruned == parents)
    // an empty (or pre-first-ingest) corpus derives depth 1, not an NPE
    assert(DocumentTree.maxTreeDepth(docs.limit(0)) == 1)
  }
}
