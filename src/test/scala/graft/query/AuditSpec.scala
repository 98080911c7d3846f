package graft.query

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Pins the audit-before-execute contract (QueryExecutorBean.java:
  * 704-740) and positive-EQ selector extraction
  * (DatawaveSelectorExtractor.java:22-52, SplitSelectorExtractor). */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("selectors are the positive equality literals, in query order") {
    assert(Audit.extractSelectors("F1 == 'abc' && F2 == 'def'")
      == Seq("abc", "def"))
    // ranges, regexes, inequalities are NOT selectors
    assert(Audit.extractSelectors(
      "F1 == 'abc' && F2 =~ 'a.*' && F3 > 5 && F4 == 7")
      == Seq("abc", "7"))
    // negated equalities are excluded; double negation re-includes
    assert(Audit.extractSelectors("F1 == 'a' && !(F2 == 'b')") == Seq("a"))
    assert(Audit.extractSelectors("!!(F2 == 'b')") == Seq("b"))
    // a negated inequality IS a positive equality
    assert(Audit.extractSelectors("!(F2 != 'b')") == Seq("b"))
  }

  test("LUCENE queries fall back to the LUCENE parser") {
    assert(Audit.extractSelectors("F1:abc OR F2:def", syntax = "LUCENE")
      == Seq("abc", "def"))
    // the JEXL-first path still finds them when syntax is unmarked
    // (DatawaveSelectorExtractor tries JEXL, then LUCENE)
    assert(Audit.extractSelectors("F1:abc F2:def") == Seq("abc", "def"))
    // a LUCENE-marked query that is actually JEXL still yields its
    // selectors (the reference ignores the syntax marker: JEXL first)
    assert(Audit.extractSelectors("F == 'a'", syntax = "LUCENE") == Seq("a"))
    // unparseable input yields no selectors, never an exception
    assert(Audit.extractSelectors("((((") == Seq.empty)
  }

  test("split selectors flatten separator-joined UID batches") {
    assert(Audit.splitSelectors(Seq("a;b; c", "d"), ';') == Seq("a", "b", "c", "d"))
  }

  test("audit runs BEFORE the query; an auditor failure stops execution") {
    val auditor = new Audit.CollectingAuditor
    var ran = false
    Audit.audited(auditor, Audit.Active, "q1", "alice",
      "F == 'x'", "JEXL", "events", 1000L) { ran = true }
    assert(ran)
    val rec = auditor.records.head
    assert(rec.auditId == "q1" && rec.user == "alice" &&
      rec.auditType == "ACTIVE" && rec.selectors == Seq("x"))
    // NONE skips the auditor entirely
    Audit.audited(auditor, Audit.None_, "q2", "alice", "F == 'y'",
      "JEXL", "events", 1000L) { () }
    assert(auditor.records.size == 1)
    // failing auditor -> body never runs
    val failing = new Audit.Auditor {
      override def audit(rec: Audit.AuditRecord): Unit =
        throw new IllegalStateException("audit service down")
    }
    var ran2 = false
    intercept[IllegalStateException] {
      Audit.audited(failing, Audit.Active, "q3", "alice", "F == 'z'",
        "JEXL", "events", 1000L) { ran2 = true }
    }
    assert(!ran2)
    // PASSIVE is best-effort: the same failing auditor does NOT stop
    // the query
    var ran3 = false
    Audit.audited(failing, Audit.Passive, "q4", "alice", "F == 'z'",
      "JEXL", "events", 1000L) { ran3 = true }
    assert(ran3)
  }

  test("server create audits with extracted selectors; audit failure is a 400") {
    val client = HttpClient.newHttpClient()
    def post(url: String) = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    def getUrl(url: String) = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    val df = Seq((1L, "A"), (2L, "B")).toDF("id", "grp")
    val auditor = new Audit.CollectingAuditor
    val srv = new QueryServer(tables = Map("people" -> df),
      auditor = auditor, auditType = Audit.Active,
      uuidTypes = Seq(LookupUUID.UuidType("GRP", logic = "people")))
    val port = srv.start()
    try {
      val r = post(s"http://127.0.0.1:$port/query/create?table=people" +
        s"&query=${java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")}&user=bob")
      assert(r.statusCode() == 200, r.body())
      val rec = auditor.records.head
      assert(rec.user == "bob" && rec.selectors == Seq("A") &&
        rec.logicName == "people")
      // lookups run full queries and audit too (QueryExecutorBean
      // audits lookupUUID/lookupContentUUID the same way)
      val lr = getUrl(s"http://127.0.0.1:$port/lookupUUID?terms=GRP:B")
      assert(lr.statusCode() == 200, lr.body())
      val lrec = auditor.records.last
      assert(lrec.logicName == "lookupUUID" && lrec.selectors == Seq("B") &&
        lrec.query == "GRP:B")
      // and a duplicate audits as a NEW query
      val id = "\"queryId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(r.body()).get.group(1)
      assert(post(s"http://127.0.0.1:$port/query/duplicate?id=$id")
        .statusCode() == 200)
      assert(auditor.records.last.logicName == "duplicate")
      assert(auditor.records.size == 3)
    } finally srv.stop()
    val down = new Audit.Auditor {
      override def audit(rec: Audit.AuditRecord): Unit =
        throw new IllegalStateException("audit service down")
    }
    val srv2 = new QueryServer(tables = Map("people" -> df),
      auditor = down, auditType = Audit.Active)
    val port2 = srv2.start()
    try {
      val r = post(s"http://127.0.0.1:$port2/query/create?table=people" +
        s"&query=${java.net.URLEncoder.encode("GRP == 'A'", "UTF-8")}")
      assert(r.statusCode() == 400, r.body())
      assert(r.body().contains("audit service down"))
    } finally srv2.stop()
  }
}
