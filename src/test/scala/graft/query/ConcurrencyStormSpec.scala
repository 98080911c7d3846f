package graft.query

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Concurrent-verb storm over one live server: three lock disciplines
  * coexist in QueryServer (the global shareLock, the per-alias row
  * writer locks, the duplicate/close frame refcounts) and the r12
  * self-reviews caught real races in their seams (phantom reservations,
  * lock-held materialization, writer-lock orphans). This spec pins the
  * invariants under load: N threads × create/next/close/duplicate/
  * load/loadAsync/update/create-from-alias/getRows/sql across two
  * principals, with a SWEEPER thread racing forced expiration sweeps
  * (far-future clock) through the storm — the unbind-vs-load,
  * teardown-vs-next, and reap-vs-rewrite seams — then asserts
  *  - every response is one of the DOCUMENTED statuses (a 500 is an
  *    undocumented failure — a torn invariant surfacing as an
  *    exception);
  *  - no orphaned rows store: every cachedrows dir left after the storm
  *    belongs to a live binding;
  *  - a full expiration sweep drains the server to NOTHING — no
  *    sessions, no definitions, no aliases, no rows dirs — and the
  *    shared SparkSession's cache returns to its pre-storm baseline
  *    (no refcount underflow ever unpersisted a shared frame early, no
  *    leak kept one forever). */
class ConcurrencyStormSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()
  private def http(method: String, url: String): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = (if (method == "POST")
      b.POST(HttpRequest.BodyPublishers.noBody()) else b.GET()).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  test("verb storm across two principals: documented statuses only, no orphan stores, drains to baseline") {
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-storm").toString
    val df = (1 to 40)
      .map(i => (i.toLong, s"n_$i", if (i % 2 == 0) "A" else "B", "A"))
      .toDF("id", "name", "grp", "visibility")
    val srv = new QueryServer(Map("people" -> df),
      stateDir = stateDir,
      users = Map("alice" -> Set("A"), "bob" -> Set("A"),
        "root" -> Set("A")),
      adminUsers = Set("root"), metricsFlush = false)
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    // loadAsync's documented contract includes 500 (a failed background
    // load surfaces through /status) — it gets the widened set; every
    // other verb must stay in the strict one
    val allowed = Set(200, 204, 400, 401, 404, 409, 412)
    val allowedAsync = allowed + 500
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val aliasPool = Seq("storm_a", "storm_b", "storm_c")
    val q = enc("GRP == 'A'")
    try {
      val threads = (0 until 6).map { tid =>
        new Thread(() => {
          val user = if (tid % 2 == 0) "alice" else "bob"
          val rnd = new scala.util.Random(1000 + tid)
          val own = scala.collection.mutable.ArrayBuffer[String]()
          def anyOwn(): String =
            if (own.isEmpty) "no_such_id" else own(rnd.nextInt(own.size))
          def check(op: String, st: Int): Unit =
            if (!allowed(st)) bad.add(s"$op -> $st (thread $tid)")
          for (_ <- 0 until 25) rnd.nextInt(11) match {
            case 0 | 1 =>
              val (st, body) = http("POST",
                s"$base/query/create?table=people&query=$q&pageSize=5" +
                  s"&orderBy=id&user=$user")
              check("create", st)
              "\"queryId\": \"([0-9a-f]+)\"".r.findFirstMatchIn(body)
                .foreach(m => own += m.group(1))
            case 2 =>
              check("next", http("GET",
                s"$base/query/next?id=${anyOwn()}&user=$user")._1)
            case 3 =>
              check("close", http("POST",
                s"$base/query/close?id=${anyOwn()}&user=$user")._1)
            case 4 =>
              val (st, body) = http("POST",
                s"$base/query/duplicate?id=${anyOwn()}&user=$user")
              check("duplicate", st)
              "\"queryId\": \"([0-9a-f]+)\"".r.findFirstMatchIn(body)
                .foreach(m => own += m.group(1))
            case 5 =>
              val a = aliasPool(rnd.nextInt(aliasPool.size))
              check("load", http("POST",
                s"$base/cachedresults/load?id=${anyOwn()}&alias=$a&user=$user")._1)
            case 6 =>
              check("update", http("POST",
                s"$base/query/update?id=${anyOwn()}&pageSize=7&user=$user")._1)
            case 7 =>
              val a = aliasPool(rnd.nextInt(aliasPool.size))
              check("getRows", http("GET",
                s"$base/cachedresults/getRows?alias=$a&rowBegin=1&rowEnd=3&user=$user")._1)
            case 8 =>
              val a = aliasPool(rnd.nextInt(aliasPool.size))
              check("sql", http("GET",
                s"$base/cachedresults/sql?sql=${enc(s"SELECT grp FROM $a")}&user=$user")._1)
            case 9 =>
              val a = aliasPool(rnd.nextInt(aliasPool.size))
              check("create-from", http("POST",
                s"$base/cachedresults/create?alias=$a&view=storm_v$tid" +
                  s"&fields=grp&user=$user")._1)
            case 10 =>
              val a = aliasPool(rnd.nextInt(aliasPool.size))
              val st = http("POST",
                s"$base/cachedresults/loadAsync?id=${anyOwn()}&alias=$a" +
                  s"&user=$user")._1
              if (!allowedAsync(st))
                bad.add(s"loadAsync -> $st (thread $tid)")
          }
        }, s"storm-$tid")
      }
      // forced sweeps RACE the verb storm: every ~100 ms an admin
      // expiration with a far-future clock evicts whatever is live,
      // exercising the unbind-vs-load, teardown-vs-next, and
      // reap-vs-rewrite seams the sweep tier introduced. Verbs against
      // just-evicted state must still answer documented statuses, and
      // every end-state invariant below must hold regardless of where
      // the sweeps landed.
      val sweeping = new java.util.concurrent.atomic.AtomicBoolean(true)
      val far = System.currentTimeMillis() + 365L * 86400 * 1000
      val sweeper = new Thread(() => {
        while (sweeping.get()) {
          val (st, _) = http("POST",
            s"$base/admin/expire?user=root&asOf=$far")
          if (st != 200) bad.add(s"mid-storm expire -> $st")
          Thread.sleep(100)
        }
      }, "storm-sweeper")
      threads.foreach(_.start())
      sweeper.start()
      threads.foreach(_.join(120000))
      sweeping.set(false)
      sweeper.join(10000)
      assert(threads.forall(!_.isAlive) && !sweeper.isAlive,
        "storm threads wedged")
      // drain any in-flight background loaders before the state checks
      import scala.jdk.CollectionConverters._
      val loaderDeadline = System.currentTimeMillis() + 30000
      while (Thread.getAllStackTraces.keySet.asScala.exists(t =>
          t.getName.startsWith("graft-crload-") && t.isAlive) &&
          System.currentTimeMillis() < loaderDeadline) Thread.sleep(50)
      assert(bad.isEmpty, s"undocumented statuses: ${bad}")
      // no orphaned rows store: every dir that survived the storm is a
      // live binding the admin can read (writeRowsFor's three-phase
      // discipline drops raced generations; a dir without a binding
      // would be a leak, a binding the admin cannot read a torn alias)
      val cachedrows = java.nio.file.Paths.get(stateDir, "cachedrows")
      if (java.nio.file.Files.isDirectory(cachedrows)) {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(cachedrows)
        val dirs = try s.iterator().asScala
          .map(_.getFileName.toString).toSeq finally s.close()
        dirs.foreach { a =>
          val (st, body) = http("GET",
            s"$base/cachedresults/getRows?alias=$a&rowBegin=1&rowEnd=1&user=root")
          assert(st == 200, s"orphan or torn rows store '$a': $st $body")
        }
      }
      // quiesce: one far-future sweep must drain EVERYTHING durably
      val (st, _) = http("POST", s"$base/admin/expire?user=root" +
        s"&asOf=${System.currentTimeMillis() + 365L * 86400 * 1000}")
      assert(st == 200)
      val (lst, lbody) = http("GET", s"$base/query/list?user=root")
      assert(lst == 200 && lbody == "[]", s"sessions survived the drain: $lbody")
      val sessionsDir = java.nio.file.Paths.get(stateDir, "sessions")
      if (java.nio.file.Files.isDirectory(sessionsDir)) {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(sessionsDir)
        val left = try s.iterator().asScala.map(_.toString).toSeq
          finally s.close()
        assert(left.isEmpty, s"durable definitions survived: $left")
      }
      if (java.nio.file.Files.isDirectory(cachedrows)) {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(cachedrows)
        val left = try s.iterator().asScala.map(_.toString).toSeq
          finally s.close()
        assert(left.isEmpty, s"rows stores survived: $left")
      }
    } finally srv.stop()
    // refcount integrity: after the drain + stop, the shared session's
    // cache is back to its pre-storm baseline
    assert(spark.sparkContext.getPersistentRDDs.size == baseline,
      s"cache leak: ${spark.sparkContext.getPersistentRDDs.size} vs $baseline")
  }
}
