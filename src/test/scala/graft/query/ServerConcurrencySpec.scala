package graft.query

import graft.SparkSpec

/** Concurrency: parallel sessions over one live server — create,
  * duplicate, drain, close interleaving across threads. Pins the
  * share-lock contract (closing the ORIGINAL while its duplicate is
  * still draining must never corrupt the duplicate's pages — worst case
  * it de-caches them) and per-session isolation of cursor state and
  * page ledgers. */
class ServerConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("six concurrent create/duplicate/drain/close lifecycles stay isolated and exact") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "grp")
    val srv = new QueryServer(tables = Map("t" -> df))
    val port = srv.start()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val svc = new RemoteQueryService(s"http://127.0.0.1:$port")
      def drain(qid: String): Seq[Long] = {
        val out = Seq.newBuilder[Long]
        var page = svc.nextPage(qid)
        while (page.nonEmpty) {
          out ++= page.get.flatMap(r =>
            "\"id\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toLong))
          page = svc.nextPage(qid)
        }
        out.result()
      }
      val tasks = (0 until 6).map { g =>
        pool.submit(new java.util.concurrent.Callable[(Int, Seq[Long], Seq[Long])] {
          override def call(): (Int, Seq[Long], Seq[Long]) = {
            val id = svc.createQuery("t", s"GRP == $g", pageSize = 37,
              orderBy = Seq("id"))
            val dup = svc.duplicate(id)
            val orig = drain(id)
            // close the ORIGINAL while the duplicate still has every
            // page ahead of it — the shared frame must stay usable
            svc.close(id)
            val dupRows = drain(dup)
            svc.close(dup)
            (g, orig, dupRows)
          }
        })
      }
      tasks.foreach { t =>
        val (g, orig, dupRows) = t.get()
        val expected = (1L to 500L).filter(_ % 7 == g)
        assert(orig == expected, s"grp $g original drain")
        assert(dupRows == expected, s"grp $g duplicate drain after source close")
      }
    } finally { pool.shutdownNow(); srv.stop() }
  }
}
