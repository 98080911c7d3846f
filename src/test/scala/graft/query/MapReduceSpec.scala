package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Bulk-export job lifecycle (MapReduceBean semantics): submit
  * validation, the async state machine, REAL Spark-stage cancellation
  * via the job group, restart-as-new-id, remove, file retrieval, and
  * the full define → submit → read-back flow over live HTTP. */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())

  test("submit validates job name, roles and required parameters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString
    try {
      val mgr = new MapReduceManager(dir,
        runQuery = _ => Seq(1).toDF("v"))
      assert(mgr.submit("NopeJob", "", Set("AuthorizedUser"))
        .left.exists(_._1 == 400))
      assert(mgr.submit("BulkResultsJob", "queryId:x;format:parquet",
        Set("SomeOtherRole")).left.exists(_._1 == 401))
      assert(mgr.submit("BulkResultsJob", "queryId:x",
        Set("AuthorizedUser")).left.exists { case (st, msg) =>
          st == 400 && msg.contains("format") })
      assert(mgr.submit("BulkResultsJob", "queryId:x;format:exe",
        Set("AuthorizedUser")).left.exists(_._1 == 400))
      assert(mgr.submit("BulkResultsJob", "queryIdx", Set("AuthorizedUser"))
        .left.exists { case (st, msg) =>
          st == 400 && msg.contains("malformed") })
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("a running export CANCELS mid-flight through the Spark job group") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString
    try {
      val slow = udf { x: Long => Thread.sleep(1); x % 2 == 0 }
      val mgr = new MapReduceManager(dir,
        configs = Seq(MapReduce.JobConfig("SlowJob", "mapreduce", "",
          Nil, Nil)),
        // ~10 minutes of work if allowed to finish — cancel must abort it
        runQuery = _ => spark.range(600000L).toDF("id").filter(slow(col("id"))))
      val id = mgr.submit("SlowJob", "format:parquet", Set.empty)
        .toOption.get
      // give the write action time to start real tasks
      Thread.sleep(1500)
      val t0 = System.currentTimeMillis()
      assert(mgr.cancel(id))
      val st = mgr.await(id, 30000)
      assert(st == "CANCELED", st)
      // the abort was prompt, not a drain of the full 10-minute scan
      assert(System.currentTimeMillis() - t0 < 25000)
      assert(!mgr.cancel("nope"))
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("restart reruns the same definition under a NEW job id; " +
      "remove drops state and files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString
    try {
      val mgr = new MapReduceManager(dir,
        configs = Seq(MapReduce.JobConfig("Tiny", "mapreduce", "",
          Nil, Nil)),
        runQuery = _ => Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val id = mgr.submit("Tiny", "format:json", Set.empty).toOption.get
      assert(mgr.await(id) == "SUCCEEDED")
      val Some((_, _, files)) = mgr.info(id)
      assert(files.nonEmpty && files.forall(_._2 > 0), files)
      // file retrieval is path-confined
      assert(mgr.resultFile(id, files.head._1).isDefined)
      assert(mgr.resultFile(id, "../state.properties").isEmpty)
      val id2 = mgr.restart(id).toOption.get
      assert(id2 != id)
      assert(mgr.await(id2) == "SUCCEEDED")
      assert(mgr.listJobIds.toSet == Set(id, id2))
      assert(mgr.remove(id))
      assert(mgr.listJobIds == Seq(id2))
      assert(mgr.info(id).isEmpty && !mgr.remove(id))
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("terminal states are sticky and shutdown cancels live exports") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mr").toString
    try {
      val slow = udf { x: Long => Thread.sleep(1); x % 2 == 0 }
      val mgr = new MapReduceManager(dir,
        configs = Seq(
          MapReduce.JobConfig("Tiny", "mapreduce", "", Nil, Nil),
          MapReduce.JobConfig("SlowJob", "mapreduce", "", Nil, Nil)),
        runQuery = p => if (p.get("speed").contains("slow"))
          spark.range(600000L).toDF("id").filter(slow(col("id")))
        else Seq(1L).toDF("id"))
      // a SUCCEEDED job stays SUCCEEDED through a late cancel
      val done = mgr.submit("Tiny", "format:json", Set.empty).toOption.get
      assert(mgr.await(done) == "SUCCEEDED")
      assert(mgr.cancel(done)) // existed → true…
      assert(mgr.info(done).exists(_._2 == "SUCCEEDED")) // …but not flipped
      // shutdown aborts a live export and records CANCELED
      val live = mgr.submit("SlowJob", "speed:slow;format:parquet",
        Set.empty).toOption.get
      Thread.sleep(1000)
      mgr.shutdown()
      assert(mgr.await(live, 30000) == "CANCELED")
    } finally graft.core.Fs.deleteRecursively(dir)
  }

  test("define → submit → poll → getFile over live HTTP exports the " +
      "defined query's full result") {
    val df = (1 to 40).map(i => (i.toLong, if (i % 4 == 0) "X" else "Y"))
      .toDF("id", "kind")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-mr-http").toString
    val srv = new QueryServer(tables = Map("things" -> df),
      stateDir = stateDir)
    val port = srv.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
      // catalog leg
      val cat = get(s"$base/mapreduce/listConfigurations")
      assert(cat.body().contains("BulkResultsJob") &&
        cat.body().contains("queryId"), cat.body())
      // define the query, then ship it into the bulk job
      val defd = post(s"$base/query/define?table=things" +
        s"&query=${enc("KIND == 'X'")}")
      val qid = "\"queryId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(defd.body()).get.group(1)
      val sub = post(s"$base/mapreduce/submit?jobName=BulkResultsJob" +
        s"&roles=AuthorizedUser&parameters=${enc(s"queryId:$qid;format:json")}")
      assert(sub.statusCode() == 200, sub.body())
      val jobId = "\"jobId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(sub.body()).get.group(1)
      // a bad queryId FAILS (async), a good one SUCCEEDS
      var state = ""
      val deadline = System.currentTimeMillis() + 60000
      while (state != "SUCCEEDED" && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        val ls = get(s"$base/mapreduce/list?jobId=$jobId")
        state = "\"state\": \"([A-Z]+)\"".r
          .findFirstMatchIn(ls.body()).map(_.group(1)).getOrElse("")
        assert(state != "FAILED", ls.body())
      }
      assert(state == "SUCCEEDED")
      // stream back every json part file; union = the full result
      val ls = get(s"$base/mapreduce/list?jobId=$jobId")
      val names = "\"name\": \"([^\"]+)\"".r
        .findAllMatchIn(ls.body()).map(_.group(1)).toSeq
      val parts = names.filter(_.endsWith(".json"))
      assert(parts.nonEmpty, ls.body())
      val lines = parts.flatMap { n =>
        get(s"$base/mapreduce/getFile?jobId=$jobId&fileName=$n")
          .body().split('\n').toSeq.filter(_.nonEmpty)
      }
      assert(lines.size == 10, lines.take(5))
      assert(lines.forall(_.contains("\"X\"")))
      val badSub = post(s"$base/mapreduce/submit?jobName=BulkResultsJob" +
        s"&roles=AuthorizedUser&parameters=${enc("queryId:deadbeef;format:json")}")
      val badJob = "\"jobId\": \"([0-9a-f]+)\"".r
        .findFirstMatchIn(badSub.body()).get.group(1)
      var badState = "RUNNING"
      val dl2 = System.currentTimeMillis() + 30000
      while (badState == "RUNNING" && System.currentTimeMillis() < dl2) {
        Thread.sleep(50)
        badState = "\"state\": \"([A-Z]+)\"".r.findFirstMatchIn(
          get(s"$base/mapreduce/list?jobId=$badJob").body())
          .map(_.group(1)).getOrElse("")
      }
      assert(badState == "FAILED", badState)
    } finally {
      srv.stop()
      graft.core.Fs.deleteRecursively(stateDir)
    }
  }
}
