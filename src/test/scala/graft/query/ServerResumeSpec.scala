package graft.query

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Server-restart durability: a query's DEFINITION (properties beside
  * the cursor state) and its cursor OFFSET both live in stateDir, so a
  * brand-new server over the same stateDir resumes paging exactly where
  * the dead one stopped — the reference's query-storage-service story.
  * Close on the new server drops the durable state for good. */
class ServerResumeSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] = client.send(
    HttpRequest.newBuilder(URI.create(url)).GET().build(),
    HttpResponse.BodyHandlers.ofString())
  private def post(url: String): HttpResponse[String] = client.send(
    HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
    HttpResponse.BodyHandlers.ofString())

  test("a new server over the same stateDir resumes paging where the dead one stopped") {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft-resume").toString
    val df = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val tables = Map("t" -> df)

    val srv1 = new QueryServer(tables, stateDir = stateDir)
    val p1 = srv1.start()
    val created = post(s"http://127.0.0.1:$p1/query/create?table=t&query=" +
      java.net.URLEncoder.encode("ID >= 1", "UTF-8") + "&pageSize=10&orderBy=id")
    assert(created.statusCode() == 200, created.body())
    val id = "\"queryId\": \"([0-9a-f]+)\"".r
      .findFirstMatchIn(created.body()).get.group(1)
    val page1 = get(s"http://127.0.0.1:$p1/query/next?id=$id")
    assert("\"id\":(\\d+)".r.findAllMatchIn(page1.body())
      .map(_.group(1).toInt).toSeq == (1 to 10), page1.body().take(400))
    srv1.stop() // the process dies mid-query; sessions map is gone

    val srv2 = new QueryServer(tables, stateDir = stateDir)
    val p2 = srv2.start()
    try {
      // pages already served STAY served: the resumed cursor continues
      val page2 = get(s"http://127.0.0.1:$p2/query/next?id=$id")
      assert(page2.statusCode() == 200, page2.body())
      assert("\"id\":(\\d+)".r.findAllMatchIn(page2.body())
        .map(_.group(1).toInt).toSeq == (11 to 20), page2.body().take(400))
      // close drops the durable definition: a third server knows nothing
      assert(post(s"http://127.0.0.1:$p2/query/close?id=$id").statusCode() == 200)
      val srv3 = new QueryServer(tables, stateDir = stateDir)
      val p3 = srv3.start()
      try assert(get(s"http://127.0.0.1:$p3/query/next?id=$id").statusCode() == 404)
      finally srv3.stop()
      // lookup-style ids never persist: unknown ids still 404
      assert(get(s"http://127.0.0.1:$p2/query/next?id=deadbeef").statusCode() == 404)
    } finally srv2.stop()
  }
}
