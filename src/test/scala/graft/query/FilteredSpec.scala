package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FilteredQueryLogic wrapper semantics (FilteredQueryLogic.java:23-76,
  * QueryLogicFilterByAuth.java:17-60, QueryLogicFilterByParameter
  * .java:15-60). */
class FilteredSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
  private val noParams = Map.empty[String, String]

  test("ByParameter boolean form: case-insensitive true, absent = false") {
    assert(Filtered.ByParameter("p").canRunQuery(Map("p" -> "TRUE"), Nil))
    assert(!Filtered.ByParameter("p").canRunQuery(Map("p" -> "yes"), Nil))
    assert(!Filtered.ByParameter("p").canRunQuery(noParams, Nil))
  }

  test("ByParameter value form and negation") {
    val f = Filtered.ByParameter("logic", Some("events"))
    assert(f.canRunQuery(Map("logic" -> "events"), Nil))
    assert(!f.canRunQuery(Map("logic" -> "edges"), Nil))
    assert(f.copy(negated = true).canRunQuery(Map("logic" -> "edges"), Nil))
  }

  test("ByAuth ALL requires user and every proxy to satisfy the visibility") {
    val f = Filtered.ByAuth("A&B")
    assert(f.canRunQuery(noParams, Seq(Set("A", "B"), Set("A", "B", "C"))))
    // a proxy missing B rejects the whole chain
    assert(!f.canRunQuery(noParams, Seq(Set("A", "B"), Set("A"))))
  }

  test("ByAuth FIRST accepts on the user entry alone; negation flips") {
    val f = Filtered.ByAuth("A&B", matchFirst = true)
    assert(f.canRunQuery(noParams, Seq(Set("A", "B"), Set("A"))))
    // the user entry failing still rejects, even under FIRST
    assert(!f.canRunQuery(noParams, Seq(Set("A"), Set("A", "B"))))
    assert(f.copy(negated = true).canRunQuery(noParams, Seq(Set("A"), Set("A", "B"))))
  }

  test("passing filter returns the delegate; blocked returns empty, same shape") {
    val pass = Filtered.query(Filtered.ByParameter("go"), Map("go" -> "true"), Nil)(df)
    assert(pass.count() == 2)
    val blocked = Filtered.query(Filtered.ByParameter("go"), noParams, Nil)(df)
    assert(blocked.count() == 0)
    assert(blocked.schema == df.schema)
  }

  test("a blocked composite leg contributes nothing to the union") {
    val auths = Seq(Set("PUBLIC"))
    val a = Filtered.query(Filtered.ByAuth("PUBLIC"), noParams, auths)(
      df.select(col("id"), lit("a").as("leg")))
    val b = Filtered.query(Filtered.ByAuth("SECRET"), noParams, auths)(
      df.select(col("id"), lit("b").as("leg")))
    val out = Composite.union(Seq("a" -> a, "b" -> b))
    assert(out.select("leg").distinct().as[String].collect().toSeq == Seq("a"))
  }
}
