package graft.query

import graft.SparkSpec
import graft.ingest.Ingest
import graft.jexl.{QueryModel, QueryPolicy}
import graft.functions.Normalizers
import org.apache.spark.sql.functions._

/** WiseGuys-style fixture (FIXTURES.md F1, WiseGuysIngest.java:36-300
  * port): multi-valued grouped fields, model aliasing, visibility. */
class ShardQuerySpec extends SparkSpec {
  import spark.implicits._

  private lazy val wiseguys = Seq(
    ("CORLEONE", "test", "2013-01-01", "A",
      Seq("SANTINO", "FREDO", "MICHAEL"), Seq(30, 34, 40), "NY"),
    ("SOPRANO", "test", "2013-01-01", "A&B",
      Seq("ANTHONY", "MEADOW"), Seq(16, 18), "NJ"),
    ("CAPONE", "test2", "2013-01-02", "A|C",
      Seq("ALPHONSE", "FRANK"), Seq(30, 34), "CHI"))
    .toDF("UUID", "datatype", "shard_date", "visibility", "NAME", "AGE", "CITY")

  private val logic = new ShardQueryLogic(
    model = QueryModel(Map("ETA" -> Seq("AGE"), "NOME" -> Seq("NAME"))),
    policy = QueryPolicy(fullTableScanEnabled = true))

  private def uuids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("UUID").collect().map(_.getString(0)).toSet

  test("multi-valued equality with model alias") {
    assert(uuids(logic.query(wiseguys, "NOME == 'SANTINO'")) == Set("CORLEONE"))
    assert(uuids(logic.query(wiseguys, "ETA == 34")) == Set("CORLEONE", "CAPONE"))
  }

  test("#NO_EXPANSION exempts a field from model alias expansion") {
    // With NOME in NO_EXPANSION the alias must stay literal — and a
    // literal NOME doesn't exist in the schema, so the default
    // nonexistent-field planner test refuses the query
    // (QueryModelVisitor.applyModel + timedTestForNonExistentFields)
    intercept[graft.jexl.PolicyException] {
      logic.query(wiseguys, "f:noExpansion(NOME) && NOME == 'SANTINO'").collect()
    }
    // with IGNORE_NONEXISTENT_FIELDS the unexpanded alias just matches
    // nothing
    assert(uuids(logic.query(wiseguys, "f:noExpansion(NOME) && NOME == 'SANTINO'",
      QueryParams(ignoreNonexistentFields = true))).isEmpty)
    // the un-exempted alias still expands
    assert(uuids(logic.query(wiseguys,
      "f:noExpansion(ETA) && NOME == 'SANTINO'")) == Set("CORLEONE"))
  }

  test("nonexistent fields refuse the query by default") {
    intercept[graft.jexl.PolicyException] {
      logic.query(wiseguys, "NO_SUCH_FIELD == 'x'").collect()
    }
    assert(uuids(logic.query(wiseguys, "NO_SUCH_FIELD == 'x'",
      QueryParams(ignoreNonexistentFields = true))).isEmpty)
  }

  test("datatype + date bounds prune") {
    val p = QueryParams(datatypeFilter = Seq("test"),
      beginDate = Some("2013-01-01"), endDate = Some("2013-01-01"))
    assert(uuids(logic.query(wiseguys, "ETA == 34", p)) == Set("CORLEONE"))
  }

  test("visibility enforcement by auths") {
    val pA = QueryParams(auths = Some(Set("A")))
    assert(uuids(logic.query(wiseguys, "ETA >= 16 && ETA <= 40", pA)) ==
      Set("CORLEONE", "CAPONE")) // SOPRANO needs A&B
    val pAB = QueryParams(auths = Some(Set("A", "B")))
    assert(uuids(logic.query(wiseguys, "ETA >= 16 && ETA <= 40", pAB)) ==
      Set("CORLEONE", "SOPRANO", "CAPONE"))
  }

  test("lenient drops un-normalizable terms; strict refuses the query") {
    val numCity = new ShardQueryLogic(
      model = QueryModel(
        forward = Map("ETA" -> Seq("AGE")),
        normalizers = Map("CITY" -> Seq("number"))),
      policy = QueryPolicy(fullTableScanEnabled = true))
    // 'NY' fails the declared NumberType normalizer → lenient drops the
    // term; the rest of the conjunction evaluates
    assert(uuids(numCity.query(wiseguys,
      "UUID == 'CORLEONE' && CITY == 'NY' && f:lenient()")) == Set("CORLEONE"))
    // strict refuses
    intercept[graft.jexl.PolicyException] {
      numCity.query(wiseguys, "UUID == 'CORLEONE' && CITY == 'NY' && f:strict()")
    }
    // numeric literals normalize fine under strict
    assert(uuids(numCity.query(wiseguys,
      "ETA == 34 && f:strict()")) == Set("CORLEONE", "CAPONE"))
    // every term dropped → refuse rather than match-all
    intercept[graft.jexl.PolicyException] {
      numCity.query(wiseguys, "CITY == 'NY' && f:lenient()")
    }
  }

  test("auths with a missing visibility column fail CLOSED") {
    val noVis = wiseguys.drop("visibility")
    intercept[graft.jexl.PolicyException] {
      logic.query(noVis, "ETA == 34", QueryParams(auths = Some(Set("A"))))
    }
    intercept[graft.jexl.PolicyException] {
      logic.query(wiseguys.drop("datatype"), "ETA == 34",
        QueryParams(datatypeFilter = Seq("test")))
    }
  }

  test("HIT_TERM reports why each document matched") {
    val out = logic.query(wiseguys, "NAME == 'FREDO' || AGE == 30",
      QueryParams(hitList = true))
    val byUuid = out.collect().map { r =>
      r.getAs[String]("UUID") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("HIT_TERM"))
          .map(h => (h.getString(0), h.getString(1))).toSet
    }.toMap
    assert(byUuid("CORLEONE") == Set(("NAME", "FREDO"), ("AGE", "30")))
    assert(byUuid("CAPONE") == Set(("AGE", "30")))
    assert(!byUuid.contains("SOPRANO"))
  }

  test("RETURN_FIELDS / LIMIT_FIELDS keep hits first") {
    val out = logic.query(wiseguys, "NAME == 'MICHAEL'",
      QueryParams(returnFields = Seq("UUID", "NAME"), hitList = true,
        limitFieldValues = Map("NAME" -> 1)))
    val r = out.head()
    assert(r.schema.fieldNames.toSet == Set("UUID", "NAME", "HIT_TERM"))
    assert(r.getSeq[String](r.fieldIndex("NAME")) == Seq("MICHAEL"))
  }

  test("rename fields") {
    val out = logic.query(wiseguys, "UUID == 'CAPONE'",
      QueryParams(renameFields = Map("CITY" -> "LOCATION")))
    assert(out.columns.contains("LOCATION") && !out.columns.contains("CITY"))
  }

  test("LUCENE syntax through the same logic") {
    assert(uuids(logic.query(wiseguys, "NAME:MEADOW",
      QueryParams(syntax = "LUCENE"))) == Set("SOPRANO"))
  }
}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wide = Seq(
    ("u1", "2024-01-01", "alice", "30", "a@x.com"),
    ("u2", "2024-01-02", "bob", null, "b@y.org"))
    .toDF("id", "event_date", "NAME.0", "AGE.0", "EMAIL")

  test("toLong melts wide records with grouping context") {
    val long = Ingest.toLong(wide, "id", "people", "event_date")
    val rows = long.collect()
    assert(rows.length == 5) // u2's null AGE dropped
    val r = long.filter(col("uid") === "u1" && col("field") === "NAME").head()
    assert(r.getAs[String]("group") == "0")
    assert(r.getAs[String]("value") == "alice")
    assert(long.filter(col("field") === "EMAIL").count() == 2)
  }

  test("metadata catalog aggregates field stats") {
    val md = Ingest.metadata(Ingest.toLong(wide, "id", "people", "event_date"))
      .collect().map(r => r.getAs[String]("field") -> r.getAs[Long]("cnt")).toMap
    assert(md == Map("NAME" -> 2L, "AGE" -> 1L, "EMAIL" -> 2L))
  }

  test("globalIndex caps uid samples at 20 (Uid.List MAX)") {
    val many = (1 to 50).map(i => (s"u$i", "2024-01-01", "x"))
      .toDF("id", "event_date", "F")
    val gi = Ingest.globalIndex(Ingest.toLong(many, "id", "t", "event_date"))
    val r = gi.filter(col("value") === "x").head()
    assert(r.getAs[Long]("cnt") == 50)
    assert(r.getSeq[String](r.fieldIndex("uid_sample")).size == 20)
  }

  test("docView reassembles documents") {
    val doc = Ingest.docView(Ingest.toLong(wide, "id", "people", "event_date"))
      .filter(col("uid") === "u1").head()
    val fields = doc.getMap[String, Seq[org.apache.spark.sql.Row]](
      doc.fieldIndex("fields"))
    assert(fields.keySet == Set("NAME", "AGE", "EMAIL"))
  }

  test("error channel splits invalid rows") {
    val (good, bad) = Ingest.withErrorChannel(wide, col("`AGE.0`").isNotNull)
    assert(good.count() == 1 && bad.count() == 1)
  }
}

class NormalizersSpec extends SparkSpec {
  import spark.implicits._

  test("lcNoDiacritics") {
    val r = Seq(Tuple1("CAFÉ Naïve Ärger")).toDF("s")
      .select(Normalizers.lcNoDiacritics(col("s"))).head().getString(0)
    assert(r == "cafe naive arger")
  }

  test("ipAddress strips leading zeros per octet") {
    val cases = Seq("010.001.002.003" -> "10.1.2.3",
      "192.168.000.001" -> "192.168.0.1", "0.0.0.0" -> "0.0.0.0")
    cases.foreach { case (in, want) =>
      val got = Seq(Tuple1(in)).toDF("s")
        .select(Normalizers.ipAddress(col("s"))).head().getString(0)
      assert(got == want, s"$in -> $got, want $want")
    }
  }

  test("#EXCERPT_FIELDS attaches the phrase window as HIT_EXCERPT") {
    val docs = Seq(
      ("d1", "one two fast scan three four five"),
      ("d2", "fast scan starts the document"),
      ("d3", "no phrase here at all"),
      ("d4", "padding fast alone scan apart fast scan tail"))
      .toDF("doc_id", "TEXT")
    val logic = new ShardQueryLogic(
      policy = QueryPolicy(fullTableScanEnabled = true))
    val out = logic.query(docs,
        "content:phrase(TEXT, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/2')",
        QueryParams(returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // d1: hit at token 3 → window [1..6]; d2: clamped at start, fixed
    // 6-token length; d3 filtered out; d4: FIRST phrase occurrence wins
    assert(out == Map(
      "d1" -> "one two fast scan three four",
      "d2" -> "fast scan starts the document",
      "d4" -> "scan apart fast scan tail"))
    // before/after directions
    val before = logic.query(docs,
        "content:phrase(TEXT, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/2/before')",
        QueryParams(returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(before("d1") == "one two fast scan")
    val after = logic.query(docs,
        "content:phrase(TEXT, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/2/after')",
        QueryParams(returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("d1") == "fast scan three four")
    // LUCENE spelling: fielded phrase + trailing #EXCERPT_FIELDS
    val lucene = logic.query(docs, """TEXT:"fast scan" #EXCERPT_FIELDS(TEXT/2)""",
        QueryParams(syntax = "LUCENE", returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lucene("d1") == "one two fast scan three four")
  }

  test("#EXCERPT_FIELDS honors content:within's unordered-window hits") {
    // 'fast quick scan' matches within(2) but NOT the ordered phrase —
    // the excerpt must anchor on the window hit, not return null
    val docs = Seq(
      ("w1", "alpha beta fast quick scan gamma delta"),
      ("w2", "alpha scan then fast beta gamma"), // reversed order, span 2
      ("w3", "fast alpha beta gamma delta scan")) // span 5 > dist: no match
      .toDF("doc_id", "TEXT")
    val logic = new ShardQueryLogic(
      policy = QueryPolicy(fullTableScanEnabled = true))
    val out = logic.query(docs,
        "content:within(TEXT, 2, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/1')",
        QueryParams(returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // w1: span [3..5] ±1 → tokens 2..6; w2: span [2..4] ±1 → tokens 1..5
    assert(out == Map(
      "w1" -> "beta fast quick scan gamma",
      "w2" -> "alpha scan then fast beta"))
    // the excerpt hugs the actual span even when an earlier anchor
    // position qualifies without being a term occurrence
    val tail = Seq(("t1", "pad pad pad pad fast scan"))
      .toDF("doc_id", "TEXT")
    val tOut = logic.query(tail,
        "content:within(TEXT, 2, termOffsetMap, 'fast', 'scan') && " +
          "f:excerpt_fields('TEXT/1')",
        QueryParams(returnFields = Seq("doc_id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tOut("t1") == "pad fast scan") // span [5..6] ±1, not [4..7]±1
  }

  test("geoPointZ interleaves deterministically and preserves locality") {
    val df = Seq((40.7, -74.0), (40.8, -74.1), (-33.9, 151.2))
      .toDF("lat", "lon")
    val zs = df.select(Normalizers.geoPointZ(col("lat"), col("lon"))).collect()
      .map(_.getLong(0))
    assert(zs.distinct.length == 3)
    // nearby points share a long z-prefix: xor is small relative to far pair
    assert((zs(0) ^ zs(1)) < (zs(0) ^ zs(2)))
  }
}
