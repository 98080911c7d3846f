package graft.jexl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class JexlParserSpec extends org.scalatest.funsuite.AnyFunSuite {
  import Node._

  test("equality and conjunction") {
    assert(JexlParser.parse("NAME == 'alice' && AGE > 30") ==
      And(List(
        FieldOp("NAME", CompareOp.Eq, Literal.Str("alice")),
        FieldOp("AGE", CompareOp.Gt, Literal.Num(30)))))
  }

  test("bounded range collapses like the _Bounded_ marker") {
    assert(JexlParser.parse("AGE >= 30 && AGE <= 40") ==
      Bounded("AGE", Literal.Num(30), Literal.Num(40)))
  }

  test("regex, negated regex, null checks") {
    assert(JexlParser.parse("NAME =~ 'al.*'") == RegexOp("NAME", "al.*", negated = false))
    assert(JexlParser.parse("NAME !~ 'al.*'") == RegexOp("NAME", "al.*", negated = true))
    assert(JexlParser.parse("NAME == null") == NullCheck("NAME", isNull = true))
    assert(JexlParser.parse("NAME != null") == NullCheck("NAME", isNull = false))
  }

  test("precedence: || binds looser than &&") {
    assert(JexlParser.parse("A == 1 && B == 2 || C == 3") ==
      Or(List(
        And(List(FieldOp("A", CompareOp.Eq, Literal.Num(1)),
          FieldOp("B", CompareOp.Eq, Literal.Num(2)))),
        FieldOp("C", CompareOp.Eq, Literal.Num(3)))))
  }

  test("negation and grouping") {
    assert(JexlParser.parse("!(A == 1 || B == 2)") ==
      Not(Or(List(FieldOp("A", CompareOp.Eq, Literal.Num(1)),
        FieldOp("B", CompareOp.Eq, Literal.Num(2))))))
  }

  test("function namespaces") {
    assert(JexlParser.parse("filter:includeRegex(NAME, 'a.*')") ==
      Func("filter", "includeRegex",
        List(FieldArg("NAME"), LitArg(Literal.Str("a.*")))))
    assert(JexlParser.parse("f:between(AGE, 10, 20)") ==
      Func("f", "between",
        List(FieldArg("AGE"), LitArg(Literal.Num(10)), LitArg(Literal.Num(20)))))
  }

  test("field-to-field comparison") {
    assert(JexlParser.parse("F1 == F2") == FieldToField("F1", CompareOp.Eq, "F2"))
  }

  test("literal-first is canonicalized (InvertNodeVisitor)") {
    assert(JexlParser.parse("'alice' == NAME") ==
      FieldOp("NAME", CompareOp.Eq, Literal.Str("alice")))
    assert(JexlParser.parse("30 < AGE") ==
      FieldOp("AGE", CompareOp.Gt, Literal.Num(30)))
  }

  test("normalize:ipv4 canonicalizes the literal at parse time") {
    assert(JexlParser.parse("IP == normalize:ipv4('010.001.002.003')") ==
      FieldOp("IP", CompareOp.Eq, Literal.Str("10.1.2.3")))
    intercept[ParseException] {
      JexlParser.parse("IP == normalize:ipv4('300.1.2.3')")
    }
  }

  test("policy gates refuse purely-negated queries") {
    val ast = JexlParser.parse("A != 'x'")
    intercept[PolicyException] { Compiler.enforce(ast, QueryPolicy()) }
    Compiler.enforce(ast, QueryPolicy(fullTableScanEnabled = true)) // ok
    Compiler.enforce(JexlParser.parse("A == 'x' && B != 'y'"), QueryPolicy()) // ok
  }
}

class LuceneParserSpec extends org.scalatest.funsuite.AnyFunSuite {
  import Node._

  test("fielded term and implicit AND (TestLuceneToJexlQueryParser:53-159)") {
    assert(LuceneParser.parse("NAME:alice AGE:30") ==
      And(List(FieldOp("NAME", CompareOp.Eq, Literal.Str("alice")),
        FieldOp("AGE", CompareOp.Eq, Literal.Num(30)))))
  }

  test("ranges: inclusive and exclusive") {
    assert(LuceneParser.parse("AGE:[30 TO 40]") ==
      Bounded("AGE", Literal.Num(30), Literal.Num(40)))
    assert(LuceneParser.parse("AGE:{30 TO 40}") ==
      Bounded("AGE", Literal.Num(30), Literal.Num(40), loInc = false, hiInc = false))
  }

  test("eval-phase # functions carry FIELD arguments (functions/jexl translations)") {
    assert(LuceneParser.parse("#COMPARE(F1, '<', 'ANY', F2)") ==
      Func("filter", "compare", List(FieldArg("F1"), LitArg(Literal.Str("<")),
        LitArg(Literal.Str("ANY")), FieldArg("F2"))))
    assert(LuceneParser.parse("#OCCURRENCE(F, '>', 2)") ==
      Func("filter", "occurrence", List(FieldArg("F"),
        LitArg(Literal.Str(">")), LitArg(Literal.Str("2")))))
    assert(LuceneParser.parse("#MATCHES_IN_GROUP(NAME, 'anna', AGE, '30')") ==
      Func("grouping", "matchesInGroup", List(FieldArg("NAME"),
        LitArg(Literal.Str("anna")), FieldArg("AGE"), LitArg(Literal.Str("30")))))
    assert(LuceneParser.parse("#TEXT(OR, F1, 'a', F2, 'b')") ==
      Or(List(
        Func("filter", "includeText", List(FieldArg("F1"), LitArg(Literal.Str("a")))),
        Func("filter", "includeText", List(FieldArg("F2"), LitArg(Literal.Str("b")))))))
    assert(LuceneParser.parse("#DATE(TS, 'after', '20240101', 'yyyyMMdd')") ==
      Func("filter", "afterDate", List(FieldArg("TS"),
        LitArg(Literal.Str("20240101")), LitArg(Literal.Str("yyyyMMdd")))))
    // unknown type token = the FIRST DATE of an implicit between
    // (DateFunction.java toString prepends it; arity picks the overload)
    assert(LuceneParser.parse("#DATE(TS, '20240101', '20240131')") ==
      Func("filter", "betweenDates", List(FieldArg("TS"),
        LitArg(Literal.Str("20240101")), LitArg(Literal.Str("20240131")))))
    // 4 positional args → (start, end, rangePattern), reference 4-arg form
    assert(LuceneParser.parse("#DATE(TS, '20240101', '20240131', 'yyyyMMdd')") ==
      Func("filter", "betweenDates", List(FieldArg("TS"),
        LitArg(Literal.Str("20240101")), LitArg(Literal.Str("20240131")),
        LitArg(Literal.Str("yyyyMMdd")))))
    // single-date form admitted by Loaded.validate (1-3 params)
    assert(LuceneParser.parse("#LOADED('20240101')") ==
      Func("filter", "betweenLoadDates", List(FieldArg("LOAD_DATE"),
        LitArg(Literal.Str("20240101")))))
    assert(LuceneParser.parse("#LOADED('20240101', '20240102')") ==
      Func("filter", "betweenLoadDates", List(FieldArg("LOAD_DATE"),
        LitArg(Literal.Str("20240101")), LitArg(Literal.Str("20240102")))))
    // the eval-only marker is a planner hint — reduces to the inner JEXL
    assert(LuceneParser.parse("#EVALUATION_ONLY('AGE > 30')") ==
      FieldOp("AGE", CompareOp.Gt, Literal.Num(30)))
  }

  test("geo/geowave/loaded # functions (GeoFunction, Geowave, Loaded translations)") {
    assert(LuceneParser.parse("#GEO(bounding_box, POS, '40_-90', '50_-80')") ==
      Func("geo", "within_bounding_box", List(FieldArg("POS"),
        LitArg(Literal.Str("40_-90")), LitArg(Literal.Str("50_-80")))))
    assert(LuceneParser.parse("#GEO(bounding_box, LON, LAT, '-90', '40', '-80', '50')") ==
      Func("geo", "within_bounding_box", List(FieldArg("LON"), FieldArg("LAT"),
        LitArg(Literal.Str("-90")), LitArg(Literal.Str("40")),
        LitArg(Literal.Str("-80")), LitArg(Literal.Str("50")))))
    assert(LuceneParser.parse("#GEO(circle, POS, '45_-85', 2.5)") ==
      Func("geo", "within_circle", List(FieldArg("POS"),
        LitArg(Literal.Str("45_-85")), LitArg(Literal.Str("2.5")))))
    assert(LuceneParser.parse("#INTERSECTS(GEOM, 'POLYGON((0 0, 1 0, 1 1, 0 0))')") ==
      Func("geowave", "intersects", List(FieldArg("GEOM"),
        LitArg(Literal.Str("POLYGON((0 0, 1 0, 1 1, 0 0))")))))
    assert(LuceneParser.parse("#LOADED(after, '20240101')") ==
      Func("filter", "afterLoadDate", List(FieldArg("LOAD_DATE"),
        LitArg(Literal.Str("20240101")))))
    assert(LuceneParser.parse("#MATCHES(F, 'a.*')") ==
      Func("filter", "matchesRegex", List(FieldArg("F"), LitArg(Literal.Str("a.*")))))
  }

  test("#INCLUDE multi-field boolean form (TestLuceneToJexlQueryParser:99-103)") {
    assert(LuceneParser.parse("#INCLUDE(OR, F1, 'a.*', F2, 'b.*')") ==
      Or(List(
        Func("filter", "includeRegex", List(FieldArg("F1"), LitArg(Literal.Str("a.*")))),
        Func("filter", "includeRegex", List(FieldArg("F2"), LitArg(Literal.Str("b.*")))))))
    assert(LuceneParser.parse("#INCLUDE(AND, F1, 'a.*', F2, 'b.*')") ==
      And(List(
        Func("filter", "includeRegex", List(FieldArg("F1"), LitArg(Literal.Str("a.*")))),
        Func("filter", "includeRegex", List(FieldArg("F2"), LitArg(Literal.Str("b.*")))))))
    // the 2-arg form is unchanged
    assert(LuceneParser.parse("#INCLUDE(F, 'rx')") ==
      Func("filter", "includeRegex", List(FieldArg("F"), LitArg(Literal.Str("rx")))))
  }

  test("phrase slop compiles to content:within (SlopQueryNodeBuilder:44-47)") {
    assert(LuceneParser.parse("TEXT:\"a b\"~2") ==
      Func("content", "within", List(FieldArg("TEXT"),
        LitArg(Literal.Num(2)), LitArg(Literal.Str("a")), LitArg(Literal.Str("b")))))
    // a 1-term phrase ignores the slop (JexlSelectorNode branch)
    assert(LuceneParser.parse("TEXT:\"a\"~2") ==
      FieldOp("TEXT", CompareOp.Eq, Literal.Str("a")))
  }

  test("wildcards become regexes (:305-312)") {
    assert(LuceneParser.parse("NAME:al*") == RegexOp("NAME", "al.*", negated = false))
    assert(LuceneParser.parse("NAME:a?ice") == RegexOp("NAME", "a.ice", negated = false))
  }

  test("boolean operators and NOT") {
    assert(LuceneParser.parse("NAME:alice OR NAME:bob") ==
      Or(List(FieldOp("NAME", CompareOp.Eq, Literal.Str("alice")),
        FieldOp("NAME", CompareOp.Eq, Literal.Str("bob")))))
    assert(LuceneParser.parse("NAME:alice NOT AGE:30") ==
      And(List(FieldOp("NAME", CompareOp.Eq, Literal.Str("alice")),
        Not(FieldOp("AGE", CompareOp.Eq, Literal.Num(30))))))
  }

  test("phrase becomes content:phrase") {
    assert(LuceneParser.parse("QUOTE:\"alas poor yorick\"") ==
      Func("content", "phrase", List(FieldArg("QUOTE"),
        LitArg(Literal.Str("alas")), LitArg(Literal.Str("poor")),
        LitArg(Literal.Str("yorick")))))
  }

  test("unfielded term becomes _ANYFIELD_") {
    assert(LuceneParser.parse("alice") ==
      FieldOp("_ANYFIELD_", CompareOp.Eq, Literal.Str("alice")))
  }

  test("#ISNOTNULL / #INCLUDE hash functions") {
    assert(LuceneParser.parse("#ISNOTNULL(NAME)") == NullCheck("NAME", isNull = false))
    assert(LuceneParser.parse("#INCLUDE(NAME, 'a.*')") ==
      Func("filter", "includeRegex",
        List(FieldArg("NAME"), LitArg(Literal.Str("a.*")))))
  }
}

class CompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val people = Seq(
    ("alice", 34, "2020-01-05", Seq("reading", "chess")),
    ("bob", 28, "2021-06-01", Seq("chess")),
    ("carol", 41, "2019-11-20", Seq.empty[String]),
    ("dave", 34, "2022-03-15", Seq("running", "chess", "go")))
    .toDF("name", "age", "joined", "hobbies")

  private def names(jexl: String, model: QueryModel = QueryModel()): Set[String] =
    Compiler.filter(people, jexl, model, QueryPolicy(fullTableScanEnabled = true))
      .select("name").collect().map(_.getString(0)).toSet

  test("equality + range conjunction end-to-end") {
    assert(names("NAME == 'alice' && AGE > 30") == Set("alice"))
    assert(names("AGE >= 30 && AGE <= 40") == Set("alice", "dave"))
  }

  test("regex and negation") {
    assert(names("NAME =~ '^[ab].*'") == Set("alice", "bob"))
    assert(names("NAME !~ '^[ab].*'") == Set("carol", "dave"))
    assert(names("!(AGE == 34)") == Set("bob", "carol"))
  }

  test("multi-valued fields use exists-any semantics") {
    assert(names("HOBBIES == 'chess'") == Set("alice", "bob", "dave"))
    assert(names("HOBBIES == 'go'") == Set("dave"))
    // empty array ≈ null field
    assert(names("HOBBIES == null") == Set("carol"))
  }

  test("!= is the negation of any-member-equals (DatawaveArithmetic)") {
    // multi-valued: 'no element equals', NOT 'some element differs'
    assert(names("HOBBIES != 'chess'") == Set("carol"))
    assert(names("HOBBIES != 'go'") == Set("alice", "bob", "carol"))
    // scalar null: null != 'x' is true
    val df = Seq(("a", Some("x")), ("b", None: Option[String])).toDF("id", "v")
    val out = Compiler.filter(df, "V != 'x'",
        policy = QueryPolicy(fullTableScanEnabled = true))
      .select("id").collect().map(_.getString(0)).toSet
    assert(out == Set("b"))
    // negated regex over null is likewise true
    val out2 = Compiler.filter(df, "V !~ 'x.*'",
        policy = QueryPolicy(fullTableScanEnabled = true))
      .select("id").collect().map(_.getString(0)).toSet
    assert(out2 == Set("b"))
  }

  test("normalize:ipv4 literal reaches the comparison; predicate form throws") {
    val ips = Seq(("h1", "10.1.2.3"), ("h2", "10.1.2.4")).toDF("host", "ip")
    val out = Compiler.filter(ips, "IP == normalize:ipv4('010.001.002.003')",
        policy = QueryPolicy(fullTableScanEnabled = true))
      .select("host").collect().map(_.getString(0)).toSet
    assert(out == Set("h1"))
    intercept[ParseException] {
      Compiler.filter(ips, "normalize:ipv4(IP)",
        policy = QueryPolicy(fullTableScanEnabled = true))
    }
  }

  test("unfielded expansion consults the index, caps at threshold") {
    val lookup: (String, Boolean) => Seq[String] = {
      case ("chess", false) => Seq("HOBBIES")
      case ("ali.*", true) => Seq("NAME")
      case ("everywhere", false) => Seq("A", "B", "C")
      case _ => Nil
    }
    def rw(q: String, threshold: Int = 50): Node =
      UnfieldedExpansion.rewrite(JexlParser.parse(q), lookup, threshold)
    assert(rw("_ANYFIELD_ == 'chess'") ==
      Node.FieldOp("HOBBIES", CompareOp.Eq, Literal.Str("chess")))
    assert(rw("_ANYFIELD_ =~ 'ali.*'") ==
      Node.RegexOp("NAME", "ali.*", negated = false))
    // no indexed field → the never-matching marker (false / true-under-NE)
    assert(rw("_ANYFIELD_ == 'absent'") ==
      Node.FieldOp(UnfieldedExpansion.NoIndexedField, CompareOp.Eq,
        Literal.Str("absent")))
    assert(rw("_ANYFIELD_ == 'everywhere'") ==
      Node.Or(List("A", "B", "C").map(f =>
        Node.FieldOp(f, CompareOp.Eq, Literal.Str("everywhere")))))
    intercept[PolicyException] { rw("_ANYFIELD_ == 'everywhere'", threshold = 2) }
    // fielded terms pass through untouched
    assert(rw("NAME == 'bob' && _ANYFIELD_ == 'chess'") ==
      Node.And(List(
        Node.FieldOp("NAME", CompareOp.Eq, Literal.Str("bob")),
        Node.FieldOp("HOBBIES", CompareOp.Eq, Literal.Str("chess")))))
  }

  test("model aliasing with 1→N expansion") {
    val m = QueryModel(Map("YEARS" -> Seq("AGE"), "ANY_NAME" -> Seq("NAME", "HOBBIES")))
    assert(names("YEARS == 28", m) == Set("bob"))
    assert(names("ANY_NAME == 'chess'", m) == Set("alice", "bob", "dave"))
  }

  test("unknown fields are lenient (never match)") {
    assert(names("NOSUCH == 'x' || NAME == 'bob'") == Set("bob"))
  }

  test("filter: functions") {
    assert(names("filter:includeRegex(NAME, '^c.*')") == Set("carol"))
    assert(names("f:between(AGE, 28, 34)") == Set("alice", "bob", "dave"))
    assert(names("f:length(NAME, 5, 5)") == Set("alice", "carol"))
    assert(names("filter:occurrence(HOBBIES, '>=', 2)") == Set("alice", "dave"))
    assert(names("filter:afterDate(JOINED, '2021-01-01')") == Set("bob", "dave"))
    assert(names("filter:matchesAtLeastCountOf(2, HOBBIES, 'chess', 'go', 'tennis')")
      == Set("dave"))
  }

  test("field-to-field comparison") {
    val df = Seq((1, 1), (1, 2), (3, 3)).toDF("a", "b")
    val out = Compiler.filter(df, "A == B",
      policy = QueryPolicy(fullTableScanEnabled = true))
    assert(out.count() == 2)
  }

  test("filter:timeFunction, f:matchRegex, f:includeText") {
    val df = Seq(
      ("near", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "alpha"),
      ("far", "2024-01-01 00:00:00", "2024-03-01 00:00:00", "beta"))
      .toDF("name", "t1", "t2", "tag")
      .withColumn("t1", col("t1").cast("timestamp"))
      .withColumn("t2", col("t2").cast("timestamp"))
    def go(q: String): Set[String] =
      Compiler.filter(df, q, policy = QueryPolicy(fullTableScanEnabled = true))
        .select("name").collect().map(_.getString(0)).toSet
    // |t1−t2| <= 1 day in millis
    assert(go("filter:timeFunction(T1, T2, '<=', 86400000)") == Set("near"))
    assert(go("f:matchRegex(TAG, 'al.*')") == Set("near"))
    assert(go("f:includeText(TAG, 'beta')") == Set("far"))
  }

  test("filter:compare ANY/ALL over multi-valued fields") {
    val df = Seq(
      ("anyhit", Seq(1, 9), Seq(5, 6)),   // 9 > 5 → ANY; not ALL (1 < 5)
      ("allhit", Seq(7, 9), Seq(5, 6)),   // every pair > → ALL
      ("miss", Seq(1, 2), Seq(5, 6)))
      .toDF("name", "xs", "ys")
    def go(q: String): Set[String] =
      Compiler.filter(df, q, policy = QueryPolicy(fullTableScanEnabled = true))
        .select("name").collect().map(_.getString(0)).toSet
    assert(go("filter:compare(XS, '>', 'ANY', YS)") == Set("anyhit", "allhit"))
    assert(go("filter:compare(XS, '>', 'ALL', YS)") == Set("allhit"))
  }

  test("value functions compare: getMaxValue / getMinTime") {
    val df = Seq(
      ("a", Seq(3, 12), "2024-02-01 00:00:00"),
      ("b", Seq(3, 5), "2020-01-01 00:00:00"))
      .toDF("name", "vals", "when0")
      .withColumn("when0", col("when0").cast("timestamp"))
    def go(q: String): Set[String] =
      Compiler.filter(df, q, policy = QueryPolicy(fullTableScanEnabled = true))
        .select("name").collect().map(_.getString(0)).toSet
    assert(go("filter:getMaxValue(VALS) > 10") == Set("a"))
    assert(go("filter:getMinValue(VALS) == 3") == Set("a", "b"))
    // 2021-01-01T00:00:00Z = 1609459200000 ms
    assert(go("filter:getMinTime(WHEN0) >= 1609459200000") == Set("a"))
  }

  test("custom-format date functions on string fields") {
    val df = Seq(("x", "20240105"), ("y", "20200101")).toDF("name", "d")
    val out = Compiler.filter(df, "filter:afterDate(D, '20230101', 'yyyyMMdd')",
        policy = QueryPolicy(fullTableScanEnabled = true))
      .select("name").collect().map(_.getString(0)).toSet
    assert(out == Set("x"))
  }

  test("_ANYFIELD_ expands over string columns") {
    assert(names("_ANYFIELD_ == 'chess'") == Set("alice", "bob", "dave"))
  }

  test("LUCENE end-to-end through the same compiler") {
    val ast = LuceneParser.parse("NAME:alice OR (AGE:[40 TO 50] NOT NAME:dave)")
    val out = people.filter(Compiler.compile(ast, people, QueryModel()))
    assert(out.select("name").collect().map(_.getString(0)).toSet == Set("alice", "carol"))
  }

  test("wildcard regexes compile to sargable string predicates") {
    val df = Seq("spearmint", "mint chocolate", "basil").toDF("p_name")
      .withColumn("p_name_rev", reverse(col("p_name")))
    def go(q: String): Set[String] =
      Compiler.filter(df, q, policy = QueryPolicy(fullTableScanEnabled = true))
        .select("p_name").collect().map(_.getString(0)).toSet
    val suffix = Compiler.filter(df, "P_NAME =~ '.*mint'")
    assert(suffix.select("p_name").collect().map(_.getString(0)).toSet ==
      Set("spearmint"))
    // plan uses the reversed column prefix, no regex (analyzed plan —
    // the optimizer folds a literal LocalRelation entirely)
    val plan = suffix.queryExecution.analyzed.toString
    assert(plan.contains("startswith") || plan.contains("StartsWith"), plan)
    assert(!plan.toLowerCase.contains("rlike"), plan)
    assert(go("P_NAME =~ 'mint.*'") == Set("mint chocolate"))
    assert(go("P_NAME =~ '.*mint.*'") == Set("spearmint", "mint chocolate"))
  }

  test("custom namespaces plug in through the function registry") {
    FunctionRegistry.register("custom", "isEven", { (ctx, args) =>
      args match {
        case Node.FieldArg(f) :: Nil =>
          ctx.anyField(f)((c, _) => pmod(c.cast("long"), lit(2L)) === 0L)
        case _ => throw new ParseException("custom:isEven(F)")
      }
    })
    try {
      assert(names("custom:isEven(AGE)") == Set("alice", "bob", "dave"))
    } finally FunctionRegistry.unregister("custom", "isEven")
    intercept[ParseException] {
      names("custom:isEven(AGE)") // unregistered again → safe failure
    }
  }

  test("content:phrase scalar fallback") {
    val docs = Seq((1, "Alas poor Yorick I knew him"), (2, "poor alas yorick"))
      .toDF("id", "quote")
    val ast = LuceneParser.parse("QUOTE:\"alas poor yorick\"")
    val ids = docs.filter(Compiler.compile(ast, docs, QueryModel()))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(ids == Set(1))
  }

  test("content terms that are not single tokens never match (no cross-boundary regex hit)") {
    // 'alas poor' as ONE term can never equal a token — the r9 regex
    // derivation must not let the quoted space match across the token
    // boundary the array semantics enforce
    val docs = Seq((1, "alas poor yorick"), (2, "alas-poor yorick"))
      .toDF("id", "quote")
    def ids(q: String): Set[Int] =
      docs.filter(Compiler.compile(JexlParser.parse(q), docs, QueryModel()))
        .select("id").collect().map(_.getInt(0)).toSet
    assert(ids(
      "content:phrase(QUOTE, termOffsetMap, 'alas poor', 'yorick')") ==
      Set.empty)
    assert(ids("content:within(QUOTE, 2, 'alas poor', 'yorick')") ==
      Set.empty)
    // sanity: the split form matches both (the hyphen normalizes away)
    assert(ids(
      "content:phrase(QUOTE, termOffsetMap, 'alas', 'poor', 'yorick')") ==
      Set(1, 2))
  }
}
