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

  test("_ANYFIELD_ expands over string columns") {
    assert(names("_ANYFIELD_ == 'chess'") == Set("alice", "bob", "dave"))
  }

  test("LUCENE end-to-end through the same compiler") {
    val ast = LuceneParser.parse("NAME:alice OR (AGE:[40 TO 50] NOT NAME:dave)")
    val out = people.filter(Compiler.compile(ast, people, QueryModel()))
    assert(out.select("name").collect().map(_.getString(0)).toSet == Set("alice", "carol"))
  }

  test("content:phrase scalar fallback") {
    val docs = Seq((1, "Alas poor Yorick I knew him"), (2, "poor alas yorick"))
      .toDF("id", "quote")
    val ast = LuceneParser.parse("QUOTE:\"alas poor yorick\"")
    val ids = docs.filter(Compiler.compile(ast, docs, QueryModel()))
      .select("id").collect().map(_.getInt(0)).toSet
    assert(ids == Set(1))
  }
}
