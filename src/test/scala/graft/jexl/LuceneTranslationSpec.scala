package graft.jexl

import org.scalatest.funsuite.AnyFunSuite

/** LUCENE → JEXL translation cases ported from the reference's own
  * parser suite (TestLuceneToJexlQueryParser.java — line cites per
  * case). Conventions that differ textually but not semantically:
  * graft renders `*` as greedy `.*` (the reference emits reluctant
  * `.*?`; identical under full-string match), content functions carry
  * the FIELD instead of the reference's implicit termOffsetMap variable
  * (an Accumulo execution detail with no Spark analog), and graft types
  * purely-numeric selector terms as numbers where the reference quotes
  * them (`FIELD1 == 99999` vs `== '99999'` — identical under the typed
  * normalization both engines apply at evaluation). */
class LuceneTranslationSpec extends AnyFunSuite {

  private def tr(lucene: String): String =
    JexlRender.render(LuceneParser.parse(lucene))

  test("wildcards become anchored regexes; plain terms stay equalities (:156-158)") {
    assert(tr("FIELD1:99?99 AND FIELD2:1111*") ==
      "FIELD1 =~ '99.99' && FIELD2 =~ '1111.*'")
    assert(tr("FIELD1:99999 AND FIELD2:11111") ==
      "FIELD1 == 99999 && FIELD2 == 11111")
    assert(tr("FIELD1:99?99 AND FIELD2:1111* OR FIELD3:AAAA") ==
      "FIELD1 =~ '99.99' && FIELD2 =~ '1111.*' || FIELD3 == 'AAAA'")
  }

  test("regex metacharacters in terms are escaped (:165)") {
    assert(tr("A:11.22*") == "A =~ '11\\\\.22.*'")
  }

  test("parens preserve the OR grouping under AND (:159)") {
    assert(tr("FIELD1:99?99 AND (FIELD2:1111* OR FIELD3:AAAA)") ==
      "FIELD1 =~ '99.99' && (FIELD2 =~ '1111.*' || FIELD3 == 'AAAA')")
  }

  test("implicit conjunction and NOT chains (:162,173)") {
    assert(tr("A:1 B:2 C:3 NOT D:4") ==
      "A == 1 && B == 2 && C == 3 && !(D == 4)")
    assert(tr("(F1:A AND F2:B) NOT F3:C NOT F4:D") ==
      "F1 == 'A' && F2 == 'B' && !(F3 == 'C') && !(F4 == 'D')")
  }

  test("ranges render the _Bounded_ marker with bracket-faithful bounds (:305-312)") {
    assert(tr("fieldName:[aaa TO bbb]") ==
      "((_Bounded_ = true) && (fieldName >= 'aaa' && fieldName <= 'bbb'))")
    assert(tr("fieldName:{aaa TO bbb}") ==
      "((_Bounded_ = true) && (fieldName > 'aaa' && fieldName < 'bbb'))")
    assert(tr("F:{lower TO upper]") ==
      "((_Bounded_ = true) && (F > 'lower' && F <= 'upper'))")
    assert(tr("F:[lower TO upper}") ==
      "((_Bounded_ = true) && (F >= 'lower' && F < 'upper'))")
  }

  test("#INCLUDE becomes filter:includeRegex (:72,126)") {
    assert(tr("F:S AND #INCLUDE(F, 'test')") ==
      "F == 'S' && filter:includeRegex(F, 'test')")
    assert(tr("F:S AND #INCLUDE(FIELD, regex)") ==
      "F == 'S' && filter:includeRegex(FIELD, 'regex')")
  }

  test("multi-field #INCLUDE(AND, ...) expands to a conjunction (:100)") {
    assert(tr("F:S AND #INCLUDE(AND, FIELD1, 'rege(x)', FIELD2, 'rege(x)')") ==
      "F == 'S' && filter:includeRegex(FIELD1, 'rege(x)') && " +
        "filter:includeRegex(FIELD2, 'rege(x)')")
  }

  test("#OCCURRENCE quotes the operator; bare and quoted ops agree (:53)") {
    // graft carries the count through as the literal text it was given
    // (the reference re-types it bare; both evaluate numerically)
    assert(tr("#OCCURRENCE(LOAD_DATE, >, 1)") ==
      "filter:occurrence(LOAD_DATE, '>', '1')")
    assert(tr("#OCCURRENCE(LOAD_DATE, '>', 1)") ==
      "filter:occurrence(LOAD_DATE, '>', '1')")
  }

  test("#MATCHES_IN_GROUP with and without quoted values (:59-62)") {
    assert(tr("#MATCHES_IN_GROUP(FOO, 'foo', BAR, 'bar')") ==
      "grouping:matchesInGroup(FOO, 'foo', BAR, 'bar')")
    assert(tr("#MATCHES_IN_GROUP(FOO, foo, BAR, bar)") ==
      "grouping:matchesInGroup(FOO, 'foo', BAR, 'bar')")
    assert(tr("#MATCHES_IN_GROUP_LEFT(FOO, foo, BAR, bar)") ==
      "grouping:matchesInGroupLeft(FOO, 'foo', BAR, 'bar')")
  }

  test("#COMPARE quotes operator and mode, fields stay bare (:180-181)") {
    assert(tr("F1:A AND F2:B AND #COMPARE(F1, <, ALL, F2)") ==
      "F1 == 'A' && F2 == 'B' && filter:compare(F1, '<', 'ALL', F2)")
    assert(tr("F1:A AND F2:B AND #COMPARE(F1, >=, ANY, F2)") ==
      "F1 == 'A' && F2 == 'B' && filter:compare(F1, '>=', 'ANY', F2)")
  }

  test("fielded phrases and slop map to content functions (:239,249)") {
    assert(tr("FIELD:\"portable document\"") ==
      "content:phrase(FIELD, 'portable', 'document')")
    assert(tr("FIELD:\"portable document\"~3") ==
      "content:within(FIELD, 3, 'portable', 'document')")
  }
}
