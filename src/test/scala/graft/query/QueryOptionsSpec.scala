package graft.query

import graft.SparkSpec
import graft.jexl._
import org.apache.spark.sql.functions._

class QueryOptionsSpec extends SparkSpec {
  import spark.implicits._

  test("option pseudo-functions are stripped and collected") {
    val (rest, o) = QueryOptions.extract(JexlParser.parse(
      "A == 'x' && f:groupby('F1','F2') && f:sum('V') && f:unique('U[DAY]')"))
    assert(rest == Some(Node.FieldOp("A", CompareOp.Eq, Literal.Str("x"))))
    assert(o.groupBy == Seq("F1", "F2"))
    assert(o.sum == Seq("V"))
    assert(o.unique == Seq(UniqueField("U", "DAY")))
  }

  test("LUCENE #GROUPBY/#SUM/#UNIQUE_BY_DAY land in the same options") {
    val (rest, o) = QueryOptions.extract(LuceneParser.parse(
      "F:v #GROUPBY(G) #SUM(S) #UNIQUE_BY_DAY(TS)"))
    assert(rest.isDefined)
    assert(o.groupBy == Seq("G") && o.sum == Seq("S"))
    assert(o.unique == Seq(UniqueField("TS", "DAY")))
  }

  test("options-only query leaves no predicate") {
    val (rest, o) = QueryOptions.extract(JexlParser.parse("f:groupby('A')"))
    assert(rest.isEmpty && o.groupBy == Seq("A"))
  }

  test("options inside a disjunction are stripped from the branch") {
    val (rest, o) = QueryOptions.extract(JexlParser.parse(
      "A == 'x' || (B == 'y' && f:groupby('G'))"))
    assert(rest == Some(Node.Or(List(
      Node.FieldOp("A", CompareOp.Eq, Literal.Str("x")),
      Node.FieldOp("B", CompareOp.Eq, Literal.Str("y"))))))
    assert(o.groupBy == Seq("G"))
  }

  test("ShardQueryLogic applies #GROUPBY aggregation from a LUCENE string") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val out = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
      .query(df, "K:a OR K:b #GROUPBY(K) #SUM(V) #AVERAGE(V)",
        QueryParams(syntax = "LUCENE"))
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("COUNT"), r.getAs[Double]("SUM_V"), r.getAs[Double]("AVERAGE_V")))
      .toMap
    assert(out("a") == ((2L, 3.0, 1.5)))
    assert(out("b") == ((1L, 5.0, 5.0)))
  }

  test("ShardQueryLogic applies #UNIQUE with DAY granularity deterministically") {
    val df = Seq(
      (3L, "u1", "2024-01-01 10:00:00"),
      (1L, "u1", "2024-01-01 18:00:00"),  // same user+day → one survivor (min id)
      (2L, "u1", "2024-01-02 09:00:00"),
      (4L, "u2", "2024-01-01 09:00:00"))
      .toDF("id", "user", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
      .query(df, "f:unique('USER', 'TS[DAY]')", QueryParams())
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L))
  }

  test("#UNIQUE TENTH_OF_HOUR and MILLISECOND granularities truncate correctly") {
    val df = Seq(
      (1L, "u1", "2024-01-01 10:01:00.000"),
      (2L, "u1", "2024-01-01 10:08:00.000"),  // same tenth (10:0x) → deduped
      (3L, "u1", "2024-01-01 10:11:00.000"),  // next tenth survives
      (4L, "u2", "2024-01-01 10:30:00.123"),
      (5L, "u2", "2024-01-01 10:30:00.123"),  // same millisecond → deduped
      (6L, "u2", "2024-01-01 10:30:00.124"))
      .toDF("id", "user", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val logic = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
    val tenth = logic.query(df, "f:unique('USER', 'TS[TENTH_OF_HOUR]')", QueryParams())
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tenth == Set(1L, 3L, 4L))
    val milli = logic.query(df, "f:unique('USER', 'TS[MILLISECOND]')", QueryParams())
      .select("id").collect().map(_.getLong(0)).toSet
    assert(milli == Set(1L, 2L, 3L, 4L, 6L))
  }

  test("content:within / grouping:matchesInGroup compile from JEXL strings") {
    val docs = Seq((1, "merge then join quickly"), (2, "join words then later merge"))
      .toDF("doc_id", "text")
    val hits = Compiler.filter(docs, "content:within(TEXT, 3, 'join', 'merge')",
        QueryModel(), QueryPolicy(fullTableScanEnabled = true))
      .select("doc_id").collect().map(_.getInt(0)).toSet
    assert(hits == Set(1))

    val wide = Seq(
      (10L, Seq("R", "N"), Seq("48.0", "10.0")),   // R paired with 48.0 → hit
      (20L, Seq("N", "R"), Seq("48.0", "10.0")),   // R paired with 10.0 → miss
      (30L, Seq("R"), Seq("7.0")))
      .toDF("uid", "RETURNFLAG", "QUANTITY")
    val g = Compiler.filter(wide,
        "grouping:matchesInGroup(RETURNFLAG, 'R', QUANTITY, '4[89].*')",
        QueryModel(), QueryPolicy(fullTableScanEnabled = true))
      .select("uid").collect().map(_.getLong(0)).toSet
    assert(g == Set(10L))
  }

  test("matchesInGroupLeft keys on the ancestor prefix; Right on trailing segments") {
    // WiseGuys-style nested contexts (GroupingRequiredFilterFunctionsTest):
    // uid 1: SANTINO and FREDO under the same parent p_0, LUCA under p_1;
    // uid 2: SANTINO and FREDO under different parents of one grandparent.
    val wide = Seq(
      (1L, Seq(("g_0.p_0.c_0", "SANTINO"), ("g_0.p_0.c_1", "FREDO"),
               ("g_0.p_1.c_0", "LUCA"))),
      (2L, Seq(("g_0.p_0.c_0", "SANTINO"), ("g_0.p_1.c_0", "FREDO"))))
      .toDF("uid", "NAME")
      .withColumn("NAME",
        expr("transform(NAME, x -> named_struct('group', x._1, 'value', x._2))"))
    def uids(q: String): Set[Long] =
      Compiler.filter(wide, q, QueryModel(), QueryPolicy(fullTableScanEnabled = true))
        .select("uid").collect().map(_.getLong(0)).toSet

    // Left pos=0: same parent required
    assert(uids("grouping:matchesInGroupLeft(NAME, 'SANTINO', NAME, 'FREDO')")
      == Set(1L))
    assert(uids("grouping:matchesInGroupLeft(NAME, 'SANTINO', NAME, 'LUCA')")
      == Set.empty)
    // Left pos=1: same grandparent suffices
    assert(uids("grouping:matchesInGroupLeft(NAME, 'SANTINO', NAME, 'FREDO', 1)")
      == Set(1L, 2L))
    // Right pos=0 compares the trailing segment only: uid 2's pair share c_0
    assert(uids("grouping:matchesInGroup(NAME, 'SANTINO', NAME, 'FREDO')")
      == Set(2L))
    // Right pos=1: parent.child must agree → nobody
    assert(uids("grouping:matchesInGroup(NAME, 'SANTINO', NAME, 'FREDO', 1)")
      == Set.empty)
    // Right pos>0 is ASYMMETRIC per the reference (manageMatchesInGroup-
    // RemainingArgs compares later fields' SUBGROUP — last segment only —
    // against the first field's pos-split context): even when two values
    // share their trailing two segments, pos=1 must NOT match, because
    // 'p_0.c_0' (first, split at 1) never equals 'c_0' (rest, subgroup).
    val sharedTail = Seq(
      (3L, Seq(("a.p_0.c_0", "SANTINO"), ("b.p_0.c_0", "FREDO"))))
      .toDF("uid", "NAME")
      .withColumn("NAME",
        expr("transform(NAME, x -> named_struct('group', x._1, 'value', x._2))"))
    assert(Compiler.filter(sharedTail,
        "grouping:matchesInGroup(NAME, 'SANTINO', NAME, 'FREDO', 1)",
        QueryModel(), QueryPolicy(fullTableScanEnabled = true))
      .select("uid").collect().isEmpty)
    // negative positions fail loudly (the reference throws AIOOBE)
    intercept[ParseException] {
      uids("grouping:matchesInGroup(NAME, 'SANTINO', NAME, 'FREDO', -1)")
    }
    intercept[ParseException] {
      uids("grouping:matchesInGroupLeft(NAME, 'SANTINO', NAME, 'FREDO', -1)")
    }

    // single-level groups never co-occur under Left (too few context levels)
    val flat = Seq((9L, Seq("anna"), Seq("30"))).toDF("uid", "NAME", "AGE")
    val left = Compiler.filter(flat,
        "grouping:matchesInGroupLeft(NAME, 'anna', AGE, '30')",
        QueryModel(), QueryPolicy(fullTableScanEnabled = true))
      .select("uid").collect()
    assert(left.isEmpty)
  }

  test("long-layout route honors Left/Right context identities") {
    val long = Seq(
      ("u1", "g_0.p_0.c_0", "NAME", "santino"),
      ("u1", "g_0.p_0.c_1", "NAME", "fredo"),
      ("u2", "g_0.p_0.c_0", "NAME", "santino"),
      ("u2", "g_0.p_1.c_0", "NAME", "fredo"))
      .toDF("uid", "group", "field", "value")
    val logic = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
    def uids(q: String): Set[String] =
      logic.query(long, q, QueryParams())
        .select("uid").distinct().collect().map(_.getString(0)).toSet
    assert(uids("grouping:matchesInGroupLeft(NAME, 'santino', NAME, 'fredo')")
      == Set("u1"))
    assert(uids("grouping:matchesInGroup(NAME, 'santino', NAME, 'fredo')")
      == Set("u2"))
    assert(uids("grouping:matchesInGroupLeft(NAME, 'santino', NAME, 'fredo', 1)")
      == Set("u1", "u2"))
    // Right pos>0 asymmetric on the long route too: u1's pair shares the
    // trailing p_0.c_* parent but first-field split-at-1 ('p_0.c_0') can
    // never equal a later field's subgroup ('c_1') → nobody.
    assert(uids("grouping:matchesInGroup(NAME, 'santino', NAME, 'fredo', 1)")
      == Set.empty)
    // negative positions fail loudly on the long route as well
    intercept[ParseException] {
      uids("grouping:matchesInGroup(NAME, 'santino', NAME, 'fredo', -1)")
    }
  }

  test("long-layout grouping route: uid-only fast path is per-DOCUMENT, " +
      "decorations route through the semi-join instead of failing") {
    // two matching docs; doc 1 carries THREE long rows, doc 2 two — the
    // uid-only projection must still return one row per document (the
    // reference's document-level contract: DocumentGrouper emits
    // documents, not fi rows)
    val long = Seq(
      (1L, "RETURNFLAG", "0", "R"), (1L, "QUANTITY", "0", "48"),
      (1L, "COLOR", "0", "red"),
      (2L, "RETURNFLAG", "1", "R"), (2L, "QUANTITY", "1", "49"),
      (3L, "RETURNFLAG", "0", "N"), (3L, "QUANTITY", "0", "48"))
      .toDF("uid", "field", "group", "value")
      .withColumn("datatype", lit("event"))
      .withColumn("shard_date", to_date(lit("2024-01-05")))
    val logic = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
    val q = "grouping:matchesInGroup(RETURNFLAG, 'R', QUANTITY, '4[89].*')"
    val fast = logic.query(long, q, QueryParams(returnFields = Seq("uid")))
    assert(fast.columns.toSeq == Seq("uid"))
    assert(fast.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // INCLUDE_RECORD_ID / INCLUDE_DATATYPE_AS_FIELD need real columns:
    // the guard must route them through the semi-join (previously a
    // PolicyException on the uid-only routed frame)
    val dec = logic.query(long, q, QueryParams(returnFields = Seq("uid"),
      includeRecordId = true, includeDatatypeAsField = true))
    val rows = dec.collect()
    assert(dec.columns.contains("RECORD_ID") &&
      dec.columns.contains("EVENT_DATATYPE"))
    // semi-join multiplicity: every long row of the matching docs
    assert(rows.length == 5, rows.mkString(","))
    assert(rows.forall(r =>
      r.getString(r.fieldIndex("RECORD_ID")).startsWith("20240105/event/")))
  }

  test("long-layout grouping route emits HIT_TERM: the keyed join's own matching pairs, per document") {
    val long = Seq(
      (1L, "RETURNFLAG", "0", "R"), (1L, "QUANTITY", "0", "48"),
      (1L, "COLOR", "0", "red"),                              // non-hit row
      (1L, "RETURNFLAG", "1", "R"), (1L, "QUANTITY", "1", "10"), // group 1: R matches, 10 doesn't
      (2L, "RETURNFLAG", "1", "R"), (2L, "QUANTITY", "1", "49"),
      (3L, "RETURNFLAG", "0", "N"), (3L, "QUANTITY", "0", "48"))
      .toDF("uid", "field", "group", "value")
    val logic = new ShardQueryLogic(policy = QueryPolicy(fullTableScanEnabled = true))
    val q = "grouping:matchesInGroup(RETURNFLAG, 'R', QUANTITY, '4[89].*')"
    // the uid-only HIT_LIST shape: one row per matching document with
    // HIT_TERM = the (FIELD, value) pairs that matched inside FULLY
    // matched groups — doc 1's group "1" only half-matched, so its R/10
    // pair contributes nothing (r10 Next #7: HIT_LIST previously forced
    // this query off the keyed route entirely)
    val hits = logic.query(long, q,
        QueryParams(returnFields = Seq("uid"), hitList = true))
      .collect().map(r => r.getLong(r.fieldIndex("uid")) ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("HIT_TERM"))
          .map(h => (h.getString(0), h.getString(1))).toSet).toMap
    assert(hits.keySet == Set(1L, 2L))
    assert(hits(1L) == Set(("RETURNFLAG", "R"), ("QUANTITY", "48")),
      hits(1L).toString)
    assert(hits(2L) == Set(("RETURNFLAG", "R"), ("QUANTITY", "49")))
    // the decorated (non-uid-only) shape: HIT_TERM rides every long row
    // of the matching documents without fan-out beyond the semi-join's
    val dec = logic.query(long, q, QueryParams(hitList = true))
    assert(dec.columns.contains("HIT_TERM"))
    assert(dec.collect().length == 7) // docs 1 (5 rows) + 2 (2 rows)
  }
}
