package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ConfigurableAgeOffFilter semantics (accept:163-191): ordered rules,
  * first claim wins, default TTL for unclaimed rows, short-circuit
  * horizon bypasses the rules. */
class AgeOffSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000L
  private val scanStart = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli

  private lazy val rows = Seq(
    (1L, "a", "2024-01-30 12:00:00"), // a-rule (5d): young enough → keep
    (2L, "a", "2024-01-20 12:00:00"), // a-rule: too old → drop
    (3L, "b", "2024-01-20 12:00:00"), // b-rule (20d): keep
    (4L, "c", "2024-01-25 12:00:00"), // default (10d): keep
    (5L, "c", "2024-01-10 12:00:00")) // default: drop
    .toDF("id", "dt", "ts").withColumn("ts", col("ts").cast("timestamp"))

  private val rules = Seq(
    AgeOff.dataTypeRule(Seq("a"), 5 * day, typeCol = "dt"),
    AgeOff.dataTypeRule(Seq("b"), 20 * day, typeCol = "dt"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("first claiming rule decides; unclaimed rows use the default TTL") {
    assert(ids(AgeOff.filter(rows, "ts", scanStart, 10 * day, rules)) ==
      Set(1L, 3L, 4L))
  }

  test("rule order matters: an earlier broader rule shadows a later one") {
    // 'a' claimed by a 1-day rule first — row 1 (2 days old) now drops
    // even though the later 5-day rule would have kept it
    val shadowed = AgeOff.dataTypeRule(Seq("a", "b"), 1 * day, typeCol = "dt") +: rules
    assert(ids(AgeOff.filter(rows, "ts", scanStart, 10 * day, shadowed)) ==
      Set(4L))
  }

  test("short-circuit horizon rescues rows from an aggressive rule") {
    val harsh = Seq(AgeOff.dataTypeRule(Seq("a"), 1 * day, typeCol = "dt"))
    // row 1 (2 days old) dropped by the 1d rule; rows 3/5 exceed the
    // 10d default; row 4 survives it
    assert(ids(AgeOff.filter(rows, "ts", scanStart, 10 * day, harsh)) ==
      Set(4L))
    // a 3-day short-circuit rescues row 1 without consulting the rule
    assert(ids(AgeOff.filter(rows, "ts", scanStart, 10 * day, harsh,
      shortCircuitTtlMillis = Some(3 * day))) == Set(1L, 4L))
  }

  test("visibility-token rules: first-configured token present wins") {
    val vis = Seq(
      (1L, "PII&OPS", "2024-01-22 12:00:00"),   // 10 days old
      (2L, "OPS", "2024-01-22 12:00:00"),
      (3L, "PUBLIC", "2024-01-22 12:00:00"))
      .toDF("id", "visibility", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    // OPS configured first → its 30d TTL claims row 1 despite PII's 2d
    val opsFirst = AgeOff.visibilityTokenRules(Seq("OPS" -> 30 * day, "PII" -> 2 * day))
    assert(ids(AgeOff.filter(vis, "ts", scanStart, 5 * day, opsFirst)) == Set(1L, 2L))
    // PII configured first → row 1 ages off under the 2d TTL
    val piiFirst = AgeOff.visibilityTokenRules(Seq("PII" -> 2 * day, "OPS" -> 30 * day))
    assert(ids(AgeOff.filter(vis, "ts", scanStart, 5 * day, piiFirst)) == Set(2L))
    // token matching is atom-level: 'PI' must not claim 'PII'
    val sub = AgeOff.visibilityTokenRules(Seq("PI" -> 30 * day))
    assert(ids(AgeOff.filter(vis, "ts", scanStart, 5 * day, sub)).isEmpty)
  }

  test("the implied max-TTL bound pushes to the scan and never changes the kept set") {
    // boundary rows around the implied bound (scanStart − max TTL = 20d):
    // exactly AT the bound both forms drop (strict >); just inside the
    // bound the per-rule leaf still decides
    val edge = Seq(
      (10L, "b", new java.sql.Timestamp(scanStart - 20 * day)),         // at max TTL: drop
      (11L, "b", new java.sql.Timestamp(scanStart - 20 * day + 1000)),  // inside: keep
      (12L, "a", new java.sql.Timestamp(scanStart - 6 * day)))          // a's 5d drops it, bound alone would keep
      .toDF("id", "dt", "ts")
    assert(ids(AgeOff.filter(edge, "ts", scanStart, 10 * day, rules)) == Set(11L))
    // the redundant bare-column conjunct reaches the parquet scan
    val plan = AgeOff.filter(
      graft.core.Tables.events(spark, sf001), "ts", scanStart, 10 * day,
      Seq(AgeOff.dataTypeRule(Seq("click"), 5 * day, typeCol = "event_type")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(ts"),
      s"expected a pushed ts bound in:\n$plan")
  }

  test("visibility-pattern rule claims by marking regex") {
    val vis = Seq((1L, "PII&OPS", "2024-01-20 12:00:00"),
      (2L, "PUBLIC", "2024-01-20 12:00:00"))
      .toDF("id", "visibility", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    // PII data ages off fast (2d); everything else keeps 30d
    val out = AgeOff.filter(vis, "ts", scanStart, 30 * day,
      Seq(AgeOff.visibilityRule("PII", 2 * day)))
    assert(ids(out) == Set(2L))
  }
}
