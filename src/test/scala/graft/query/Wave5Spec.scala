package graft.query

import graft.SparkSpec
import graft.operators.TextOps
import graft.queries.StreamingQueries
import org.apache.spark.sql.functions._

/** Round-5 additions: PII redaction, repetition profiling, and the
  * streamed-vs-batch convergence of every StreamingQueries gate. */
class Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs every pattern kind and counts each once") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org then 192.168.001.7 " +
        "call 555-123-4567 pay 4111111111111111 done"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(Seq(col("doc_id")) ++ TextOps.piiCounts(col("text")) :+
      TextOps.redactPii(col("text")).as("red"): _*).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_email") == 1L && r1.getAs[Long]("n_ip") == 1L &&
      r1.getAs[Long]("n_phone") == 1L && r1.getAs[Long]("n_card") == 1L)
    assert(r1.getAs[String]("red") ==
      "mail <EMAIL> then <IP> call <PHONE> pay <CARD> done")
    val r2 = out(1)
    assert(r2.getAs[Long]("n_email") == 0L && r2.getAs[String]("red") == "no pii here at all")
  }

  test("a card number is attributed to card, never double-counted as phone/ip") {
    val df = Seq((1L, "4111111111111111")).toDF("doc_id", "text")
    val r = df.select(TextOps.piiCounts(col("text")): _*).head()
    assert(r.getAs[Long]("n_card") == 1L && r.getAs[Long]("n_phone") == 0L &&
      r.getAs[Long]("n_ip") == 0L)
  }

  test("repetition computes top shares the exploded way") {
    val df = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.repetition(df).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_tokens") == 4L)
    assert(r1.getAs[Double]("distinct_ratio") == 0.5)
    assert(r1.getAs[Double]("top_token_frac") == 0.75)
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 2.0 / 3.0) < 1e-12)
    val r2 = out(1)
    assert(r2.getAs[Double]("distinct_ratio") == 1.0 &&
      r2.getAs[Double]("top_bigram_frac") == 0.5)
    val r3 = out(2) // empty text: defined, not null
    assert(r3.getAs[Long]("n_tokens") == 0L &&
      r3.getAs[Double]("distinct_ratio") == 1.0 &&
      r3.getAs[Double]("top_token_frac") == 0.0)
  }

  test("record-id decorations fail loudly when the key columns are absent") {
    val df = Seq((1L, "x")).toDF("uid", "v")
    val e = intercept[graft.jexl.PolicyException] {
      new ShardQueryLogic().query(df, "V == 'x'",
        QueryParams(includeRecordId = true))
    }
    assert(e.getMessage.contains("INCLUDE_RECORD_ID"))
    val e2 = intercept[graft.jexl.PolicyException] {
      new ShardQueryLogic().query(df, "V == 'x'",
        QueryParams(includeDatatypeAsField = true))
    }
    assert(e2.getMessage.contains("INCLUDE_DATATYPE_AS_FIELD"))
  }

  test("hierarchy fields: direct children only, roots get null parent") {
    val docs = Seq("1", "1.1", "1.2", "1.2.1", "2").toDF("uid")
    val out = graft.operators.DocumentTree.withHierarchyFields(docs)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getAs[Long]("CHILD_COUNT"))).toMap
    assert(out("1") == (None, 2L))     // 1.1 and 1.2 — NOT 1.2.1
    assert(out("1.2") == (Some("1"), 1L))
    assert(out("1.2.1") == (Some("1.2"), 0L))
    assert(out("2") == (None, 0L))
  }

  // --- streamed results must converge to their batch equivalents --------

  test("stream_windowed equals the batch hourly group-by") {
    val streamed = StreamingQueries.streamWindowed(spark, sf001)
    val batch = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream_ingest sink summary equals the batch long-layout summary") {
    val streamed = StreamingQueries.streamIngest(spark, sf001)
    val batch = graft.ingest.Ingest.toLong(
        spark.read.parquet(s"$sf001/events.parquet")
          .withColumn("event_date", to_date(col("ts"))).drop("ts"),
        "event_id", "events", "event_date")
      .groupBy("field")
      .agg(count(lit(1)).as("n_values"),
        countDistinct(col("uid")).as("n_uids"),
        countDistinct(col("shard_date")).as("n_days"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream_uid_state carries exact counts across four micro-batches") {
    val streamed = StreamingQueries.streamUidState(spark, sf001)
    val batch = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy(col("user_id").cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"),
        least(countDistinct(col("event_id")), lit(20L)).as("sample_size"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream_sessions equals the batch session_window aggregation") {
    val streamed = StreamingQueries.streamSessions(spark, sf001)
    val batch = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"), col("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
