package graft.query

import graft.SparkSpec
import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** FieldIndexHole semantics (FieldIndexHoleDataIngest fixtures in
  * reference tests): a field indexed only over part of the date range
  * must still answer queries over the whole range — indexed dates prune
  * through the index, hole dates fall back to an event scan. */
class IndexHolesSpec extends SparkSpec {
  import spark.implicits._

  // 4 days of events; COLOR values drift per day
  private lazy val wide = Seq(
    (1L, "2024-01-01 10:00:00", "red"),
    (2L, "2024-01-02 10:00:00", "blue"),
    (3L, "2024-01-03 10:00:00", "red"),
    (4L, "2024-01-04 10:00:00", "red"))
    .toDF("id", "ts", "color")
    .withColumn("ts", col("ts").cast("timestamp"))

  private lazy val long = Ingest.toLong(wide, "id", "t", "ts")
  private lazy val freq = Ingest.fieldFrequency(long)
  // index built only from the first two days — days 3-4 are holes
  private lazy val partialIndex = Ingest.globalIndex(
    long.filter(col("shard_date") <= lit("2024-01-02")))

  test("holes are the frequency dates the index lacks") {
    val h = IndexHoles.holes(freq.filter(col("field") === "color"),
        partialIndex.filter(col("field") === "color"))
      .collect().map(_.getAs[java.sql.Date]("shard_date").toString).sorted
    assert(h.toSeq == Seq("2024-01-03", "2024-01-04"))
  }

  test("pruned scan finds matches in hole dates the index never saw") {
    val out = IndexHoles.prunedScan(wide, to_date(col("ts")),
        freq, partialIndex, field = "color", value = "red")
      .filter(col("color") === "red")
      .collect().map(_.getAs[Long]("id")).sorted
    // ids 3 and 4 exist only in hole dates; an index-only prune loses them
    assert(out.toSeq == Seq(1L, 3L, 4L))
  }

  test("index-only prune without hole fallback misses hole matches") {
    val hitDates = partialIndex
      .filter(col("field") === "color" && col("value") === "red")
      .select(col("shard_date"))
    val out = wide.join(broadcast(hitDates),
        to_date(col("ts")) === col("shard_date"), "left_semi")
      .filter(col("color") === "red")
      .collect().map(_.getAs[Long]("id")).sorted
    assert(out.toSeq == Seq(1L)) // the motivation for hole fallback
  }
}
