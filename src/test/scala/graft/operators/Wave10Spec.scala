package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operator contracts: winnowed document fingerprints. */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  private val run = "the quick brown fox jumps over the lazy dog tonight"

  test("winnowing guarantee: a shared w+k-1 token run shares a fingerprint, edits elsewhere don't break it") {
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon zeta"),
      (2L, s"completely different opening words here $run and another tail entirely"),
      (3L, "unrelated text about spark catalyst optimizer plans and shuffles today"),
      (4L, "hi")) // < k tokens: no fingerprints
      .toDF("doc_id", "text")
    val fps = docs.select($"doc_id",
        TextOps.winnowFingerprints($"text", k = 3, w = 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // the 10-token shared run is ≥ w+k−1 = 6: at least one common fp
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert(fps(4L).isEmpty)
    // pair detection: (1,2) present, 3 pairs with nobody
    val pairs = TextOps.winnowedOverlapPairs(docs, k = 3, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // shared count equals the true fingerprint intersection
    val shared = TextOps.winnowedOverlapPairs(docs, k = 3, w = 4, minShared = 1)
      .filter($"id_a" === 1L && $"id_b" === 2L)
      .head().getAs[Long]("shared")
    assert(shared == (fps(1L) & fps(2L)).size)
  }

  test("hotFpCap drops boilerplate fingerprints before the join") {
    val boiler = "subscribe to our newsletter for updates every single day"
    val docs = (1L to 6L).map(i =>
        (i, s"$boiler unique body $i with its own words number$i here"))
      .toDF("doc_id", "text")
    // uncapped: every pair shares the boilerplate fingerprints
    val all = TextOps.winnowedOverlapPairs(docs, minShared = 1)
    assert(all.count() == 15) // C(6,2)
    // capped at 2: ANY fingerprint shared by ≥2 docs (the boilerplate
    // and every boundary gram) drops before the join, so no pair can
    // share anything
    val capped = TextOps.winnowedOverlapPairs(docs, minShared = 1,
      hotFpCap = Some(2))
    assert(capped.count() == 0)
  }
}
