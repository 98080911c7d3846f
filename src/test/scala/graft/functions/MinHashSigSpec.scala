package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native codegen'd MinHash expression must be bit-identical to the
  * declarative HOF form — same XXH64 seed, same (aᵢ,bᵢ) family, same
  * fold — or LSH buckets (and so candidate recall) silently change. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature equals the declarative signature") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different document about spark and catalyst plans"),
      (3L, "the quick brown fox jumps over the lazy dog again and again!"))
      .toDF("doc_id", "text")
    val sh = Dedup.hashedShingles(col("text"), 3).as("sh")
    val both = docs.select(col("doc_id"), sh)
      .select(col("doc_id"),
        MinHashSig.signature(col("sh"), 128).as("native"),
        Dedup.minhashSignature(col("sh"), 128).as("declarative"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("native simhash equals the declarative md5 form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst plans are declarative"),
      (3L, ""))
      .toDF("doc_id", "text")
    val rows = docs.select(
        Dedup.simhash(col("text")).as("native"),
        Dedup.simhashDeclarative(col("text")).as("declarative"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("null and empty shingle arrays are handled") {
    val df = Seq(Tuple1(Seq.empty[Long]), Tuple1(null.asInstanceOf[Seq[Long]]))
      .toDF("sh")
      .select(MinHashSig.signature(col("sh"), 8).as("sig"))
    val rows = df.collect()
    // empty array → all-MaxValue signature; null → null
    assert(rows(0).getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(rows(1).isNullAt(0))
  }
}
