package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 second wave: TF-IDF/BM25 relevance ranking, BPE pair
  * statistics, and temperature-scaled domain sampling weights. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat dog cat"),
    (2L, "cat fish"),
    (3L, "bird bird dog")).toDF("doc_id", "text")

  test("rankTfIdf: quarter-bit idf, integer scores, total-order ties") {
    // N=3 → qlog4=6; df(cat)=df(dog)=2 → qlog4=4 → idf_q=2 each.
    // d1: 2*2 + 1*2 = 6 (2 terms); d2: 1*2 (cat); d3: 1*2 (dog).
    val got = TextOps.rankTfIdf(corpus, Seq("cat", "dog"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 6L), (2L, 1L, 2L), (3L, 1L, 2L)),
      got.toSeq.toString)
  }

  test("rankTfIdf: top-k cuts after the total order") {
    val got = TextOps.rankTfIdf(corpus, Seq("cat", "dog"), k = 2)
      .collect().map(_.getLong(0))
    // the score-2 tie breaks by doc_id: 2 stays, 3 is cut
    assert(got.toSeq == Seq(1L, 2L), got.toSeq.toString)
  }

  test("rankBm25: standard formula ranks the two-term doc first") {
    val got = TextOps.rankBm25(corpus, Seq("cat", "dog"), k = 10).collect()
    assert(got.map(_.getLong(0)).head == 1L)
    val scores = got.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted.reverse))
    // d1 carries both terms with tf(cat)=2 — strictly above the
    // single-term docs
    assert(scores(0) > scores(1))
  }

  test("bpePairs: word-frequency-weighted adjacent pairs, 1-char words dropped") {
    val docs = Seq((1L, "low low lower a")).toDF("doc_id", "text")
    val got = TextOps.bpePairs(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // vocab: low×2, lower×1, a×1 (no pairs). pairs: lo=2+1, ow=2+1,
    // we=1, er=1; order (count desc, pair asc)
    assert(got.toSeq == Seq(("lo", 3L), ("ow", 3L), ("er", 1L), ("we", 1L)),
      got.toSeq.toString)
  }

  test("lineDedup: global first-occurrence keeper, in-order reassembly") {
    val docs = Seq(
      (1L, "shared header\nunique one\nshared header"),
      (2L, "shared header\nunique two"),
      (3L, "  \nunique three")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 1 keeps the FIRST "shared header" and drops its own repeat;
    // doc 2 loses it entirely; doc 3's blank line never counts
    assert(got(1L)._1 == 3 && got(1L)._2 == 2)
    assert(got(2L)._1 == 2 && got(2L)._2 == 1)
    assert(got(3L)._1 == 1 && got(3L)._2 == 1)
    def md5Of(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got(1L)._3 == md5Of("shared header\nunique one"))
    assert(got(2L)._3 == md5Of("unique two"))
    assert(got(3L)._3 == md5Of("unique three"))
  }

  test("temperatureWeights: exact integer roots, α=1/2 and α=1/4") {
    val counts = Seq(("en", 900L), ("zh", 100L)).toDF("lang", "n")
    val rows = Sampling.temperatureWeights(counts, "lang", "n")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // isqrt: 30, 10 → S=40, T=1000
    assert(rows("en") == ((900L, 0.75, 0.75 * (1000.0 / 900.0))))
    assert(rows("zh") == ((100L, 0.25, 0.25 * (1000.0 / 100.0))))
    // the point of temperature: the low-resource domain repeats >1,
    // the high-resource one <1
    assert(rows("zh")._3 > 1.0 && rows("en")._3 < 1.0)
    val quarter = Sampling.temperatureWeights(counts, "lang", "n",
        alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    // isqrt(isqrt): 5, 3 → S=8
    assert(quarter("en") == 0.625 && quarter("zh") == 0.375)
    // flatter than α=1/2: the low-resource share grows as α shrinks
    assert(quarter("zh") > rows("zh")._2)
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(counts, "lang", "n", alpha = 0.3)
    }
  }
}
