package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 third wave: DSIR importance selection and the per-domain
  * frequency cap. */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  // two "dialects": en-flagged docs reuse the same bigrams, the others
  // use disjoint vocabulary — a doc written in the target dialect but
  // NOT flagged as target must outscore the off-target docs
  private def pool = Seq(
    (1L, "alpha beta alpha beta alpha", "en"),
    (2L, "alpha beta gamma alpha beta", "en"),
    (3L, "alpha beta alpha beta gamma", "xx"), // target-like, unflagged
    (4L, "zip zap zip zap zip zap", "xx"),
    (5L, "quux corge quux corge quux", "xx")).toDF("doc_id", "text", "lang")

  test("dsirSelect: target-like unflagged doc ranks above off-target docs") {
    val got = Sampling.dsirSelect(pool, col("lang") === "en", buckets = 64,
      k = 5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val byId = got.toMap
    // doc 3 shares the target bigrams → its score must beat 4 and 5
    assert(byId(3L) > byId(4L), got.toSeq.toString)
    assert(byId(3L) > byId(5L), got.toSeq.toString)
    // order is score desc then id asc
    val scores = got.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse), got.toSeq.toString)
  }

  test("dsirSelect: k cuts after the total order; rerun is identical") {
    val a = Sampling.dsirSelect(pool, col("lang") === "en", buckets = 64,
      k = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Sampling.dsirSelect(pool, col("lang") === "en", buckets = 64,
      k = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.length == 3)
    assert(a == b)
  }

  private def domains = (1L to 25L).map { i =>
    (i, if (i <= 18) "hot" else if (i <= 22) "warm" else "cold")
  }.toDF("doc_id", "source")

  test("domainCap: every domain at most cap; under-cap domains intact") {
    val got = Sampling.domainCap(domains, "source", cap = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perDomain = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perDomain("hot") == 4, perDomain.toString)
    assert(perDomain("warm") == 4, perDomain.toString)
    assert(perDomain("cold") == 3, perDomain.toString) // 3 < cap: all kept
    // n_domain carries the ORIGINAL sizes
    assert(got.filter(_._2 == "hot").forall(_._3 == 18L))
    assert(got.filter(_._2 == "cold").forall(_._3 == 3L))
  }

  test("domainCap: raising the cap yields a superset; rerun identical") {
    val k4 = Sampling.domainCap(domains, "source", cap = 4)
      .collect().map(_.getLong(0)).toSet
    val k8 = Sampling.domainCap(domains, "source", cap = 8)
      .collect().map(_.getLong(0)).toSet
    assert(k4.subsetOf(k8), (k4, k8).toString)
    val again = Sampling.domainCap(domains, "source", cap = 4)
      .collect().map(_.getLong(0)).toSet
    assert(again == k4)
  }

  test("domainCapOnePass: identical rows to domainCap at several caps") {
    for (cap <- Seq(1, 4, 8, 30)) {
      val a = Sampling.domainCap(domains, "source", cap = cap)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val b = Sampling.domainCapOnePass(domains, "source", cap = cap)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(a == b, s"cap=$cap\n a=$a\n b=$b")
    }
  }

  test("exactKeep: row set equals the exact() survivor semi-join") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "Alpha  beta GAMMA", "s2"), // same normalized content as 1
      (3L, "something else entirely", "s1"),
      (4L, "alpha beta gamma", "s3"),
      (5L, "fifth unique text here", "s2")).toDF("doc_id", "text", "source")
    val viaJoin = docs.join(
        Dedup.exact(docs).select(col("survivor_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val viaKeep = Dedup.exactKeep(docs)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(viaKeep == viaJoin, s"keep=$viaKeep join=$viaJoin")
    assert(viaKeep.map(_._1) == Set(1L, 3L, 5L))
  }

  test("splitAssignLeakFree: cluster members share a split; singletons match splitAssign") {
    // docs 1,2,3 form one near-dup cluster; 10,11 another; 20,21 are
    // singletons — ids chosen so plain per-doc assignment WOULD split
    // at least one cluster (the property the operator exists to forbid)
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val frs = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val got = Sampling.splitAssignLeakFree(ids, clusters, "doc_id", frs,
        salt = "lf")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(r => r._1 -> r._3).toMap
    // every cluster lands whole
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1, got.toSeq.toString)
    assert(byId(10L) == byId(11L), got.toSeq.toString)
    // the plain per-doc assignment DOES split cluster {1,2,3} under
    // this salt — the guarantee is not vacuous
    val plain = Sampling.splitAssign(ids, "doc_id", frs, salt = "lf")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(Set(plain(1L), plain(2L), plain(3L)).size > 1, plain.toString)
    // singletons (and each cluster) key exactly like splitAssign on the
    // cluster id = their own id for singletons
    assert(byId(20L) == plain(20L) && byId(21L) == plain(21L))
    // cluster_id carried: coalesced to self for singletons
    assert(got.filter(_._1 >= 20L).forall(r => r._2 == r._1))
  }

  test("splitAssignLeakFree: non-numeric ids keep DISTINCT singleton keys") {
    // a long-cast of these ids is null — the old keying collapsed every
    // unclustered doc onto one shared null cluster key (same bucket,
    // same split, and a cluster-key collision with each other)
    val ids = Seq("doc-a", "doc-b", "doc-c", "doc-d", "doc-e", "doc-f",
      "doc-g", "doc-h").toDF("doc_id")
    val clusters = Seq(("doc-a", "doc-a"), ("doc-b", "doc-a"))
      .toDF("doc_id", "cluster_id")
    val frs = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val got = Sampling.splitAssignLeakFree(ids, clusters, "doc_id", frs,
        salt = "lf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val byId = got.map(r => r._1 -> r._3).toMap
    // the cluster still lands whole
    assert(byId("doc-a") == byId("doc-b"), got.toSeq.toString)
    // singletons key on their OWN id — identical to plain splitAssign,
    // and NOT all on one split (the null-collapse symptom)
    val plain = Sampling.splitAssign(ids, "doc_id", frs, salt = "lf")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val singles = got.filter(r => r._1 >= "doc-c")
    assert(singles.forall(r => r._3 == plain(r._1)), got.toSeq.toString)
    assert(singles.map(_._3).toSet.size > 1, singles.toSeq.toString)
    // and each keeps its own id as its cluster key
    assert(singles.forall(r => r._2 == r._1), singles.toSeq.toString)
  }

  test("keepBestPerCluster: argmax by quality, ties by id, singletons survive") {
    val docs = Seq(
      (1L, "aaaa"), (2L, "aaaaaaaa"), (3L, "aaaa"), // cluster {1,2,3}: 2 wins
      (4L, "bbbb"), (5L, "bbbb"),                   // cluster {4,5}: tie → 4
      (9L, "solo")).toDF("doc_id", "text")
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepBestPerCluster(docs, cl, length(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((2L, 1L, 8L, 3L), (4L, 4L, 4L, 2L),
      (9L, 9L, 4L, 1L)), got.toSeq.toString)
  }

  test("preTokenCount: contractions, leading-space words, digit and punct runs") {
    val got = Seq((1L, "I don't like 42 pears!"), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.preTokenCount(col("text")).as("n"),
        TextOps.wsTokenCount(col("text")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // I | _don | 't | _like | _42 | _pears | ! → 7 pieces, 5 ws words
    assert(got.toSeq == Seq((1L, 7L, 5L), (2L, 0L, 0L), (3L, 0L, 0L)),
      got.toSeq.toString)
  }

  test("spanScrub: cross-doc 10-token spans cut, within-doc repeats kept") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta"),   // shared span + 4-token tail
      (2L, s"zig zag $span"),                  // shared span after 2 tokens
      (3L, "solo words only here none shared stay put now ok"),
      (4L, s"$span $span")).toDF("doc_id", "text") // cross-doc: all cut
    val got = Dedup.spanScrub(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc1: covered 0..9 → tail survives; doc2: covered 2..11 → "zig zag";
    // doc3: untouched; doc4: every window contains shared material → all cut
    assert(got == Seq(
      (1L, 14L, 10L, h("alpha beta gamma delta")),
      (2L, 12L, 10L, h("zig zag")),
      (3L, 10L, 0L, h("solo words only here none shared stay put now ok")),
      (4L, 20L, 20L, h(""))), got.toString)
  }

  test("domainCap: under-cap rows avoid the window (no sort on that path)") {
    val onlyUnder = Sampling.domainCap(domains.filter(col("source") === "cold"),
      "source", cap = 4)
    val plan = onlyUnder.queryExecution.executedPlan.toString
    // the under-cap leg is a broadcast join + filter; the only Window in
    // the tree sits on the OVER-cap leg, which is empty here — assert the
    // under-cap branch's rows don't flow through it by checking output
    assert(onlyUnder.collect().length == 3)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}
