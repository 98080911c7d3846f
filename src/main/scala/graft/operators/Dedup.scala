package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline:
  *
  *  - exact: content-hash groupBy (one shuffle on the hash).
  *  - n-gram Jaccard: shared-shingle candidate generation (inverted-index
  *    join — finds every pair with ≥1 common shingle, i.e. every pair with
  *    Jaccard > 0) + exact set-overlap verify. No O(n²) cross join.
  *  - MinHash + LSH: banded signature bucket-join for scale, exact verify.
  *  - SimHash: 64-bit sign-of-projection fingerprint, hamming-ball
  *    candidates, exact verify.
  *
  * All candidate paths verify with EXACT shingle-set intersection/union
  * counts, so outputs are integer-deterministic (oracle-friendly) and the
  * probabilistic stage only affects recall, not precision.
  */
object Dedup {

  /** Distinct n-token shingles as "t1 … tn" strings, derived straight
    * off the space-normalized token string with ONE overlapping-window
    * lookahead regex (the same codegen-only move as
    * [[graft.operators.TextOps.bigrams]]): the previous nested
    * transform/slice form built every window as an array copy under two
    * higher-order functions, which dropped the whole projection out of
    * whole-stage codegen — and shingling is the front of every
    * jaccard/minhash/simhash/decontaminate/incremental pipeline.
    * Output order (first occurrence) and content are identical. */
  def shingles(text: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
    array_distinct(regexp_extract_all(norm,
      lit(s"(?=\\b((?:[a-z0-9]+ ){${n - 1}}[a-z0-9]+))"), lit(1)))
  }

  /** Shingle sets carried as xxhash64 values (`array<bigint>`): every
    * downstream operation — document frequency, prefix self-join, exact
    * intersect/union verify — becomes integer work instead of string
    * hashing/compares. 64-bit collisions within a ~50-element set are
    * ~1e-13 per document: the exact-count verify contract is preserved at
    * any realistic corpus size (and the verify join IS the 100 TB hot
    * path, so this is where the cycles go). */
  def hashedShingles(text: Column, n: Int): Column =
    transform(shingles(text, n), s => xxhash64(s))

  /** Exact dedup: one survivor (min id) per identical normalized text.
    * groupBy on the 128-bit content hash — the only shuffle, keyed small. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** The keep-side of [[exact]]: the input ROWS whose doc survives
    * (id == min id of its identical-content group), via ONE
    * fingerprint-keyed window — no survivor-id join back to the corpus,
    * so a composed pipeline's upstream stages execute once instead of
    * once per join probe. The fingerprint is a pre-shuffle projection
    * and the text column prunes below the exchange when the caller
    * doesn't select it, so the shuffle carries ids + 128 bits per row.
    * Row set equals `docs` semi-joined on [[exact]]'s survivor_id
    * (spec-pinned in Wave9Spec). */
  def exactKeep(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprint(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** All pairs (idA < idB) with shingle-set Jaccard ≥ threshold, reported
    * as exact integer (intersection, union) sizes.
    *
    * Candidate generation is the EXACT prefix-filtering inverted-index
    * join ("Scaling Up All Pairs Similarity Search", Bayardo et al.):
    * under a global rarest-first shingle order, a doc only indexes its
    * first |A| − ⌈t·|A|⌉ + 1 shingles — any pair with J ≥ t must collide
    * inside both prefixes — plus the size-ratio filter
    * (t·|B| ≤ |A| ≤ |B|/t). Prefix shingles are by construction the
    * LOW-document-frequency ones, so bucket skew dies without a lossy
    * stop-shingle cap, and the verify stage re-checks exactly, so the
    * output equals the quadratic oracle. */
  /** Spread the docs across the cluster BEFORE the interpreted
    * shingle/signature derivation — see [[graft.core.Spread]] for why a
    * bare repartition is not enough (projection/filter pushdown moves the
    * expensive expressions back below the shuffle). */
  private def spread(docs: DataFrame): DataFrame =
    graft.core.Spread(docs.select(col("doc_id"), col("text")))

  /** (doc_id, sh) shingle-hash frame — the shared first stage of every
    * signature path (LSH, SimHash needle verify, the dedup store).
    * Shingle-free docs (shorter than n tokens) are dropped: they can
    * never reach the Jaccard threshold. */
  private def shingled(docs: DataFrame, n: Int): DataFrame =
    spread(docs)
      .select(col("doc_id"), hashedShingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)

  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val withSh = spread(docs)
      .select(col("doc_id"), hashedShingles(col("text"), n).as("sh"))
      .persist()
    // Materialize each persisted frame BEFORE its multi-consumer join:
    // AQE submits a join's input stages CONCURRENTLY, and on a cold
    // cache every stage races to compute the full subtree — the shingle
    // pass and the prefix window would otherwise evaluate 2-3× in
    // parallel (measured on the simhash sibling: twin 1.4 s stages for
    // one subtree). One count turns the race into cache reads.
    withSh.count()
    val inverted = withSh
      .select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    val dfreq = inverted.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    // `prefix` feeds BOTH sides of the candidate self-join and `cand`
    // feeds the verify join: persist each so the scan→explode→dfreq-join→
    // window subtree evaluates exactly once (the one-evaluation rule
    // already applied to the MinHash path; measured 218 s → ~56 s before
    // the integer-verify switch).
    val prefix = inverted.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "sz", "shingle")
      .persist()
    prefix.count() // one evaluation before the concurrent self-join sides
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.sz") >= lit(threshold) * col("y.sz") &&
          col("y.sz") >= lit(threshold) * col("x.sz"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .persist()
    eagerRelease(verifyJaccard(cand, withSh, threshold),
      Seq(withSh, prefix, cand))
  }

  /** The [[incrementalNearDupPairs]] cache contract, shared by every
    * batch pair op: materialize the (pair-bounded) RESULT so the
    * intermediate caches release in-op — a long-lived curation session
    * holds exactly one cached frame per call and frees it with
    * `result.unpersist()` (CacheHygieneSpec pins that nothing else
    * stays behind). Call-site audit (r10): every first-party consumer
    * (gates via Verify/Bench, probes) runs under a per-query
    * `spark.catalog.clearCache()`, so the result cache lives exactly
    * one query; embedding callers own the unpersist per this contract. */
  private def eagerRelease(result: DataFrame,
                           intermediates: Seq[DataFrame]): DataFrame = {
    val out = result.persist()
    out.count()
    intermediates.foreach(_.unpersist())
    out
  }

  /** Exact verify of candidate pairs against shingle sets. */
  private def verifyJaccard(cand: DataFrame, withSh: DataFrame,
                            threshold: Double): DataFrame = {
    val shA = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cand.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("uni") > 0 &&
        col("inter").cast("double") >= col("uni").cast("double") * threshold)
      .select("id_a", "id_b", "inter", "uni")
  }

  /** Exact-substring duplication profile ("Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022 — ExactSubstr): a
    * k-token span occurring verbatim in ≥2 documents marks both as
    * carrying duplicated text. Reported per document as exact integer
    * counts (n_spans, n_dup_spans) + one IEEE division, so the profile is
    * engine-deterministic.
    *
    * The suffix-array of the paper collapses, in Spark terms, to an
    * inverted index over k-token windows: distinct spans per doc →
    * groupBy(span) document frequency → df ≥ 2 filter → doc-keyed count.
    * Two map-side-combined shuffles keyed on the 128-bit span hash; the
    * df filter keeps the join side to actually-shared spans.
    *
    * `hotSpanCap` is the 100 TB guard: boilerplate (license headers,
    * nav chrome) can put ONE span in millions of documents, and every
    * occurrence of that span lands on a single reducer in the
    * doc-count join — a skew cliff that grows with corpus size, not
    * with genuine duplication. A span with df ≥ cap is a STOP SPAN
    * (the stopword analog, and the same clip discipline as the
    * reference's Uid.List 20-cap): it stops counting as duplication —
    * ubiquity is boilerplate, not copying — and, because the clip
    * happens at the df AGGREGATE (row per distinct span), the join
    * never fans it out; wall time stays flat as a hot span's df grows
    * (ScaleProbe6Main: 10× hot-df at ~1× wall). Default uncapped. */
  def spanProfile(docs: DataFrame, k: Int = 10,
                  hotSpanCap: Long = Long.MaxValue): DataFrame = {
    // the shingle derivation is the expensive interpreted subtree — one
    // evaluation, everything downstream reads the persisted arrays
    val withSp = spread(docs)
      .select(col("doc_id"), shingles(col("text"), k).as("sp"))
      .persist()
    // one shingle pass before the concurrent consumers (df aggregate,
    // per-doc join, profile side) race on the cold cache; the derived
    // explode+md5 `spans` feeds two of them, so it persists too and
    // releases with the profile's eagerRelease
    withSp.count()
    val spans = withSp
      .select(col("doc_id"), explode(col("sp")).as("span"))
      .select(col("doc_id"), md5(col("span")).as("h"))
      .persist()
    spans.count()
    val shared = spans.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") < hotSpanCap)
    val perDoc = spans.join(shared, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    val profile = withSp
      .select(col("doc_id"), size(col("sp")).cast("long").as("n_spans"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          coalesce(col("n_dup_spans"), lit(0L)).cast("double")
            / col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
    eagerRelease(profile, Seq(withSp, spans))
  }

  /** Exact-substring span REMOVAL (the other half of Lee et al. —
    * [[spanProfile]] measures, this rewrites): every token covered by a
    * k-token window whose content also appears in ANOTHER document is
    * cut, and the scrubbed text is reassembled from the survivors. The
    * all-copies-removed policy (vs the paper's keep-one) is the
    * decontamination-grade scrub: cross-document verbatim material is
    * boilerplate or contamination, and which copy was "first" is
    * order-dependent — removing all of them keeps the output a pure
    * function of the corpus.
    *
    * Relational end-to-end: positional windows hash in one projection
    * over the persisted token arrays, cross-doc spans fall out of the
    * df aggregate (min(doc) ≠ max(doc) — no countDistinct), coverage is
    * a bounded k-fan explode of ONLY the duplicated windows, survivors
    * are one anti-join, and the rebuild is a per-doc sort+fold. Every
    * shuffle is keyed by the 128-bit span hash or the doc id; nothing
    * is all-pairs. `hotSpanCap` clips boilerplate-ubiquitous spans at
    * the aggregate exactly like [[spanProfile]]. */
  def spanScrub(docs: DataFrame, k: Int = 10,
                hotSpanCap: Long = Long.MaxValue): DataFrame = {
    val toks = spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .persist()
    // one token pass before the three concurrent consumers (window
    // derivation, survivor posexplode, totals side) race on the cache
    toks.count()
    // (doc_id, window start, span hash): windows come from ONE
    // overlapping-window lookahead regex on the re-joined token string
    // (the same codegen-only move as shingles()/bigrams() — the
    // previous transform/slice loop built every window as an array copy
    // under an interpreted HOF); window i starts at token i, so the
    // posexplode index IS the span position, and the md5 hashes the
    // identical "t1 … tk" string post-explode
    val wins = toks
      .select(col("doc_id"), posexplode(
        regexp_extract_all(array_join(col("toks"), " "),
          lit(s"(?=\\b((?:[a-z0-9]+ ){${k - 1}}[a-z0-9]+))"),
          lit(1))).as(Seq("p", "w")))
      .select(col("doc_id"), col("p"), md5(col("w")).as("h"))
      .persist()
    wins.count() // the window regex feeds BOTH the df aggregate and the
                 // coverage join — one evaluation, not two racing stages
    val crossDoc = wins.groupBy("h")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"),
        count(lit(1)).as("df"))
      .filter(col("d0") =!= col("d1") && col("df") < hotSpanCap)
      .select("h")
    val covered = wins.join(crossDoc, "h")
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (k - 1)))
        .as("pos"))
      .distinct()
    val kept = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ")).as("scrubbed_md5"))
    val out = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_removed"),
        coalesce(col("scrubbed_md5"), md5(lit(""))).as("scrubbed_md5"))
      // EAGER, like incrementalNearDupPairs: materialize the per-doc
      // result (4 scalar columns — orders smaller than the token
      // arrays) so the token cache releases IN-OP instead of leaking a
      // cached frame per invocation in a long-lived session; the caller
      // holds exactly one cached frame and frees it with
      // `result.unpersist()`.
      .persist()
    out.count()
    toks.unpersist()
    wins.unpersist()
    out
  }

  /** MinHash prime modulus (2^31 − 1, Mersenne): products h·aᵢ stay below
    * 2^63 for 32-bit h, so ANSI-mode long arithmetic never overflows. */
  private val MinhashP = 2147483647L

  /** MinHash signature in ONE pass over the shingle array: a single
    * xxhash64 per shingle (vs `numHashes` string hashes in the naive
    * form — the expensive part), then `numHashes` derived hashes
    * hᵢ(s) = (aᵢ·h + bᵢ) mod p with per-i constants from a seeded PRNG.
    * The (aᵢ, bᵢ) family is pairwise independent ACROSS i — an affine
    * h1 + i·h2 shortcut is measurably correlated within an LSH band and
    * loses recall. Constants ride along as one array literal; the fold is
    * cheap long arithmetic inside a single `aggregate`. */
  /** Near-dup CLUSTERING: connected components over a near-dup pair
    * graph (id_a, id_b), labeling every member with its component's
    * minimum doc id — the survivor a dedup sweep keeps. Completes the
    * dedup family: pairs (ngram/minhash/simhash) → components → one
    * representative per component.
    *
    * The pair graph is orders of magnitude smaller than the corpus it
    * came from (it holds only near-duplicates), so the common case is a
    * policy-bounded driver union-find — `driverBound` pairs ≈ 16 MB at
    * the 1M default, the same planner-side materialization pattern as
    * NeedleScan's range collect. Past the bound it falls back to
    * distributed min-label propagation: labels start as self, each
    * round every node takes the min label among itself and neighbors
    * (one equi-join + groupBy over the EDGE list only — the corpus
    * never enters the loop), converging in component-diameter rounds
    * with a single driver action per round and a maxIter backstop.
    *
    * Cache contract: the input `pairs` frame is fully consumed in BOTH
    * paths (edge count + collect, or the persisted edge loop), so a
    * caller holding a persisted pair frame may unpersist it as soon as
    * this returns. The RESULT is unpersisted on the driver-bound path
    * and persisted+counted on the distributed fallback (the label loop's
    * cache must release in-op; returning a lazy view over it would
    * strand a cache no caller could reach) — callers that compose the
    * result lazily own `result.unpersist()` once their plan has
    * consumed it, same as every pair op. */
  def clusters(pairs: DataFrame, maxIter: Int = 20,
               driverBound: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edgesOnce = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .persist()
    val nPairs = edgesOnce.count()

    if (nPairs <= driverBound) {
      // Union-find keeping the min id as every root (union attaches the
      // larger root under the smaller, so root == component minimum).
      val edgeRows = edgesOnce.collect().map(r => (r.getLong(0), r.getLong(1)))
      edgesOnce.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edgeRows.foreach { case (x, y) =>
        val (a, b) = (find(x), find(y))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val nodes = edgeRows.flatMap(p => Seq(p._1, p._2)).distinct
      val out = nodes.map(x => org.apache.spark.sql.Row(x, find(x)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, numSlices = 1), schema)
    } else {
      val edges = edgesOnce
        .unionAll(edgesOnce.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).persist()
      labels.count()
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val next = edges
          .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
          .select(col("src").as("id"), col("nl").as("label"))
          .unionAll(labels)
          .groupBy("id").agg(min("label").as("label"))
          .persist()
        // one action per round: the change count both materializes
        // `next` into its cache and decides convergence
        val changed = next
          .join(labels.select(col("id"), col("label").as("prev")), "id")
          .filter(col("label") < col("prev")).count()
        converged = changed == 0
        labels.unpersist()
        labels = next
        it += 1
      }
      // materialize-and-release: returning a lazy view over the
      // persisted `labels` would strand that cache (a caller's
      // unpersist on the RETURNED frame cannot reach it) — so the
      // result persists under its own plan (caller-owned, like every
      // pair op) and the loop cache frees here
      val out = labels
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .persist()
      out.count()
      labels.unpersist()
      edges.unpersist(); edgesOnce.unpersist()
      out
    }
  }

  /** Quality-aware dedup collapse: instead of keeping each near-dup
    * cluster's min-id member, keep its BEST member under an integer
    * quality score (ties by id) — the curation rule real pipelines
    * apply after clustering (drop the mangled OCR copy, keep the clean
    * one). Unclustered documents survive as their own singleton cluster.
    *
    * 100 TB shape: the cluster table is bounded by near-dup density
    * (it only holds docs that appeared in a pair), the per-cluster
    * argmax is a rank window over clusters that are small by
    * construction, and the untouched majority of the corpus takes the
    * anti-join path — one shuffle on the id, no sort. `quality` must be
    * an integer column expression over `docs` so the argmax reproduces
    * on any engine. */
  def keepBestPerCluster(docs: DataFrame, clusterDf: DataFrame,
                         quality: Column,
                         idCol: String = "doc_id"): DataFrame = {
    val q = docs.select(col(idCol), quality.cast("long").as("quality"))
    val best = clusterDf.join(q, idCol)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality").desc, col(idCol))))
    val sizes = clusterDf.groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("n_members"))
    best.filter(col("rk") === 1).drop("rk").join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id").cast("long").as("cluster_id"),
        col("quality"), col("n_members"))
      .unionByName(
        q.join(clusterDf.select(col(idCol)), Seq(idCol), "left_anti")
          .select(col(idCol), col(idCol).cast("long").as("cluster_id"),
            col("quality"), lit(1L).as("n_members")))
  }

  /** Benchmark decontamination (training-data hygiene, net-new beyond
    * the reference): report every corpus document sharing at least
    * `minHits` n-gram shingles with a benchmark/eval corpus, so eval
    * data can be scrubbed from training sets before a run.
    *
    * 100 TB shape: the benchmark side is small by nature (eval suites
    * are thousands of documents, not billions), so its DISTINCT shingle
    * hashes broadcast — the corpus is read ONCE, each document's
    * shingles probe the broadcast set map-side, and only matching
    * (doc, shingle) pairs reach the per-doc counting shuffle (the
    * contaminated minority). Never a corpus×benchmark join. */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      minHits: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bench = benchmark
      .select(explode(hashedShingles(col(textCol), n)).as("sh")).distinct()
    spread(docs)
      .select(col(idCol), explode(hashedShingles(col(textCol), n)).as("sh"))
      .join(broadcast(bench), "sh")
      // shingles() is array_distinct per doc → count = |intersection|
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  def minhashSignature(sh: Column, numHashes: Int): Column = {
    val rnd = new scala.util.Random(42)
    val ab: Seq[(Long, Long)] = Seq.fill(numHashes)(
      (1L + rnd.nextLong(MinhashP - 1), rnd.nextLong(MinhashP)))
    val abLit = typedLit(ab.map { case (a, b) => (a, b) })
    val hashes = transform(sh, s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL)))
    aggregate(hashes,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, abLit, (m, c) =>
        least(m, pmod(pmod(h * c.getField("_1"), lit(MinhashP)) +
          c.getField("_2"), lit(MinhashP)))))
  }

  /** (doc_id, band, bucket) rows from a shingled frame: the codegen'd
    * MinHash signature ([[graft.functions.MinHashSig]] — bit-identical
    * to the declarative form, MinHashSigSpec) sliced into `bands`
    * hashed band keys. Shared by the one-shot pair join and the
    * write-once signature store. */
  private def bandTable(withSh: DataFrame, numHashes: Int,
                        bands: Int): DataFrame = {
    val rows = numHashes / bands
    withSh.withColumn("mh",
        graft.functions.MinHashSig.signature(col("sh"), numHashes))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("mh"), b * rows + lit(1), lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** MinHash-LSH near-dup pairs: banded bucket join for candidates, exact
    * Jaccard verify (same output contract as [[ngramJaccardPairs]]).
    * bands × rowsPerBand = numHashes; P(candidate | j) = 1-(1-j^rows)^bands.
    * Defaults catch j ≥ 0.8 pairs with ~1-1e-13 probability. */
  def minhashLshPairs(docs: DataFrame, n: Int, threshold: Double,
                      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    // Persist shingles + banded signatures: higher-order aggregates are
    // interpreted (non-codegen), so each must be evaluated exactly once —
    // not once per side of the self-join plus twice more in the verify
    // join. At lake scale the analog is a checkpointed signatures table
    // maintained incrementally at ingest.
    val withSh = shingled(docs, n).persist()
    val banded = bandTable(withSh, numHashes, bands).persist()
    // one pass populates BOTH caches (banded reads through withSh)
    // before the concurrent self-join + verify stages race on them
    banded.count()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .persist()
    eagerRelease(verifyJaccard(cand, withSh, threshold),
      Seq(withSh, banded, cand))
  }

  /** 64-bit SimHash over tokens: per-bit weighted sign accumulation,
    * computed per-row with higher-order aggregates (no shuffle, no UDF).
    * Packs sign bits of the accumulated vote vector into a BIGINT.
    *
    * The per-token 64 vote bits derive from the token's md5 — two 60-bit
    * halves of the hex digest (lanes 0-31 from the first, 32-63 from the
    * second) — instead of xxhash64: md5 is bit-identical across engines,
    * which makes the ENTIRE pipeline (signature → banding → hamming →
    * verify) replicable in the DuckDB oracle, upgrading dedup_simhash
    * from a rows-only check to a full hash match. Cost: one md5 per
    * token, bound ONCE via the 1-element `transform` lambda-let (same
    * trick as [[shingles]] — referencing it inside the 64-lane fold would
    * re-hash per lane). */
  def simhash(text: Column): Column =
    graft.functions.SimHashSig.signature(TextOps.tokens(text))

  /** Declarative HOF form of [[simhash]] — retained as the reference
    * implementation the native kernel is spec-checked against
    * (SimHashSigSpec); same math, interpreted evaluation. */
  def simhashDeclarative(text: Column): Column = {
    val counts = aggregate(
      TextOps.tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => element_at(transform(array(struct(
          conv(substring(md5(t), 1, 15), 16, 10).cast("long").as("h1"),
          conv(substring(md5(t), 16, 15), 16, 10).cast("long").as("h2"))), h =>
        zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
          a - 1 + when(i < 32,
              call_function("shiftright", h.getField("h1"), i))
            .otherwise(call_function("shiftright", h.getField("h2"), i - 32))
            .bitwiseAND(lit(1L)) * 2)), 1))
    // fold the 64 sign bits into one long: acc = acc | (cnt>0 ? 1L<<i : 0)
    // (call_function: the SQL shiftleft takes a Column shift amount,
    // unlike the Scala wrapper)
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (cnt, i) => when(cnt > 0,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: hamming-distance ≤ `maxHamming` candidates
    * via band blocks (8×8-bit bands — any pair within hamming 7 shares a
    * band by pigeonhole), exact Jaccard verify so precision is 1.0.
    *
    * NOTE on recall: simhash over unigram tokens is noisy for short
    * documents (bits whose vote count is near zero flip under single-token
    * edits — a 0.99-Jaccard pair can sit at hamming >20), so unlike
    * [[minhashLshPairs]] this operator does NOT promise the exact-Jaccard
    * result set; it is the cheap-fingerprint tradeoff point. */
  def simhashPairs(docs: DataFrame, n: Int, threshold: Double,
                   maxHamming: Int = 7, needleBound: Int = 100000): DataFrame = {
    val sig = spread(docs).select(col("doc_id"), simhash(col("text")).as("sim"))
    // 8 bands of 8 bits: hamming ≤ 7 ⇒ at least one band identical.
    // Persisted for the same one-evaluation reason as minhashLshPairs.
    val banded = sig.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("sim"), b * 8).bitwiseAND(lit(0xFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist()
    // materialize the cache BEFORE the self-join: AQE submits the join's
    // two input stages CONCURRENTLY, and on a cold cache both race to
    // compute the full signature subtree (measured: the two sides ran
    // 1.47 s + 1.46 s in parallel — the md5-token pass paid twice); one
    // cheap count turns the race into two cache reads (guide §2.4: one
    // evaluation per expensive subtree).
    banded.count()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b")
      .persist()
    // Shingle only the CANDIDATE docs for the verify stage: candidates
    // are a small minority by construction (the banding already
    // collapsed the corpus), so their ids materialize on the driver and
    // the shingle pass becomes a pushed-down needle scan — the corpus
    // never pays the n-gram derivation twice. Past the policy bound the
    // full-corpus frame returns (semi-join shape, still correct).
    // id-type-agnostic collect (doc ids may be int/long/string)
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct().limit(needleBound + 1).collect().map(_.get(0))
    val needleDocs =
      if (candIds.length <= needleBound)
        docs.filter(col("doc_id").isin(candIds.toIndexedSeq: _*))
      else docs
    val withSh = spread(needleDocs)
      .select(col("doc_id"), hashedShingles(col("text"), n).as("sh"))
      .persist()
    withSh.count() // one shingle pass before the verify join's two sides
    eagerRelease(verifyJaccard(cand, withSh, threshold),
      Seq(banded, cand, withSh))
  }

  // ---- Incremental dedup: a write-once signature store ---------------
  // The ingest-pipeline shape: a corpus's shingle hashes + LSH band
  // table are written ONCE; each new batch dedups against the STORE —
  // the band join broadcasts the (small) new batch against one scan of
  // the stored bands, and the exact verify reads stored shingles for
  // candidate partners only (semi-join prune). The old corpus is never
  // re-shingled and never re-paired, exactly like
  // [[graft.operators.VectorOps.pqAppendToIndex]] on the ANN side (and
  // the reference's new shards joining the global index without a
  // rebuild). At lake scale the band table would be written bucketed by
  // (band, bucket) so even re-runs of LARGE batches sort-merge without
  // a shuffle of the stored side.

  /** Resolve a store's signature params once (e.g. at stream start) as
    * `Some(params)` for [[streamBatchNearDup]] — absent store → None, so
    * a caller constructed before seeding falls back to the per-batch
    * read. Every append/query derives its signatures from the STORE's
    * params, so a mismatch — which would silently produce near-empty
    * candidate sets — cannot happen WHILE the store lives. The guarantee
    * is conditional on not deleting and re-seeding the store with
    * different (n, numHashes, bands) under a live writer that cached
    * these params (ADVICE r13): re-seeding is an offline operation, like
    * [[compactDedupStore]] — stop the stream first. */
  private[graft] def readStoreParams(spark: org.apache.spark.sql.SparkSession,
                                     dir: String): Option[(Int, Int, Int)] =
    scala.util.Try(storeParams(spark, dir)).toOption

  private def storeParams(spark: org.apache.spark.sql.SparkSession,
                          dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/params").head()
    (r.getAs[Int]("n"), r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"))
  }

  /** Band rows first, shingles second: after a partial failure, a doc
    * with bands but no shingles merely misses pairs until the append is
    * retried (band-row duplicates collapse in the candidate
    * `.distinct()`), whereas duplicated SHINGLE rows would corrupt the
    * verify join forever. Retrying the whole append is therefore safe.
    * Flat-layout writes only — the batched streaming layout goes
    * through [[graft.core.BatchStore]]. */
  private def writeStoreParts(withSh: DataFrame, dir: String, numHashes: Int,
                              bands: Int, mode: String): Unit = {
    bandTable(withSh, numHashes, bands)
      .write.mode(mode).parquet(s"$dir/bands")
    withSh.write.mode(mode).parquet(s"$dir/shingles")
  }

  private def writeParams(spark: org.apache.spark.sql.SparkSession,
                          dir: String, n: Int, numHashes: Int,
                          bands: Int): Unit =
    spark.range(1)
      .select(lit(n).as("n"), lit(numHashes).as("num_hashes"),
        lit(bands).as("bands"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")

  /** Write the signature store for a corpus: `params` (one row),
    * `shingles` (doc_id, sh) and `bands` (doc_id, band, bucket). */
  def writeDedupStore(docs: DataFrame, dir: String, n: Int = 3,
                      numHashes: Int = 128, bands: Int = 32): Unit = {
    writeParams(docs.sparkSession, dir, n, numHashes, bands)
    val withSh = shingled(docs, n).persist()
    try writeStoreParts(withSh, dir, numHashes, bands, "overwrite")
    finally withSh.unpersist()
  }

  /** Offline store maintenance: rewrite the append-splintered `bands`
    * and `shingles` tables into `filesPerTable` large files each. Every
    * [[appendDedupStore]] adds one part-file set, so months of live
    * batches splinter the store and each incremental probe pays
    * per-file open overhead on the stored-bands read. Row content is
    * unchanged — identical pair results, pinned in Wave7Spec with a
    * part-file-count assertion. Write-to-temp then RENAME-ONLY swap
    * ([[graft.core.Fs.swapDir]]: src→src.old, tmp→src, drop src.old —
    * no crash window leaves the table absent; readers recover a
    * half-swapped dir via [[graft.core.Fs.recoverSwap]]); run while no
    * append is in flight (the same offline discipline as a major
    * compaction, and as [[graft.operators.VectorOps.pqCompactIndex]]). */
  def compactDedupStore(spark: org.apache.spark.sql.SparkSession,
                        dir: String, filesPerTable: Int = 1): Unit =
    // batched streaming layout ([[seedDedupStoreBatched]]) collapses to
    // ONE `batch=compacted` partition dir per table (flattening `batch`
    // into a data column would mix files and k=v dirs and break
    // partition discovery); the flat layout compacts in place. The
    // BatchStore horizon marker makes a batch replayed after compaction
    // SKIP re-registration instead of coexisting with its compacted
    // copy — run while no append is in flight all the same.
    for (t <- Seq("bands", "shingles"))
      graft.core.BatchStore.compact(spark, s"$dir/$t", filesPerTable)

  /** Register a processed batch as part of the corpus: its signatures
    * append to the store, so the NEXT batch dedups against it too.
    * Signature params come from the store itself. Caller contract:
    * append AFTER consuming the batch's [[incrementalNearDupPairs]]
    * (the pair frame reads the store), and never append ids already
    * stored. A failed append may be retried whole (see
    * [[writeStoreParts]]). */
  def appendDedupStore(newDocs: DataFrame, dir: String): Unit = {
    val (n, numHashes, bands) = storeParams(newDocs.sparkSession, dir)
    val withSh = shingled(newDocs, n).persist()
    try writeStoreParts(withSh, dir, numHashes, bands, "append")
    finally withSh.unpersist()
  }

  /** Seed a signature store in BATCH-PARTITIONED layout (`bands/batch=…`,
    * `shingles/batch=…`) for STREAMING maintenance: params plus an empty
    * seed partition per table, so the first micro-batch's incremental
    * probe reads a valid (empty) store. The batch layout is what makes a
    * live pipeline exactly-once: [[appendDedupStoreBatch]] OVERWRITES its
    * own `batch=N` partition, so a crash-replayed micro-batch replaces
    * its registration instead of duplicating shingle rows (the flat
    * [[appendDedupStore]] is append-mode and relies on the caller never
    * re-appending). Readers see one extra `batch` partition column;
    * [[incrementalPairsPlan]] projects it away. `docs` contributes only
    * its SCHEMA (zero rows are written from it). */
  def seedDedupStoreBatched(docs: DataFrame, dir: String, n: Int = 3,
                            numHashes: Int = 128, bands: Int = 32): Unit = {
    writeParams(docs.sparkSession, dir, n, numHashes, bands)
    // schema comes from the REAL corpus frame (doc ids may be
    // int/long/string — pinning a type here would make the seed
    // partition's footer conflict with every later batch's)
    val emptySh = shingled(docs.limit(0), n)
    graft.core.BatchStore.seed(bandTable(emptySh, numHashes, bands),
      s"$dir/bands")
    graft.core.BatchStore.seed(emptySh, s"$dir/shingles")
  }

  /** Register one micro-batch in a [[seedDedupStoreBatched]] store —
    * overwrite-by-batch-partition, so retries and crash-replays of the
    * SAME batch id are idempotent (and a batch at or below the
    * compaction horizon is a no-op, [[graft.core.BatchStore]]). Same
    * caller contract as [[appendDedupStore]] otherwise: append AFTER
    * consuming the batch's [[incrementalNearDupPairs]]. */
  def appendDedupStoreBatch(newDocs: DataFrame, dir: String,
                            batchId: Long): Unit = {
    val (n, numHashes, bands) = storeParams(newDocs.sparkSession, dir)
    val withSh = shingled(newDocs, n).persist()
    try {
      graft.core.BatchStore.registerBatch(
        bandTable(withSh, numHashes, bands), s"$dir/bands", batchId)
      graft.core.BatchStore.registerBatch(withSh, s"$dir/shingles", batchId)
    } finally withSh.unpersist()
  }

  /** One micro-batch of the LIVE near-dup pipeline
    * ([[graft.streaming.StreamingIngest.nearDupStream]] delegates here):
    * emit the batch's pairs vs the store-so-far plus itself into
    * `pairsDir/batch_id=N` (overwrite — replay-safe), then register the
    * batch under `batch=N`. The batch's shingles and band table are
    * computed ONCE — the pair plan's cached frames are reused for the
    * registration instead of re-deriving the interpreted MinHash
    * signatures a second time. */
  private[graft] def streamBatchNearDup(batch: DataFrame, storeDir: String,
                                        pairsDir: String, batchId: Long,
                                        threshold: Double,
                                        params: Option[(Int, Int, Int)] = None)
      : Unit = {
    val (pairs, cached) = incrementalPairsPlan(batch, storeDir, threshold,
      params)
    // cached = (newSh, newBands, …) — the batch's signature frames are
    // reused for the store registration instead of re-deriving the
    // interpreted MinHash signatures a second time
    graft.core.BatchStore.emitAndRegister(pairs, cached(1),
      s"$storeDir/bands", pairsDir, batchId)
    graft.core.BatchStore.registerBatch(cached.head,
      s"$storeDir/shingles", batchId)
    cached.foreach(_.unpersist())
  }

  /** Lazy plan behind [[incrementalNearDupPairs]] — split out so specs
    * can assert the join shapes (the public op materializes eagerly,
    * hiding the plan behind a checkpoint scan). The cached seq is
    * positional by contract: (newSh, newBands, cand, allSh) — callers
    * unpersist all of them, and [[streamBatchNearDup]] reuses the first
    * two for the store registration. */
  private[graft] def incrementalPairsPlan(newDocs: DataFrame, dir: String,
                                          threshold: Double,
                                          params: Option[(Int, Int, Int)] = None)
      : (DataFrame, Seq[DataFrame]) = {
    val spark = newDocs.sparkSession
    // restore a half-swapped compaction before reading either table
    graft.core.Fs.recoverSwap(s"$dir/bands")
    graft.core.Fs.recoverSwap(s"$dir/shingles")
    // params are written once at seed time and immutable for the store's
    // life, so a long-running stream resolves them ONCE at start and
    // passes them down — re-reading the 1-row table was one extra job
    // per micro-batch (guide §1.2: remove work per trigger)
    val (n, numHashes, bands) = params.getOrElse(storeParams(spark, dir))
    val newSh = shingled(newDocs, n).persist()
    val newBands = bandTable(newSh, numHashes, bands).persist()
    val oldBands = spark.read.parquet(s"$dir/bands")
    // stored side scanned once; the new batch is the broadcast side
    val candCross = oldBands.as("y")
      .join(broadcast(newBands.as("x")),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id_b"))
    // the batch's own band table is broadcast-bounded BY DEFINITION (a
    // micro-batch is small — it already broadcasts in candCross above);
    // the size-blind planner otherwise schedules a SortMergeJoin with
    // two exchanges+sorts for the self-join, and under AQE every
    // materialized exchange is one more driver-sequenced job per
    // trigger (guide §3.1 + §1.2; measured 81 jobs / 3 batches on
    // stream_neardup before this wave)
    val candSelf = newBands.as("x").join(broadcast(newBands.as("y")),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    // NO eager count here: the racing duplicate evaluations of the
    // cold caches run on otherwise-idle task slots, while an extra
    // materializing job per micro-batch is pure serial wall time —
    // measured on the r13 bench pair: adding one count per batch cost
    // stream_neardup +0.5 s and dedup_incremental +0.76 s (the batch
    // ops whose subtrees DON'T saturate the cores keep the lazy shape;
    // the corpus-wide ops with CPU-bill subtrees get the count — see
    // ngramJaccardPairs).
    val cand = candCross.unionByName(candSelf).distinct().persist()
    // verify touches stored shingles for candidate PARTNERS only: one
    // full scan of the store semi-join-pruned to candidate ids (AQE
    // broadcasts the id side when small), persisted so the id_a and
    // id_b branches of the verify join share the single pruned pass
    // no .distinct(): a LEFT SEMI join's result is insensitive to
    // duplicate build-side keys, so the dedup exchange was one pure
    // extra shuffle (and one AQE job) per trigger; the exploded frame
    // stays bounded by the batch's candidate pairs
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
    // the anti-join vs the batch's own ids makes the op idempotent
    // under crash-replay AFTER a store append (the batched streaming
    // layout): a doc whose shingles are already stored must not appear
    // twice in the verify side. The select pins the shingle columns so
    // a batch-partitioned store (extra `batch` partition column) unions
    // cleanly with the fresh side.
    // no .distinct() here either: newSh is one row per doc already and a
    // LEFT ANTI join is insensitive to duplicate build-side keys
    val newIds = newSh.select("doc_id")
    val allSh = spark.read.parquet(s"$dir/shingles")
      .select(newSh.columns.map(col).toIndexedSeq: _*)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .join(broadcast(newIds), Seq("doc_id"), "left_anti")
      .unionByName(newSh)
      .persist()
    // cand is bounded by the batch's candidate pairs — broadcast it into
    // the verify join (two SMJ exchange+sort pairs otherwise); the
    // corpus-wide callers of verifyJaccard keep their unhinted shape
    (verifyJaccard(broadcast(cand), allSh, threshold),
      Seq(newSh, newBands, cand, allSh))
  }

  /** Near-dup pairs a NEW batch forms with the stored corpus and with
    * itself — (id_a, id_b, inter, uni), id_a < id_b, the same verified
    * contract as [[ngramJaccardPairs]]/[[minhashLshPairs]]. Candidates
    * come from the LSH band join (new × stored + new × new); signature
    * params come from the store. EAGER: the result (bounded by the new
    * batch's candidate pairs) is persisted and counted so the four
    * intermediate caches release in-op — a per-batch ingest loop holds
    * exactly one cached frame per outstanding result, released by
    * `result.unpersist()` (or `catalog.clearCache`), NOT a
    * localCheckpoint whose blocks only garbage collection can free. */
  def incrementalNearDupPairs(newDocs: DataFrame, dir: String,
                              threshold: Double): DataFrame = {
    val (pairs, cached) = incrementalPairsPlan(newDocs, dir, threshold)
    val out = pairs.persist()
    out.count()
    cached.foreach(_.unpersist())
    out
  }

  /** C4-style GLOBAL line deduplication (Raffel et al. 2020 §2.2: "we
    * discarded all but one of any three-sentence span occurring more
    * than once" — productionized as line-level dedup in C4/RefinedWeb):
    * every distinct non-empty line is kept in exactly ONE document —
    * its first occurrence in (doc_id, line_no) order — and every other
    * occurrence is dropped. Returns one row per document: original and
    * surviving line counts plus the md5 of the reassembled text (the
    * surviving lines re-joined in original order), so the whole rewrite
    * is hash-checkable. Expects the (doc_id, text) layout every Dedup
    * operator uses.
    *
    * 100 TB shape: every shuffle is a map-side-combined AGGREGATE — a
    * min-struct per line hash picks each line's global keeper (the
    * boilerplate-line skew concern collapses at the combiner: a line
    * shared by millions of docs ships ONE candidate per input
    * partition, never the fan-out), a doc-keyed agg reassembles the
    * KEPT lines (the only doc-keyed text movement), and the totals leg
    * shuffles bare counts. The joins are per-doc result rows, never the
    * line set; nothing is sorted globally. */
  def lineDedup(docs: DataFrame): DataFrame = {
    val lines = spread(docs)
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .withColumnRenamed("pos", "line_no")
      .withColumn("line", trim(col("col"))).drop("col")
      .filter(col("line") =!= "")
    // Global keeper per distinct line = min (doc_id, line_no, line) —
    // an AGGREGATE with map-side partial combine (one surviving struct
    // per distinct line per input partition), never a window: the
    // window form sort-shuffled EVERY line occurrence by hash and then
    // shuffled the full text a second time by doc (5.3× the oracle on
    // the sf1 crossover probe). The struct's (doc_id, line_no) prefix
    // is unique per row, so `line` never decides the min — the keeper
    // is exactly the window form's rank-1 row, and it CARRIES the text,
    // so the only doc-keyed text shuffle left is the KEPT lines; the
    // totals leg shuffles counts only.
    val keepers = lines
      .groupBy(md5(col("line")).as("h"))
      .agg(min(struct(col("doc_id"), col("line_no"), col("line"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.line_no").as("line_no"),
        col("k.line").as("line"))
    val kept = keepers.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(concat_ws("\n",
        array_sort(collect_list(struct(col("line_no"), col("line"))))
          .getField("line"))).as("kept_md5"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }
}
