package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation (training-data pipeline,
  * net-new beyond the reference): down-sample over-represented strata
  * (language, source, quality band) to target mix rates.
  *
  * The keep decision is a pure hash of (key, salt) — no RNG state, so a
  * sample is reproducible across runs, engines, and partitionings, and
  * re-running with a wider rate yields a SUPERSET of the earlier sample
  * (bucket < rate·B is monotone in rate). Map-side only: a 100 TB sweep
  * is scan+filter, no shuffle. */
object Sampling {

  val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from an md5-derived integer (the
    * engine-portable hash also used by the simhash oracle path). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Keep each row with its stratum's rate (absent strata use
    * `defaultRate`). Rates are fractions in [0, 1]. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double,
                 salt: String = "graft"): Column = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (els, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(els)
    }
    hashBucket(col(keyCol), salt) < (rate * Buckets).cast("long")
  }

  /** The sampled frame. */
  def sample(df: DataFrame, keyCol: String, stratumCol: String,
             rates: Map[String, Double], defaultRate: Double,
             salt: String = "graft"): DataFrame =
    df.filter(stratified(df, keyCol, stratumCol, rates, defaultRate, salt))

  /** Token-budget corpus mixing: per stratum (language/source/domain),
    * keep documents in deterministic hash order until the stratum's token
    * budget is exhausted — how a training mix hits "X billion tokens of
    * code, Y of web" exactly, reproducibly.
    *
    * The keep set is a pure function of (id, salt, budgets): docs are
    * ranked by the same md5 bucket [[hashBucket]] uses (ties broken by
    * id), and a doc stays iff the running token total THROUGH it is
    * within budget — so raising a budget yields a superset, like rate
    * widening in [[stratified]].
    *
    * 100 TB shape: one shuffle partitions by stratum for the running sum
    * — strata are the corpus mix dimensions (dozens, not millions), so
    * the window is per-stratum sequential by necessity (a budget cut IS
    * an order statistic). At real scale the same decision comes from a
    * two-pass variant: aggregate per-bucket token subtotals (tiny), find
    * each stratum's cut bucket on the driver, then one map-side filter —
    * the window form here is the single-job gate shape. */
  def tokenBudget(df: DataFrame, idCol: String, stratumCol: String,
                  nTokensCol: String, budgets: Map[String, Long],
                  defaultBudget: Long, salt: String = "graft"): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (els, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(els)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("cum_tokens", sum(col(nTokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic repeat-factor upsampling — the other half of corpus
    * mixing: over-represented strata are DOWN-sampled ([[stratified]] /
    * [[tokenBudget]]), high-value strata are UP-sampled by a fractional
    * repeat factor (the "epochs" column of a training-mix table: code ×
    * 2.3 means every code doc appears twice and 30% of them a third
    * time). Each doc emits floor(w) copies plus one more iff its hash
    * bucket falls under frac(w)·B — so the realized rate is exactly w in
    * expectation, the copy set is a pure function of (id, salt, w), and
    * raising w never removes copies a lower w produced. A `copy` ordinal
    * distinguishes the duplicates (shuffle-salt material for the
    * downstream global shuffle). Map-side only: explode of a ≤⌈w⌉-long
    * sequence, no shuffle, no RNG state. */
  def repeatUpsample(df: DataFrame, idCol: String, stratumCol: String,
                     weights: Map[String, Double], defaultWeight: Double,
                     salt: String = "graft"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "repeat weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) { case (els, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(els)
    }
    val copies = (floor(w).cast("long") +
      when(hashBucket(col(idCol), salt) <
        floor((w - floor(w)) * Buckets).cast("long"), 1L).otherwise(0L))
    df.withColumn("__n", copies)
      .filter(col("__n") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"), lit(1L))))
      .drop("__n")
  }

  /** Deterministic global training order — the LAST pipeline step: the
    * final mix is shuffled reproducibly so every training run (and every
    * resume) reads documents in the same pseudo-random order. Position
    * = rank in ([[hashBucket]] of the salt-keyed id, id) order, CONTIGUOUS
    * from 1.
    *
    * A naive `row_number() OVER (ORDER BY hash)` is a single-partition
    * window — the anti-scale shape. Here positions come from the same
    * two-pass trick as [[tokenBudgetTwoPass]]: a map-side-combined count
    * per coarse hash bucket (≤ `coarseBuckets` rows to the driver), a
    * cumulative-offset lookup broadcast back, and a PER-BUCKET window
    * for the local rank — parallel across buckets, exact because the
    * bucket is monotone in the hash. */
  def trainingOrder(df: DataFrame, idCol: String, salt: String = "graft",
                    coarseBuckets: Int = 4096): DataFrame = {
    val bucket = (hashBucket(col(idCol), salt) * coarseBuckets / Buckets)
      .cast("int")
    val sub = df.groupBy(bucket.as("b")).agg(count(lit(1)).as("c")).collect()
    var cum = 0L
    val offsets = sub.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .map { case (b, c) => val o = (b, cum); cum += c; o }
    val spark = df.sparkSession
    import spark.implicits._
    val meta = broadcast(offsets.toSeq.toDF("__b", "__off"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cb"))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("__cb", bucket)
      .join(meta, col("__cb") === col("__b"))
      .withColumn("pos", row_number().over(wLocal) + col("__off"))
      .drop("__cb", "__b", "__off")
  }

  /** The 100 TB form of [[tokenBudget]]: the SAME keep set (proved
    * row-for-row equal by SamplingSpec) without a per-stratum global
    * window over the full corpus.
    *
    * Pass 1 aggregates token subtotals per (stratum, coarse hash-order
    * bucket) — a map-side-combined shuffle producing at most
    * strata × `coarseBuckets` rows (dozens × 4096), a bounded driver
    * collect. The driver walks each stratum's buckets in order and finds
    * the CUT bucket: the first whose cumulative total exceeds the
    * budget. Pass 2 is a map-side filter — buckets before the cut are
    * kept whole, buckets after dropped whole — plus a window over ONLY
    * the cut bucket's rows (≈ corpus/`coarseBuckets` per stratum) to
    * place the exact boundary. Equality holds because the coarse bucket
    * `floor(hash·C/B)` is monotone in the hash that orders the window
    * form, and hash ties always land in the same bucket.
    *
    * Returns the kept rows with the same `cum_tokens` the window form
    * emits — exact for boundary-bucket rows (prior-bucket subtotals are
    * known) and reconstructed per earlier bucket by a bucket-local
    * window plus the driver's running offsets, so both variants are
    * hash-identical, not just keep-set-equal. */
  def tokenBudgetTwoPass(df: DataFrame, idCol: String, stratumCol: String,
                         nTokensCol: String, budgets: Map[String, Long],
                         defaultBudget: Long, salt: String = "graft",
                         coarseBuckets: Int = 4096): DataFrame = {
    val bucket = (hashBucket(col(idCol), salt) * coarseBuckets / Buckets)
      .cast("int")
    // PASS 1: (stratum, bucket) subtotals; bounded by strata × buckets
    val sub = df
      .groupBy(col(stratumCol).cast("string").as("s"), bucket.as("b"))
      .agg(sum(col(nTokensCol)).cast("long").as("t"))
      .collect()
    // driver walk per stratum: the cut bucket (first whose cumulative
    // exceeds the budget) and each bucket's starting offset (cumulative
    // through the PRIOR buckets) — emitted as a tiny broadcastable
    // lookup table, NOT a when-chain (strata × buckets literals would
    // blow up the expression tree)
    val metaRows = sub.groupBy(_.getString(0)).toSeq.flatMap { case (s, rows) =>
      val budget = budgets.getOrElse(s, defaultBudget)
      val inOrder = rows.map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      var cum = 0L
      var cut = Int.MaxValue
      val offsets = inOrder.map { case (b, t) =>
        val off = cum
        if (cut == Int.MaxValue && cum + t > budget) cut = b
        cum += t
        (b, off)
      }
      offsets.map { case (b, off) => (s, b, off, cut, budget) }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val meta = broadcast(
      metaRows.toDF("__s", "__b", "__off", "__cut", "__budget"))
    val withB = df.withColumn("__cb", bucket)
      .join(meta, col(stratumCol).cast("string") === col("__s") &&
        col("__cb") === col("__b"))
      // map-side drop of every bucket PAST the cut — the window below
      // never sees them
      .filter(col("__cb") <= col("__cut"))
    // bucket-local window: identical ordering to the global window
    // restricted to one bucket (the bucket is monotone in the hash, and
    // hash ties share a bucket), and PARALLEL across strata × buckets —
    // the per-stratum sequential scan the single-window form pays is
    // gone
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__cb"))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    withB
      .withColumn("cum_tokens",
        sum(col(nTokensCol)).over(wLocal) + col("__off"))
      // whole buckets before the cut keep; only the cut bucket consults
      // the reconstructed running total
      .filter(col("__cb") < col("__cut") || col("cum_tokens") <= col("__budget"))
      .drop("__cb", "__s", "__b", "__off", "__cut", "__budget")
  }

  /** Deterministic train/val/test split assignment: each id's hash
    * bucket falls into one of the ordered fractions' cumulative ranges
    * — a pure per-row function of (id, salt, fractions), so membership
    * is reproducible anywhere, map-side, and raising one fraction at a
    * neighbor's expense moves only boundary-bucket docs. The ordered
    * list (not a map) pins which split absorbs rounding. */
  def splitAssign(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must be non-negative and sum to 1")
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail.dropRight(1) :+ Buckets // last split absorbs rounding drift
    val b = hashBucket(col(idCol), salt)
    val assign = fractions.map(_._1).zip(bounds).reverse
      .foldLeft(lit(fractions.last._1)) { case (els, (name, hi)) =>
        when(b < hi, name).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /** LEAKAGE-FREE split assignment — the contamination rule an
    * eval-aware pipeline layers over [[splitAssign]]: two documents
    * that are near-duplicates must land in the SAME split, or the copy
    * in test leaks training text (the train-test-overlap finding of
    * Lee et al. 2022 §6.2, applied at split time instead of after the
    * fact). Membership becomes a pure function of the near-dup CLUSTER
    * identity: the split hash keys on `cluster_id` (the component
    * minimum from [[graft.operators.Dedup.clusters]]); docs with no
    * near-dup default to their own id — which is exactly their
    * singleton cluster id, so the clustered and unclustered rows share
    * one keying rule. Plan: the clusters frame (bounded by near-dup
    * PAIRS, orders smaller than the corpus) hash-joins onto the corpus
    * ids — AQE broadcasts it when small — and the assignment itself
    * stays the same map-side hash-range function as [[splitAssign]]. */
  def splitAssignLeakFree(df: DataFrame, clusters: DataFrame,
                          idCol: String,
                          fractions: Seq[(String, Double)],
                          salt: String = "graft"): DataFrame = {
    // Singletons coalesce to their RAW id — casting to long would
    // collapse every non-numeric id onto one shared null cluster key
    // (all unclustered docs landing in the same split bucket). The
    // clusters frame's id type must match the corpus id column; a
    // mismatch fails analysis loudly instead of mis-keying silently.
    val cl = clusters.select(col("doc_id").as(idCol), col("cluster_id"))
    val keyed = df.join(cl, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    splitAssign(keyed, "cluster_id", fractions, salt)
  }

  /** Sequence packing — the step AFTER [[trainingOrder]]: lay the
    * shuffled corpus out as one token stream and cut it into fixed
    * `ctxLen` context windows, reporting for every document its stream
    * start offset, the window it starts in, and how many windows it
    * spans. This is the map a packed-pretraining loader needs to build
    * batch files without ever concatenating text on one machine.
    *
    * The running token total is a global order statistic, so it uses
    * the SAME bucket-offset scheme as [[trainingOrder]] /
    * [[tokenBudgetTwoPass]]: per-coarse-bucket token subtotals
    * (map-side-combined, ≤ `coarseBuckets` rows to the driver), driver
    * cumsum, broadcast offsets, per-bucket running-sum window — never
    * a single-partition global window. */
  def packWindows(df: DataFrame, idCol: String, nTokensCol: String,
                  ctxLen: Long, salt: String = "graft",
                  coarseBuckets: Int = 4096): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val bucket = (hashBucket(col(idCol), salt) * coarseBuckets / Buckets)
      .cast("int")
    val sub = df.groupBy(bucket.as("b"))
      .agg(sum(col(nTokensCol)).as("t")).collect()
    var cum = 0L
    val offsets = sub.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .map { case (b, t) => val o = (b, cum); cum += t; o }
    val spark = df.sparkSession
    import spark.implicits._
    val meta = broadcast(offsets.toSeq.toDF("__b", "__toff"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cb"))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("__cb", bucket)
      .join(meta, col("__cb") === col("__b"))
      .withColumn("start_tok",
        sum(col(nTokensCol)).over(wLocal) - col(nTokensCol) + col("__toff"))
      .withColumn("window_id", floor(col("start_tok") / ctxLen))
      // an empty doc still OCCUPIES its start window (span 1)
      .withColumn("n_windows",
        floor((col("start_tok") + greatest(col(nTokensCol), lit(1L)) - 1)
          / ctxLen) - col("window_id") + 1)
      .drop("__cb", "__b", "__toff")
  }

  /** Temperature-scaled domain sampling weights — the multilingual-mix
    * step (mT5/XLM-R style: p_d ∝ n_d^α with α < 1 upweights low-resource
    * domains). Emits one row per domain: token count, normalized
    * sampling weight, and the repeat factor (weight · total / n_d) that
    * [[repeatUpsample]] then applies.
    *
    * Exactness discipline: α is restricted to 1/2 or 1/4 so n^α is an
    * INTEGER floor-sqrt (floor(sqrt(n)) is exact for n < 2^52 because
    * IEEE sqrt is correctly rounded — any engine computes the same
    * long), the normalizers S = Σ n^α and T = Σ n are exact integer
    * sums, and each output double is a fixed tree of IEEE ÷/× over
    * those integers — reproducible bit-for-bit, hash-gateable. The
    * qlog4 convention, applied to pow.
    *
    * 100 TB shape: ONE map-side-combined aggregate (corpus-in,
    * domains-out) whose domains-sized result materializes on the driver
    * exactly once — S, T, and every output row come from that single
    * collect, so the corpus is never scanned twice. Nothing grows with
    * the corpus but the aggregate's input. */
  def temperatureWeights(df: DataFrame, domainCol: String,
                         nTokensCol: String,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha == 0.5 || alpha == 0.25,
      s"alpha must be 0.5 or 0.25 (exact integer-root path), got $alpha")
    def isqrt(n: Long): Long = math.sqrt(n.toDouble).toLong
    val root: Long => Long =
      if (alpha == 0.5) isqrt else n => isqrt(isqrt(n))
    val counts = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(sum(col(nTokensCol)).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) 0L else r.getLong(1)))
    // the mix table is model-sized by definition (languages/sources);
    // refuse a mis-keyed call before it swamps the driver
    require(counts.length <= 100000,
      s"temperatureWeights collected ${counts.length} domains — domainCol" +
        " must be a model-sized key (languages/sources), not a row key")
    val na = counts.map { case (_, n) => root(n) }
    val s = na.sum
    val t = counts.map(_._2).sum
    require(s > 0, "temperatureWeights needs a non-empty corpus")
    // weight = n^α/S; repeat = (n^α/S)·(T/n) — each a fixed IEEE tree
    // over exact integers (association mirrored in the oracle)
    val out = counts.zip(na).map { case ((d, n), a) =>
      val weight = a.toDouble / s.toDouble
      (d, n, weight, weight * (t.toDouble / n.toDouble))
    }.toSeq
    df.sparkSession.createDataFrame(out)
      .toDF("domain", "n_tokens", "weight", "repeat_factor")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram features are and keep
    * the top `k`. Feature = word bigrams hashed into `buckets` buckets;
    * the raw and target bucket LMs come out of ONE shared aggregate
    * (target rows are flagged by `targetPred`, a predicate over the raw
    * corpus itself — the paper's "target distribution sample"); the
    * importance weight of bucket b is the log-ratio
    * log p_target(b) − p_raw(b), quarter-bit quantized
    * ([[TextOps.qlog4]] of the Laplace-smoothed counts) so every doc
    * score is exact integer arithmetic on any engine. The constant
    * log(T_raw/T_target) normalizer is dropped: it shifts all docs
    * equally and cannot reorder the top-k.
    *
    * 100 TB shape: the LM is one map-side-combinable aggregate over the
    * exploded bigram stream into ≤`buckets` rows (never collected — it
    * stays a frame and BROADCASTS into the scoring join), the per-doc
    * score is a second map-side-combinable aggregate keyed by doc id,
    * and the final top-k is a TakeOrderedAndProject. The corpus streams
    * through exactly twice; nothing is all-pairs, nothing is
    * driver-side. */
  def dsirSelect(docs: DataFrame, targetPred: Column, buckets: Int = 256,
                 k: Int = 100, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // ONE pass of the corpus through the tokenizer: the bigram stream
    // collapses to (doc, is_target, bucket, cnt) — ≤ `buckets` rows per
    // doc — before anything else reads it, so the LM aggregate AND the
    // scoring join both run over this compact frame instead of
    // re-deriving the gram stream (the previous two-pass form
    // re-tokenized the corpus per pass and was 2.4× slower on the sf1
    // crossover probe). EAGER like spanScrub: the tiny k-row result
    // persists so the bucketed cache releases in-op; callers free it
    // with `result.unpersist()`.
    val bucketed = docs.select(col(idCol), targetPred.as("is_target"),
        explode(TextOps.bigrams(col(textCol))).as("s"))
      .withColumn("b",
        conv(substring(md5(col("s")), 1, 6), 16, 10).cast("long") % buckets)
      .groupBy(col(idCol), col("is_target"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    // one tokenize+bigram pass: the scoring join's two input stages (the
    // bucketed exchange and the broadcast LM whose subtree ALSO reads
    // bucketed) materialize concurrently under AQE — cold cache = the
    // corpus gram pass computed twice on contended cores (the
    // one-evaluation rule, see Dedup.ngramJaccardPairs)
    bucketed.count()
    val lm = bucketed.groupBy("b").agg(
      sum("cnt").as("r"),
      sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("t"))
    val weights = lm.select(col("b"),
      (TextOps.qlog4(col("t") + 1) - TextOps.qlog4(col("r") + 1)).as("w"))
    // w·cnt over the bucketed counts = Σw over the raw gram stream,
    // exactly (integer arithmetic) — the oracle replays either form
    val scores = bucketed.join(broadcast(weights), "b")
      .groupBy(col(idCol)).agg(sum(col("w") * col("cnt")).as("dsir_qbits"))
    val out = docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dsir_qbits"), lit(0L)).cast("long").as("dsir_qbits"))
      .orderBy(col("dsir_qbits").desc, col(idCol))
      .limit(k)
      .persist()
    out.count()
    bucketed.unpersist()
    out
  }

  /** Per-domain frequency cap (the RefinedWeb/Dolma "no domain may
    * dominate the corpus" rule): keep at most `cap` documents from each
    * domain, survivors chosen in deterministic salted-hash order
    * ([[hashBucket]], ties by id) so the kept set is a pure function of
    * (corpus, cap, salt) — independent of partitioning, and raising the
    * cap yields a superset.
    *
    * 100 TB shape: two-phase like [[tokenBudgetTwoPass]]. Phase 1 is a
    * map-side-combined per-domain count (domains-sized output). Domains
    * already within cap pass WITHOUT any sort — their rows take the
    * broadcast-join fast path and never shuffle. Only over-cap domains'
    * rows enter the per-domain rank window, so the expensive path is
    * bounded by (over-cap domains × their rows), and a single
    * pathologically hot domain is exactly the case the cap exists to
    * cut — its window emits `cap` rows no matter the input size. Output
    * carries the domain's ORIGINAL count so the cut is visible. */
  def domainCap(docs: DataFrame, domainCol: String, cap: Int,
                idCol: String = "doc_id",
                salt: String = "dcap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("long").as("n_domain"))
    val base = docs.select(col(idCol), col(domainCol))
      .join(broadcast(counts), Seq(domainCol))
    val under = base.filter(col("n_domain") <= cap)
    val over = base.filter(col("n_domain") > cap)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(domainCol))
          .orderBy(hashBucket(col(idCol), salt), col(idCol))))
      .filter(col("rk") <= cap).drop("rk")
    under.unionByName(over)
      .select(col(idCol), col(domainCol), col("n_domain"))
  }

  /** [[domainCap]] in ONE pass over the input: a single domain-keyed
    * window computes the domain count and the salted keep-rank in one
    * sort, so the input DAG executes exactly once. Same rows, same
    * columns (spec-pinned in Wave9Spec).
    *
    * Which to use: [[domainCap]]'s under-cap bypass is right when the
    * input is a cheap table scan — under-cap rows skip the full-row
    * shuffle entirely and only the domain COUNTS shuffle. This form is
    * right when the input is itself an expensive pipeline (quality →
    * dedup → …): [[domainCap]]'s three branches (counts, under, over)
    * would re-execute that whole upstream DAG three times, which costs
    * far more than shuffling the (id, domain) projection once. */
  def domainCapOnePass(docs: DataFrame, domainCol: String, cap: Int,
                       idCol: String = "doc_id",
                       salt: String = "dcap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(domainCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    docs.select(col(idCol), col(domainCol))
      // same (partition, order) spec for both → one WindowExec/sort
      .withColumn("n_domain", count(lit(1)).over(full).cast("long"))
      .withColumn("rk", row_number().over(ord))
      .filter(col("n_domain") <= cap || col("rk") <= cap)
      .select(col(idCol), col(domainCol), col("n_domain"))
  }
}
