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
}
