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
}
