package graft.core

import org.apache.spark.sql.DataFrame

/** Small-input parallelism guard for CPU-heavy derivations.
  *
  * The driver's test parquet is one row group per table, so Spark reads
  * each table as ONE input split; any interpreted higher-order expression
  * or `collect_*` partial aggregation placed directly over the scan runs
  * in a single task no matter how many cores `local[N]` offers (measured:
  * the difference between 10 s and 500+ s runs of the shingle pipeline).
  *
  * A bare `df.repartition(n)` does NOT fix this: Catalyst pushes
  * deterministic projections and filters below `Repartition`, so the
  * expensive expressions still evaluate in the lone pre-shuffle task (and
  * then again above it). The round-trip through an `RDD[Row]` here is an
  * optimizer barrier — nothing migrates below it, so everything derived
  * from the returned frame evaluates AFTER the shuffle, across `n` tasks.
  *
  * Select only the columns you need BEFORE calling this (the RDD boundary
  * also blocks column pruning from reaching the scan).
  *
  * At 100 TB this is a no-op concern: a real table has thousands of
  * splits and the derivations parallelize at the scan. The barrier costs
  * one extra row (de)serialization of the raw input, which is the honest
  * price of forcing a distribution the storage layout doesn't provide.
  */
object Spread {
  def apply(df: DataFrame, parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    spark.createDataFrame(df.repartition(n).rdd, df.schema)
  }
}
