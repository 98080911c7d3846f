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

  // ---- CountMinSketch half of FacetValue ------------------------------
  // FacetValue.java:16-25 carries BOTH sketches: HLL+ for cardinality
  // (above) and CountMinSketch for per-value frequency. The CMS side
  // answers "how often does value v occur under facet key k" from sketch
  // bytes alone — merged across ingest batches, never re-reading raw
  // events. Estimates are DETERMINISTIC given (eps, confidence, seed),
  // and exact whenever the value collides with no other value in at
  // least one hash row (overwhelmingly likely for bounded value domains
  // at the default width), which is what makes the gate hash-comparable
  // against an exact oracle while exercising the full
  // serialize → merge → estimate interchange.

  import org.apache.spark.sql.expressions.Aggregator
  import org.apache.spark.sql.Encoders
  import org.apache.spark.util.sketch.CountMinSketch

  /** Mergeable CMS-union aggregate (serialized-bytes in, serialized-bytes
    * out) — partial (map-side) merge capable, so unioning N batch
    * sketches shuffles only sketch bytes. All inputs must share
    * (depth, width, seed); CountMinSketch.mergeInPlace enforces it. */
  private object CmsUnion extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def read(b: Array[Byte]) =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    private def write(s: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      s.writeTo(bos)
      bos.toByteArray
    }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] =
      merge(acc, x)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { val s = read(a); s.mergeInPlace(read(b)); write(s) }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder = Encoders.BINARY
    override def outputEncoder = Encoders.BINARY
  }

  /** Per-(batch, key) serialized CountMinSketch over the facet values —
    * the CMS write path beside [[sketchBatches]]'s HLL. */
  def cmsBatches(df: DataFrame, batchCol: String, keyCol: String,
                 valCol: String, eps: Double = 0.005,
                 confidence: Double = 0.999, seed: Int = 42): DataFrame =
    df.groupBy(col(batchCol), col(keyCol))
      .agg(count_min_sketch(col(valCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"),
        count(lit(1)).as("cnt"))

  /** Union the per-batch CMS sketches per key — the CMS read path. */
  def cmsMerge(batches: DataFrame, keyCol: String): DataFrame =
    batches.groupBy(col(keyCol))
      .agg(udaf(CmsUnion, Encoders.BINARY).apply(col("cms")).as("cms"),
        sum(col("cnt")).as("cnt"))

  /** Frequency estimates for `values` under each facet key, from the
    * merged sketch bytes: one deserialization per key, one
    * (key, value, estimate) row per probe value. */
  def cmsEstimates(merged: DataFrame, keyCol: String,
                   values: Seq[String]): DataFrame = {
    val probe = values.toArray
    val est = udf { (bytes: Array[Byte]) =>
      val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      probe.map(v => s.estimateCount(v))
    }
    merged.select(col(keyCol),
        explode(map_from_arrays(lit(probe), est(col("cms"))))
          .as(Seq("value", "estimate")))
  }
}
