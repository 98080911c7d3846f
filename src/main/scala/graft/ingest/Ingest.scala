package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest write path (SURVEY.md §2.1): one wide/raw record stream →
  * the long event layout + derived aggregate tables. The reference emits
  * five physical projections per event from MapReduce handlers
  * (ShardedDataTypeHandler.java:121); here each is a declarative
  * aggregation of the SAME long DataFrame, so Spark executes the whole
  * fan-out in one job with shared scan.
  *
  * Long layout (SURVEY §1.3): every (uid, field, instance) is a row —
  * `(uid, datatype, shard_date, visibility, field, group, value)`.
  * At scale: partition by shard_date, bucket by uid (the yyyyMMdd_N
  * shardId analog, ShardedDataTypeHandler.java:105-108).
  */
object Ingest {

  /** Parse a grouping-context field name: `CANINE.PET.0.NAME` →
    * (field=CANINE…NAME composite per reference rules); simple case
    * `NAME.0` → (NAME, "0") (SimpleGroupFieldNameParser analog). */
  def splitGroupedField(name: String): (String, String) = {
    val ix = name.indexOf('.')
    if (ix < 0) (name, "") else (name.substring(0, ix), name.substring(ix + 1))
  }

  /** Melt a wide record DataFrame into the long event layout.
    * Column names may carry grouping context (`NAME.0`). Every value is
    * stringified (value_raw) — typed/normalized sibling values are added
    * by [[normalize]]. */
  def toLong(wide: DataFrame, uidCol: String, datatype: String,
             dateCol: String, visibilityCol: Option[String] = None): DataFrame = {
    val fieldCols = wide.columns.filterNot(c =>
      c == uidCol || c == dateCol || visibilityCol.contains(c))
    val entries = fieldCols.map { c =>
      val (field, group) = splitGroupedField(c)
      struct(lit(field).as("field"), lit(group).as("group"),
        col(s"`$c`").cast("string").as("value"))
    }
    wide.select(
        col(uidCol).cast("string").as("uid"),
        lit(datatype).as("datatype"),
        to_date(col(dateCol)).as("shard_date"),
        visibilityCol.map(col(_)).getOrElse(lit("")).as("visibility"),
        explode(array(entries: _*)).as("e"))
      .select(col("uid"), col("datatype"), col("shard_date"), col("visibility"),
        col("e.field").as("field"), col("e.group").as("group"),
        col("e.value").as("value"))
      .filter(col("value").isNotNull)
  }

  /** The metadata catalog (DatawaveMetadata analog, EventMetadata.java:
    * 96-110): which fields exist per datatype, observation counts, date
    * bounds. Maintained by MERGE in an incremental ingest; full recompute
    * here. */
  def metadata(long: DataFrame): DataFrame =
    long.groupBy("field", "datatype")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("value")).as("cardinality"),
        min(col("shard_date")).as("first_date"),
        max(col("shard_date")).as("last_date"))

  /** Per-datatype PLANNING statistics the ingest tier maintains beside
    * the field catalog (EventMetadata.java:96-110 — the reference
    * writes its planning statistics into the metadata table at ingest;
    * MetadataHelper reads them back at plan time, never re-scanning the
    * corpus): `max_tree_depth` = the deepest dotted-uid document
    * (`root.child.grandchild` = 3), the statistic
    * [[graft.operators.DocumentTree.parentsOfMatches]] prunes its
    * retrieve side on. One row per datatype from ONE batch; max/sum are
    * trivially mergeable across batches ([[mergeDatatypeStats]]). Works
    * on any frame carrying a uid + datatype column — the long event
    * layout or a raw document frame. */
  def datatypeStats(df: DataFrame, uidCol: String = "uid",
                    datatypeCol: String = "datatype"): DataFrame =
    df.groupBy(col(datatypeCol).as("datatype"))
      .agg(max(size(split(col(uidCol), "\\."))).cast("bigint")
          .as("max_tree_depth"),
        count(lit(1)).as("cnt"))

  /** Fold a new batch's statistics into the stored rows: max of maxes,
    * sum of counts — associative, so incremental ingest never re-reads
    * old batches. */
  def mergeDatatypeStats(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.unionByName(batch).groupBy("datatype")
      .agg(max(col("max_tree_depth")).as("max_tree_depth"),
        sum(col("cnt")).as("cnt"))

  /** Data dictionary (DataDictionaryBean.java, data-dictionary-core):
    * the per-field catalog a deployment serves over `/DataDictionary` —
    * observation counts, cardinality, and date bounds from the metadata
    * catalog, flagged with the ingest configuration's indexing decisions
    * (what the reference's metadata `i`/`ri`/`tf` rows record). */
  def dataDictionary(long: DataFrame, indexedFields: Seq[String] = Nil,
                     reverseIndexedFields: Seq[String] = Nil,
                     tokenizedFields: Seq[String] = Nil): DataFrame =
    metadata(long).select(
      col("field"), col("datatype"),
      col("field").isin(indexedFields: _*).as("forward_indexed"),
      col("field").isin(reverseIndexedFields: _*).as("reverse_indexed"),
      col("field").isin(tokenizedFields: _*).as("tokenized"),
      col("cnt"), col("cardinality"), col("first_date"), col("last_date"))

  /** Global-index aggregate (shardIndex analog): per (value, field, date,
    * datatype) counts — powers Discovery queries and needle-query
    * semi-joins without touching the event table. */
  def globalIndex(long: DataFrame): DataFrame =
    long.groupBy(col("value"), col("field"), col("shard_date"), col("datatype"))
      .agg(count(lit(1)).as("cnt"),
        collect_set(col("uid")).as("uid_sample"))
      .withColumn("uid_sample", slice(col("uid_sample"), 1, 20)) // Uid.List MAX=20 cap

  /** Reverse global index (shardReverseIndex, ShardedDataTypeHandler
    * .java:86-101): the same aggregate keyed on the REVERSED value, so a
    * leading-wildcard discovery/query becomes a sargable prefix scan —
    * at scale this is its own sorted/partitioned table, like the
    * reference's. */
  def reverseGlobalIndex(long: DataFrame): DataFrame =
    globalIndex(long.withColumn("value", reverse(col("value"))))

  /** Per-date field frequency — the metadata "f" column-family rows
    * (EventMetadata.java:96-110, MetadataHelper frequency counts): which
    * fields appear in events on which dates, ALWAYS complete regardless
    * of indexing config. Compared against the global index's (field,
    * date) coverage it yields the FieldIndexHole set ([[graft.query
    * .IndexHoles]]). */
  def fieldFrequency(long: DataFrame): DataFrame =
    long.groupBy("field", "datatype", "shard_date")
      .agg(count(lit(1)).as("cnt"))

  /** Date-index analog (DateIndexDataTypeHandler.java:43-72): secondary
    * mapping from an alternate date semantic (ACTIVITY vs EVENT vs LOAD
    * time) to the shard dates holding matching events. A query with
    * date-type X resolves its begin/end bounds through this table into a
    * shard_date set — partition pruning under non-storage date semantics. */
  def dateIndex(df: DataFrame, dateType: String, dateCol: String,
                shardDateCol: String = "shard_date"): DataFrame =
    df.groupBy(lit(dateType).as("date_type"), to_date(col(dateCol)).as("date"))
      .agg(collect_set(col(shardDateCol)).as("shard_dates"),
        count(lit(1)).as("cnt"))

  /** Shard dates for a date-type-bounded query (RangeStream date step). */
  def shardDatesFor(dateIdx: DataFrame, dateType: String,
                    begin: String, end: String): DataFrame =
    dateIdx.filter(col("date_type") === dateType &&
        col("date").between(lit(begin), lit(end)))
      .select(explode(col("shard_dates")).as("shard_date")).distinct()

  /** Document view: reassemble events into documents —
    * `uid → map<field, array<struct<value, group>>>` (attributes/Document
    * .java analog). Two-level aggregation keeps the shuffle keyed on uid
    * only. */
  def docView(long: DataFrame): DataFrame = {
    val perField = long.groupBy("uid", "datatype", "shard_date", "field")
      .agg(collect_list(struct(col("value"), col("group"))).as("values"))
    perField.groupBy("uid", "datatype", "shard_date")
      .agg(map_from_entries(collect_list(struct(col("field"), col("values"))))
        .as("fields"))
  }

  /** Dead-letter split (ErrorShardedDataTypeHandler analog): route rows
    * failing `valid` to an errors frame; both sides share one scan via
    * cached tagging. */
  def withErrorChannel(raw: DataFrame, valid: Column): (DataFrame, DataFrame) = {
    val tagged = raw.withColumn("_valid", valid)
    (tagged.filter(col("_valid")).drop("_valid"),
      tagged.filter(!col("_valid")).drop("_valid"))
  }
}
