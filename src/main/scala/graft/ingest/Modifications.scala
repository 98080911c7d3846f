package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modification service + age-off — the mutation story over the long
  * event layout (MutableMetadataHandler.java:188 insert/delete per event
  * field; age-off/FieldAgeOffFilter.java:39, DataTypeAgeOffFilter).
  *
  * On a lakehouse table these are MERGE/DELETE statements; expressed here
  * as pure-DataFrame rewrites (anti-join + union) so the semantics are
  * engine-complete without a table-format dependency — the reference
  * applies the same logic at compaction time.
  */
object Modifications {

  /** Field-level edits (the modification REST service's INSERT/DELETE). */
  sealed trait FieldEdit
  final case class PutField(uid: String, datatype: String, field: String,
                            value: String, group: String = "",
                            shardDate: java.sql.Date = null,
                            visibility: String = "") extends FieldEdit
  /** Delete all instances of (uid, field) — or only a specific value.
    * `group`/`shardDate`/`visibility` place the HISTORY trail row when
    * [[applyEdits]] runs with `insertHistory` — the reference inherits
    * the REMOVED entry's markings (the service tier reads them before
    * submitting the edit, so it passes them here). */
  final case class DeleteField(uid: String, datatype: String, field: String,
                               value: Option[String] = None,
                               group: String = "",
                               shardDate: java.sql.Date = null,
                               visibility: String = "") extends FieldEdit

  /** UPDATE (MutableMetadataHandler MODE.UPDATE, :369-377): remove the
    * REQUIRED old value and insert the new one as one edit. Existence of
    * the old value is the service tier's read-side check (the reference
    * validates against its current-entry scan); the edit itself is the
    * delete+insert pair. */
  final case class UpdateField(uid: String, datatype: String, field: String,
                               oldValue: String, newValue: String,
                               group: String = "",
                               shardDate: java.sql.Date = null,
                               visibility: String = "") extends FieldEdit {
    require(oldValue != null, "fieldValue parameter required for update")
  }

  val HistoryPrefix = "HISTORY_" // MutableMetadataHandler.java:198

  /** Apply edits: deletes anti-join out, puts append. One shuffle on the
    * delete keys; the long table never rewrites untouched rows.
    *
    * `insertHistory` mirrors MutableMetadataHandler.insertHistory
    * (:573-590): every insert/delete leg also appends a
    * `HISTORY_<FIELD>` row valued `<ts>:<user>:<value>:<mode>` (an
    * UPDATE contributes both its delete and its insert entry), so the
    * event's modification trail is queryable with the standard stack. */
  def applyEdits(long: DataFrame, edits: Seq[FieldEdit],
                 insertHistory: Boolean = false, user: String = "anonymous",
                 timeMillis: Long = 0L): DataFrame = {
    val spark = long.sparkSession
    import spark.implicits._
    val desugared = edits.flatMap {
      case u: UpdateField => Seq(
        DeleteField(u.uid, u.datatype, u.field, Some(u.oldValue)),
        PutField(u.uid, u.datatype, u.field, u.newValue, u.group,
          u.shardDate, u.visibility))
      case e => Seq(e)
    }
    val history: Seq[PutField] =
      if (!insertHistory) Seq.empty
      else edits.flatMap {
        case p: PutField => Seq(PutField(p.uid, p.datatype,
          HistoryPrefix + p.field, s"$timeMillis:$user:${p.value}:insert",
          p.group, p.shardDate, p.visibility))
        case dl: DeleteField => Seq(PutField(dl.uid, dl.datatype,
          HistoryPrefix + dl.field,
          s"$timeMillis:$user:${dl.value.getOrElse("")}:delete",
          dl.group, dl.shardDate, dl.visibility))
        case u: UpdateField => Seq(
          PutField(u.uid, u.datatype, HistoryPrefix + u.field,
            s"$timeMillis:$user:${u.oldValue}:delete", u.group,
            u.shardDate, u.visibility),
          PutField(u.uid, u.datatype, HistoryPrefix + u.field,
            s"$timeMillis:$user:${u.newValue}:insert", u.group,
            u.shardDate, u.visibility))
      }
    val dels = desugared.collect { case d: DeleteField => d }
    val puts = desugared.collect { case p: PutField => p } ++ history
    val afterDelete =
      if (dels.isEmpty) long
      else {
        val delDf = dels.map(d => (d.uid, d.datatype, d.field, d.value.orNull))
          .toDF("d_uid", "d_datatype", "d_field", "d_value")
        long.join(delDf,
          col("uid") === col("d_uid") && col("datatype") === col("d_datatype") &&
            col("field") === col("d_field") &&
            (col("d_value").isNull || col("d_value") === col("value")),
          "left_anti")
      }
    if (puts.isEmpty) afterDelete
    else {
      val putDf = puts.map(p => (p.uid, p.datatype,
          Option(p.shardDate).map(_.toString).orNull, p.visibility,
          p.field, p.group, p.value))
        .toDF("uid", "datatype", "shard_date", "visibility", "field", "group", "value")
        .withColumn("shard_date", col("shard_date").cast("date"))
      afterDelete.unionByName(putDf)
    }
  }

  /** Incrementally patch the GLOBAL INDEX for a batch of edits — the
    * REMOVEDUID path (MutableMetadataHandler.java:188 writes removal
    * entries on delete; GlobalIndexUidAggregator.java:21-25 nets them
    * against adds at compaction): deletes decrement the term count and
    * drop the uid from the Uid.List, puts increment and append, keys
    * netting to zero disappear, brand-new keys from puts materialize.
    * `long` is the PRE-edit long frame (a value-less DeleteField removes
    * every value of the (uid, field) — the values come from the data,
    * exactly like the reference's mutation service reading the event
    * before writing removal entries).
    *
    * Scale shape: the edit batch is small (a mutation request), so the
    * index is touched by two BROADCAST joins (anti + semi on the affected
    * keys); only the affected slice (tiny) runs the full-outer patch
    * merge. Like the reference, a saturated Uid.List (past the 20-cap)
    * stays exact in COUNT while the uid list is best-effort. */
  def patchIndex(index: DataFrame, long: DataFrame,
                 edits: Seq[FieldEdit]): DataFrame = {
    val spark = long.sparkSession
    import spark.implicits._
    val dels = edits.collect { case d: DeleteField => d }
    val puts = edits.collect { case p: PutField => p }
    if (dels.isEmpty && puts.isEmpty) return index
    val keys = Seq("value", "field", "shard_date", "datatype")
    val removed =
      if (dels.isEmpty) None
      else {
        val delDf = dels.map(d => (d.uid, d.datatype, d.field, d.value.orNull))
          .toDF("d_uid", "d_datatype", "d_field", "d_value")
        // left_semi, not inner: overlapping delete patterns (whole-field
        // AND value-specific for the same uid) must remove each long row
        // ONCE, not once per matching pattern
        Some(long.join(broadcast(delDf),
            col("uid") === col("d_uid") && col("datatype") === col("d_datatype") &&
              col("field") === col("d_field") &&
              (col("d_value").isNull || col("d_value") === col("value")), "left_semi")
          .select(col("value"), col("field"), col("shard_date"), col("datatype"),
            col("uid"), lit(-1L).as("delta")))
      }
    val added =
      if (puts.isEmpty) None
      else Some(puts.map(p => (p.value, p.field,
          Option(p.shardDate).map(_.toString).orNull, p.datatype, p.uid))
        .toDF("value", "field", "shard_date", "datatype", "uid")
        .withColumn("shard_date", col("shard_date").cast("date"))
        .withColumn("delta", lit(1L)))
    val delta = (removed ++ added).reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("delta")).as("cnt_delta"),
        collect_set(when(col("delta") === 1, col("uid"))).as("added_uids"),
        collect_set(when(col("delta") === -1, col("uid"))).as("removed_uids"))
    val deltaKeys = delta.select(keys.map(col): _*)
    // untouched keys pass through without a rewrite
    val unaffected = index.join(broadcast(deltaKeys), keys, "left_anti")
    // the affected slice is as small as the edit batch — full-outer merge
    // runs on it only (new keys from puts materialize here)
    val affected = index.join(broadcast(deltaKeys), keys, "left_semi")
      .join(delta, keys, "full_outer")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)) +
        coalesce(col("cnt_delta"), lit(0L)))
      .withColumn("uid_sample", {
        val sample = coalesce(col("uid_sample"), array().cast("array<string>"))
        val removedU = coalesce(col("removed_uids"), array().cast("array<string>"))
        val addedU = coalesce(col("added_uids"), array().cast("array<string>"))
        val survivors = array_except(sample, removedU)
        // added uids dedup against the SURVIVOR list, not the pre-removal
        // sample: a delete+put of the same uid in one batch (re-assert an
        // entry) must rejoin the list, and a sub-cap Uid.List is
        // contractually COMPLETE — silently dropping the uid would make
        // the needle scan's uid regime omit its events
        slice(concat(survivors, array_except(addedU, survivors)), 1, 20)
      })
      .filter(col("cnt") > 0)
      .select(index.columns.map(col): _*)
    unaffected.unionByName(affected)
  }

  /** Age-off rule: rows of (datatype?, field?) expire after ttlDays
    * (None = applies to all). */
  final case class AgeOffRule(datatype: Option[String] = None,
                              field: Option[String] = None, ttlDays: Int)

  /** Age-off sweep (the scheduled `DELETE WHERE` retention job): drop
    * rows expired under ANY matching rule as of `asOf`. */
  def ageOff(long: DataFrame, rules: Seq[AgeOffRule],
             asOf: java.sql.Date): DataFrame = {
    if (rules.isEmpty) return long
    val expired = rules.map { r =>
      val matches =
        r.datatype.map(col("datatype") === _).getOrElse(lit(true)) &&
        r.field.map(col("field") === _).getOrElse(lit(true))
      matches && datediff(lit(asOf), col("shard_date")) > r.ttlDays
    }.reduce(_ || _)
    long.filter(!expired)
  }
}
