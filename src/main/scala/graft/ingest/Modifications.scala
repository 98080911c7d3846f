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
  /** Delete all instances of (uid, field) — or only a specific value. */
  final case class DeleteField(uid: String, datatype: String, field: String,
                               value: Option[String] = None) extends FieldEdit

  /** Apply edits: deletes anti-join out, puts append. One shuffle on the
    * delete keys; the long table never rewrites untouched rows. */
  def applyEdits(long: DataFrame, edits: Seq[FieldEdit]): DataFrame = {
    val spark = long.sparkSession
    import spark.implicits._
    val dels = edits.collect { case d: DeleteField => d }
    val puts = edits.collect { case p: PutField => p }
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
