package graft.jexl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-model loading from a model TABLE — the model is DATA, not code
  * (QueryModelLoader.java:107-133 builds a QueryModel from model-table
  * entries at query time; QueryModelVisitor.java:58 then applies it;
  * ShardQueryLogic.initialize wires the loaded model in). Re-expressed
  * relationally: one row per mapping,
  *
  * {{{ (model_name, alias, field, direction) }}}
  *
  * where direction is FORWARD (query alias → db field; several rows per
  * alias = 1→N expansion) or REVERSE (db field → display name, applied
  * to results). Per-field normalizer names (the DatawaveMetadata `t`
  * rows ExpandMultiNormalizedTerms reads) ride in a second frame of
  * `(field, norm)` rows — the same catalog shape
  * [[graft.ingest.Ingest.metadata]] maintains.
  *
  * The collect is driver-side and POLICY-BOUNDED like the reference's
  * model cache load: a model is curated configuration (hundreds of rows,
  * not data volume); loading refuses past `maxEntries`.
  */
object QueryModelLoader {

  /** Build the forward model (+ normalizers) for `modelName` from table
    * rows. `types`: optional `(field, norm)` frame; multiple rows per
    * field = multi-normalizer matching (term matches under ANY). */
  def load(modelTable: DataFrame, modelName: String,
           types: Option[DataFrame] = None,
           maxEntries: Int = 10000): QueryModel = {
    val rows = modelTable
      .filter(upper(col("model_name")) === modelName.toUpperCase &&
        upper(col("direction")) === "FORWARD")
      .select(upper(col("alias")).as("alias"), col("field"))
      .limit(maxEntries + 1)
      .collect()
    if (rows.length > maxEntries)
      throw new PolicyException(
        s"model '$modelName' exceeds $maxEntries forward mappings — refusing")
    val forward = rows.groupBy(_.getString(0))
      .map { case (a, rs) => a -> rs.map(_.getString(1)).toSeq.sorted }
    val fieldNorms = types.map { t =>
      val trs = t.select(upper(col("field")).as("field"), col("norm"))
        .limit(maxEntries + 1).collect()
      if (trs.length > maxEntries)
        throw new PolicyException(
          s"normalizer table exceeds $maxEntries entries — refusing")
      trs.groupBy(_.getString(0))
        .map { case (f, rs) => f -> rs.map(_.getString(1)).toSeq.sorted }
    }.getOrElse(Map.empty[String, Seq[String]])
    // normalizers attach to DB fields in the catalog (metadata `t` rows);
    // queries name ALIASES — register each alias with the union of its
    // target fields' normalizers so both lookups resolve
    val aliasNorms = forward.flatMap { case (alias, fs) =>
      val ns = fs.flatMap(f => fieldNorms.getOrElse(f.toUpperCase, Nil)).distinct
      if (ns.isEmpty) None else Some(alias -> ns.sorted)
    }
    QueryModel(forward, fieldNorms ++ aliasNorms)
  }

  /** REVERSE mappings for `modelName`: db field → display name, the
    * result-side renames (QueryModel.addTermToReverseModel). Feed into
    * `QueryParams.renameFields`. */
  def reverseRename(modelTable: DataFrame, modelName: String,
                    maxEntries: Int = 10000): Map[String, String] = {
    val rows = modelTable
      .filter(upper(col("model_name")) === modelName.toUpperCase &&
        upper(col("direction")) === "REVERSE")
      .select(col("field"), col("alias"))
      .limit(maxEntries + 1)
      .collect()
    if (rows.length > maxEntries)
      throw new PolicyException(
        s"model '$modelName' exceeds $maxEntries reverse mappings — refusing")
    rows.map(r => r.getString(0) -> r.getString(1)).toMap
  }
}
