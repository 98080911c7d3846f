package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable DocumentTransform chain (transformer/DocumentTransform.java
  * analog) + result enrichment/filter stages (DataEnricher /
  * DataTypeFilter, ShardQueryLogic.java:157-167): result post-processing
  * as an ordered pipeline of declarative stages, replacing the fixed-order
  * post-ops with user-composable ones.
  */
object Transforms {

  type DocumentTransform = DataFrame => DataFrame

  /** Apply a chain in order. */
  def chain(stages: Seq[DocumentTransform]): DocumentTransform =
    df => stages.foldLeft(df)((d, t) => t(d))

  /** DocumentProjection stage. */
  def project(fields: Seq[String]): DocumentTransform = { df =>
    val keep = fields.map(_.toUpperCase).toSet
    df.select(df.columns.filter(c => keep.contains(c.toUpperCase)).map(col): _*)
  }

  /** FieldRename stage. */
  def rename(mapping: Map[String, String]): DocumentTransform = { df =>
    mapping.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(d.columns.find(_.equalsIgnoreCase(from)).getOrElse(from), to)
    }
  }

  /** DataEnricher stage: add derived fields. */
  def enrich(fields: Map[String, Column]): DocumentTransform = { df =>
    fields.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }

  /** DataTypeFilter stage: post-evaluation row filter. */
  def where(pred: Column): DocumentTransform = _.filter(pred)

  /** Result dedup stage (DedupingIterator analog — exact, no bloom
    * false-positives). */
  def dedup(keys: Seq[String]): DocumentTransform =
    df => df.dropDuplicates(keys)

  /** Result decoration over the LONG (uid, field, value) layout
    * (EventQueryDataDecorator.java:23-63 /
    * EventQueryDataDecoratorTransformer): for each document, walk the
    * ORDERED `patterns` list (sourceField → template) and let the FIRST
    * entry whose source field is present win; its value substitutes
    * every `@field_value@` occurrence in the template. If the document
    * already has `destField` rows, ALL of them get the new value
    * (markings untouched — the reference only setValue()s); otherwise
    * one new row is appended inheriting the source value's visibility.
    * The reference reads the source multimap's first value and logs
    * when a source is multi-valued ("use the first"); iteration order
    * there is ingest order, which the long layout doesn't preserve, so
    * the deterministic stand-in is the minimum value (pinned in
    * TransformsSpec).
    *
    * Plan shape: ONE priority-tagged scan of the source + dest fields →
    * a per-uid aggregate (map-side combined) computing both the
    * min-struct winner and a has-dest flag → one uid-keyed join against
    * the dest rows; the append leg is a FILTER on the aggregate (no
    * anti-join, no second dest scan). No per-pattern passes, no window
    * (measured: per-uid window partitions are tiny, so WindowExec's
    * sort + per-partition overhead loses to the map-side-combined
    * aggregate here). */
  def decorate(destField: String, patterns: Seq[(String, String)],
               placeholder: String = "@field_value@"): DocumentTransform = { df =>
    val srcFields = patterns.map(_._1)
    val prioOf = patterns.zipWithIndex
      .map { case ((f, _), i) => (f, i) }.toMap
    val prio = srcFields.foldLeft(lit(Int.MaxValue)) { (acc, f) =>
      when(col("field") === f, lit(prioOf(f))).otherwise(acc)
    }
    // min struct = lowest-priority pattern first, then the minimum
    // source value (the deterministic "first"), carrying that value's
    // row context for the append leg
    val chosen = df.filter(col("field").isin(srcFields :+ destField: _*))
      .groupBy("uid")
      .agg(
        min(when(col("field").isin(srcFields: _*),
          struct(prio.as("prio"), col("value").as("src_value"),
            col("visibility").as("src_vis"), col("datatype").as("src_dt"),
            col("shard_date").as("src_date")))).as("m"),
        max(col("field") === destField).as("has_dest"))
      .filter(col("m").isNotNull)
      .select(col("uid"), col("m.prio").as("prio"),
        col("m.src_value").as("src_value"), col("m.src_vis").as("src_vis"),
        col("m.src_dt").as("src_dt"), col("m.src_date").as("src_date"),
        col("has_dest"))
    // template substitution, driver-side split so ALL placeholder
    // occurrences are replaced (String.replace semantics), codegen'd
    def rendered(prioCol: Column, value: Column): Column =
      patterns.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, ((_, template), i)) =>
          val parts = template.split(java.util.regex.Pattern.quote(placeholder), -1)
          val pieces = parts.zipWithIndex.flatMap { case (p, j) =>
            if (j == 0) Seq(lit(p)) else Seq(value, lit(p))
          }
          when(prioCol === i, concat(pieces: _*)).otherwise(acc)
      }
    val withNew = chosen
      .select(col("uid"), rendered(col("prio"), col("src_value")).as("new_value"),
        col("src_vis"), col("src_dt"), col("src_date"), col("has_dest"))
    val dest = df.filter(col("field") === destField)
    val rest = df.filter(col("field") =!= destField)
    val overwritten = dest.join(withNew.select("uid", "new_value"), Seq("uid"), "left")
      .withColumn("value", coalesce(col("new_value"), col("value")))
      .drop("new_value")
      .select(df.columns.map(col): _*)
    val appended = withNew.filter(!col("has_dest"))
      .select(col("uid"), col("src_dt").as("datatype"),
        col("src_date").as("shard_date"), col("src_vis").as("visibility"),
        lit(destField).as("field"), lit("").as("group"),
        col("new_value").as("value"))
      .select(df.columns.map(col): _*)
    rest.unionByName(overwritten).unionByName(appended)
  }
}
