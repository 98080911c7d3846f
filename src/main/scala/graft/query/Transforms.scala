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
    * Plan shape: ONE pass — a single uid-partitioned WindowExec
    * (ordered by the priority-tagged source struct, so first_value IS
    * the min-struct winner, has-dest is a full-frame max, and
    * row_number marks one canonical emitter row per uid) feeding a
    * conditional 1-or-2-row explode that overwrites dest rows and
    * appends the missing-dest row in place. The previous
    * groupBy + uid-join + three-branch union re-executed the whole
    * upstream DAG once per branch — under a chain of decorates that
    * compounds (3 branches × 3 branches = 9 source scans for two
    * stages); the window form keeps exactly one scan and one
    * hashpartitioning(uid) exchange, which the NEXT chained decorate
    * reuses (its window repartitions on the same key). */
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
    val srcStruct = when(col("field").isin(srcFields: _*),
      struct(prio.as("prio"), col("value").as("src_value"),
        col("visibility").as("src_vis"), col("datatype").as("src_dt"),
        col("shard_date").as("src_date")))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("uid").orderBy(col("_src").asc_nulls_last)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
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
    val tagged = df.withColumn("_src", srcStruct)
      // same (partition, order) on all three → ONE WindowExec, one sort
      .withColumn("_w", first(col("_src"), ignoreNulls = true).over(full))
      .withColumn("_has_dest",
        max(col("field") === destField).over(full))
      .withColumn("_rn", row_number().over(ord))
    val newValue = rendered(col("_w.prio"), col("_w.src_value"))
    val others = df.columns.filterNot(_ == "uid")
    val passRow = struct(others.map {
      case "value" => when(col("field") === destField && col("_w").isNotNull,
        newValue).otherwise(col("value")).as("value")
      case c => col(c).as(c)
    }.toIndexedSeq: _*)
    val appendRow = struct(others.map {
      case "datatype" => col("_w.src_dt").as("datatype")
      case "shard_date" => col("_w.src_date").as("shard_date")
      case "visibility" => col("_w.src_vis").as("visibility")
      case "field" => lit(destField).as("field")
      case "group" => lit("").as("group")
      case "value" => newValue.as("value")
      case c => col(c).as(c)
    }.toIndexedSeq: _*)
    val emit = col("_rn") === 1 && col("_w").isNotNull && !col("_has_dest")
    tagged
      .select(col("uid"),
        explode(when(emit, array(passRow, appendRow))
          .otherwise(array(passRow))).as("_r"))
      .select(col("uid") +: others.map(c => col(s"_r.$c").as(c)).toIndexedSeq: _*)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
