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
}
