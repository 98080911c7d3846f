package graft.content

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Raw document content storage + fetch — the `d` column family and
  * ContentQueryLogic (ExtendedContentIndexingColumnBasedHandler.java:
  * 94,558-598 write side; ContentQueryLogic.java:44-51 read side:
  * `DOCUMENT:shardId/datatype/uid` fetch).
  *
  * The reference stores gzip'd base64 bytes in Accumulo values; the lake
  * analog is a binary column in a content table partitioned the same way
  * as events, fetched by (datatype, uid[, view]).
  */
object ContentStore {

  /** Build the content table from a document frame: one row per
    * (uid, view) with the raw bytes. `compress` uses Spark's built-in
    * deflate-style codec pair (to_binary of the text here — the container
    * has no gzip SQL function; at scale the parquet page codec already
    * compresses, making value-level gzip redundant). */
  def contentTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", view: String = "RAW"): DataFrame =
    docs.select(col(idCol).cast("string").as("uid"),
      lit("document").as("datatype"),
      lit(view).as("view_name"),
      col(textCol).cast("binary").as("content"),
      length(col(textCol)).as("content_length"))

  /** ContentQueryLogic fetch: documents by uid set (and optional view).
    * A needle lookup — at scale this hits partition/file pruning on the
    * uid-bucketed layout rather than a scan. */
  def fetch(content: DataFrame, uids: Seq[String],
            view: Option[String] = None): DataFrame = {
    val base = content.filter(col("uid").isin(uids: _*))
    view.fold(base)(v => base.filter(col("view_name") === v))
  }

  /** Decode fetched content back to text (the response-side transform). */
  def decoded(fetched: DataFrame): DataFrame =
    fetched.withColumn("text", col("content").cast("string"))
}
