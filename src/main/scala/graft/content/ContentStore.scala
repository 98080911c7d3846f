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

  /** One `DOCUMENT:shardId/datatype/uid` term of a content query
    * (ContentQueryLogic.java:14-20 query syntax). Shard/datatype are
    * optional pruning hints when the term carries fewer segments. */
  final case class DocRef(shard: Option[String], datatype: Option[String],
                          uid: String)

  /** Parse the ContentQueryLogic query string: whitespace-separated
    * `DOCUMENT:shardId/datatype/uid` terms (ContentQueryLogic.java:14-20;
    * the last segment is the uid, earlier segments narrow the seek). */
  def parseDocumentQuery(query: String): Seq[DocRef] =
    query.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { term =>
      val body = if (term.toUpperCase.startsWith("DOCUMENT:"))
        term.substring("DOCUMENT:".length) else term
      body.split("/").toSeq match {
        case Seq(uid)           => DocRef(None, None, uid)
        case Seq(dt, uid)       => DocRef(None, Some(dt), uid)
        case shard +: rest      =>
          DocRef(Some(shard), Some(rest.head), rest.last)
      }
    }

  /** Fetch by parsed refs; `viewAll` additionally returns every CHILD
    * document of each requested uid (`content.view.all` — the reference
    * widens the per-document seek range from PARENT_ONLY to ALL,
    * ContentQueryLogic.java:26-27: dotted-uid descendants). */
  def fetchByRefs(content: DataFrame, refs: Seq[DocRef],
                  view: Option[String] = None,
                  viewAll: Boolean = false): DataFrame = {
    val uids = refs.map(_.uid)
    val base =
      if (viewAll) {
        // descendants share the uid as a dotted prefix; the needle set
        // is tiny, so the OR of codegen'd prefix tests stays a scan
        // predicate (partition-prunable on the uid-bucketed layout)
        val cond = uids.map(u =>
            col("uid") === u || col("uid").startsWith(u + "."))
          .reduce(_ || _)
        content.filter(cond)
      } else content.filter(col("uid").isin(uids: _*))
    val dts = refs.flatMap(_.datatype).distinct
    val dtPruned =
      if (dts.nonEmpty && refs.forall(_.datatype.isDefined))
        base.filter(col("datatype").isin(dts: _*))
      else base
    view.fold(dtPruned)(v => dtPruned.filter(col("view_name") === v))
  }

  /** Decode fetched content back to text (the response-side transform). */
  def decoded(fetched: DataFrame): DataFrame =
    fetched.withColumn("text", col("content").cast("string"))
}
