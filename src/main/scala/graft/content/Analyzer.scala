package graft.content

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Tokenizer SPI with analysis chain — the reference's content analyzer
  * (tokenize/StandardAnalyzer.java:20, TokenSearchSynonymFilter.java,
  * ngram truncation in ContentIndexingColumnBasedHandler): base tokens +
  * synonym expansion + length truncation, all as Column expressions so
  * the tf build stays one codegen'd pass.
  */
final case class Analyzer(
    synonyms: Map[String, Seq[String]] = Map.empty,
    maxTokenLength: Int = 0) {   // 0 = no truncation

  /** Token stream for `text` under this analyzer. Synonyms are emitted
    * AT THE SAME POSITION as the source token (the reference emits
    * zero-position-increment synonym tokens), which [[Content.buildTfWith]]
    * preserves by position-pairing before the explode. */
  def tokensWithSynonyms(text: Column): Column = {
    val base = truncated(TextOps.tokens(text))
    if (synonyms.isEmpty) transform(base, t => array(t))
    else {
      val entries = synonyms.toSeq.map { case (k, vs) =>
        struct(lit(k).as("key"), typedLit(vs).as("value"))
      }
      val synMap = map_from_entries(array(entries: _*))
      transform(base, t =>
        concat(array(t), coalesce(element_at(synMap, t),
          array().cast("array<string>"))))
    }
  }

  private def truncated(toks: Column): Column =
    if (maxTokenLength <= 0) toks
    else transform(toks, t => t.substr(lit(1), lit(maxTokenLength)))
}

object AnalyzedContent {

  /** tf build under an analyzer: one row per (doc, term) with positions;
    * synonym tokens share their source token's position. */
  def buildTfWith(docs: org.apache.spark.sql.DataFrame, analyzer: Analyzer,
                  idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.DataFrame =
    docs.select(col(idCol),
        posexplode(analyzer.tokensWithSynonyms(col(textCol))).as(Seq("pos", "terms")))
      .select(col(idCol), col("pos"), explode(col("terms")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
}
