package graft.content

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Term-frequency/position machinery: the Spark re-expression of the
  * reference's `tf` section + `content:` functions
  * (TermFrequencyIterator.java:28-33, ContentFunctions.java:91-245,
  * TermFrequencyList.java — the `termOffsetMap` JEXL variable becomes a
  * per-document map<term, positions> column).
  */
object Content {

  /** Build the tf table from a document table: one row per (doc, term)
    * with sorted 0-based token positions.
    * At scale this is the write-path product (tokenize once at ingest,
    * ShardedDataTypeHandler tf analog) — partitioned by the same key as
    * the documents so phrase evaluation joins are co-located. */
  def buildTf(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col(idCol), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** tf with a per-(doc, term) score — the TermWeight proto analog
    * (TermWeight.proto:10-14). Real ingest would carry analyzer weights;
    * here score = term frequency in the document: deterministic, and the
    * natural "how strong is this term here" signal. */
  def buildTfScored(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    buildTf(docs, idCol, textCol).withColumn("score", size(col("positions")))

  /** content:scoredPhrase (ContentFunctions.java:214-245): the phrase
    * must occur AND every term's score must reach minScore. */
  def scoredPhrase(tf: DataFrame, minScore: Int, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    val withScores = terms.zipWithIndex.map { case (t, i) =>
      tf.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"), col("score").as(s"s$i"))
    }.reduce((a, b) => a.join(b, "doc_id"))
    val scoreCond = terms.indices.map(i => col(s"s$i") >= minScore).reduce(_ && _)
    withScores.filter(phraseChain(terms) && scoreCond).select("doc_id")
  }

  /** Direct term-frequency lookup — TermFrequencyQueryTable analog
    * (TermFrequencyQueryTable.java:9-70: seek straight to the requested
    * documents' tf section; `termfrequency.match.term` optionally narrows
    * to one term). One row per (doc, term, position).
    *
    * Scale shape: the uid filter lands BEFORE tokenization, so only the
    * requested documents are ever tokenized — a partition-pruned needle
    * read, not a corpus-wide tf build. */
  def tfLookup(docs: DataFrame, uids: Seq[Long],
               matchTerm: Option[String] = None,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hit = docs.filter(col(idCol).isin(uids: _*))
    val exploded = hit.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
    matchTerm.fold(exploded)(t => exploded.filter(col("term") === t))
      .select(col(idCol), col("term"), col("pos"))
  }

  /** termOffsetMap as a column: map<term, array<int>> per document. */
  def termOffsetMap(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      map_from_entries_of(TextOps.tokens(col(textCol))).as("term_offsets"))

  private def map_from_entries_of(tokens: Column): Column = {
    // positions per term: aggregate over (pos, token) pairs
    val indexed = zip_with(tokens, sequence(lit(0), size(tokens) - 1),
      (t, i) => struct(t.as("term"), i.as("pos")))
    map_from_entries(
      transform(array_distinct(tokens), t =>
        struct(t.as("key"),
          filter(transform(indexed, e => when(e.getField("term") === t,
            e.getField("pos"))), p => p.isNotNull).as("value"))))
  }

  /** Positions of `term` for each doc as a joinable frame. */
  private def posFor(tf: DataFrame, term: String, idx: Int): DataFrame =
    tf.filter(col("term") === term)
      .select(col("doc_id"), col("positions").as(s"p$idx"))

  /** Docs where the ordered phrase occurs (content:phrase,
    * ContentFunctions.java:184-213). Successor rule per
    * ContentOrderedEvaluator.isWithIn (:321-355): each next term's
    * position must lie in [prev, prev + 1] — the SAME position is a
    * legal step when the terms differ (synonym tokens share an offset;
    * ContentFunctionsTest reverseAllSharedTokenIndex expects a phrase
    * satisfied entirely at one position), while a repeated query term
    * must advance (isSameTerm guard, :164). */
  def phrase(tf: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    val joined = joinTerms(tf, terms)
    joined.filter(phraseChain(terms)).select("doc_id")
  }

  /** ∃ x₀∈p0, …, xₖ∈pk with xᵢ ∈ [xᵢ₋₁ (+1 if same term), xᵢ₋₁+1]. */
  private def phraseChain(terms: Seq[String]): Column =
    exists(col("p0"), x0 => chainFrom(terms, 1, x0))

  /** Chain continuation from term `i` given the previous term's position —
    * the ONE successor rule (same-offset steps legal for differing terms,
    * repeated terms must advance), shared by [[phrase]] and [[excerpt]] so
    * a document phrase() matches is never dropped by excerpt(). */
  private def chainFrom(terms: Seq[String], i: Int, prev: Column): Column =
    if (i == terms.size) lit(true)
    else {
      val lo = if (terms(i) == terms(i - 1)) prev + 1 else prev
      exists(col(s"p$i"), x => x >= lo && x <= prev + 1 && chainFrom(terms, i + 1, x))
    }

  /** Docs where all terms occur within a window of `dist` positions
    * (content:within, ContentFunctions.java:91-137): ∃ tuple with
    * max(p)−min(p) ≤ dist, unordered. */
  def within(tf: DataFrame, dist: Int, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    val joined = joinTerms(tf, terms)
    joined.filter(tupleExists(terms.size, dist)).select("doc_id")
  }

  /** content:adjacent (ContentFunctions.java:141-182): all terms in
    * adjacent positions = window of size (#terms − 1). */
  def adjacent(tf: DataFrame, terms: Seq[String]): DataFrame =
    within(tf, terms.size - 1, terms)

  /** Inner-join the per-term position lists for each doc — the "index
    * intersection" step; docs missing any term drop out before the
    * position check (same short-circuit the reference's AndIterator does). */
  private def joinTerms(tf: DataFrame, terms: Seq[String]): DataFrame =
    terms.zipWithIndex.map { case (t, i) => posFor(tf, t, i) }
      .reduce((a, b) => a.join(b, "doc_id"))

  /** ∃ (x₀∈p0 … xₖ∈pk): greatest(xᵢ)−least(xᵢ) ≤ dist — built as nested
    * `exists` lambdas; position lists are short (per-doc term frequency),
    * so the product enumeration is bounded and stays codegen'd. */
  private def tupleExists(k: Int, dist: Int): Column = {
    def nest(i: Int, chosen: List[Column]): Column =
      if (i == k) {
        val all = chosen.reverse
        val hi = all.reduce((a, b) => greatest(a, b))
        val lo = all.reduce((a, b) => least(a, b))
        (hi - lo) <= dist
      } else
        exists(col(s"p$i"), x => nest(i + 1, x :: chosen))
    nest(0, Nil)
  }

  /** Excerpt around the first phrase hit (ExcerptTransform /
    * TermFrequencyExcerptIterator.java:36 analog): re-join the doc text
    * and slice ±`window` tokens around the match position. hit_pos is the
    * first p0 position from which [[chainFrom]] — the same successor rule
    * phrase() evaluates — succeeds, so every phrase-matched document gets
    * an excerpt row (including matches stepping through same-offset
    * synonym tokens), and the separate phrase() semi-join is unnecessary. */
  def excerpt(docs: DataFrame, tf: DataFrame, terms: Seq[String],
              window: Int): DataFrame = {
    val firstPos = joinTerms(tf, terms)
      .withColumn("hit_pos", try_element_at(
        filter(col("p0"), x0 => chainFrom(terms, 1, x0)), lit(1)))
      .filter(col("hit_pos").isNotNull)
      .select(col("doc_id"), col("hit_pos"))
    docs.join(firstPos, "doc_id")
      .select(col("doc_id"), col("hit_pos"),
        array_join(slice(TextOps.tokens(col("text")),
          greatest(col("hit_pos") - window + 1, lit(1)),
          lit(terms.size + 2 * window)), " ").as("excerpt"))
  }
}
