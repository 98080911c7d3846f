package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `text`
  * column: tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting. All native expressions (codegen'd, distributed); the
  * oracle mirrors each formula exactly, so every op is hash-checkable.
  */
object TextOps {

  /** Lowercased word tokens: split on non-alphanumeric runs, drop empties.
    * (The reference tokenizes content at ingest with a Lucene-style
    * analyzer — ContentIndexingColumnBasedHandler.java:63; this is the
    * equivalent normalize+split for analysis purposes.) */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Normalized text for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic document fingerprint (content hash) — exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  // --- quality scoring -----------------------------------------------

  /** Count of alphabetic characters. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", ""))

  /** Count of punctuation characters. */
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", ""))

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that", "are", "be")

  /** Fraction of tokens that are (English) stopwords — a fluency signal. */
  def stopwordRatio(text: Column, stops: Seq[String] = EnStopwords): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      size(filter(t, x => x.isin(stops.map(lit(_)): _*)))
        .cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Structured quality row: counts + ratios + a keep/drop heuristic in
    * the spirit of C4/Gopher-style filters (length bounds, alpha ratio,
    * stopword presence). */
  def qualityColumns(text: Column): Seq[Column] = {
    val t = tokens(text)
    val nTok = size(t)
    val nChars = length(text)
    val alphaRatio = when(nChars > 0,
      alphaChars(text).cast("double") / nChars.cast("double")).otherwise(0.0)
    val meanTokLen = when(nTok > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / nTok.cast("double")).otherwise(0.0)
    Seq(
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      alphaRatio.as("alpha_ratio"),
      meanTokLen.as("mean_token_len"),
      stopwordRatio(text).as("stopword_ratio"),
      (nTok >= 5 && nTok <= 100000 && alphaRatio > 0.6).as("quality_keep"))
  }

  // --- language identification ----------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deterministic: score = #distinct stopwords of that language present;
    * argmax with fixed preference order (en,de,es,fr), 'und' if all 0. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "un", "une", "dans", "pour"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val t = array_distinct(tokens(text))
    LangStopwords.map { case (lang, stops) =>
      lang -> size(array_intersect(t, array(stops.map(lit(_)): _*)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // fold from the right so earlier languages win ties (fixed preference
    // order keeps the heuristic deterministic and oracle-expressible)
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  // --- derived DataFrames ----------------------------------------------

  def analyze(docs: DataFrame): DataFrame =
    docs.select(Seq(col("doc_id")) ++ qualityColumns(col("text"))
      :+ langId(col("text")).as("lang_pred")
      :+ fingerprint(col("text")).as("fingerprint"): _*)
}
