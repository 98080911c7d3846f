package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.jexl._
import graft.jexl.Node._
import graft.operators.TextOps

/** `#EXCERPT_FIELDS` → `HIT_EXCERPT` — the ExcerptTransform analog
  * (ExcerptTransform.java:53,201: attach a phrase-window excerpt to each
  * returned document; ExcerptFields.java:61-66 `FIELD/offset[/direction]`
  * spec syntax; TermFrequencyExcerptIterator fetches the offsets).
  *
  * The reference re-scans the tf column family for hit-phrase offsets;
  * here the document text is a column of the frame being queried, so the
  * excerpt is computed INLINE with the same tokenizer the `content:`
  * predicates use — no tf join, stays codegen'd, and the window math
  * matches [[graft.content.Content.excerpt]] (fixed-length slice clamped
  * at the document start).
  */
object Excerpts {

  /** One parsed spec: excerpt `offset` tokens around the phrase in
    * `field`, in `direction` BEFORE/AFTER/BOTH (ExcerptFields.java:64-65:
    * direction defaults to BOTH; the offset is mandatory). */
  final case class Spec(field: String, offset: Int, direction: String = "BOTH")

  def parse(specs: Seq[String]): Seq[Spec] = specs.map { s =>
    s.split("/").map(_.trim).filter(_.nonEmpty) match {
      case Array(f, o) => Spec(f, o.toInt)
      case Array(f, o, d) => Spec(f, o.toInt, d.toUpperCase)
      case _ => throw new ParseException(
        s"excerpt field spec '$s' is not FIELD/offset[/direction]")
    }
  }

  /** The first content phrase-shaped function in evaluation order — its
    * terms are what the excerpt centers on (the reference keys excerpts
    * off the phrase indexes recorded during evaluation). `within` and
    * `scoredPhrase` carry a leading numeric literal before the terms. */
  def phraseTerms(n: Node): Option[Seq[String]] = n match {
    case Func("content", name, args) =>
      val terms = args.collect { case LitArg(l) => l.raw }
      name.toLowerCase match {
        case "phrase" | "adjacent" => Some(terms).filter(_.nonEmpty)
        case "within" | "scoredphrase" => Some(terms.drop(1)).filter(_.nonEmpty)
        case _ => None
      }
    case And(cs) => cs.view.flatMap(phraseTerms).headOption
    case Or(cs) => cs.view.flatMap(phraseTerms).headOption
    case _ => None
  }

  /** Excerpt string around the FIRST occurrence of `terms` as a phrase in
    * `textCol`, or null when the phrase is absent. 1-based token
    * positions; the token array is bound once per row via a 1-element
    * `transform` (the same lambda-let trick as Compiler.phrasePred — an
    * unbound form would re-tokenize the document per window index). */
  def excerptCol(textCol: Column, terms: Seq[String], spec: Spec): Column = {
    val k = terms.size
    val lowered = terms.map(_.toLowerCase)
    try_element_at(transform(array(TextOps.tokens(textCol.cast(StringType))), toks => {
      val starts = when(size(toks) >= k,
        filter(sequence(lit(1), size(toks) - (k - 1)), i =>
          lowered.zipWithIndex.map { case (t, j) =>
            element_at(toks, (i + lit(j)).cast("int")) === lit(t)
          }.reduce(_ && _)))
        .otherwise(array().cast("array<int>"))
      val hit = try_element_at(starts, lit(1))
      val start = spec.direction match {
        case "AFTER" => hit
        case _ => greatest(hit - spec.offset, lit(1))
      }
      val len: Column = spec.direction match {
        case "BEFORE" => hit + lit(k) - start // through the phrase end
        case "AFTER" => lit(k + spec.offset)
        case _ => lit(k + 2 * spec.offset) // BOTH: fixed window
      }
      when(hit.isNotNull,
        array_join(slice(toks, start.cast("int"), len.cast("int")), " "))
        .otherwise(lit(null).cast("string"))
    }), lit(1))
  }
}
