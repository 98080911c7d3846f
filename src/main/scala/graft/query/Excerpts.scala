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
  * excerpt is computed INLINE with the same tokenizer — and the same hit
  * semantics — the `content:` predicates use: ordered-consecutive for
  * phrase/scoredPhrase, unordered window for within/adjacent (the
  * Compiler maps content:adjacent to a k−1 window, so a document matched
  * by it need not contain the ordered phrase). No tf join, stays
  * codegen'd.
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

  /** Hit semantics of the driving content function. */
  sealed trait Mode
  /** Ordered consecutive positions (content:phrase / scoredPhrase). */
  case object Ordered extends Mode
  /** Unordered, span ≤ dist (content:within; adjacent = within(k−1)). */
  final case class Window(dist: Int) extends Mode

  final case class PhraseSpec(terms: Seq[String], mode: Mode)

  /** The first content phrase-shaped function in evaluation order — its
    * terms are what the excerpt centers on (the reference keys excerpts
    * off the phrase indexes recorded during evaluation). */
  def phraseTerms(n: Node): Option[PhraseSpec] = n match {
    case Func("content", name, args) =>
      val terms = args.collect { case LitArg(l) => l.raw }
      name.toLowerCase match {
        case "phrase" => Some(PhraseSpec(terms, Ordered)).filter(_.terms.nonEmpty)
        case "scoredphrase" => // leading literal is minScore
          Some(PhraseSpec(terms.drop(1), Ordered)).filter(_.terms.nonEmpty)
        case "adjacent" =>
          Some(PhraseSpec(terms, Window(math.max(terms.size - 1, 0))))
            .filter(_.terms.nonEmpty)
        case "within" => terms match { // leading literal is the distance
          case d +: rest if rest.nonEmpty =>
            scala.util.Try(PhraseSpec(rest, Window(BigDecimal(d).toInt))).toOption
          case _ => None
        }
        case _ => None
      }
    case And(cs) => cs.view.flatMap(phraseTerms).headOption
    case Or(cs) => cs.view.flatMap(phraseTerms).headOption
    case _ => None
  }

  /** Excerpt string around the FIRST hit of `phrase` in `textCol`, or
    * null when absent. 1-based token positions; the token array is bound
    * once per row via a 1-element `transform` (the same lambda-let trick
    * as Compiler.phrasePred — an unbound form would re-tokenize the
    * document per window index). */
  def excerptCol(textCol: Column, phrase: PhraseSpec, spec: Spec): Column = {
    val k = phrase.terms.size
    val lowered = phrase.terms.map(_.toLowerCase)
    try_element_at(transform(array(TextOps.tokens(textCol.cast(StringType))), toks => {
      // (lo, hi) = 1-based bounds of the first hit span, null when absent
      val (lo, hi) = phrase.mode match {
        case Ordered =>
          val starts = when(size(toks) >= k,
            filter(sequence(lit(1), size(toks) - (k - 1)), i =>
              lowered.zipWithIndex.map { case (t, j) =>
                element_at(toks, (i + lit(j)).cast("int")) === lit(t)
              }.reduce(_ && _)))
            .otherwise(array().cast("array<int>"))
          val s = try_element_at(starts, lit(1))
          (s, s + lit(k - 1))
        case Window(dist) =>
          // first anchor x (a term occurrence, the span minimum) such
          // that EVERY term occurs in [x, x+dist] — matches
          // Compiler.withinPred's ∃-tuple(max−min ≤ dist) semantics
          val anchors = filter(sequence(lit(1), size(toks)), x => {
            val hiB = least(x + lit(dist), size(toks))
            lowered.map(t => exists(sequence(x, hiB), q =>
              element_at(toks, q.cast("int")) === lit(t))).reduce(_ && _)
          })
          val x = try_element_at(anchors, lit(1))
          val hiB = least(x + lit(dist), size(toks))
          // per-term first occurrence ≥ x: the tightest qualifying tuple.
          // lo is least(qs), NOT x — the first qualifying anchor can sit
          // before the span's first term (x need not be an occurrence),
          // and the excerpt must hug the actual hit
          val qs = lowered.map(t => try_element_at(
            filter(sequence(x, hiB), q =>
              element_at(toks, q.cast("int")) === lit(t)), lit(1)))
          (if (qs.size == 1) qs.head else least(qs: _*),
            if (qs.size == 1) qs.head else greatest(qs: _*))
      }
      val start = spec.direction match {
        case "AFTER" => lo
        case _ => greatest(lo - spec.offset, lit(1))
      }
      val endTok: Column = spec.direction match {
        case "BEFORE" => hi
        case "AFTER" => hi + spec.offset
        case _ => phrase.mode match {
          // Ordered BOTH keeps the fixed (k + 2·offset) window clamped at
          // the document start — Content.excerpt / tf_excerpt semantics
          case Ordered => start + lit(k + 2 * spec.offset - 1)
          case _ => hi + spec.offset
        }
      }
      when(lo.isNotNull,
        array_join(slice(toks, start.cast("int"),
          (endTok - start + 1).cast("int")), " "))
        .otherwise(lit(null).cast("string"))
    }), lit(1))
  }
}
