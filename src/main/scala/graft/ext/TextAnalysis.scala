package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  * All pure Catalyst column expressions — codegen'd, no UDFs, no
  * shuffles beyond the caller's aggregation.
  */
object TextAnalysis {

  /** Public, widely-published stopword samples per language — used as
    * n-gram/lexicon profiles for a deterministic heuristic language ID. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "que", "es", "por", "como"))

  /** Count of tokens (from an array column) found in `profile`. */
  def profileScore(tokens: Column, profile: Seq[String]): Column =
    size(filter(tokens, t => t.isin(profile: _*))).cast("long")

  /** Deterministic argmax over the four language scores, ties resolved
    * in en > de > fr > es order. */
  def predictLang(sEn: Column, sDe: Column, sFr: Column, sEs: Column): Column =
    when(sEn >= sDe && sEn >= sFr && sEn >= sEs, "en")
      .when(sDe >= sFr && sDe >= sEs, "de")
      .when(sFr >= sEs, "fr")
      .otherwise("es")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(text, "\\s+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, or single other
    * non-space chars — the pre-tokenization regex family used by
    * byte-pair encoders. */
  val bpeTokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenRegex), lit(0))).cast("long")

  /** Non-alphanumeric/non-space ("punctuation-ish") character ratio —
    * char class chosen to mean the same thing in Java regex and RE2,
    * case-insensitive so capitalized prose isn't counted as punctuation.
    * The count is the native PunctCount expression (one byte-loop pass)
    * rather than `length - length(regexp_replace(...))`, which pays a
    * regex engine plus a stripped string copy per row for the same
    * number. */
  val punctClass = "[^a-zA-Z0-9\\s]"
  def punctRatio(text: Column): Column =
    graft.functions.PunctCount.punct_count(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** Stopword token ratio. */
  def stopwordRatio(tokens: Column): Column =
    size(filter(tokens, t => t.isin(graft.ops.TextOps.stopWords: _*))).cast("double") /
      greatest(size(tokens).cast("double"), lit(1.0))

  /** Deterministic quality score in [0,1]: rewards length up to 100
    * tokens, penalizes stopword share and punctuation. Rational
    * arithmetic only — no transcendentals — so Spark and any oracle
    * compute bit-identical doubles. */
  def qualityScore(tokens: Column, text: Column): Column =
    qualityFromStaged(size(tokens).cast("long"),
      stopwordRatio(tokens), punctRatio(text))

  /** The SAME quality product over already-staged inputs — THE canonical
    * definition (qualityScore delegates here). Callers that have staged
    * the token count and both ratios (textStats, d10's member scoring)
    * use this form so the ratio exprs aren't re-evaluated per factor and
    * the formula exists in exactly one Spark-side place. */
  def qualityFromStaged(nTokens: Column, stopwordRatio: Column,
                        punctRatio: Column): Column =
    (least(nTokens.cast("double"), lit(100.0)) / lit(100.0)) *
      (lit(1.0) - stopwordRatio) * (lit(1.0) - punctRatio)

  /** Key-collision fingerprint (OpenRefine method): md5 of the sorted,
    * de-duplicated token set — robust to token order and repetition. */
  def fingerprint(tokens: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens))).cast("binary"))
}
