package graft

import graft.functions.TextFeatures
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for training-data pipelines:
 * token counting, quality scoring, stopword-profile language ID,
 * and content fingerprinting. All are pure Catalyst expression trees
 * (no UDFs) so they stay inside whole-stage codegen — at 100 TB the
 * entire text pass is one scan with no serialization boundary.
 *
 * Determinism: only regex constructs shared by Java and RE2 are used
 * so the DuckDB oracles match byte-for-byte.
 */
object TextAnalysisCols {

  /** Whitespace tokens of trimmed text (empty string → empty array). */
  def wsTokens(c: Column): Column = {
    val trimmed = trim(c)
    when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
  }

  def wsTokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish token count: letter runs, digit runs, single punct. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Common-English stopwords used by quality scoring. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /**
   * Quality features: token count, stopword count/ratio, punctuation
   * count/ratio, and a combined [0,1] score — computed by the native
   * one-pass [[TextFeatures.TextQualityExpr]] (the equivalent
   * split/filter/regexp Column tree re-materialized token arrays per
   * derived column; ~10× slower at sf0.1).
   */
  def qualityFeatures(c: Column): Seq[Column] = {
    val q = TextFeatures.qualityStruct(c, EnStop)
    TextFeatures.Fields.map { case (n, _) => q.getField(n).as(n) }
  }

  /** Per-language stopword profiles for the language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /**
   * Language ID: count profile-stopword hits per language, pick the
   * max (ties broken by profile order, zero hits → "und").
   */
  def langId(c: Column): Column = {
    val tokens = wsTokens(c)
    val scores = LangProfiles.map { case (lang, words) => lang -> countIn(tokens, words) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), els) =>
      when(score > 0 && score === maxScore, lit(lang)).otherwise(els)
    }
  }

  /** Normalized fingerprint: md5 over sorted lowercase tokens. */
  def normFingerprint(c: Column): Column =
    md5(array_join(array_sort(wsTokens(lower(c))), " "))
}
