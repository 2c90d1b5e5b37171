package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for LLM training-data pipelines (SURVEY §2 D7–D10).
 * All computations are deterministic integer/ratio math so the DuckDB
 * oracle can reproduce them exactly.
 *
 * Tokenization: lower-cased split on single spaces (the corpus is
 * single-spaced); punctuation-aware token counting uses a regex shared
 * verbatim with the oracle.
 */
object TextAnalysis {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "von", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"))

  /** Stopword hits (with duplicates) for one language list. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /**
   * n-gram/stopword language-ID heuristic: argmax of per-language
   * stopword hit counts; 'und' (unknown) when no list scores > 0.
   * Ties resolve in fixed order en > es > de > fr (greatest-with-CASE,
   * mirrored in SQL).
   */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopwordHits(t, "en"); val es = stopwordHits(t, "es")
    val de = stopwordHits(t, "de"); val fr = stopwordHits(t, "fr")
    val mx = greatest(en, es, de, fr)
    when(mx === 0, "und")
      .when(en === mx, "en").when(es === mx, "es")
      .when(de === mx, "de").otherwise("fr")
  }

  /** Punctuation-ish character count (shared regex with the oracle). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))

  /**
   * Quality features + a weighted score in [0,1]:
   * length norm, stopword ratio, repetition (1 - distinct/total tokens),
   * punctuation ratio.
   */
  def qualityFeatures(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val nd = size(array_distinct(t)).cast("double")
    val sw = stopwordHits(t, "en").cast("double")
    val pr = punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")
    struct(
      n.cast("long").as("n_tokens"),
      nd.cast("long").as("n_distinct"),
      round(sw / n, 6).as("stopword_ratio"),
      round(lit(1.0) - nd / n, 6).as("repetition"),
      round(pr, 6).as("punct_ratio"),
      round(
        least(n / 400d, lit(1.0)) * 0.4
          + (lit(1.0) - (lit(1.0) - nd / n)) * 0.4
          + least(sw / n * 10d, lit(1.0)) * 0.2, 6).as("quality"))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: letter runs, digit runs, single symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /**
   * Polynomial rolling-hash fingerprint over characters:
   * h = (h * 31 + codepoint) mod 1e9+7 — a Rabin–Karp document
   * fingerprint, reproducible in SQL via list_reduce (single compiled
   * pass; the HOF formulation was O(n²) in interpreted substr calls).
   */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.RollingHash(
        org.apache.spark.sql.graft.Bridge.expression(text)))
}
