package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines:
  * language ID (marker-word heuristic), quality scoring, token counting,
  * document fingerprinting (rolling hash).
  *
  * Everything here is a pure Catalyst expression tree over built-ins —
  * codegen'd, push-down-safe, no UDF barriers — and every arithmetic path
  * is deterministic (fixed op order) so results replay identically on the
  * DuckDB oracle. */
object TextOps {

  def wsTokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(wsTokens(text)).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks — the usual pre-tokenizer shape. */
  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Fraction of tokens found in `words` (e.g. a stopword list). */
  def wordHitRatio(text: Column, words: Seq[String]): Column = {
    val toks = wsTokens(text)
    size(filter(toks, t => array_contains(typedlit(words), t)))
      .cast("double") / size(toks)
  }

  /** Count of tokens found in `words`. */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(wsTokens(text), t => array_contains(typedlit(words), t)))
      .cast("long")

  /** Type-token ratio: distinct tokens / tokens. */
  def typeTokenRatio(text: Column): Column = {
    val toks = wsTokens(text)
    size(array_distinct(toks)).cast("double") / size(toks)
  }

  /** Mean word length (chars excluding spaces / token count). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      size(wsTokens(text))

  /** English stopword sample used by the default quality score. */
  val EnStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "is", "in", "a", "it", "that", "for")

  /** Composite quality score in [0,1]: lexical diversity + stopword
    * plausibility + length adequacy. Weights fixed; op order fixed. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(lit(1.0), size(wsTokens(text)) / lit(50.0))
    round(typeTokenRatio(text) * 0.4 +
      wordHitRatio(text, EnStopwords) * 0.3 +
      lenScore * 0.3, 6)
  }

  /** Marker-word tables for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that"),
    "es" -> Seq("el", "la", "los", "que", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有", "我"))

  /** Marker-hit counts per language, in [[LangMarkers]] order, as one
    * array column. Materialize this behind a projection (withColumn)
    * before [[langIdFromHits]] on hot paths: the CASE chain references
    * every count up to 4 times, and higher-order filter expressions are
    * interpreted — an inline form would re-tokenize per reference. */
  def langIdHits(text: Column): Column =
    array(LangMarkers.map { case (_, words) => wordHits(text, words) }: _*)

  /** Argmax over a [[langIdHits]] array; ties break alphabetically
    * (the CASE chain checks langs in sorted order with >=). */
  def langIdFromHits(hits: Column): Column = {
    val byLang = LangMarkers.map(_._1).zipWithIndex.map {
      case (lang, i) => lang -> element_at(hits, i + 1)
    }
    val branches = byLang.map { case (lang, h) =>
      val geAll = byLang.filter(_._1 != lang).map(o => h >= o._2)
        .reduce(_ && _)
      (lang, geAll)
    }
    branches.init.foldRight(lit(branches.last._1)) {
      case ((lang, cond), elseCol) => when(cond, lang).otherwise(elseCol)
    }
  }

  /** Predicted language in one expression — convenient for single rows;
    * prefer the two-step langIdHits/langIdFromHits on large scans. */
  def langId(text: Column): Column = langIdFromHits(langIdHits(text))

  /** Char-fold polynomial hash (base 131, mod 2^31-1) — engine-portable,
    * implemented as a codegen'd Catalyst expression (hot path). */
  def charPolyHash(c: Column): Column =
    graft.plans.GraftExpressions.poly_hash(c)

  /** Document fingerprint: rolling hash folding per-token char-poly
    * hashes — order-sensitive, whitespace-normalization-insensitive
    * (empty tokens from repeated separators are skipped so "a b" and
    * "a  b" fingerprint identically). */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(wsTokens(text), t => length(t) > 0),
      lit(0L),
      (acc, tok) => (acc * 131 + charPolyHash(tok)) % 2147483647L)
}
