package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, document
  * fingerprinting.
  *
  * Everything is a composition of builtin codegen'd expressions (split,
  * higher-order array functions, md5) — no UDFs, so the operators stay
  * inside whole-stage codegen and scale linearly with no shuffle. At 100 TB
  * these run as pure map stages over the document scan.
  */
object TextOps {

  /** Whitespace tokenization of normalized (lowercased, trimmed) text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (default n=3) as space-joined strings.
    * Docs shorter than n tokens yield one shingle = the whole text.
    * Evaluated by the native WordShingles expression (registered by
    * [[graft.sources.Tables]], the Dedup entry points, and
    * GraftExtensions); the equivalent composable tree
    * `transform(sequence(...), i => concat_ws(" ", slice(tokens, i, n)))`
    * costs ~2 ms per document interpreted. */
  def shingles(text: Column, n: Int = 3): Column =
    call_function("word_shingles", text, lit(n))

  /** Tiny public stopword lists per language — enough signal for an n-gram
    * heuristic language ID over web-style text. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "il"),
  )

  /** Count of tokens that are stopwords of `lang`. */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords(lang))))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:'\"()-]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Ratio of stopword tokens to all tokens (English list). */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") / greatest(tokenCount(text), lit(1))

  /** Mean token length (whitespace removed / token count). */
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Composite [0,1] quality score: length saturation + stopword presence +
    * punctuation sanity. Same formula as common web-corpus quality filters
    * (length/punct/stopword ratios). Truncated (floor) rather than rounded
    * at the 6th decimal: HALF_UP rounding of a value that lands exactly on
    * a .5 tie at 1e-6 is engine-dependent, floor of the same double is not. */
  def qualityScore(text: Column): Column =
    floor(
      (least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4 +
        least(stopwordRatio(text) * 5.0, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))) * 0.3) * 1e6) / 1e6

  /** Whole-document fingerprint: md5 of whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " ").cast("binary"))

  /** Shingle fingerprint: lexicographic min of word-3-gram md5s — a 1-hash
    * MinHash signature, robust to local edits. */
  def shingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s.cast("binary"))))

  /** Rolling polynomial (Rabin) fingerprint of the whitespace-normalized
    * text — the window-shiftable hash family behind content-defined
    * chunking. Native expression; registered alongside the other
    * NativeHashes functions. */
  def rollingFingerprint(text: Column): Column =
    call_function("rabin_fingerprint",
      regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Heuristic language ID: argmax of per-language stopword hits, with a
    * fixed priority order on ties. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en")
    val de = stopwordHits(text, "de")
    val es = stopwordHits(text, "es")
    val fr = stopwordHits(text, "fr")
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }
}
