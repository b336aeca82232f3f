package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristics.
  *
  * All are pure `Column` compositions over built-in (codegen'd) functions —
  * no UDFs — so they survive whole-stage codegen and push down cleanly at
  * 100 TB. Document fingerprinting (stateful winnowing) lives in
  * [[graft.text.Winnow]] as a native Catalyst expression.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count; 0 for empty/blank documents. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(wsTokens(text)))

  /** BPE-style pre-tokenization (GPT-2-like): runs of letters, runs of
    * digits, runs of other non-space symbols, each with an optional leading
    * space. Approximates subword-tokenizer input segmentation.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(" ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"), lit(0))

  /** Character count. */
  def charCount(text: Column): Column = length(text)

  /** Ratio of punctuation characters to all characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  /** Mean whitespace-token length in characters. */
  def meanWordLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(length(trim(text)) === 0, 0.0)
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks))
  }

  /** English stopword ratio over whitespace tokens. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val stops = filter(toks, t => t.isInCollection(EnglishStopwords))
    when(length(trim(text)) === 0, 0.0)
      .otherwise(size(stops).cast("double") / size(toks))
  }

  /** Composite document quality score in [0,1]: rewards moderate length,
    * some stopwords (natural language), and low punctuation density.
    * Heuristic in the spirit of C4/Gopher quality filters (public).
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lengthScore = least(n.cast("double") / 64.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    (lengthScore + stopScore + punctPenalty) / 3.0
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deterministic and engine-portable.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Marker-hit count for one language's word list. */
  def langHits(text: Column, markers: Seq[String]): Column = {
    val toks = wsTokens(lower(text))
    size(filter(toks, t => t.isInCollection(markers)))
  }

  /** Predicted language: argmax of marker hits, ties and all-zero falling
    * back to "en". Pure column expression (a chain of whens), portable to
    * the SQL oracle.
    */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> langHits(text, ms) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("en"): Column) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  // ---------------------------------------- repetition / format signals
  // (the Gopher repetition filters, Rae et al. 2021 §A1.1 — public)

  /** Non-blank lines of a document. */
  private def contentLines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** Fraction of non-blank lines that are duplicates of an earlier line
    * (1 − distinct/total); 0 for documents without content lines.
    */
  def dupLineFraction(text: Column): Column = {
    val ls = contentLines(text)
    when(size(ls) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** Fraction of non-blank lines that start with a bullet marker
    * (`-`, `*`, `•` after leading whitespace).
    */
  def bulletLineFraction(text: Column): Column = {
    val ls = contentLines(text)
    val bullets = filter(ls, l => ltrim(l).rlike("^[-*•]"))
    when(size(ls) === 0, 0.0)
      .otherwise(size(bullets).cast("double") / size(ls))
  }

  /** Fraction of non-blank lines that end with an ellipsis (`...` or `…`
    * after trailing whitespace).
    */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = contentLines(text)
    val ell = filter(ls, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))
    when(size(ls) === 0, 0.0)
      .otherwise(size(ell).cast("double") / size(ls))
  }

  /** Distinct whitespace-token fraction — low values flag token-level
    * repetition (the inverse of Gopher's duplicate-n-gram family at n=1).
    */
  def distinctTokenRatio(text: Column): Column = {
    val toks = wsTokens(text)
    when(length(trim(text)) === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
  }

  // ------------------------------------------------------- PII scrubbing
  // (C4-style cleanup, Raffel et al. 2020 — public; patterns kept to the
  // common regex subset so the DuckDB oracle matches byte-for-byte)

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"

  /** Emails → `<EMAIL>`, URLs → `<URL>` (URLs first: an email inside a
    * URL's query string should scrub as part of the URL).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")

  /** Count of email / URL matches (pre-scrub). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0)))

  // -------------------------------------------- C4 line-cleaning rules
  // (Raffel et al. 2020 §2.2 — the public line-level cleaning recipe)

  /** Lines that survive the C4 rules: terminal punctuation (`.!?"'`
    * after trailing whitespace) and at least `minWords` whitespace
    * words. Boilerplate (navigation, cookie banners, footers) rarely
    * forms punctuated sentences — these two checks remove most of it
    * with zero model cost, map-side.
    */
  def c4KeptLines(text: Column, minWords: Int = 5): Column =
    filter(split(text, "\n"), l =>
      rtrim(l).rlike("[.!?\"']$") &&
        size(filter(split(trim(l), "\\s+"), t => length(t) > 0)) >= minWords)

  /** The document after C4 line cleaning (kept lines re-joined). */
  def c4CleanText(text: Column, minWords: Int = 5): Column =
    array_join(c4KeptLines(text, minWords), "\n")

  /** C4's page-level rejection flag: lorem-ipsum placeholder text or a
    * curly brace (code spill) anywhere on the page.
    */
  def c4PageFlagged(text: Column): Column =
    lower(text).contains("lorem ipsum") || text.contains("{")
}
