package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis building blocks (language ID, quality
  * scoring, token counting, fingerprinting). Everything here is Spark
  * built-in expression composition — codegen'd, pushdown-friendly, no
  * UDFs — and each derivation has an exact ANSI-SQL mirror for the
  * DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. `array_remove` (a plain
    * collection expression) instead of a `filter` HOF — same semantics,
    * cheaper evaluation. */
  def tokens(c: Column): Column = array_remove(split(c, "\\s+"), "")

  /** Raw whitespace split (positions preserved; may contain one leading
    * empty token if the text starts with whitespace). Used where
    * positional alignment with the oracle matters. */
  def rawTokens(c: Column): Column = split(c, "\\s+")

  /** BPE-ish regex token count: letter runs, digit runs, single
    * non-alphanumeric marks. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(TokenPattern), lit(0))).cast("long")

  /** Count of punctuation characters. */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("long")

  /** Language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny by construction — the point is the *operator shape*
    * (token explode → profile join → per-doc argmax), which is how a
    * real profile table (e.g. CLD3-style n-gram weights) would plug in. */
  val StopwordProfiles: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "and", "en" -> "of", "en" -> "is",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "y",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "fr" -> "le", "fr" -> "les", "fr" -> "des", "fr" -> "et", "fr" -> "est",
    "zh" -> "de5", "zh" -> "shi4", "zh" -> "le5", "zh" -> "bu4", "zh" -> "zai4")

  /** English stopwords used by the quality scorer. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "is", "in", "to", "it", "that", "for")

  /** Count of tokens that are in the given stopword list. */
  def stopwordCount(c: Column, stops: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(stops))).cast("long")

  /** PII scrubbing patterns (training-data redaction): email addresses,
    * North-American phone shapes, IPv4 literals. Deliberately simple,
    * deterministic regexes — the production path swaps in vetted
    * patterns behind the same redact call. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact all three PII classes to the given sentinel. */
  def redactPii(c: Column, sentinel: String = "[REDACTED]"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, sentinel),
        PhonePattern, sentinel),
      Ipv4Pattern, sentinel)
}
