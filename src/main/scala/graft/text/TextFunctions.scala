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
}
