package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the
  * subword-vocabulary learner an LLM data pipeline runs before
  * tokenizing a corpus (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units"; the reference has no
  * tokenizer-training surface at all — its `src/api.py:24-42` only
  * embeds the query and retrieves top-3 chunks from ChromaDB).
  *
  * Scale shape — why this survives 100 TB of text: training never
  * iterates the corpus. ONE corpus pass builds the distinct
  * word-frequency table (a groupBy — the only corpus-sized shuffle),
  * and every merge round after that runs on the VOCABULARY: explode
  * each distinct word's current symbol sequence into adjacent pairs
  * weighted by word frequency, aggregate pair counts (shuffle bounded
  * by distinct pairs), pick the argmax, and rewrite the vocabulary's
  * sequences with the merge applied. Cost per round = O(vocab), rounds
  * = the requested merge count; corpus size only matters once. This is
  * exactly how production trainers (HuggingFace `tokenizers`,
  * SentencePiece BPE) structure it.
  *
  * Determinism contract: pure function of the corpus multiset — ties
  * on pair count break by pair string ascending, and the per-word
  * merge application is leftmost-first non-overlapping. A re-run,
  * a repartition, or an external reimplementation lands the identical
  * merge table (pinned in BpeSpec; t20's driver gate is rows-only
  * because replaying iterative leftmost merges in one SQL statement is
  * not reasonably expressible in the oracle dialect).
  *
  * The driver-side loop holds only the learned merge list (N pairs) —
  * model-sized state, the [[graft.vector.KMeans]] precedent; each
  * round's argmax is a 1-row collect.
  */
object Bpe {

  /** Leftmost-first non-overlapping application of ONE merge rule to a
    * symbol sequence: ("l","o","w","o") + merge(o,w) → ("l","ow","o").
    * Sequential fold semantics (the result of position i depends on
    * whether i-1 merged) — a per-row Scala UDF by necessity, the
    * documented chunker tier. */
  private def mergeUdf: UserDefinedFunction =
    udf { (syms: Seq[String], a: String, b: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b
          i += 2
        } else {
          out += syms(i)
          i += 1
        }
      }
      out.toSeq
    }

  /** The distinct-word frequency table of a text column, each word as
    * its initial character-symbol sequence. The ONLY corpus-sized
    * step. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .transform(wordTableOf(_, "word", "freq"))

  /** [[wordTable]] from an ALREADY-AGGREGATED (word, count) frame — a
    * caller that computes per-source word usage anyway (t21) derives
    * the vocabulary from the reduced counts instead of re-scanning the
    * corpus; the character-symbol split convention lives here once. */
  def wordTableOf(counts: DataFrame, wordCol: String,
      freqCol: String): DataFrame =
    counts.select(
      array_remove(split(col(wordCol), "(?!^)"), "").as("syms"),
      col(freqCol).cast("long").as("freq"))

  /** Learn `n` merges. Returns (rank, left, right, pair_count) — rank
    * 1 is the first (highest-count) merge. */
  def train(spark: SparkSession, words: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    var vocab = words.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < n && !exhausted) {
      // adjacent pairs = the sequence zipped with its own tail (stays
      // inside each word — no cross-row window needed)
      val len = greatest(size(col("syms")) - 1, lit(0))
      val pairs = vocab
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), len),
            slice(col("syms"), lit(2), len))).as("p"))
        .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"),
          col("freq"))
        .groupBy("a", "b").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val row = pairs.head
        val a = row.getString(0)
        val b = row.getString(1)
        val cnt = row.getLong(2)
        merges += ((r + 1, a, b, cnt))
        vocab = vocab
          .select(mergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("freq"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Tokenize a symbol-sequence column with an ALREADY-LEARNED merge
    * list, applied in rank order — the serving path (broadcast the
    * model, map the corpus once). */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (df, (a, b)) =>
      df.select(mergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("freq"))
    }
}
