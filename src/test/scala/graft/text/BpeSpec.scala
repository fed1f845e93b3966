package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Bpe]] merge training — the exact-semantics pins behind t20's
  * rows-only gate: hand-computed merges on the classic toy corpus
  * (count-desc/pair-asc tie-breaks, leftmost non-overlapping
  * application), invariance under repartitioning, and the serving path
  * reproducing the training-end vocabulary.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toyWords = {
    import spark.implicits._
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).mkString(" ")
    Bpe.wordTable(Seq(docs).toDF("text"), "text")
  }

  test("toy corpus learns the hand-computed merges with exact tie-breaks") {
    // pair counts round 1: (e,s)=9 and (s,t)=9 tie -> "es" < "st";
    // round 2: (es,t)=9; round 3: (l,o)=7 ties (o,w)=7 -> "lo" < "ow"
    val merges = Bpe.train(spark, toyWords, 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("training is repartition-invariant and leftmost application is non-overlapping") {
    import spark.implicits._
    val a = Bpe.train(spark, toyWords, 5).collect().toSeq
    val b = Bpe.train(spark, toyWords.repartition(7), 5).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "merge table must not depend on layout")
    // "aaaa" + merge(a,a): leftmost non-overlapping -> (aa, aa), never (a, aa, a)
    val runs = Seq("aaaa").toDF("text")
    val merged = Bpe.applyMerges(Bpe.wordTable(runs, "text"), Seq(("a", "a")))
      .select("syms").head().getSeq[String](0)
    assert(merged == Seq("aa", "aa"))
  }

  test("applyMerges replayed in rank order reproduces the trained vocabulary") {
    val words = toyWords
    val merges = Bpe.train(spark, words, 4).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val served = Bpe.applyMerges(words, merges)
      .select(concat_ws("|", col("syms")).as("w"))
      .collect().map(_.getString(0)).sorted.toSeq
    // round 4 merges (lo,w)=7: "low" collapses fully; "newest" stays n e w est
    assert(served.contains("low") && served.contains("n|e|w|est"),
      served.mkString(", "))
  }

  test("token accounting (t21's arithmetic) is exact on a hand-computed corpus") {
    import spark.implicits._
    // corpus: docA = "low low lower", docB = "low" — fixed merges
    // (l,o) then (lo,w): low -> [low] (1 token), lower -> [low,e,r] (3)
    val docs = Seq(("a", "low low lower"), ("b", "low")).toDF("source", "text")
    val vocab = Bpe.wordTable(docs, "text")
    val wordTokens = Bpe.applyMerges(vocab, Seq(("l", "o"), ("lo", "w")))
      .select(array_join(col("syms"), "").as("word"),
        size(col("syms")).as("n_tokens"))
    val usage = docs.select(col("source"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n_uses"))
    val acct = usage.join(wordTokens, "word")
      .groupBy("source")
      .agg(sum(col("n_uses")).as("n_words"),
        sum(col("n_uses") * col("n_tokens")).as("n_tokens"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: 3 words, 2×low(1) + 1×lower(3) = 5 tokens; b: 1 word, 1 token
    assert(acct == Seq(("a", 3L, 5L), ("b", 1L, 1L)), acct.mkString(", "))
  }
}
