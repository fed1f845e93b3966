package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Misra–Gries heavy hitters: exactness above the vocabulary size, the
  * never-overcount / bounded-undercount guarantees below it, survival
  * of every true heavy hitter, and merge behavior across partitions. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import HeavyHittersAgg.heavy_hitters

  /** Skewed corpus: token i of `vocab` appears vocab-i times per round,
    * spread over `parts` partitions so partial merges actually fire. */
  private def skewed(vocab: Int, rounds: Int, parts: Int) = {
    import spark.implicits._
    val rows = for {
      _ <- 1 to rounds
      i <- 0 until vocab
      _ <- 1 to (vocab - i)
    } yield s"tok_$i"
    rows.toDF("tok").repartition(parts)
  }

  private def summary(df: org.apache.spark.sql.DataFrame, capacity: Int)
      : Map[String, Long] =
    df.agg(heavy_hitters(col("tok"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.token", "e.cnt")
      .collect()
      .map { case Row(t: String, c: Long) => t -> c }
      .toMap

  test("exact when capacity covers the vocabulary, any partitioning") {
    val df = skewed(vocab = 40, rounds = 3, parts = 7).cache()
    try {
      val truth = df.groupBy("tok").count()
        .collect().map { case Row(t: String, c: Long) => t -> c }.toMap
      assert(summary(df, capacity = 64) === truth)
      assert(summary(df.repartition(1), capacity = 64) === truth)
    } finally df.unpersist(blocking = false)
  }

  test("below-vocabulary capacity: never overcounts, undercount <= n/capacity") {
    val df = skewed(vocab = 40, rounds = 3, parts = 7).cache()
    try {
      val truth = df.groupBy("tok").count()
        .collect().map { case Row(t: String, c: Long) => t -> c }.toMap
      val n = truth.values.sum
      val cap = 10
      val sk = summary(df, cap)
      assert(sk.size <= cap)
      sk.foreach { case (t, c) =>
        assert(c <= truth(t), s"$t overcounted: $c > ${truth(t)}")
        assert(truth(t) - c <= n / cap,
          s"$t undercounted past the bound: ${truth(t)} - $c > ${n / cap}")
      }
      // every token with true frequency > n/capacity must survive
      truth.filter(_._2 > n / cap).keys.foreach { t =>
        assert(sk.contains(t), s"heavy hitter $t evicted")
      }
    } finally df.unpersist(blocking = false)
  }

  test("output is sorted by (cnt desc, token asc) and nulls are skipped") {
    import spark.implicits._
    val df = Seq(Some("b"), Some("a"), Some("b"), None, Some("c"), Some("a"))
      .toDF("tok")
    val rows = df.agg(heavy_hitters(col("tok"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.token", "e.cnt")
      .collect().map { case Row(t: String, c: Long) => (t, c) }.toSeq
    assert(rows === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
