package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      probes: Seq[(Long, Long)],   // (key, t)
      quotes: Seq[(Long, Long, String)]) = { // (key, t, payload)
    val l = probes.toDF("k", "t")
    val r = quotes.toDF("qk", "qt", "payload")
    AsOfJoin(l, r, col("k"), col("qk"), col("t"), col("qt"))
      .select(col("k"), col("t"), col("qt"), col("payload"))
      .orderBy("k", "t")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2)),
        Option(row.getString(3))))
      .toSeq
  }

  test("takes the latest quote at or before each probe time") {
    val out = run(
      probes = Seq((1L, 10L), (1L, 25L)),
      quotes = Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 30L, "c")))
    assert(out == Seq(
      (1L, 10L, Some(5L), Some("a")),
      (1L, 25L, Some(20L), Some("b"))))
  }

  test("no prior quote yields null right side") {
    val out = run(probes = Seq((1L, 3L)), quotes = Seq((1L, 5L, "late")))
    assert(out == Seq((1L, 3L, None, None)))
  }

  test("equal timestamps: the exact-time quote matches (t >= qt semantics)") {
    val out = run(probes = Seq((1L, 10L)), quotes = Seq((1L, 10L, "same")))
    assert(out == Seq((1L, 10L, Some(10L), Some("same"))))
  }

  test("keys never bleed: a quote on another key is invisible") {
    val out = run(probes = Seq((1L, 10L)), quotes = Seq((2L, 5L, "other")))
    assert(out == Seq((1L, 10L, None, None)))
  }

  test("every probe row survives (left-join cardinality)") {
    val probes = (1L to 50L).map(i => (i % 5, i))
    val quotes = Seq((0L, 10L, "x"), (1L, 1L, "y"))
    assert(run(probes, quotes).size == probes.size)
  }
}
