package graft.vector

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The exact/approx tier contract of CosineNearDup: approx returns only
  * true pairs (precision 1 — exact rerank) and its recall vs the exact
  * tier is measured, not assumed. */
class CosineNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private val t = 0.35

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("approx pairs are a subset of unblocked exact pairs (precision 1)") {
    val exactAll = CosineNearDup.exactPairs(
      emb.withColumn("one", org.apache.spark.sql.functions.lit(1)),
      "vec_id", "embedding", "one", t)
    val approx = CosineNearDup.approxPairs(emb, "vec_id", "embedding", 64, t)
    val (e, a) = (pairSet(exactAll), pairSet(approx))
    assert(a.subsetOf(e), s"approx produced non-pairs: ${a -- e}")
  }

  test("recall is threshold-dependent and reported; floor holds on fixture") {
    val exactAll = pairSet(CosineNearDup.exactPairs(
      emb.withColumn("one", org.apache.spark.sql.functions.lit(1)),
      "vec_id", "embedding", "one", t))
    val approx = pairSet(CosineNearDup.approxPairs(emb, "vec_id", "embedding", 64, t))
    assume(exactAll.nonEmpty)
    val recall = (exactAll intersect approx).size.toDouble / exactAll.size
    info(s"banded-LSH recall at t=$t on sf0.001: $recall (${approx.size}/${exactAll.size})")
    // Low threshold → modest recall by design (see CosineNearDup doc).
    // The deterministic fixture floor documents the behavior.
    assert(recall >= 0.2, s"recall=$recall")
  }
}
