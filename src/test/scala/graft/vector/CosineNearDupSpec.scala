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
    info(s"multiprobe banded-LSH recall at t=$t on sf0.001: $recall (${approx.size}/${exactAll.size})")
    // Multiprobe (flip-1 per band) predicts ~0.94 recall at the
    // threshold angle itself and higher above it (CosineNearDup doc);
    // the deterministic fixture floor pins production grade.
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("multiprobe dominates the plain banded scheme (recall strictly gains)") {
    val plain = pairSet(CosineNearDup.approxPairs(
      emb, "vec_id", "embedding", 64, t, probeBits = 0))
    val multi = pairSet(CosineNearDup.approxPairs(
      emb, "vec_id", "embedding", 64, t))
    assert(plain.subsetOf(multi),
      "every plain-banded candidate is also a multiprobe candidate")
    assert(multi.size > plain.size,
      s"multiprobe must find strictly more true pairs on the fixture " +
        s"(plain=${plain.size}, multi=${multi.size})")
  }
}
