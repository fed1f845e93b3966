package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HashEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha alpha beta"),
    (3L, "zeta eta theta iota kappa"))

  test("components are deterministic and bounded by dim") {
    val df = docs.toDF("id", "text")
    val c1 = HashEmbed.components(df, "text", Seq("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    val c2 = HashEmbed.components(df, "text", Seq("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    assert(c1.toSeq == c2.toSeq)
    assert(c1.forall { case (_, idx, _) => idx >= 0 && idx < HashEmbed.Dim })
  }

  test("cosineTopK: a document's own text retrieves it first with cosine 1") {
    val df = docs.toDF("id", "text")
    val top = HashEmbed.cosineTopK(df, "id", "text", "zeta eta theta iota kappa", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head._1 == 3L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
  }

  test("toDense produces unit-norm 64-d vectors consistent with sparse components") {
    val df = docs.toDF("id", "text")
    val dense = HashEmbed.toDense(HashEmbed.components(df, "text", Seq("id")), "id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(dense(1L).length == 64)
    dense.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12)
    }
    // doc 2 repeats "alpha": its alpha component magnitude must exceed beta's
    val t = HashEmbed.tokenHash(lit("alpha"))
    val idxAlpha = spark.range(1).select(pmod(t, lit(64))).head().getLong(0).toInt
    assert(math.abs(dense(2L)(idxAlpha)) > 0)
  }
}
