package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Contract of the sharded-NSW graph ANN: results are true cosine
  * similarities (exact rerank is implicit — every reported distance is
  * computed exactly), determinism across runs, and measured recall
  * against the exact brute-force top-k. */
class NswAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val probe = emb.orderBy("vec_id").limit(1)
    .select(col("embedding").cast("array<float>")).as[Array[Float]].head()

  private def exactTopK(k: Int): Seq[Long] = {
    import graft.functions.vec_cosine_sim
    val p = typedLit(probe.map(_.toDouble))
    emb.select(col("vec_id"), vec_cosine_sim(col("embedding"), p).as("cos"))
      .orderBy(desc("cos"), col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("recall@10 vs exact brute force meets the fixture floor") {
    val exact = exactTopK(10).toSet
    val ann = NswAnn.search(emb, "vec_id", "embedding", probe, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(s"sharded-NSW recall@10 on ${TestSpark.sf}: $recall")
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("deterministic: two runs return identical ranked results") {
    def run() = NswAnn.search(emb, "vec_id", "embedding", probe, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run() == run())
  }

  test("scores are exact cosines (graph only limits WHICH ids return)") {
    import graft.functions.vec_cosine_sim
    val p = typedLit(probe.map(_.toDouble))
    val exactByIds = emb
      .select(col("vec_id"), vec_cosine_sim(col("embedding"), p).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    NswAnn.search(emb, "vec_id", "embedding", probe, k = 10)
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - exactByIds(r.getLong(0))) < 1e-9)
      }
  }
}
