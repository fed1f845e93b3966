package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Gates for the IVF-PQ tier (s12): codebook/code-table shape, ADC
  * table size, and recall@10 against the exact scan on the fixture.
  */
class PqAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private val m = 8
  private val k = 16

  private lazy val books = Pq.codebooks(emb, "vec_id", "embedding", m, k)
  private lazy val codes = Pq.encode(emb, "vec_id", "embedding", books, m)

  test("codebooks: m subspaces × k entries, centroids of sub-dimension D/m") {
    val b = books.collect()
    assert(b.length == m * k, s"expected ${m * k} codebook rows, got ${b.length}")
    assert(b.forall(_.getSeq[Double](2).length == 64 / m),
      "every centroid must have the subspace dimension")
    assert(books.select("sub").distinct().count() == m)
  }

  test("encode: every vector carries exactly m codes, all within [0, k)") {
    val n = emb.count()
    assert(codes.count() == n * m)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= m).count() == 0)
    assert(codes.filter(col("code") < 0 || col("code") >= k).count() == 0)
  }

  test("ADC distance table is m×k and non-negative (it feeds a broadcast)") {
    val probeDf = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val dt = Pq.distanceTable(probeDf, "embedding", books, m)
    val rows = dt.collect()
    assert(rows.length == m * k)
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("IVF-PQ recall@10 vs exact meets the fixture floor; self-match found") {
    val probeRow = emb.orderBy("vec_id").select("embedding").head()
    val probe = probeRow.getSeq[Float](0).map(_.toDouble)
    val exact = Knn.exactTopK(emb, "embedding", "vec_id", probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val cents = Ivf.centroids(emb, "vec_id", "embedding", k)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", cents)
    val probeDf = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val approx = Pq.searchIvfPq(emb, assigned, cents, codes, books,
      "vec_id", "embedding", probeDf, "embedding",
      m = m, k = 10, nProbe = 4, pool = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / 10
    info(s"IVF-PQ recall@10 m=$m k=$k nProbe=4/16 pool=50: $recall")
    // same routed lists as s03/s11; the 8-lookup ADC pool then exact
    // rerank — floor matches the plain-IVF fixture floor
    assert(recall >= 0.3, s"recall = $recall")
    assert(approx.contains(emb.orderBy("vec_id").select("vec_id").head().getLong(0)))
  }

  test("batch-probe IVF-PQ serves each probe exactly what single-probe serves") {
    val cents = Ivf.centroids(emb, "vec_id", "embedding", k)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", cents)
    val probes = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val batch = Pq.searchIvfPqBatch(emb, assigned, cents, codes, books,
        "vec_id", "embedding", probes, "probe_id", "pv",
        m = m, k = 5, nProbe = 4, pool = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    emb.orderBy("vec_id").limit(3).select("vec_id").collect()
      .map(_.getLong(0)).foreach { pid =>
        val single = Pq.searchIvfPq(emb, assigned, cents, codes, books,
            "vec_id", "embedding",
            emb.filter(col("vec_id") === pid).select("embedding"), "embedding",
            m = m, k = 5, nProbe = 4, pool = 50)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val got = batch.filter(_._1 == pid).map(t => (t._2, t._3)).toSeq
        assert(got == single, s"probe $pid must match the single-probe plan")
      }
  }
}
