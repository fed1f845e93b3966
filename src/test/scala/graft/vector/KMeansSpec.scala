package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val assigned =
    KMeans.assign(graft.sources.Tables.embeddings(spark, sf), k = 8, iters = 3).cache()

  test("every row is assigned to exactly one of k clusters") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(assigned.count() == emb.count())
    val cids = assigned.select("cid").distinct().collect().map(_.getInt(0)).sorted
    assert(cids.nonEmpty && cids.forall(c => c >= 0 && c < 8))
  }

  test("assignment is deterministic and non-degenerate") {
    // the fixture embeddings are near-isotropic (no label clusters), so
    // the properties to pin are determinism (fixed init + tie rule +
    // rounded centroids) and that Lloyd's keeps multiple populated
    // Voronoi cells rather than collapsing to one
    val again = KMeans.assign(graft.sources.Tables.embeddings(spark, sf), k = 8, iters = 3)
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty,
      "re-running k-means changed the assignment")
    val used = assigned.select("cid").distinct().count()
    assert(used >= 2, s"all rows collapsed into $used cluster(s)")
  }

  test("iterations strictly improve (or hold) total within-cluster distance") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def cost(iters: Int): Double =
      KMeans.assign(emb, k = 8, iters = iters).agg(sum("dist")).head().getDouble(0)
    val c1 = cost(1)
    val c3 = cost(3)
    assert(c3 <= c1 + 1e-6, s"cost went up: iter1 $c1 -> iter3 $c3")
  }

  test("profile partitions the input") {
    val p = KMeans.profile(assigned).collect()
    assert(p.map(_.getLong(1)).sum == assigned.count())
    assert(p.forall(_.getDouble(2) >= 0.0))
  }
}
