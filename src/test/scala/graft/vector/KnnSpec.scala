package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** ANN (s01 path) recall against the exact brute-force path, and
  * lazy-probe/driver-probe agreement. Deterministic hyperplanes + fixed
  * fixture → these assertions are exact, not flaky. */
class KnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dim = 64
  private val k = 10

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val probe: Seq[Double] = {
    val row = emb.orderBy("vec_id").select("embedding").head()
    row.getSeq[Float](0).map(_.toDouble)
  }

  test("approxTopK recall@10 vs exactTopK meets the measured floor") {
    val exact = Knn.exactTopK(emb, "embedding", "vec_id", probe, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bucketed = Knn.withBuckets(emb, "embedding", nPlanes = 12, dim = dim)
    val approx = Knn.approxTopK(bucketed, "embedding", "vec_id", probe, k,
      nPlanes = 12, hammingRadius = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / k
    // self-match (vec 0 probes itself) must always survive bucketing
    assert(approx.contains(emb.orderBy("vec_id").select("vec_id").head().getLong(0)))
    // Deterministic fixture: measured recall@10 is exactly 0.3 at
    // hammingRadius=1 — low because fixture vectors are near-random, so
    // the true top-10 sits at wide angles from the probe (the same
    // geometry documented in CosineNearDup). The floor pins measured
    // behavior; the radius test below shows the recall lever.
    assert(recall >= 0.3, s"recall@$k = $recall")
    val approxR3 = Knn.approxTopK(bucketed, "embedding", "vec_id", probe, k,
      nPlanes = 12, hammingRadius = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recallR3 = (exact intersect approxR3).size.toDouble / k
    assert(recallR3 >= recall, s"recall must not shrink with radius: $recallR3 < $recall")
  }

  test("s05 quantized kNN: top-10 by integer dot tracks the exact-dot top-10") {
    val s05 = graft.operators.VectorQueries.queries("s05_quantized_knn")(spark, TestSpark.sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // exact top-10 by DOT PRODUCT against vec 0 (s05's ranking metric)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val p = all.find(_._1 == 0L).get._2
    val exact = all.map { case (id, v) => id -> v.zip(p).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    val recall = (exact intersect s05).size.toDouble / k
    // 8-bit levels keep component error < 0.4 % of the per-dim range, so
    // the quantized ranking reproduces at least 9 of the exact top-10 on
    // the fixture (measured: 1.0); the floor pins against regression.
    assert(s05.contains(0L), "self-match survives quantization")
    assert(recall >= 0.9, s"quantized recall@$k = $recall")
  }

  test("s06 binary kNN: self-match at hamming 0; sign bits track cosine neighbors") {
    val s06 = graft.operators.VectorQueries.queries("s06_binary_knn")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(s06.head == (0L -> 0L), "probe vector is its own 0-distance match")
    assert(s06.map(_._2).toSeq == s06.map(_._2).toSeq.sorted, "ascending hamming")
    // exact COSINE top-10 (the metric the sign bits approximate)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val p = all.find(_._1 == 0L).get._2
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = all.map { case (id, v) => id -> cos(v, p) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    val overlap = (exact intersect s06.map(_._1).toSet).size.toDouble / k
    // near-random fixture vectors sit at wide angles, so 60 sign bits
    // recover a minority of the cosine top-10 (measured 0.2) — the
    // binary tier is a CANDIDATE filter, not a final ranking; the floor
    // pins measured behavior against regression.
    assert(overlap >= 0.2, s"sign-bit overlap with cosine top-$k = $overlap")
  }

  test("lazy-probe plan (approxTopKPlan) equals the driver-probe path") {
    val bucketed = Knn.withBuckets(emb, "embedding", nPlanes = 12, dim = dim)
    val viaDriver = Knn.approxTopK(bucketed, "embedding", "vec_id", probe, k,
      nPlanes = 12, hammingRadius = 1)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probeDf = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val viaPlan = Knn.approxTopKPlan(bucketed, "embedding", "vec_id", probeDf, "embedding",
      k, nPlanes = 12, dim = dim, hammingRadius = 1)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaDriver == viaPlan)
  }

  test("hamming radius widens the candidate set monotonically") {
    val bucketed = Knn.withBuckets(emb, "embedding", nPlanes = 12, dim = dim)
    def cands(r: Int): Long = {
      val planes = Knn.hyperplanes(12, dim)
      val pb = planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(probe).map { case (a, b) => a * b }.sum > 0) 1L << i else 0L
      }.sum
      bucketed.filter(expr(s"bit_count(bucket ^ ${pb}L) <= $r")).count()
    }
    assert(cands(0) <= cands(1) && cands(1) <= cands(2))
  }
}
