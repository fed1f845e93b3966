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

  test("hierarchy beats flat NSW: equal recall costs flat more comparisons") {
    // A shard-sized deterministic fixture (4096 vectors, 64 clusters in
    // 16 dims): the hierarchy is the sublinear-entry device for LARGE
    // shards, so the claim is pinned at a scale-representative size —
    // on the ~toy sf0.001 table the descent overhead (~40 dists)
    // exceeds what the beam can save and proves nothing either way.
    // Averaged over 16 probes. The pin is the published claim stated
    // honestly: at the SAME ef the fixed-entry flat beam terminates
    // early inside the entry's cluster (cheap AND wrong), so the fair
    // comparison is cost AT EQUAL RECALL — flat must raise ef (and pay
    // more distance computations) to match the descent's recall, or
    // never match it at all.
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    def u(seed: Long): Double = ((mix(seed) >>> 11) + 1).toDouble / (1L << 53).toDouble
    val dim = 16
    val n = 4096
    val centers = Array.tabulate(64, dim)((c, j) => (u(c * 31 + j) * 10).toFloat)
    val vecs = Array.tabulate(n) { i =>
      val c = i % 64
      Array.tabulate(dim)(j => centers(c)(j) + (u(i.toLong * 97 + j) - 0.5).toFloat)
    }
    val ids = Array.tabulate(n)(_.toLong)
    val g = NswAnn.build(ids, vecs, m = 8, ef = 32, new NswAnn.DistCounter)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i).toDouble*b(i); na += a(i).toDouble*a(i); nb += b(i).toDouble*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probes = Array.tabulate(16) { p =>
      Array.tabulate(dim)(j => centers(p * 3 % 64)(j) + (u(p * 1009 + j) - 0.5).toFloat)
    }
    val exacts = probes.map { q =>
      vecs.zipWithIndex.map { case (v, i) => (i, cos(v, q)) }
        .sortBy { case (i, c) => (-c, i) }.take(10).map(_._1).toSet
    }
    def run(search: (Array[Float], Int, NswAnn.DistCounter) => Array[(Int, Double)],
        ef: Int): (Double, Long) = {
      var r = 0.0; var d = 0L
      probes.indices.foreach { pi =>
        val c = new NswAnn.DistCounter
        val res = search(probes(pi), ef, c)
        d += c.n
        r += (exacts(pi) intersect res.take(10).map(_._1).toSet).size / 10.0
      }
      (r / probes.length, d)
    }
    val (hr, hd) = run((q, ef, c) => NswAnn.searchLocal(g, vecs, q, ef, c), 32)
    val (fr, fd) = run((q, ef, c) => NswAnn.flatSearchLocal(g, vecs, q, ef, c), 32)
    info(s"hier recall=$hr dists=${hd / 16}; flat recall=$fr dists=${fd / 16} (ef=32)")
    assert(hr >= fr,
      "the descent entry point must not lose recall vs the fixed entry")
    assert(hr >= 0.5, s"recall floor on the adversarially clustered set: $hr")
    // equal-recall cost: raise flat's ef until it matches the
    // hierarchy's recall; it must pay MORE comparisons to get there
    // (or never match — the stronger win)
    var ef2 = 32
    var matched = false
    var flatCost = 0L
    while (ef2 <= n && !matched) {
      val (fr2, fd2) = run((q, ef, c) => NswAnn.flatSearchLocal(g, vecs, q, ef, c), ef2)
      if (fr2 >= hr) { matched = true; flatCost = fd2 }
      else ef2 *= 2
    }
    info(if (matched) s"flat matches recall at ef=$ef2, dists=${flatCost / 16}"
      else "flat never matches the hierarchy's recall")
    assert(!matched || flatCost > hd,
      s"flat needed $flatCost dists to match recall $hr (hier: $hd)")
  }

  test("levels follow the geometric distribution and are id-stable") {
    val ls = (0L until 4096L).map(id => NswAnn.levelOf(id, 8))
    assert(ls == (0L until 4096L).map(id => NswAnn.levelOf(id, 8)))
    val n0 = ls.count(_ == 0).toDouble / ls.size
    // P(level = 0) = 1 - 1/m = 0.875 at m=8; allow generous slack
    assert(n0 > 0.8 && n0 < 0.95, s"P(l=0)=$n0")
    assert(ls.max <= 16)
  }
}
