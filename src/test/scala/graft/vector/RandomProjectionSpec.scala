package graft.vector

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Pins for [[RandomProjection]]: the md5-seeded matrix is balanced,
  * the projection is partition-invariant (integer algebra) and
  * shuffle-free, and the 16-d sketch order tracks the exact 64-d
  * cosine order at the measured fixture floor. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
    .select("vec_id", "embedding")

  test("sign matrix is deterministic and roughly balanced") {
    val entries = for (d <- 0 until 64; j <- 0 until 16)
      yield RandomProjection.sign(d, j)
    assert(entries.forall(s => s == 1L || s == -1L))
    val pos = entries.count(_ == 1L).toDouble / entries.size
    assert(pos > 0.4 && pos < 0.6, s"+1 fraction $pos — md5 parity is fair")
    assert(RandomProjection.sign(3, 7) == RandomProjection.sign(3, 7))
  }

  test("projection is partition-invariant and shuffle-free") {
    def sketch(parts: Int): Map[Long, Seq[Long]] =
      RandomProjection.project(emb.repartition(parts), "embedding", "y")
        .select("vec_id", "y").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sketch(2) == sketch(7),
      "integer sums are associative — layout can never change a sketch")
    val plan = RandomProjection.project(emb, "embedding", "y")
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "projection is a per-row map: no exchange in its plan")
  }

  test("sketch cosine is the JL estimator: unbiased, error ~ sqrt(2/(piK)), " +
      "distributional separation preserved") {
    // all-pairs exact vs sketch cosine over the fixture (500 vectors)
    val exploded = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"), col("v").cast("double").as("v"))
    val exact = exploded.join(
        exploded.select(col("vec_id").as("vb"), col("d"),
          col("v").as("w")), "d")
      .filter(col("vec_id") < col("vb"))
      .groupBy("vec_id", "vb").agg(sum(col("v") * col("w")).as("cos_e"))
    val proj = RandomProjection.project(emb, "embedding", "y")
      .select(col("vec_id"), col("y"))
    val projCos = proj.crossJoin(
        proj.select(col("vec_id").as("vb"), col("y").as("yb")))
      .filter(col("vec_id") < col("vb"))
      .select(col("vec_id"), col("vb"),
        (RandomProjection.dot(col("y"), col("yb")).cast("double") /
          (sqrt(RandomProjection.dot(col("y"), col("y")).cast("double")) *
            sqrt(RandomProjection.dot(col("yb"), col("yb")).cast("double"))))
          .as("cos_p"))
    val stats = exact.join(projCos, Seq("vec_id", "vb"))
      .agg(avg(col("cos_p") - col("cos_e")).as("bias"),
        avg(abs(col("cos_p") - col("cos_e"))).as("mae"),
        avg(when(col("cos_e") >= 0.35, col("cos_p"))).as("hi"),
        avg(when(col("cos_e") < 0.2, col("cos_p"))).as("lo"))
      .head()
    val (bias, mae, hi, lo) = (stats.getDouble(0), stats.getDouble(1),
      stats.getDouble(2), stats.getDouble(3))
    info(f"bias=$bias%.5f mae=$mae%.4f hi=$hi%.4f lo=$lo%.4f")
    assert(math.abs(bias) < 0.01, s"JL estimate is unbiased; bias=$bias")
    // theory: E|N(0, 1/K)| = sqrt(2/(pi*16)) = 0.199 — allow 25% slack
    assert(mae < 0.25, s"error within the 1/sqrt(K) JL envelope; mae=$mae")
    assert(hi - lo > 0.3,
      s"high-similarity band stays separated through the sketch: $hi vs $lo")
    // and per the same theory a 0.2-scale error cannot rank ~0.005
    // margins — the sketch is a coarse-stage tool, never a final ranker
  }
}
