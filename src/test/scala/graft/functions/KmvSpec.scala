package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.KmvAgg.kmv_sketch

/** [[KmvAgg]] invariants behind t19's hash gate:
  *   - partition-order independence: the sketch of a set is the same
  *     under any repartitioning (k-smallest-of-distinct is a pure set
  *     function — THE property that lets a sketch be hash-gated);
  *   - capacity ⇒ exact degeneration: distinct ≤ k means the sketch IS
  *     the sorted distinct set;
  *   - estimator accuracy on an over-capacity universe: (k−1)·2⁶⁰/kth
  *     within the ~1/√k relative-error envelope.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val k = 256

  // deterministic pseudo-uniform 60-bit hashes from a counter — the
  // same md5-prefix rule as t19, so the estimator sees its real input
  // distribution
  private def hashed(n: Int, salt: String) = {
    import spark.implicits._
    (1 to n).map(i => s"$salt$i").toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long").as("h"))
  }

  test("sketch is partition-order independent and dedups") {
    val df = hashed(5000, "x")
    val once = df.agg(kmv_sketch(col("h"), k)).head().getSeq[Long](0)
    val repart = df.repartition(13).agg(kmv_sketch(col("h"), k))
      .head().getSeq[Long](0)
    val doubled = df.union(df).repartition(3).agg(kmv_sketch(col("h"), k))
      .head().getSeq[Long](0)
    assert(once == repart, "repartitioning changed the sketch")
    assert(once == doubled, "duplicate inputs changed the sketch")
    assert(once.length == k && once == once.sorted && once.distinct == once)
  }

  test("distinct <= k degenerates to the exact sorted distinct set") {
    val df = hashed(100, "y")
    val sk = df.union(df).agg(kmv_sketch(col("h"), k)).head().getSeq[Long](0)
    val exact = df.distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(sk == exact)
  }

  test("estimator lands inside the ~1/sqrt(k) envelope at 40x capacity") {
    val n = 10000
    val sk = hashed(n, "z").agg(kmv_sketch(col("h"), k)).head().getSeq[Long](0)
    val est = (k - 1).toDouble * math.pow(2, 60) / sk.last.toDouble
    val relErr = math.abs(est - n) / n
    info(f"KMV estimate for $n distinct: $est%.1f (rel err $relErr%.3f)")
    // stderr = 1/sqrt(k-2) ≈ 0.063; 3 sigma ≈ 0.19, fixture-determined
    assert(relErr < 0.19, s"estimate $est for $n distinct")
  }
}
