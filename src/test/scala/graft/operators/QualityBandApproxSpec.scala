package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Accuracy pin for t15, the approx-percentile scale tier of t11's
  * quality band: sketch cut points must land near the exact deciles and
  * the surviving fraction near the designed 80 %. (The driver checks
  * t15 rows-only — sketch merge order makes exact hashes unstable —
  * so this spec is the tier's correctness evidence.)
  */
class QualityBandApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx thresholds track exact deciles; ~80% of rows survive") {
    val scored = CurationQueries.qualityScored(spark, TestSpark.sf).cache()
    try {
      val n = scored.count().toDouble
      assert(n > 50, "fixture sanity: enough docs to make deciles meaningful")
      val exact = scored.stat.approxQuantile("q", Array(0.1, 0.9), 0.0)
      val th = scored
        .agg(expr("approx_percentile(q, array(0.1, 0.9), 10000)").as("th"))
        .head().getSeq[Double](0)
      val span = math.max(exact(1) - exact(0), 1e-9)
      assert(math.abs(th(0) - exact(0)) <= 0.05 * span + 1e-6,
        s"lo cut ${th(0)} vs exact ${exact(0)}")
      assert(math.abs(th(1) - exact(1)) <= 0.05 * span + 1e-6,
        s"hi cut ${th(1)} vs exact ${exact(1)}")

      val out = CurationQueries.queries("t15_quality_band_approx")(spark, TestSpark.sf)
      val kept = out.agg(sum("n_kept")).head().getLong(0).toDouble
      assert(kept / n > 0.70 && kept / n < 0.90,
        s"band keeps ${kept / n} — designed 0.8 minus tie clumping")
    } finally scored.unpersist(blocking = false)
  }
}
