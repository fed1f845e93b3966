package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The tolerance check that q09b (approx_count_distinct, rows-only at
  * the driver) claims: the HLL sketch estimate is within its configured
  * relative error of the exact distinct count. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q09b HLL estimate within 5x the configured 2% rsd of exact q09") {
    val exact = RelationalQueries.queries("q09_count_distinct")(spark, TestSpark.sf)
      .collect().head.getLong(0)
    val approx = RelationalQueries.queries("q09b_approx_distinct")(spark, TestSpark.sf)
      .collect().head.getLong(0)
    val relErr = math.abs(approx.toDouble - exact) / exact
    // rsd 0.02 is a standard deviation, not a bound — 5 sigma is the
    // deterministic-fixture assertion (the sketch is deterministic for
    // fixed input, so this either always passes or always fails).
    assert(relErr <= 0.10, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("q66's non-mergeable stat: DataSketches HLL union of per-batch sketches ≈ exact") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, TestSpark.sf)
    // per-ingest-batch sketches — the mergeable form of count(distinct)
    val sketches = orders.filter(col("o_orderkey") % 2 === 0)
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .unionByName(orders.filter(col("o_orderkey") % 2 === 1)
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk")))
    val merged = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val exact = orders.agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val relErr = math.abs(merged.toDouble - exact) / exact
    assert(relErr <= 0.05, s"merged HLL=$merged exact=$exact relErr=$relErr")
  }
}
