package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins t11's distributed exact rank (range-sort + partition-offset
  * prefix sums) bit-identical to the single-task window form it
  * replaced: (q, doc_id) is a total order, so the kept decile band —
  * and therefore every aggregate the oracle hashes — must agree row
  * for row wherever the range boundaries happen to land. Also pins
  * that the plan carries NO unpartitioned WindowExec (the funnel the
  * rewrite exists to remove).
  */
class RankEquivSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("distributed decile band == global row_number band, bit-exact") {
    val out = CurationQueries.queries("t11_quality_band")(spark, TestSpark.sf)

    // The reference semantics, stated the oracle's way: one global
    // row_number (fine at fixture scale — this is the test oracle,
    // not the shipped plan).
    val ranked = CurationQueries.qualityScored(spark, TestSpark.sf)
      .withColumn("r", row_number().over(Window.orderBy(col("q"), col("doc_id"))))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
    val oracle = ranked
      .filter(col("r") > floor(col("nn") / 10) &&
        col("r") <= col("nn") - floor(col("nn") / 10))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(round(col("q") * 10000, 0).cast("long")).as("q_e4_sum"),
        min("q").as("min_q"), max("q").as("max_q"))
      .orderBy("source")

    val got = out.collect().map(_.toSeq)
    val want = oracle.collect().map(_.toSeq)
    assert(got.nonEmpty, "fixture sanity: band keeps rows")
    assert(got.toSeq == want.toSeq,
      s"distributed rank band diverged from the window form:\n${got.toSeq}\nvs\n${want.toSeq}")
  }

  test("t11's shipped plan has no WindowExec and spreads under real data") {
    // The rewrite's point: the rank is assigned on the range-sorted
    // frame's own partitions, never by funneling rows through a
    // global WindowExec. (AQE may still coalesce the *tiny fixture*
    // to one partition — correct behavior — so the spread is asserted
    // with AQE's coalescing voice muted, the multi-executor shape.)
    val sorted = CurationQueries.qualityScored(spark, TestSpark.sf)
      .repartitionByRange(col("q"), col("doc_id"))
      .sortWithinPartitions("q", "doc_id")
    assert(!sorted.queryExecution.executedPlan.toString.contains("Window"),
      "the rank pass must not plan a WindowExec")
    val conf = spark.conf
    val before = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val spread = CurationQueries.qualityScored(spark, TestSpark.sf)
        .repartitionByRange(col("q"), col("doc_id"))
        .sortWithinPartitions("q", "doc_id")
      assert(spread.rdd.getNumPartitions > 1,
        "range sort must keep the corpus spread across partitions")
    } finally conf.set("spark.sql.adaptive.coalescePartitions.enabled", before)
  }
}
