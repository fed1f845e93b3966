package graft

/** Scale rehearsal for t11's distributed exact rank (r13): the
  * fixture-scale gates prove bit-exactness but cannot show the funnel
  * the rewrite removes. `runMain graft.CurationScaleProbe [nRows]`
  * builds a deterministic synthetic scored frame (default 2.2 M rows —
  * the same scale the ANN rehearsals use), then times the decile band
  * three ways:
  *
  *   1. WINDOW form — `row_number() OVER (ORDER BY q, doc_id)` + a
  *      global count: every row moves to ONE WindowExec task (the
  *      shape t11 shipped before r13);
  *   2. DISTRIBUTED form — [[graft.operators.CurationQueries
  *      .exactDecileBand]], the shipped range-sort + partition-offset
  *      rank;
  *   3. the distributed form again (persist framework warm).
  *
  * The two forms' aggregates are asserted EQUAL (the probe doubles as
  * a scale-sized RankEquivSpec), timings go to stdout for PLANS.md.
  * Nothing is committed; the frame is synthesized in memory. */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2200000L)
    val spark = Sessions.local()
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curation-scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // deterministic synthetic (doc_id, source, q): xxhash64-derived so
    // any rerun reproduces exactly; q has ~1e6 distinct values (real
    // tie density, the rank's tiebreak on doc_id does real work)
    val scored = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("src_"), pmod(xxhash64(col("id")), lit(10L))).as("source"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).cast("double") /
        1000000.0).as("q"))
    def agg(kept: org.apache.spark.sql.DataFrame) =
      kept.groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(round(col("q") * 10000, 0).cast("long")).as("q_e4_sum"),
          min("q").as("min_q"), max("q").as("max_q"))
        .orderBy("source")
    val windowed = timed(s"WINDOW form (global row_number, n=$n)") {
      val ranked = scored
        .withColumn("r", row_number().over(Window.orderBy(col("q"), col("doc_id"))))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
      agg(ranked.filter(col("r") > floor(col("nn") / 10) &&
        col("r") <= col("nn") - floor(col("nn") / 10))).collect().toSeq
    }
    val distributed = timed(s"DISTRIBUTED form (range-sort + offsets, n=$n)") {
      graft.operators.CurationQueries.exactDecileBand(spark, scored)(agg)
        .collect().toSeq
    }
    timed("DISTRIBUTED form, second run") {
      graft.operators.CurationQueries.exactDecileBand(spark, scored)(agg)
        .collect()
    }
    require(windowed == distributed,
      s"rank forms diverged at n=$n:\n$windowed\nvs\n$distributed")
    println(s"[curation-scale] forms agree on ${windowed.size} sources")
    spark.stop()
  }
}
