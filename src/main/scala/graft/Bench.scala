package graft

object Bench {
  /** Median of an already-timed sample; for even n takes the mean of the
    * two central values.
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Bench measures the configuration the engine ships: Sessions.local
    // (AQE + skew join + sized shuffle partitions), not a bare session.
    val spark = Sessions.local()
    // Untimed warmup at the smallest SF: JIT + codegen + streaming
    // machinery initialization are per-JVM one-time costs, not query
    // costs — the timed section below measures steady-state throughput.
    val warmDir = "/root/testdata/sf0.001"
    Seq("q02_pricing_agg", "d03_simhash", "st1_stream_tumbling", "e01_hash_embed_knn")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[warmup] $n: ${e.getMessage}") }
      }
    // Single-shot timings on this box swing 3-8x run to run (JIT, GC,
    // noisy neighbours); the per-query number reported is the MEDIAN of
    // `reps` timed runs, with min/max kept so the spread is visible in
    // the artifact instead of silently folded into the point estimate.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop-format write materializes EVERY column of the result —
        // a count() would let Catalyst prune unreferenced projections and
        // under-measure expression-heavy queries.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
            None
        }
      }
      name -> times
    }
    def j(d: Double): String = f"$d%.3f"
    val qs = results.collect { case (k, ts) if ts.nonEmpty =>
      s"\"" + k + "\":" + j(median(ts))
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, ts) if ts.nonEmpty =>
      s"\"" + k + "\":[" + ts.map(j).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) =>
      "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.values.collect { case ts if ts.nonEmpty => median(ts) }.sum
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","queries":$qs,"runs":$spread,"errors":$errJson,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
