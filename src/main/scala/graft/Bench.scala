package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write materializes EVERY column of the result —
      // a count() would let Catalyst prune unreferenced projections and
      // under-measure expression-heavy queries.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
