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
    // The driver captures only the LAST ~2000 chars of output and tries to
    // parse the JSON line out of that tail — a line carrying 90 full query
    // names plus per-run spreads is ~12 KB and gets truncated mid-line
    // (BENCH_r01..r04 all ended up `parsed: null`). So stdout gets ONE
    // compact line: short query codes (the unique prefix before the first
    // '_' — q01, d02, st5, ... — the same codes PLANS.md uses) and medians
    // only. Full names, per-run spreads, ok-rep counts and error messages
    // go to target/bench_detail.json and stderr.
    def short(name: String): String = name.takeWhile(_ != '_')
    // Compact line carries ADAPTIVE-precision medians: <10 s at 2
    // decimals (10 ms resolution, far below box noise), 10–100 s at 1
    // decimal, ≥100 s at 0 — every value ≤4 chars, so the line's
    // worst-case width is bounded as the suite grows (full 3-decimal
    // spreads live in the detail file). BenchContractSpec pins the
    // worst-case line against the driver's 2000-char tail.
    // Thresholds sit at the ROUNDING boundary (99.95, not 100) so a
    // value like 99.97 prints "100", never the 5-char "100.0" — the
    // output is ≤4 chars for any median below 9999.5 s.
    def j2(d: Double): String =
      if (d >= 99.95) f"$d%.0f" else if (d >= 9.995) f"$d%.1f" else f"$d%.2f"
    val qs = results.collect { case (k, ts) if ts.nonEmpty =>
      "\"" + short(k) + "\":" + j2(median(ts))
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, ts) if ts.nonEmpty =>
      "\"" + k + "\":{\"median\":" + j(median(ts)) + ",\"runs\":[" + ts.map(j).mkString(",") +
        "],\"ok_reps\":" + ts.length + "}"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) =>
      "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.values.collect { case ts if ts.nonEmpty => median(ts) }.sum
    val detail =
      s"""{"metric":"total","value":${j(total)},"unit":"sec","reps":$reps,"sf":"$sfDir","queries":$spread,"errors":$errJson}"""
    // File only — NOT stderr: sbt re-emits the program's stderr on its own
    // stdout (`[error] ...` lines), so an 8 KB detail line would land in
    // the driver's 2000-char tail and evict the compact line below.
    val detailPath = java.nio.file.Paths.get("target/bench_detail.json")
    java.nio.file.Files.createDirectories(detailPath.getParent)
    java.nio.file.Files.write(detailPath, detail.getBytes("UTF-8"))
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    val line =
      s"""{"metric":"total","value":${j(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfShort"}"""
    // Guard the driver contract: the line must survive a 2000-char tail
    // that also holds sbt's trailing "[success] ..." line.
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars may exceed driver tail capture")
    println(line)
    spark.stop()
  }
}
