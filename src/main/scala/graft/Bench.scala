package graft

object Bench {
  /** Short reporting code for a query name: the prefix before the first
    * '_' with leading zeros stripped from the numeric run (q01_filter →
    * q1, q09b_hll → q9b, st10_... → st10). Shared with BenchContractSpec
    * so uniqueness is pinned over the exact codes the line emits. */
  private[graft] def shortCode(name: String): String =
    name.takeWhile(_ != '_').replaceFirst("^([a-z]+)0+(?=[0-9])", "$1")

  /** The EXACT key the compact line emits for a query — shortCode plus
    * the declared compressions (q-prefix dropped, st→S). ONE function
    * shared with BenchContractSpec so the uniqueness pin can never
    * drift from the encoder. */
  private[graft] def lineKey(name: String): String = {
    val c = shortCode(name)
    if (c.length > 1 && c(0) == 'q' && c(1).isDigit) c.drop(1)
    else if (c.length > 2 && c.startsWith("st") && c(2).isDigit)
      "S" + c.drop(2)
    else c
  }

  /** Median of an already-timed sample; for even n takes the mean of the
    * two central values.
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Is a `target/` directory entry a per-JVM fixture leftover? These
    * are the disposable artifacts earlier bench/verify/test JVMs leave
    * behind (memoized versioned-table fixtures, catalog warehouses,
    * verify dumps). ~7k of them once inflated an identical-code suite
    * run by 15% (directory-churn I/O, PLANS r10) — so the bench CLEANS
    * them before the warmup instead of trusting the operator to
    * remember, and stamps what it found in both artifacts. Exact
    * names for the fixture roots (never prefix-match "stream": sbt's
    * own `target/streams` build state lives next door), prefixes for
    * the uniquified families. */
  private[graft] def isFixtureLeftover(name: String): Boolean =
    Set("pipeline", "stream", "curation", "sigraft_wh",
      // per-suite catalog warehouses + streaming-family fixture roots
      // observed to accumulate under target/ (ADVICE r11)
      "cgraft_wh", "fgraft_wh", "rgraft_wh", "warehouse",
      "stfam", "stfam2")(name) ||
      // verify_* dumps are deliberately NOT cleaned: the DRIVER's
      // correctness artifacts may live under target/ and a bench run
      // must never race its oracle compare — a few parquet dumps are
      // not the thousands-of-tiny-dirs pollution this guard targets
      (!name.startsWith("verify_") &&
        (Seq("vt_", "compact", "annwh", "annkind", "bookpipe",
          "del_src", "del_dst", "frag", "floorprobe")
          .exists(name.startsWith) ||
        // structural rule so the classifier can't drift as new fixture
        // families appear: every uniquified fixture dir in this repo is
        // minted by createTempDirectory under target/ and carries the
        // random-positive-long suffix — ≥16 trailing decimal digits
        // covers >99.99% of that range while NO legitimate artifact or
        // user dump reaches it (sbt's "scala-2.13"/"streams" carry few
        // digits; date stamps are 8, datetime stamps 14 — "backup
        // 20260815120000" survives where the old ≥6 rule deleted it).
        // Accepted residual: a random long is < 10^15 with p ≈ 1e-4,
        // so roughly one in ten thousand NEW-family leftovers escapes
        // this rule (known families are caught by the prefix list
        // above regardless); at the observed leak scale that is one
        // stray dir per ~10k — noise against the deleted-user-data
        // failure mode the bound exists to prevent
        (name.length > 16 && name.takeRight(16).forall(_.isDigit))))

  /** Refuse to bench when leftovers SURVIVED the cleanup attempt (an
    * undeletable polluted build dir would silently tax every timing);
    * `allowDirty` (SPARK_GRAFT_BENCH_DIRTY=1) overrides for
    * environments where the pollution is understood. Pure so
    * BenchContractSpec pins the decision. */
  private[graft] def refusePollution(remaining: Long, allowDirty: Boolean): Boolean =
    remaining > 0 && !allowDirty

  /** Queries whose captured unpartitioned-window warnings are
    * UNEXPLAINED — since r13 that is ALL of them: t11, the last
    * declared global-window tier, now assigns its exact ranks via a
    * range-sort + partition-offset pass, so no query in the suite is
    * allowed to move every row to one WindowExec partition. Any
    * warning here is the identity-allocator regression class and must
    * flag in bench_detail.json. Pure so BenchContractSpec pins the
    * classification; warmup labels are the same queries re-run and
    * carry no extra information. */
  private[graft] def unexplainedWindowWarnings(
      warned: Iterable[String]): Seq[String] =
    warned.toSeq.distinct
      .filterNot(_.startsWith("warmup:"))
      .sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // BUILD-DIR HYGIENE (self-serve, not tribal knowledge): count and
    // delete fixture leftovers from earlier JVMs before anything is
    // timed, stamp the count in both artifacts, and REFUSE if any
    // survive deletion — an unclean build dir measurably taxes the
    // whole suite and would masquerade as a code regression.
    val targetDir = java.nio.file.Paths.get("target")
    // every FS step here tolerates both IOException and the
    // UncheckedIOException a java.nio Stream pipeline wraps traversal
    // failures in (a concurrently-written or unreadable leftover is
    // EXACTLY the dirty-dir case this guard exists for — it must reach
    // the refusal path below, never crash the bench before it)
    def quietly[T](fallback: => T)(body: => T): T =
      try body catch {
        case _: java.io.IOException => fallback
        case _: java.io.UncheckedIOException => fallback
      }
    // a FAILED listing must reach the refusal gate too — falling back
    // to "no leftovers" would stamp fixture_pollution=0 over a dir we
    // could not even enumerate, the opposite of the guard's point
    var listFailed = false
    val leftovers: Seq[java.nio.file.Path] =
      if (!java.nio.file.Files.isDirectory(targetDir)) Seq.empty
      else quietly { listFailed = true; Seq.empty[java.nio.file.Path] } {
        val s = java.nio.file.Files.list(targetDir)
        try {
          val it = s.iterator()
          val b = Seq.newBuilder[java.nio.file.Path]
          while (it.hasNext) {
            val p = it.next()
            if (isFixtureLeftover(p.getFileName.toString)) b += p
          }
          b.result()
        } finally s.close()
      }
    val pollution = leftovers.size.toLong
    leftovers.foreach { p =>
      quietly(()) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
        finally walk.close()
      }
    }
    val remaining = leftovers.count(java.nio.file.Files.exists(_)).toLong
    val allowDirty = sys.env.get("SPARK_GRAFT_BENCH_DIRTY").contains("1")
    if (listFailed && !allowDirty) {
      println(s"""{"metric":"total","value":-1,"unit":"sec","error":"could not enumerate target/ for fixture leftovers — refusing to bench an unverifiable build dir (SPARK_GRAFT_BENCH_DIRTY=1 to override)","fixture_pollution":-1}""")
      sys.exit(2)
    }
    if (refusePollution(remaining, allowDirty)) {
      println(s"""{"metric":"total","value":-1,"unit":"sec","error":"polluted build dir: $remaining fixture leftovers survived cleanup (SPARK_GRAFT_BENCH_DIRTY=1 to override)","fixture_pollution":$pollution}""")
      sys.exit(2)
    }
    // WARNING TAIL CAPTURE: every `WindowExec: No Partition Defined`
    // emitted during the run is attributed to the query executing at
    // that moment (planning happens on this driver thread). The detail
    // artifact records the per-query counts plus the UNEXPLAINED set —
    // warnings from queries that are not declared exact tiers — so a
    // new single-partition funnel can never hide in the tail: the tail
    // is clean by construction, not by round-N triage.
    val windowWarned =
      scala.collection.mutable.LinkedHashMap[String, Long]()
    val currentQuery = new java.util.concurrent.atomic.AtomicReference("init")
    locally {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.LoggerContext
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
          "graftWindowWatch", null, null, true,
          Array.empty[org.apache.logging.log4j.core.config.Property]) {
        override def append(
            e: org.apache.logging.log4j.core.LogEvent): Unit =
          if (e.getLoggerName.endsWith("WindowExec") &&
              e.getMessage.getFormattedMessage.contains("No Partition Defined"))
            windowWarned.synchronized {
              val k = currentQuery.get()
              windowWarned(k) = windowWarned.getOrElse(k, 0L) + 1L
            }
      }
      app.start()
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
      ctx.updateLoggers()
    }
    // Bench measures the configuration the engine ships: Sessions.local
    // (AQE + skew join + sized shuffle partitions), not a bare session.
    val spark = Sessions.local()
    // Untimed warmup at the smallest SF: JIT + codegen + streaming
    // machinery initialization are per-JVM one-time costs, not query
    // costs — the timed section below measures steady-state throughput.
    val warmDir = "/root/testdata/sf0.001"
    Seq("q02_pricing_agg", "d03_simhash", "st1_stream_tumbling", "e01_hash_embed_knn")
      .foreach { n =>
        currentQuery.set(s"warmup:$n")
        try SparkEntry.queries(n)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[warmup] $n: ${e.getMessage}") }
      }
    // Single-shot timings on this box swing 3-8x run to run (JIT, GC,
    // noisy neighbours); the per-query number reported is the MEDIAN of
    // `reps` timed runs, with min/max kept so the spread is visible in
    // the artifact instead of silently folded into the point estimate.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SORTED run order: Map hash order reshuffles every query's
    // neighborhood each time the suite grows, so a query following a
    // filesystem-churn-heavy predecessor inflates in one round and
    // recovers the next (r7's t04, r8's st1 — both diagnosed as
    // ordering contamination, not plan changes). A stable alphabetical
    // order makes per-query medians comparable ACROSS rounds.
    //
    // INTERLEAVED reps: the suite runs as `reps` complete PASSES
    // (every query once per pass) rather than `reps` back-to-back runs
    // per query. Box noise is localized in TIME, so consecutive reps
    // all sit inside the same noisy window and the median keeps the
    // contamination (r8's q32: artifact median 7.9 s, re-probed
    // 0.60–0.81 s — all three fixed-order reps were hit). With passes,
    // a noisy window hits DIFFERENT queries each pass and the
    // cross-pass median rejects it.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map(_._1 -> Vector.empty[Double]): _*)
    for (_ <- 1 to reps; (name, fn) <- names) {
      currentQuery.set(name)
      val t0 = System.nanoTime()
      // noop-format write materializes EVERY column of the result —
      // a count() would let Catalyst prune unreferenced projections and
      // under-measure expression-heavy queries.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        acc(name) :+= (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    val results = names.map { case (name, _) => name -> acc(name) }
    def j(d: Double): String = f"$d%.3f"
    val medians = results.collect { case (k, ts) if ts.nonEmpty =>
      k -> median(ts)
    }.toSeq
    val spread = results.collect { case (k, ts) if ts.nonEmpty =>
      "\"" + k + "\":{\"median\":" + j(median(ts)) + ",\"runs\":[" + ts.map(j).mkString(",") +
        "],\"ok_reps\":" + ts.length + "}"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) =>
      "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val (warnJson, unexplainedJson) = windowWarned.synchronized {
      val w = windowWarned.map { case (k, n) => s""""$k":$n""" }
        .mkString("{", ",", "}")
      val u = unexplainedWindowWarnings(windowWarned.keys)
        .map("\"" + _ + "\"").mkString("[", ",", "]")
      (w, u)
    }
    val detail =
      s"""{"metric":"total","value":${j(total)},"unit":"sec","reps":$reps,"sf":"$sfDir","fixture_pollution":$pollution,"queries":$spread,"errors":$errJson,"window_warnings":$warnJson,"unexplained_window_warnings":$unexplainedJson}"""
    // File only — NOT stderr: sbt re-emits the program's stderr on its own
    // stdout (`[error] ...` lines), so an 8 KB detail line would land in
    // the driver's 2000-char tail and evict the compact line below.
    val detailPath = java.nio.file.Paths.get("target/bench_detail.json")
    java.nio.file.Files.createDirectories(detailPath.getParent)
    java.nio.file.Files.write(detailPath, detail.getBytes("UTF-8"))
    // The round-over-round comparison table, machine- AND eye-readable
    // (full names, not the compact line's budgeted codes): one row per
    // query with median/min/max/ok_reps, sorted by name so a diff
    // against last round's table lines up.
    val tsv = new StringBuilder("query\tmedian_s\tmin_s\tmax_s\tok_reps\n")
    results.foreach { case (k, ts) =>
      if (ts.nonEmpty)
        tsv ++= s"$k\t${j(median(ts))}\t${j(ts.min)}\t${j(ts.max)}\t${ts.length}\n"
      else tsv ++= s"$k\tERROR\t-\t-\t0\n"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/bench_medians.tsv"),
      tsv.toString.getBytes("UTF-8"))
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    println(compactLine(medians, errors.keys.toSeq, sfShort, pollution))
    spark.stop()
  }

  /** The driver-facing stdout line (r9+: CSV-array encoding — see
    * `line()` below; r8 used a JSON map, r7 and earlier full names).
    * The driver captures only the LAST
    * ~2000 chars of output (with sbt's trailing "[success] ..." line in
    * the same window) and parses the JSON out of that tail — a line
    * carrying full query names plus per-run spreads is ~12 KB and gets
    * truncated mid-line (BENCH_r01..r04 were all `parsed: null`; r7's
    * two-decimal object hit 1,877 chars at 162 queries — one round from
    * going dark). So the line is built to a HARD budget and can never
    * outgrow the tail, at any suite size:
    *
    *  - query keys are the short codes: the unique prefix before the
    *    first '_' with leading zeros stripped from the numeric run
    *    (q01_filter → q1, st10_... → st10, q09b → q9b), and q-family
    *    keys additionally drop the 'q' itself (declared by the line's
    *    `"qpfx":"q"`): a digit-led key is a q query — "1":5 is q01,
    *    "9b":4 is q09b. Zero-stripping landed in round 8 and the
    *    q-prefix drop mid-round-8 at 220 queries — BENCH_r07 and
    *    earlier report q01, r8+ the digit form; the mapping stays
    *    1:1. Together these buy ~260 chars — what keeps the full
    *    suite reportable with zero omission;
    *  - per-query medians print as INTEGER DECISECONDS (declared by
    *    the line's `"qu":"ds"` key; `"value"`/`"unit"` stay seconds):
    *    0.25 s → 3, 6.08 s → 61 — 1–2 chars for the sub-second bulk
    *    of the suite vs 3 at r7's two-decimal seconds. The ds switch
    *    landed mid-round-8 when 1-decimal seconds started omitting 20
    *    queries at 203 entries; r7 and earlier report seconds, r8+
    *    deciseconds — divide by 10 to compare across rounds. 100 ms
    *    resolution is far inside this box's documented 3–8×
    *    single-shot swing; exact 3-decimal medians live in
    *    target/bench_detail.json;
    *  - failed queries are listed by code in `"errors":[...]`, present
    *    only when non-empty (messages: detail file + stderr);
    *  - if the full object would still blow the budget, the SLOWEST
    *    queries are kept (they carry the performance signal; the
    *    dropped tail is sub-second noise-dominated entries) and an
    *    `"omitted":N` count makes the truncation explicit — the line
    *    degrades gracefully instead of breaking the channel.
    *
    * Pure function of (medians, error codes, sf) so BenchContractSpec
    * can pin the budget at future suite sizes without a Spark session. */
  def compactLine(medians: Seq[(String, Double)], errorNames: Seq[String],
      sfShort: String, pollution: Long = 0L): String = {
    // driver tail 2000 − sbt's ~73-char "[success]" line (+2 newlines)
    // = 1925 hard ceiling; 1905 keeps 20 chars of slack and fits the
    // 182-query suite with zero omission at worst-case widths
    val budget = 1905
    // q-family keys drop their 'q' (declared by the line's
    // `"qpfx":"q"` key): a key STARTING WITH A DIGIT reads as
    // q<key> — "103":9 is q103, "9b":4 is q09b. The q family is ~60%
    // of the suite, so this buys ~125 chars — what keeps a 220-query
    // round reporting with zero omission. st-family keys compress
    // "st" → "S" (declared by `"Spfx":"st"`): "S19":61 is st19 —
    // capital S can never collide with the lowercase s ANN family.
    // Other letter-led keys (t5, d12, …) are untouched; uniqueness is
    // pinned in BenchContractSpec over [[lineKey]], the ONE encoder.
    def short(name: String): String = lineKey(name)
    // integer deciseconds: the densest encoding that keeps 100 ms
    // resolution (sub-second queries cost 1 char, not 3)
    def fmt(d: Double): String = math.round(d * 10).toString
    // total at 1 decimal — the 3-decimal figure lives in bench_detail
    def j(d: Double): String = f"$d%.1f"
    val total = medians.map(_._2).sum
    // the error list is BOUNDED too: a mass-failure run (every query
    // erroring) must still fit the tail — that is exactly when the
    // channel matters most. 24 codes ≈ 170 chars worst case.
    val errPart =
      if (errorNames.isEmpty) ""
      else {
        val (shown, dropped) = errorNames.map(short).splitAt(24)
        val more =
          if (dropped.isEmpty) "" else s""","errors_omitted":${dropped.size}"""
        shown.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]") + more
      }
    // CSV-array encoding (declared by `"enc":"csv"`): `qk` and `qv` are
    // parallel comma-joined strings — qk[i]'s query took qv[i]
    // deciseconds. Saves the per-entry quotes+colon of a JSON map
    // (~2 chars x suite size), which is what keeps a 234-query round
    // reporting with zero omission; the map form hit "omitted":4 at
    // 234 (r9). Decode: split both on ',' and zip.
    def line(entries: Seq[(String, Double)], omitted: Int): String = {
      val qk = entries.map(e => short(e._1)).mkString(",")
      val qv = entries.map(e => fmt(e._2)).mkString(",")
      val omitPart = if (omitted == 0) "" else s""","omitted":$omitted"""
      // "pol": fixture leftovers found (and removed) at startup — a
      // nonzero value self-describes a run whose PREDECESSOR polluted
      // the build dir; present only when nonzero (budget)
      val polPart = if (pollution == 0L) "" else s""","pol":$pollution"""
      s"""{"metric":"total","value":${j(total)},"unit":"sec","qu":"ds","qpfx":"q","Spfx":"st","enc":"csv","qk":"$qk","qv":"$qv"$errPart$omitPart$polPart,"sf":"$sfShort"}"""
    }
    val full = line(medians, 0)
    if (full.length <= budget) full
    else {
      // keep the slowest K that fit, emitted in original (stable) order
      val byCost = medians.sortBy(-_._2)
      val keep = (medians.size to 0 by -1).view
        .map(k => byCost.take(k).map(_._1).toSet)
        .map(ks => (ks, line(medians.filter(p => ks(p._1)), medians.size - ks.size)))
        .find(_._2.length <= budget)
        .map(_._2)
      keep.getOrElse(line(Seq.empty, medians.size))
    }
  }
}
