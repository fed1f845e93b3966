package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Versioned, VersionedScan}

/** PERSISTED ANN indexes — the vector-side twin of the d11 MinHash
  * signature index: the expensive build artifacts (IVF centroids +
  * inverted-list assignments, PQ codebooks + codes, HNSW adjacency) are
  * committed as ordinary versioned graft tables, so a retrieval session
  * LOADS the index instead of rebuilding it per query run, and a change
  * to the corpus extends the index incrementally instead of retraining.
  *
  * The incremental contract mirrors FAISS's operational model: the
  * trained structures (coarse quantizer, codebooks) are FROZEN at
  * build; `ensure*` assigns/encodes ONLY the out-of-date vectors
  * against the frozen structures — bit-identical to what a full
  * assignment/encode pass over the current corpus would produce with
  * the same frozen structures (pinned in AnnIndexSpec). Retraining the
  * quantizer itself is an explicit rebuild (drop the index root), the
  * same way d11 re-shingles only under an explicit recompute.
  *
  * Staleness detection covers the full CRUD surface, never just id
  * presence: every index row records `vh = xxhash64(embedding)`, and
  * `ensure*` classifies corpus rows by a distributed join —
  *   - NEW (id absent): upsert the delta's assignments/codes —
  *     idempotent BY ID under racing writers (two concurrent ensures
  *     from the same base converge to one row per id even when their
  *     deltas differ because the corpus moved between observations);
  *   - CHANGED (id present, vh differs — an UPDATE/MERGE rewrote the
  *     embedding): re-encode and land via the merge-on-read upsert
  *     (O(delta) append + positional tombstones, zero file rewrite);
  *   - REMOVED (indexed id gone from the corpus): merge-on-read
  *     delete (deletion-vector tombstones, zero rewrite).
  * An index written before `vh` existed self-describes: value drift is
  * undetectable there (only id presence/absence is), which the ensure
  * paths honor by skipping the CHANGED class — rebuild to migrate.
  * When nothing is out of date no commit lands — "run 2 reuses the
  * committed index with zero rebuild" is observable as an unchanged
  * version number, which the s15 gate emits as columns.
  *
  * At 100 TB: the centroids/codebooks are model-sized broadcast tables;
  * the assignments/codes tables are the bucketed serving layout
  * (clustered by id via the commit key) and an incremental refresh
  * costs O(delta) assignment work + O(corpus ⋈ index-id) staleness
  * metadata — never a rescan-and-rewrite of the indexed corpus.
  */
object AnnIndex {

  def ivfCentroidsTable(root: String): String = s"$root/ivf_centroids"
  def ivfAssignmentsTable(root: String): String = s"$root/ivf_assignments"
  def pqCodebooksTable(root: String): String = s"$root/pq_codebooks"
  def pqCodesTable(root: String): String = s"$root/pq_codes"
  def pqListsTable(root: String): String = s"$root/pq_lists"

  /** Freshness stamp for the derived cid-clustered CODES layout: binds
    * the commit to the exact assignments and codes generations (version
    * AND manifest fingerprint — drop-root rebuilds reuse version
    * numbers) it was derived from. */
  private def pqListsTxn(av: Long, afp: Long, qv: Long, qfp: Long): String =
    s"pq-lists-a$av-f$afp-q$qv-g$qfp"

  /** A layout table's EFFECTIVE stamp: the latest commit's txn — or,
    * when the trailing commits are row-preserving OPTIMIZE compactions,
    * the stamp of the most recent stamped commit beneath them. Binpack
    * on a serving layout is routine maintenance (the O(delta) refresh
    * accretes small delta files by design) and must not cost a full
    * re-cluster on the next refresh nor silently un-prune serving. The
    * walk stops at the FIRST unstamped non-OPTIMIZE commit — DML,
    * RESTORE, foreign writes: their rows may differ from the stamped
    * derivation, so they must read as stale — and is bounded by
    * compaction cadence (8), never history length. Testing the
    * EXPECTED stamp against this (instead of the recent-txn ring)
    * keeps a corpus RESTORE honest: an old identity resurfacing never
    * matches a NEWER restamp's layout rows. */
  private def effectiveLayoutStamp(spark: SparkSession, lT: String,
      lv: Long): Option[String] = {
    var v = lv
    var steps = 0
    while (v > 0 && steps <= 8) {
      val sn = scala.util.Try(Versioned.snapshot(spark, lT, v))
        .getOrElse(return None)
      if (sn.txn.isDefined) return sn.txn
      if (!sn.op.contains("OPTIMIZE")) return None
      v -= 1
      steps += 1
    }
    None
  }

  /** Build (or refresh) the DERIVED cid-clustered PQ codes layout:
    * `(cid, id, sub, code)` committed CLUSTERED BY list id with
    * per-file cid stats — the layout real IVF-PQ index files ship, and
    * what makes the ADC scan's "stream codes for nProbe/k of the data"
    * true at the FILE level: the serving scan manifest-prunes to the
    * probed lists' files instead of reading the whole codes table and
    * joining assignments per serve. Derived, not truth (`pq_codes` +
    * `ivf_assignments` stay authoritative, O(delta) MoR-maintained);
    * the stamp names both source generations, so any ensure/retrain on
    * either invalidates it and serving falls back to the join form —
    * never stale codes. An up-to-date layout returns without
    * committing; a stale one refreshes O(delta) since r14
    * ([[tryIncrementalPqLists]]). */
  def optimizePqServing(spark: SparkSession, root: String,
      idCol: String, force: Boolean = false): Long = {
    val (cT, aT, qT, lT) = (ivfCentroidsTable(root),
      ivfAssignmentsTable(root), pqCodesTable(root), pqListsTable(root))
    val av = Versioned.latestVersion(spark, aT)
    require(av > 0, s"no committed IVF routing at $root — the pq tier " +
      "routes through the IVF lists; ensure kind 'ivf' first")
    val qv = Versioned.latestVersion(spark, qT)
    require(qv > 0, s"no committed PQ codes at $root — ensure first")
    val txn = pqListsTxn(av, Versioned.manifestFingerprint(spark, aT, av),
      qv, Versioned.manifestFingerprint(spark, qT, qv))
    val lv = Versioned.latestVersion(spark, lT)
    val oldStamp =
      if (lv > 0) effectiveLayoutStamp(spark, lT, lv) else None
    if (!force && oldStamp.contains(txn)) return lv
    // O(delta) path first (r14): rewrite only the lists whose code or
    // assignment membership changed; full re-cluster is the fallback —
    // and the explicit door (`force`) for restoring pruning
    // granularity after a whole-layout compaction
    if (!force && lv > 0)
      tryIncrementalPqLists(spark, root, idCol, lv, oldStamp, av, qv, txn)
        .foreach(return _)
    val asg = VersionedScan.read(spark, aT, av)
    val codes = VersionedScan.read(spark, qT, qv)
    val k = VersionedScan.read(spark, cT).count()
    val lists = codes.select(col(idCol), col("sub"), col("code"))
      .join(asg.select(col(idCol), col("cid")), Seq(idCol))
      .select(col("cid"), col(idCol), col("sub"), col("code"))
    // same granularity rule as the ivf lists (pruning + O(delta) rewrite)
    Versioned.commit(spark, lT, lists, Some("cid"),
      files = math.max(4, math.min(4096, (k / 4).toInt)),
      txn = Some(txn), op = "OPTIMIZE_SERVING",
      expected = if (lv > 0) Some(lv) else None)
  }

  /** [[tryIncrementalIvfLists]]'s codes-layout twin: the pq_lists delta
    * is the union of the ASSIGNMENTS diff (routing moves) and the
    * CODES diff (re-encodes) between the stamped and current
    * generations — both stamped-generation file diffs
    * ([[stampedDeltaSides]]: fingerprints verified, DV deltas folded
    * in), never a table scan. Only the lists holding changed OLD
    * images rewrite. */
  private def tryIncrementalPqLists(spark: SparkSession, root: String,
      idCol: String, lv: Long, oldStamp: Option[String], av: Long, qv: Long,
      newTxn: String): Option[Long] = {
    val (cT, aT, qT, lT) = (ivfCentroidsTable(root),
      ivfAssignmentsTable(root), pqCodesTable(root), pqListsTable(root))
    val parsed = oldStamp
      .flatMap("""pq-lists-a(\d+)-f(-?\d+)-q(\d+)-g(-?\d+)""".r
        .findFirstMatchIn(_))
      .getOrElse(return None)
    val (av0, afp0) = (parsed.group(1).toLong, parsed.group(2).toLong)
    val (qv0, qfp0) = (parsed.group(3).toLong, parsed.group(4).toLong)
    scala.util.Try {
      val asg0 = VersionedScan.read(spark, aT, av0)
      val asg1 = VersionedScan.read(spark, aT, av)
      val codes1 = VersionedScan.read(spark, qT, qv)
      val (asgOld, asgNew) = stampedDeltaSides(spark, aT, idCol,
        av0, afp0, av).getOrElse(return None)
      val (codesOld, codesNew) = stampedDeltaSides(spark, qT, idCol,
        qv0, qfp0, qv).getOrElse(return None)
      val oldIds: Seq[Any] = (asgOld ++ codesOld).distinct
      val deltaIds: Seq[Any] =
        (asgOld ++ asgNew ++ codesOld ++ codesNew).distinct
      if (deltaIds.size > maxLayoutDelta) return None
      // rewrite keys = the OLD images' lists only (append-mostly deltas
      // rewrite nothing — the new codes land in fresh cid-sorted files)
      val dirtyCids =
        if (oldIds.isEmpty) Seq.empty[Long]
        else restrictToIds(spark, asg0, idCol, oldIds)
          .select("cid").distinct().collect()
          .map(_.getAs[Number](0).longValue).toSeq
      // COST-AWARE fallback (r15 crossover rehearsal): when the dirty
      // lists span over half the layout's FILES, the refresh costs
      // more than the full re-cluster it avoids — preview with the
      // rewrite's own matcher, O(files) driver arithmetic
      val (touchedF, totalF) =
        Versioned.filesTouchedByKey(spark, lT, lv, "cid", dirtyCids)
      if (touchedF * 2 > totalF) return None
      val deltaNew =
        if (deltaIds.isEmpty)
          VersionedScan.read(spark, lT, lv).limit(0)
        else restrictToIds(spark, codes1, idCol, deltaIds)
          .select(col(idCol), col("sub"), col("code"))
          .join(restrictToIds(spark, asg1, idCol, deltaIds)
            .select(col(idCol), col("cid")), idCol)
          .select(col("cid"), col(idCol), col("sub"), col("code"))
      Some(Versioned.rewriteFilesByKey(spark, lT, "cid", dirtyCids,
        Some(newTxn), "OPTIMIZE_SERVING", lv)(
        layoutReplace(spark, idCol, asg1.schema(idCol).dataType,
          deltaIds, deltaNew)))
    }.toOption.flatten
  }

  /** The fresh cid-clustered codes layout, or None when absent/stale —
    * the same metadata-reads routing decision as [[freshLists]]. */
  private def freshPqLists(spark: SparkSession,
      root: String): Option[DataFrame] = {
    val (aT, qT, lT) =
      (ivfAssignmentsTable(root), pqCodesTable(root), pqListsTable(root))
    val lv = Versioned.latestVersion(spark, lT)
    if (lv == 0L) return None
    val av = Versioned.latestVersion(spark, aT)
    val qv = Versioned.latestVersion(spark, qT)
    if (av == 0L || qv == 0L) return None
    if (effectiveLayoutStamp(spark, lT, lv).contains(
        pqListsTxn(av, Versioned.manifestFingerprint(spark, aT, av),
          qv, Versioned.manifestFingerprint(spark, qT, qv))))
      Some(VersionedScan.read(spark, lT, lv))
    else None
  }

  /** [[freshPqLists]] AT an instant: Some only when a layout commit
    * existed then AND its stamp names the same-instant assignments and
    * codes generations. */
  private def freshPqListsAsOf(spark: SparkSession, root: String,
      tsMillis: Long): Option[DataFrame] = {
    val (aT, qT, lT) =
      (ivfAssignmentsTable(root), pqCodesTable(root), pqListsTable(root))
    if (Versioned.latestVersion(spark, lT) == 0L) return None
    scala.util.Try {
      val ls = Versioned.snapshotAsOf(spark, lT, tsMillis)
      val av = Versioned.snapshotAsOf(spark, aT, tsMillis).version
      val qv = Versioned.snapshotAsOf(spark, qT, tsMillis).version
      if (effectiveLayoutStamp(spark, lT, ls.version).contains(
          pqListsTxn(av, Versioned.manifestFingerprint(spark, aT, av),
            qv, Versioned.manifestFingerprint(spark, qT, qv))))
        Some(VersionedScan.read(spark, lT, ls.version))
      else None
    }.toOption.flatten
  }

  /** `pq_lists` freshness for `ann_stats` — artifact-internal (no
    * corpus identity involved), so it always reports. */
  def pqListsFreshness(spark: SparkSession, root: String): Map[String, Long] =
    Map("pq_lists_fresh" ->
      (if (freshPqLists(spark, root).isDefined) 1L else 0L))

  /** MEASURED recall@k of a committed index against the exact cosine
    * oracle — recall is data- and scale-dependent (the 2.2 M rehearsal:
    * hnsw 0.425 → 0.975 sweeping ef 32 → 512), so tuning the width
    * knobs (nProbe for ivf/pq, ef for hnsw) needs a measurement, not a
    * fixture number. Probes = the `probes` lowest-id corpus rows
    * (deterministic, reproducible across calls); the oracle is ONE
    * broadcast cosine pass over the corpus + a per-probe top-k window
    * (O(n × probes) — an AUDIT op to run at maintenance time, never on
    * the serve path), and the served side rides the kind's committed
    * door at the given `width` so the number describes exactly what
    * `graft_ann_search` would return. Returns (recall in [0,1],
    * oracle pair count). */
  /** Exact-oracle memo for [[measureRecall]]: a width sweep (the
    * procedure's stated purpose) re-asks the same oracle per point —
    * probes × k id pairs, tiny. The id/emb COLUMN NAMES are part of
    * the key: the oracle's content depends on which embedding column
    * it ranked (a table carrying two — say a 64-d column and its JL
    * projection — measured back-to-back at the same (table, version,
    * probes, k) would otherwise silently reuse the first column's
    * ground truth for the second: a wrong recall number, no error). */
  private val recallOracles =
    new LruMap[(String, Long, String, String, Int, Int), Set[(Long, Long)]](64)

  def measureRecall(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String, kind: String,
      probes: Int, k: Int, width: Int): (Double, Long) = {
    import graft.functions.vec_cosine_sim
    import org.apache.spark.sql.expressions.Window
    // every cheap check fires BEFORE the O(n × probes) oracle pass —
    // a typo'd kind or a missing index must fail in milliseconds, not
    // after a brute-force corpus scan
    require(probes > 0 && k > 0 && width > 0,
      s"measureRecall: probes/k/width must be positive ($probes/$k/$width)")
    val kindL = kind.toLowerCase
    require(Set("ivf", "pq", "hnsw")(kindL),
      s"measureRecall: unknown kind '$kind' (ivf | pq | hnsw)")
    require(idCol != "probe_id" && idCol != "__pv" && embCol != "__pv",
      s"measureRecall: the oracle adds probe_id/__pv columns — a " +
        s"corpus column with either name would collide; rename it")
    val artifactT = kindL match {
      case "ivf" => ivfCentroidsTable(root)
      case "pq" => pqCodesTable(root)
      case _ => nswEdgesTable(root)
    }
    require(Versioned.latestVersion(spark, artifactT) > 0,
      s"measureRecall: no committed $kindL index at $root — " +
        "CALL ann_ensure first")
    val cv = Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"measureRecall: $corpusTable has no commits")
    val emb = VersionedScan.read(spark, corpusTable, cv)
    // probe rows collect ONCE (bounded by `probes`) and feed both the
    // oracle and the served side from a local relation
    val pSlim = emb.orderBy(idCol).limit(probes)
      .select(col(idCol).cast("long").as("probe_id"),
        col(embCol).as("__pv"))
    val pRows = pSlim.collect()
    require(pRows.nonEmpty,
      s"measureRecall: $corpusTable v$cv has no rows to probe")
    val p = spark.createDataFrame(
      java.util.Arrays.asList(pRows: _*), pSlim.schema)
    val oKey = (corpusTable, cv, idCol, embCol, probes, k)
    val exact = recallOracles.get(oKey).getOrElse {
      val v = emb.crossJoin(broadcast(p))
        .select(col("probe_id"), col(idCol).cast("long").as("__id"),
          vec_cosine_sim(col(embCol), col("__pv")).as("__s"))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("probe_id").orderBy(desc("__s"), col("__id"))))
        .filter(col("__rk") <= k).select("probe_id", "__id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      recallOracles.put(oKey, v)
      v
    }
    val served = kindL match {
      case "ivf" => searchIvfBatchCommitted(spark, root, corpusTable,
        idCol, embCol, p, "probe_id", "__pv", k, nProbe = width, cv)
      // the pool follows the TVF's width-scaled formula
      // ([[pqRerankPool]] — one definition), so the measured recall
      // describes exactly what graft_ann_search would serve
      case "pq" => searchIvfPqBatchCommitted(spark, root, corpusTable,
        idCol, embCol, p, "probe_id", "__pv", k, nProbe = width,
        pool = pqRerankPool(k, width), corpusVersion = cv)
      case _ => searchNswBatchCommitted(spark, root, corpusTable,
        idCol, embCol, p, "probe_id", "__pv", k, cv, ef = width)
    }
    val got = served.select(col("probe_id").cast("long"),
        col(idCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact.count(got).toDouble / exact.size, exact.size.toLong)
  }

  /** Target-recall width selection — the "pick" step that closes the
    * r12–r15 observability loop (ann_stats observes, ann_recall
    * measures, ann_tune CHOOSES): walk the width ladder (doubling —
    * nProbe for ivf/pq, ef for hnsw) through [[measureRecall]] and
    * stop at the FIRST width whose measured recall@k meets `target`.
    * Returns the walked curve as (width, recall, oraclePairs) rows,
    * the meeting width last — the cheapest serve for the recall goal,
    * which is the question every operator actually asks ("recall ≥
    * 0.9, minimal cost"), answered by measurement instead of a
    * hand-run sweep. The exact oracle is memoized per (table, version,
    * columns, probes, k) ([[recallOracles]]), so the whole ladder pays
    * ONE brute-force pass; each rung costs one committed-door serve.
    * The hnsw ladder starts at k (the effective beam is max(ef, k) —
    * below k every rung measures the same serve); ivf/pq start at 1.
    * An unmeetable target refuses loudly WITH the max width's measured
    * recall, so the caller knows whether to raise max_width or improve
    * the tier itself (pq: retrain at a larger m; hnsw: rebuild with a
    * larger construction beam). An audit op for maintenance windows,
    * never the serve path — same contract as [[measureRecall]]. */
  def tuneWidth(spark: SparkSession, root: String, corpusTable: String,
      idCol: String, embCol: String, kind: String, probes: Int, k: Int,
      target: Double, maxWidth: Int): Seq[(Int, Double, Long, Int)] = {
    require(target > 0.0 && target <= 1.0,
      s"tuneWidth: target recall must be in (0, 1], got $target")
    val kindL = kind.toLowerCase
    val floor = if (kindL == "hnsw") math.max(1, k) else 1
    require(maxWidth >= floor,
      s"tuneWidth: max width $maxWidth is below the $kindL ladder " +
        s"floor $floor" +
        (if (kindL == "hnsw") " (the effective beam is max(ef, k) — " +
          "widths below k all measure the same serve)" else ""))
    // the doubling walks in Long: an Int ladder would overflow past
    // 2^30 (max_width => Int.MaxValue is an operator's natural "no
    // cap" spelling) and every overflowed value stays < maxWidth —
    // a non-terminating takeWhile
    val ladder =
      Iterator.iterate(floor.toLong)(_ * 2).takeWhile(_ < maxWidth)
        .map(_.toInt).toSeq :+ maxWidth
    val curve =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long, Int)]
    for (w <- ladder) {
      val (r, n) = measureRecall(spark, root, corpusTable, idCol, embCol,
        kindL, probes, k, w)
      // the pq pool CO-WALKS the ladder through the one shared formula
      // ([[pqRerankPool]] — what the door serves at that width); each
      // rung REPORTS the pool it measured with, so the curve names
      // both knobs it exercised (the documented lever order is
      // m → pool → nProbe; m is a retrain-time decision) — -1 for
      // kinds without a rerank pool
      val pool = if (kindL == "pq") pqRerankPool(k, w) else -1
      curve += ((w, r, n, pool))
      if (r >= target) return curve.toSeq
    }
    val (wMax, rMax, _, _) = curve.last
    throw new IllegalArgumentException(
      f"tuneWidth: target recall@$k%d $target%.4f is not met at max " +
        f"width $wMax%d — measured $rMax%.4f there (over $probes%d " +
        "probes); raise max_width, improve the tier (pq: retrain at a " +
        "larger m; hnsw: rebuild with a larger construction beam), or " +
        "lower the target")
  }

  /** Joint (eps, width) selection for the SPILL knob — the pick step
    * that composes `ann_spill_preview`'s price with `ann_tune`'s
    * value (VERDICT r16: eps was the one knob without one). For each
    * rung of the eps ladder (plain eps = 0 always walks first as the
    * width-only baseline), build a SHADOW index from the root's OWN
    * committed centroids (one assignment pass per rung — never a
    * retrain, the trained quantizer stays frozen), walk the doubling
    * width ladder through the memoized exact-recall oracle
    * ([[recallOracles]] — ONE brute-force pass for the whole
    * (eps x width) grid), stopping each rung at its first
    * target-meeting width, and return the measured curve with
    * chosen = true on the CHEAPEST meeting pair, where
    * cost = width x (1 + spill fraction) — the expected scanned-rows
    * proxy (routing scans `width` lists whose rows grew by the
    * fraction). Rungs the preview prices out are SKIPPED without
    * paying their build: recall at a fixed width is monotone in eps
    * (IvfSpec), so a wider eps can only beat the incumbent by meeting
    * at a SMALLER width — at most HALF on a doubling ladder — and
    * when (1 + frac) x (bestWidth / 2) already reaches the best cost
    * the rung cannot win (reported with width = -1, its preview
    * fraction still named). Ties go to the SMALLER eps (smaller
    * index). Shadow artifacts live in a temp dir torn down before
    * returning; the root itself is never touched — apply the chosen
    * pair with `ann_ensure(spill => eps)` on a fresh root (spill
    * freezes at first build) and serve at the chosen width. An
    * unmeetable target refuses loudly naming the best-achievable
    * (eps, width, recall). An audit op for maintenance windows, never
    * the serve path — same contract as [[tuneWidth]]. */
  def tuneSpill(spark: SparkSession, root: String, corpusTable: String,
      idCol: String, embCol: String, probes: Int, k: Int,
      target: Double, maxWidth: Int,
      epsLadder: Seq[Double] = Seq(0.02, 0.05))
      : Seq[(Double, Double, Int, Double, Double, Boolean)] = {
    require(target > 0.0 && target <= 1.0,
      s"tuneSpill: target recall must be in (0, 1], got $target")
    require(maxWidth >= 1, s"tuneSpill: max width must be >= 1")
    require(epsLadder.nonEmpty && epsLadder.forall(_ > 0.0),
      "tuneSpill: every ladder eps must be positive")
    val cT = ivfCentroidsTable(root)
    require(Versioned.latestVersion(spark, cT) > 0,
      s"ann_spill_tune: no committed IVF centroids at $root — the " +
        "shadow builds reuse the root's own quantizer; CALL " +
        "graft.system.ann_ensure(..., kind => 'ivf') first")
    val cv = Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"tuneSpill: $corpusTable has no commits")
    val corpus = VersionedScan.read(spark, corpusTable, cv)
    val cents = VersionedScan.read(spark, cT)
    val ladder = epsLadder.distinct.sorted
    // ONE assignment-cost pass prices every rung up front (the
    // preview's own machinery) — the prune below reads from here
    val fracs = spillCurve(spark, root, corpus, idCol, embCol, ladder)
      .map { case (e, s, n) =>
        e -> (if (n == 0L) 0.0 else s.toDouble / n) }.toMap
    val widthLadder =
      (Iterator.iterate(1L)(_ * 2).takeWhile(_ < maxWidth)
        .map(_.toInt).toSeq :+ maxWidth).distinct
    val tmp = java.nio.file.Files.createTempDirectory("graft_spill_tune")
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Double, Int, Double, Double, Boolean)]
    var best: Option[(Double, Int, Double)] = None // (eps, width, cost)
    try {
      for (((eps, frac), i) <- ((0.0, 0.0) +:
          ladder.map(e => (e, fracs(e)))).zipWithIndex) {
        val pruned = best.exists { case (_, bw, bc) =>
          (1.0 + frac) * (bw / 2.0) >= bc }
        if (pruned) rows += ((eps, frac, -1, -1.0, -1.0, false))
        else {
          val shadow = s"$tmp/r$i"
          Versioned.commit(spark, ivfCentroidsTable(shadow), cents,
            Some("cid"), files = 1)
          ensureIvf(spark, shadow, corpus, idCol, embCol, spill = eps)
          var met = false
          for (w <- widthLadder if !met) {
            val (r, _) = measureRecall(spark, shadow, corpusTable,
              idCol, embCol, "ivf", probes, k, w)
            val cost = (1.0 + frac) * w
            rows += ((eps, frac, w, r, cost, false))
            if (r >= target) {
              met = true
              if (best.forall(_._3 > cost)) best = Some((eps, w, cost))
            }
          }
        }
      }
    } finally {
      // the shadow builds are audit scratch, never state
      val p = new org.apache.hadoop.fs.Path(tmp.toString)
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    best match {
      case Some((be, bw, _)) => rows.toSeq.map {
        case t @ (e, _, w, _, _, _) =>
          if (e == be && w == bw) t.copy(_6 = true) else t
      }
      case None =>
        val (e, _, w, r, _, _) = rows.filter(_._3 > 0).maxBy(_._4)
        throw new IllegalArgumentException(
          f"tuneSpill: target recall@$k%d $target%.4f is not met by " +
            f"any (eps, width) pair on the ladder — best achievable: " +
            f"recall $r%.4f at (eps=$e%.4f, width=$w%d) over $probes%d " +
            "probes; raise max_width or the eps ladder, improve the " +
            "quantizer (retrain at a larger k), or lower the target")
    }
  }

  /** Classify the corpus into NEW / CHANGED / REMOVED against the
    * indexed (id, vh) pairs and land the WHOLE delta as ONE atomic
    * commit (Versioned.upsertDeleteMergeOnRead when both kinds are
    * present): MoR delete for REMOVED, MoR upsert for CHANGED (an
    * UPDATEd embedding) AND for NEW — upserting the fresh class (instead of a
    * blind append) makes a racing ensure idempotent BY ID: two ensures
    * from the same base with different deltas (the corpus moved
    * between their observations) converge to one row per id instead
    * of one silently dropping rows to a txn dedupe or double-indexing
    * the overlap. The classification is ONE full-outer join, reduced
    * to the out-of-date delta and PINNED (eager localCheckpoint, see
    * the Dedup.minHashNearDups note): the class counts and every
    * landing branch read the same frozen delta-sized frame, so a
    * corpus commit racing the ensure cannot make the landed rows
    * diverge from the counts — and a stale refresh pays ONE corpus
    * join, not one per non-empty class. The up-to-date path pins an
    * empty frame and mints nothing. `indexed` rows: (idCol[, vh]) — a
    * pre-vh legacy index disables CHANGED detection (id presence is
    * all such an index records). */
  private def landDelta(spark: SparkSession, table: String,
      corpus: DataFrame, indexed: DataFrame, idCol: String, hasVh: Boolean,
      encode: DataFrame => DataFrame): Unit = {
    val ix = indexed.select(col(idCol),
      (if (hasVh) col("vh") else lit(null).cast("long")).as("__vh0"),
      lit(1).as("__ix"))
    // a NULL stored hash marks a pre-vh legacy row (vh itself is never
    // null): value drift is undetectable there, so such rows are NOT
    // "changed" — matching the documented rebuild-to-migrate contract
    // instead of surprise-re-encoding the whole legacy corpus
    val valueChanged =
      if (hasVh) col("__vh0").isNotNull && col("__vh0") =!= col("vh")
      else lit(false)
    val delta = corpus.withColumn("__c", lit(1))
      .join(ix, Seq(idCol), "full_outer")
      .withColumn("__cls",
        when(col("__c").isNull, lit("removed"))
          .when(col("__ix").isNull, lit("fresh"))
          .when(valueChanged, lit("changed")))
      .filter(col("__cls").isNotNull)
      .localCheckpoint(true)
    val byCls = delta.groupBy("__cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def branch(filter: org.apache.spark.sql.Column): DataFrame =
      delta.filter(filter).drop("__c", "__vh0", "__ix", "__cls")
    val nRemoved = byCls.getOrElse("removed", 0L)
    val nUpsert = byCls.getOrElse("changed", 0L) + byCls.getOrElse("fresh", 0L)
    // the whole delta lands as ONE commit, whatever mix of classes it
    // carries — a concurrent reader (or a crash mid-refresh) sees the
    // old index or the fully refreshed one, never a torn window where
    // the upserts landed but the deletes are pending. CHANGED and NEW
    // share the upsert path (both are encode-then-land-by-id), so the
    // mixed case is one upsert+delete publication, not three commits.
    if (nRemoved > 0L && nUpsert > 0L)
      Versioned.upsertDeleteMergeOnRead(spark, table,
        encode(branch(col("__cls").isin("changed", "fresh"))),
        branch(col("__cls") === "removed").select(idCol), idCol, files = 1)
    else if (nUpsert > 0L)
      Versioned.upsertMergeOnRead(spark, table,
        encode(branch(col("__cls").isin("changed", "fresh"))),
        idCol, files = 1)
    else if (nRemoved > 0L)
      Versioned.deleteMergeOnRead(spark, table,
        branch(col("__cls") === "removed").select(idCol), idCol)
  }

  /** Vectors-per-inverted-list target for the auto-sized centroid
    * count — [[nswShardTarget]]'s IVF analogue, and the documented
    * per-list COST BOUND: a probe at nProbe lists exact-reranks
    * ~nProbe × (n / k) candidate rows, so a build-frozen k under a
    * growing corpus marches the per-probe scan cost toward a full
    * corpus scan (the cliff the HNSW sizing rule fixed one tier over).
    * With k = ceil(n / 2^13), every list holds ≈ 8k vectors and the
    * per-probe rerank stays ~nProbe · 8k rows — constant as the corpus
    * grows, at the price of a k-row broadcast for routing (k = n/2^13
    * is ~12k centroids at 10^8 vectors: comfortably broadcastable). A
    * corpus that outgrew its build-time k migrates with [[retrainIvf]]
    * (CAS commits, history preserved), never by drop-root. */
  val ivfListTarget: Long = 1L << 13

  /** Corpus-derived centroid count: ceil(n / [[ivfListTarget]]), floor
    * 16 (small corpora keep the historical default — and enough lists
    * for nProbe routing to prune at all). Counts above the floor round
    * to the next PRIME for the same strided-id reason as
    * [[nswAutoShards]]: the deterministic trainer seeds by
    * `pmod(id, k)` stratification (Ivf.centroids), and a composite k
    * folds a strided id space onto few residues — a stride-10 corpus
    * at k = 10 would seed ONE group, collapsing the codebook to a
    * single effective centroid. */
  def ivfAutoK(n: Long): Int = {
    val raw = math.max(16L, (n + ivfListTarget - 1L) / ivfListTarget).toInt
    if (raw <= 16) raw else nextPrime(raw)
  }

  /** Ensure the persisted IVF index at `root` covers exactly the rows
    * of `emb`: the first call trains the coarse quantizer and assigns
    * the whole corpus (one commit per index table); later calls land
    * only the NEW/CHANGED/REMOVED delta against the FROZEN committed
    * centroids, and mint nothing when the index is already current.
    * `k <= 0` (the scale-safe default) derives the centroid count from
    * the corpus size at first build ([[ivfAutoK]]); an existing index
    * keeps its trained k either way (k only matters at training — the
    * frozen-structure contract). Returns (centroidsVersion,
    * assignmentsVersion). */
  def ensureIvf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, k: Int = -1,
      spill: Double = 0.0): (Long, Long) = {
    require(spill >= 0.0,
      s"ensureIvf: spill must be >= 0 (got $spill) — 0 is single " +
        "assignment, > 0 multi-assigns within the (1+spill) band")
    val (cT, aT) = (ivfCentroidsTable(root), ivfAssignmentsTable(root))
    val corpus = emb.select(col(idCol), col(embCol))
      .withColumn("vh", xxhash64(col(embCol)))
    // spill > 0 = MULTI-ASSIGNMENT (Ivf.assignSpill): boundary vectors
    // whose second-nearest centroid nearly ties (d2 <= (1+eps)*d1)
    // join that list too — the routing-recall lever that widens the
    // scan only by the spill fraction. Like k, the scheme FREEZES at
    // first build: deltas and retrains re-read the stored eps (the
    // spill_eps constant column), so an id assigned today routes
    // exactly like its cohort
    def assignRows(rows: DataFrame, cents: DataFrame, eps: Double) =
      (if (eps > 0.0)
         Ivf.assignSpill(rows, idCol, embCol, cents, eps)
           .withColumn("spill_eps", lit(eps))
       else Ivf.assign(rows, idCol, embCol, cents))
        .join(rows.select(col(idCol), col("vh")), Seq(idCol))
    // bootstrap-complete is judged by the LAST artifact: a crash
    // between the two bootstrap commits leaves centroids without
    // assignments, and the repair path must stay reachable (training
    // only re-runs if the centroids commit itself is missing)
    if (Versioned.latestVersion(spark, aT) == 0L) {
      if (Versioned.latestVersion(spark, cT) == 0L)
        Versioned.commit(spark, cT,
          Ivf.centroids(emb, idCol, embCol,
            if (k > 0) k else ivfAutoK(emb.count())), Some("cid"), files = 1)
      // assign against the COMMITTED centroids (doubles round-trip
      // parquet exactly), so the stored assignment is the one every
      // later load reproduces
      Versioned.commit(spark, aT,
        assignRows(corpus, VersionedScan.read(spark, cT), spill),
        Some(idCol), files = 4)
    } else {
      // pin the index read to the observed version so the lazy read
      // cannot drift to a newer snapshot between classification and
      // landing (the corpus side is pinned inside landDelta)
      val av = Versioned.latestVersion(spark, aT)
      val cents = VersionedScan.read(spark, cT)
      val asg = VersionedScan.read(spark, aT, av)
      // spill = 0 is "no opinion" and the stored scheme wins (the
      // frozen-structure contract k already follows); the eps read is
      // one stats-pruned 1-row job, paid only by spilled roots with a
      // delta to land (or by an explicit spill request's drift check)
      lazy val storedEps = storedSpillEps(spark, root, av, asg)
      // an EXPLICIT spill > 0 that contradicts the committed scheme
      // must refuse loudly — mirroring the hnsw build-parameter
      // refusal — never ride stored-scheme-wins into a zero-job
      // "success" that applied nothing (the Current memo would then
      // stamp the drifted key as current, ADVICE r16)
      if (spill > 0.0) {
        require(asg.columns.contains("cid2"),
          s"ann index at $root was committed PLAIN (single-" +
            s"assignment); got spill=$spill — the multi-assignment " +
            "scheme freezes at first build like k: drop the index " +
            s"root tables ($cT, $aT) and re-ensure to rebuild spilled")
        require(math.round(spill * 1e6) == math.round(storedEps * 1e6),
          s"ann index at $root was committed with spill_eps=" +
            s"$storedEps; got spill=$spill — the multi-assignment " +
            "band freezes at first build like k: drop the index root " +
            "and re-ensure to change it")
      }
      landDelta(spark, aT, corpus, asg, idCol,
        asg.columns.contains("vh"),
        assignRows(_, cents,
          if (asg.columns.contains("cid2")) storedEps else 0.0))
    }
    (Versioned.latestVersion(spark, cT), Versioned.latestVersion(spark, aT))
  }

  /** The frozen spill eps of a SPILLED root's committed assignments
    * (the spill_eps constant column), memoized per generation like the
    * trained m — a steady-state re-ensure must not pay a driver job to
    * re-read an immutable constant. A spilled-schema generation whose
    * rows are all gone (e.g. a delta removed every row, before a
    * re-grow) REFUSES instead of defaulting to 0.0: the frozen eps is
    * unrecoverable, and silently assigning the next delta plain would
    * be a scheme change (or a commit-time schema mismatch) on a root
    * the schema still declares spilled (ADVICE r16). */
  private val spillEpsMemo = new LruMap[(String, Long, Long), Double](256)
  private def storedSpillEps(spark: SparkSession, root: String,
      av: Long, asg: => DataFrame): Double = {
    val aT = ivfAssignmentsTable(root)
    val key = (aT, av, Versioned.manifestFingerprint(spark, aT, av))
    spillEpsMemo.get(key).getOrElse {
      val head = asg.select(col("spill_eps")).limit(1).collect().headOption
      if (head.isEmpty)
        throw new IllegalStateException(
          s"spilled IVF root $root: the current assignments " +
            s"generation (v$av) carries the multi-assignment schema " +
            "but holds ZERO readable rows, so the frozen spill_eps " +
            "cannot be recovered — drop the index root tables " +
            s"(${ivfCentroidsTable(root)}, $aT) and re-ensure (the " +
            "rebuild re-freezes the eps), or restore a non-empty " +
            "assignments version")
      val v = head.map(_.getDouble(0)).get
      spillEpsMemo.put(key, v)
      v
    }
  }

  /** "Index generation X is exactly current for corpus generation Y"
    * — the memo behind the [[ensureIvfCurrent]] family. Every ensure
    * on an unchanged corpus otherwise pays the landDelta
    * classification join (a FULL corpus + index pass just to learn
    * the delta is empty — at 100 TB that is a 100 TB read per
    * re-ensure); with the memo the steady state is METADATA-ONLY
    * (version + manifest-fingerprint reads, zero Spark jobs). The key
    * carries the caller's structural args (k/m/spill — a drifted
    * request must still reach the real path's refusal/ignore
    * semantics) and the (version, fingerprint) generation of EVERY
    * involved table — corpus AND all of the kind's artifact tables —
    * so a corpus commit, a retrain, a torn chain (one artifact moved,
    * its pair did not) or a drop-root rebuild reusing version numbers
    * (fingerprint) all MISS and take the full path, where the
    * existing coherence checks and repairs fire exactly as before.
    * Session-local: the first ensure of a (root, corpus) pair in a
    * JVM always verifies the hard way. */
  private val ensureCurrentMemo = new LruMap[Seq[Any], Unit](512)
  private def generationKey(spark: SparkSession,
      tables: Seq[String]): Seq[Any] =
    tables.flatMap { t =>
      val v = Versioned.latestVersion(spark, t)
      Seq(t, v,
        if (v > 0) Versioned.manifestFingerprint(spark, t, v) else 0L)
    }

  /** DURABLE twin of [[ensureCurrentMemo]] (r17): the verified-current
    * key persisted as a tiny JSON marker under the index root
    * (`<root>/_ensure_stamps/<kind>.json`), so a FRESH JVM's ensure on
    * an unchanged (corpus, index) pair is metadata-only too — the
    * session-local memo alone still paid one full corpus+index
    * classification join per JVM, which for a scheduled
    * "refresh if needed" job from cron is a 100 TB read per week on
    * data that never changed (VERDICT r16). The stamp is ADVISORY and
    * self-invalidating: it is trusted only when it equals, element for
    * element, the key freshly computed from live metadata (every
    * involved table's version + manifest fingerprint + the caller's
    * structural args), so a corpus commit, retrain, torn chain,
    * drop-root fingerprint reuse, or arg drift all mismatch and take
    * the full path — where the existing coherence checks and refusals
    * fire exactly as before, and a SUCCESSFUL ensure then overwrites
    * the stamp with the new generation key. Readers tolerate a
    * missing/corrupt/mid-replace stamp as a plain miss (every failure
    * mode degrades to the pre-r17 behavior, never to a false hit);
    * the overwrite is write-temp + rename, and a racing writer's lost
    * stamp only costs the loser's next session one classification
    * join. */
  private def stampPath(root: String, kindTag: String) =
    new org.apache.hadoop.fs.Path(root, s"_ensure_stamps/$kindTag.json")
  private def stampKeyStrings(key: Seq[Any]): Seq[String] =
    key.map(String.valueOf)
  private def readStamp(spark: SparkSession, root: String,
      kindTag: String): Option[Seq[String]] =
    try {
      val p = stampPath(root, kindTag)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val bytes =
          try org.apache.commons.io.IOUtils.toByteArray(in)
          finally in.close()
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(bytes).get("key")
        if (node == null || !node.isArray) None
        else Some((0 until node.size).map(i => node.get(i).asText))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  private def writeStamp(spark: SparkSession, root: String,
      kindTag: String, key: Seq[Any]): Unit =
    try {
      val p = stampPath(root, kindTag)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(p.getParent,
        s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.createObjectNode()
      val arr = node.putArray("key")
      stampKeyStrings(key).foreach(arr.add)
      val out = f.create(tmp, true)
      try out.write(mapper.writeValueAsBytes(node)) finally out.close()
      // local rename replaces atomically (POSIX); HDFS-class stores
      // refuse an occupied destination — delete-then-rename leaves a
      // tiny no-stamp window a reader treats as a miss (advisory)
      if (f.exists(p)) f.delete(p, false)
      if (!f.rename(tmp, p)) f.delete(tmp, false)
    } catch { case scala.util.control.NonFatal(_) => () }
  private def stampMatches(spark: SparkSession, root: String,
      kindTag: String, key: Seq[Any]): Boolean =
    readStamp(spark, root, kindTag).contains(stampKeyStrings(key))

  /** TEST hook: forget the session-local ensure memo, simulating a
    * FRESH JVM — the durable stamp path is only observable when the
    * in-memory memo cannot answer first. */
  private[vector] def clearEnsureCurrentMemoForTest(): Unit =
    ensureCurrentMemo.removeIf(_ => true)

  /** [[ensureIvf]] for a corpus that IS a versioned table — the form
    * the SQL door and every serving-shaped caller should use: the
    * corpus identity is true by construction (this reads the table
    * itself), so an unchanged (corpus, index) pair re-ensures with
    * ZERO Spark jobs (see [[ensureCurrentMemo]]). Passing the table
    * instead of a DataFrame is what makes the claim honest — a
    * caller-shaped frame (filtered, transformed) cannot ride the
    * memo and keeps the classification-join path via [[ensureIvf]]. */
  def ensureIvfCurrent(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String, k: Int = -1,
      spill: Double = 0.0): (Long, Long) = {
    val arts = Seq(ivfCentroidsTable(root), ivfAssignmentsTable(root))
    val cv = Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"ensureIvfCurrent: $corpusTable has no commits")
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    // the corpus generation PINS in the key; the artifact generations
    // re-read per use (a def) so the post-ensure put records the
    // generations the ensure just landed — a racing corpus commit
    // after the pin simply misses on its own next lookup
    def key = Seq("ivf", root, idCol, embCol, k, spill,
      corpusTable, cv, cfp) ++ generationKey(spark, arts)
    if (ensureCurrentMemo.get(key).isDefined ||
        stampMatches(spark, root, "ivf", key)) {
      ensureCurrentMemo.put(key, ())
      (Versioned.latestVersion(spark, arts.head),
        Versioned.latestVersion(spark, arts(1)))
    } else {
      val r = ensureIvf(spark, root,
        VersionedScan.read(spark, corpusTable, cv), idCol, embCol, k,
        spill)
      ensureCurrentMemo.put(key, ())
      writeStamp(spark, root, "ivf", key)
      r
    }
  }

  /** [[ensurePq]]'s versioned-table twin — zero-job steady state; the
    * memo key carries the IVF centroids generation too, so a torn
    * residual chain (centroids retrained, codes not re-encoded)
    * misses and reaches ensurePq's own coherence refusal. */
  def ensurePqCurrent(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String, m: Int,
      k: Int): (Long, Long) = {
    val arts = Seq(pqCodebooksTable(root), pqCodesTable(root),
      ivfCentroidsTable(root))
    val cv = Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"ensurePqCurrent: $corpusTable has no commits")
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    def key = Seq("pq", root, idCol, embCol, m, k,
      corpusTable, cv, cfp) ++ generationKey(spark, arts)
    if (ensureCurrentMemo.get(key).isDefined ||
        stampMatches(spark, root, "pq", key)) {
      ensureCurrentMemo.put(key, ())
      (Versioned.latestVersion(spark, arts.head),
        Versioned.latestVersion(spark, arts(1)))
    } else {
      val r = ensurePq(spark, root,
        VersionedScan.read(spark, corpusTable, cv), idCol, embCol, m, k)
      ensureCurrentMemo.put(key, ())
      writeStamp(spark, root, "pq", key)
      r
    }
  }

  /** [[ensureNsw]]'s versioned-table twin — zero-job steady state;
    * m/ef/shards ride the key so a build-parameter drift still
    * reaches ensureNsw's own refusal. */
  def ensureNswCurrent(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String, m: Int = 8,
      ef: Int = 32, shards: Int = -1): Long = {
    val eT = nswEdgesTable(root)
    val cv = Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"ensureNswCurrent: $corpusTable has no commits")
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    def key = Seq("nsw", root, idCol, embCol, m, ef, shards,
      corpusTable, cv, cfp) ++ generationKey(spark, Seq(eT))
    if (ensureCurrentMemo.get(key).isDefined ||
        stampMatches(spark, root, "nsw", key)) {
      ensureCurrentMemo.put(key, ())
      Versioned.latestVersion(spark, eT)
    } else {
      val r = ensureNsw(spark, root,
        VersionedScan.read(spark, corpusTable, cv), idCol, embCol, m,
        ef, shards)
      ensureCurrentMemo.put(key, ())
      writeStamp(spark, root, "nsw", key)
      r
    }
  }

  /** Load the committed IVF index: (centroids, assignments). */
  def loadIvf(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (VersionedScan.read(spark, ivfCentroidsTable(root)),
      VersionedScan.read(spark, ivfAssignmentsTable(root)))

  /** TIME-TRAVEL load of the committed IVF index: both artifact tables
    * resolve to the versions current AT `tsMillis` (the commit-ts walk
    * every graft table supports), so "re-run last week's retrieval
    * EXACTLY" is one timestamp away — pair it with the corpus read at
    * the same instant (`graft_table(path, TIMESTAMP ...)` /
    * snapshotAsOf) and the whole serving stack reproduces. Searching a
    * historical index costs the same as searching the current one:
    * version resolution is metadata-only, immutable files do the
    * rest. */
  def loadIvfAsOf(spark: SparkSession, root: String,
      tsMillis: Long): (DataFrame, DataFrame) = {
    val (cT, aT) = (ivfCentroidsTable(root), ivfAssignmentsTable(root))
    (VersionedScan.read(spark, cT,
        Versioned.snapshotAsOf(spark, cT, tsMillis).version),
      VersionedScan.read(spark, aT,
        Versioned.snapshotAsOf(spark, aT, tsMillis).version))
  }

  /** [[Ivf.search]] over the index AS OF `tsMillis` — historical
    * serving with the same plan as [[searchIvf]]; the caller supplies
    * the corpus view to rerank against (normally the same-instant
    * snapshot of the embedding table). */
  def searchIvfAsOf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int, tsMillis: Long): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    Ivf.search(emb, asg, cents, idCol, embCol, probeDf, probeCol, k, nProbe)
  }

  /** [[Ivf.search]] over the COMMITTED index — the serving path that
    * pays load, not build. */
  def searchIvf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    Ivf.search(emb, asg, cents, idCol, embCol, probeDf, probeCol, k, nProbe)
  }

  /** Retrain the committed IVF quantizer at a NEW centroid count —
    * [[reshardNsw]]'s IVF twin, the operational alternative to
    * drop-root retrain for a corpus that outgrew its build-time k (see
    * [[ivfListTarget]] for the per-list cost bound this maintains).
    * Trains fresh centroids over the current corpus (`newK <= 0` =
    * [[ivfAutoK]] of the corpus size) and lands new centroids + a FULL
    * reassign as expected-slot CAS commits on the existing tables:
    * history is preserved (time travel to the pre-retrain index still
    * works, [[searchIvfAsOf]]), version numbers never reuse, and a
    * writer racing either commit makes the CAS fail loudly instead of
    * clobbering — conversely an `ensure` that classified against the
    * pre-retrain index loses ITS publish to the same CAS (morCommit
    * pins the observed snapshot), so stale-generation assignments can
    * never land over the retrained index.
    *
    * The pair is two commits, not one (the artifacts are two tables):
    * a crash between them leaves new centroids routing over the prior
    * assignment — DEGRADED recall (the old cid space ranks against new
    * centroids), never wrong results (the rerank is exact over
    * whatever candidates routing yields). The torn state is DETECTED
    * on the next call: each retrain stamps its commits (the centroids
    * commit, and the assignments commit with the centroids version it
    * reassigned for), so "centroids retrained but their reassign never
    * landed" is two metadata reads — and the re-call then COMPLETES
    * the stranded pair (reassigns against the already-minted
    * centroids, mints no new generation) instead of training yet
    * another one over the degraded window. Committed PQ codes under
    * the same root: RAW-encoded codes (pre-residual indexes) stay
    * VALID across an IVF retrain — they encode the vector against
    * their own codebooks, and routing only selects which codes are
    * scanned. RESIDUAL codes (the r14 default for new indexes) encode
    * x − centroid, so an IVF retrain invalidates them — this call
    * CHAINS a [[retrainPq]] at the stored (m, k) on every exit whose
    * centroids generation differs from the codebooks' stamp (the
    * FAISS-faithful rule: retraining the coarse quantizer retrains the
    * residual codebooks). A crash between the IVF pair and the chained
    * PQ retrain leaves a TORN CHAIN that serving and ensurePq refuse
    * loudly ([[requireResidualCoherent]]); re-running retrainIvf heals
    * it (the IVF pair reads current, the PQ chain re-fires). Returns
    * (centroids version, assignments version). */
  def retrainIvf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, newK: Int = -1): (Long, Long) = {
    val (cT, aT) = (ivfCentroidsTable(root), ivfAssignmentsTable(root))
    val cv = Versioned.latestVersion(spark, cT)
    val av = Versioned.latestVersion(spark, aT)
    require(cv > 0L && av > 0L, s"no committed IVF index at $root to retrain")
    // every exit passes here: residual PQ codebooks stamped to an older
    // centroids generation re-train + re-encode against the new one
    def healed(r: (Long, Long)): (Long, Long) = {
      healResidualPq(spark, root, emb, idCol, embCol)
      r
    }
    val corpus = emb.select(col(idCol), col(embCol))
      .withColumn("vh", xxhash64(col(embCol)))
    // a SPILLED root keeps its scheme across retrains (frozen like k):
    // the reassign re-reads the stored eps and multi-assigns against
    // the new centroids
    val asgCur = VersionedScan.read(spark, aT, av)
    val retrainEps =
      if (asgCur.columns.contains("cid2"))
        storedSpillEps(spark, root, av, asgCur)
      else 0.0
    def reassign(centroidsV: Long, expectedAv: Long): Long =
      Versioned.commit(spark, aT,
        (if (retrainEps > 0.0)
           Ivf.assignSpill(corpus, idCol, embCol,
             VersionedScan.read(spark, cT, centroidsV), retrainEps)
             .withColumn("spill_eps", lit(retrainEps))
         else Ivf.assign(corpus, idCol, embCol,
           VersionedScan.read(spark, cT, centroidsV)))
          .join(corpus.select(col(idCol), col("vh")), Seq(idCol)),
        Some(idCol), files = 4, op = "RETRAIN",
        txn = Some(s"ivf-retrain-asg-c$centroidsV"), expected = Some(expectedAv))
    // TORN-PAIR REPAIR: the latest centroids commit is a stamped
    // retrain whose reassign never landed (no assignments commit in
    // the txn ring names it) — complete THAT pair rather than minting
    // another generation on top of the degraded window. Pre-stamp
    // retrains (or plain ensures) never match: the repair only fires
    // on provably-torn state. A caller who asked for a DIFFERENT k
    // than the stranded generation is NOT silently short-changed: the
    // pair heals first, then the requested retrain lands on top.
    val cSnap = Versioned.snapshot(spark, cT, cv)
    var avCur = av
    if (cSnap.op.contains("RETRAIN") &&
        cSnap.txn.exists(_.startsWith("ivf-retrain-c")) &&
        !Versioned.snapshot(spark, aT, av)
          .seenTxn(Some(s"ivf-retrain-asg-c$cv"))) {
      avCur = reassign(cv, av)
      // the stranded generation's REQUESTED k rides its stamp (the
      // trained row count is only the effective size — a stratified
      // seed can occupy fewer cells); an unparseable stamp means the
      // request is unknown, so an explicit caller k retrains on top
      val strandedK = cSnap.txn
        .flatMap("""-k(\d+)$""".r.findFirstMatchIn(_))
        .map(_.group(1).toInt)
      if (newK <= 0 || strandedK.contains(newK)) return healed((cv, avCur))
    }
    val k = if (newK > 0) newK else ivfAutoK(emb.count())
    val newCv = Versioned.commit(spark, cT,
      Ivf.centroids(emb, idCol, embCol, k), Some("cid"), files = 1,
      op = "RETRAIN", txn = Some(s"ivf-retrain-c-from$cv-k$k"),
      expected = Some(cv))
    // the reassign reads the COMMITTED new centroids (round-tripped
    // through parquet exactly like ensure's bootstrap), so the stored
    // assignment is the one every later load reproduces
    healed((newCv, reassign(newCv, avCur)))
  }

  /** [[retrainIvf]]'s residual-PQ chain: when the root carries
    * residual-encoded codebooks stamped to a DIFFERENT centroids
    * generation than the current one, re-train them (and re-encode the
    * codes) via [[retrainPq]] at the stored (m, k). Raw codebooks (and
    * roots without a PQ tier) are untouched — raw codes are valid
    * across IVF retrains by construction. */
  private def healResidualPq(spark: SparkSession, root: String,
      emb: DataFrame, idCol: String, embCol: String): Unit = {
    val bT = pqCodebooksTable(root)
    if (Versioned.latestVersion(spark, bT) == 0L) return
    val books = VersionedScan.read(spark, bT)
    residualStamp(books).foreach { case (cgv, cgf) =>
      val cT = ivfCentroidsTable(root)
      val cvNow = Versioned.latestVersion(spark, cT)
      if (cgv != cvNow ||
          cgf != Versioned.manifestFingerprint(spark, cT, cvNow)) {
        val (m, k) = codebookShape(books)
        retrainPq(spark, root, emb, idCol, embCol, m, k)
      }
    }
  }

  /** [[retrainIvf]]'s PQ sibling: retrain the committed codebooks at a
    * new (m, k) over the current corpus and land codebooks + a FULL
    * re-encode as expected-slot CAS commits with history preserved —
    * for a corpus whose value distribution drifted past what the
    * build-time codebooks quantize well (the codes' accuracy analogue
    * of the IVF list-size cliff). Same two-commit contract as
    * [[retrainIvf]], including the torn-pair repair: a crash between
    * them leaves new codebooks over prior codes — DEGRADED ADC
    * accuracy (still exact-reranked) — and the next call detects the
    * stamped-but-unpaired codebooks commit and COMPLETES it (re-encode
    * only, no new training) instead of minting another generation; a
    * racing writer on either table fails the CAS cleanly. Returns
    * (codebooks version, codes version). */
  def retrainPq(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int, k: Int): (Long, Long) = {
    val (bT, cT) = (pqCodebooksTable(root), pqCodesTable(root))
    val ivfT = ivfCentroidsTable(root)
    val bv = Versioned.latestVersion(spark, bT)
    val cv = Versioned.latestVersion(spark, cT)
    // codebooks-without-codes is a TORN BOOTSTRAP (a crash between
    // ensurePq's two commits), not a missing index: the retrain heals
    // it by landing the FIRST codes commit (expected-slot 0 CAS) —
    // refusing here would leave both remedies the torn-chain error
    // names (retrainPq, retrainIvf's chained heal) throwing on the
    // exact state they promise to repair
    require(bv > 0L, s"no committed PQ codebooks at $root to retrain")
    val corpus = emb.select(col(idCol), col(embCol))
      .withColumn("vh", xxhash64(col(embCol)))
    // re-encode under the BOOKS' stored scheme: residual books subtract
    // their stamped centroids generation, raw books encode the vector
    def reencode(booksV: Long, expectedCv: Long): Long = {
      val books = VersionedScan.read(spark, bT, booksV)
      // m rides trainedM, not the bare max(sub)+1: a RAGGED stranded
      // generation (pre-r15, m not dividing the width) must refuse
      // here with the retrain remedy exactly like the serve does —
      // codebookM would re-encode its codes at m+1 on boundaries the
      // training never used and the catch-up commit would land
      // garbage codes (ADVICE r15)
      val mBooks = trainedM(spark, root, books, booksV)
      val coded = residualStamp(books) match {
        case Some((cgv, cgf)) =>
          requireStampedGeneration(spark, root, cgv, cgf, "retrainPq")
          Pq.encode(residualFrame(corpus, idCol, embCol,
              VersionedScan.read(spark, ivfT, cgv)), idCol, "__resid",
            books, mBooks)
        case None => Pq.encode(corpus, idCol, embCol, books, mBooks)
      }
      Versioned.commit(spark, cT,
        coded.join(corpus.select(col(idCol), col("vh")), Seq(idCol)),
        Some(idCol), files = 4, op = "RETRAIN",
        txn = Some(s"pq-retrain-codes-b$booksV"), expected = Some(expectedCv))
    }
    // same torn-pair repair as retrainIvf, same caller-parameter
    // honesty: heal the stranded pair, and if the requested (m, k)
    // differs from the stranded codebooks' shape, land the requested
    // retrain on top instead of silently returning the old structure
    val bSnap = Versioned.snapshot(spark, bT, bv)
    var cvCur = cv
    if (cv > 0L && bSnap.op.contains("RETRAIN") &&
        bSnap.txn.exists(_.startsWith("pq-retrain-b")) &&
        !Versioned.snapshot(spark, cT, cv)
          .seenTxn(Some(s"pq-retrain-codes-b$bv"))) {
      cvCur = reencode(bv, cv)
      // same requested-vs-effective distinction as retrainIvf: the
      // stranded (m, k) ride the stamp, never the trained row count
      val stranded = bSnap.txn
        .flatMap("""-m(\d+)-k(\d+)$""".r.findFirstMatchIn(_))
        .map(g => (g.group(1).toInt, g.group(2).toInt))
      if (stranded.contains((m, k))) return (bv, cvCur)
    }
    // train at the scheme the root supports TODAY: committed centroids
    // ⇒ residual (this is also the explicit migration door for a raw
    // index — retrain once and it serves residual from then on)
    val trained = trainBooks(spark, root, emb, idCol, embCol, m, k)
    val newBv = Versioned.commit(spark, bT, trained, Some("sub"), files = 1,
      op = "RETRAIN", txn = Some(s"pq-retrain-b-from$bv-m$m-k$k"),
      expected = Some(bv))
    (newBv, reencode(newBv, cvCur))
  }

  /** [[Ivf.searchBatch]] over the COMMITTED index — the probe-SET
    * serving path: one plan serves the whole question batch, with the
    * rerank a per-probe partitioned window ([[searchNswBatch]]'s IVF
    * twin). */
  def searchIvfBatch(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probes: DataFrame,
      probeIdCol: String, probeCol: String, k: Int, nProbe: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    Ivf.searchBatch(emb, asg, cents, idCol, embCol,
      probes, probeIdCol, probeCol, k, nProbe)
  }

  /** [[searchIvfBatch]] over the index AS OF `tsMillis` — the batch
    * door's historical twin (same artifact resolution as
    * [[loadIvfAsOf]]). */
  def searchIvfBatchAsOf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probes: DataFrame,
      probeIdCol: String, probeCol: String, k: Int, nProbe: Int,
      tsMillis: Long): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    Ivf.searchBatch(emb, asg, cents, idCol, embCol,
      probes, probeIdCol, probeCol, k, nProbe)
  }

  def ivfListsTable(root: String): String = s"$root/ivf_lists"

  /** Freshness stamp for the derived inverted-list layout: binds the
    * lists commit to the EXACT assignments generation (version AND
    * manifest fingerprint — drop-root rebuilds reuse version numbers)
    * and corpus identity it was derived from — any ensure that mints,
    * or any corpus commit, invalidates it (serving falls back to the
    * join plan, never to stale files). The fingerprints also gate the
    * O(delta) refresh: the incremental path only trusts a version-pair
    * diff after proving the stamped generations are the SAME
    * generations those version numbers name today. (Format changed in
    * r14 to carry the assignments fingerprint; pre-r14 stamps read as
    * stale and pay one full re-cluster to migrate.) */
  private def listsTxn(av: Long, afp: Long, corpusTable: String, cv: Long,
      cfp: Long): String =
    s"ivf-lists-a$av-g$afp-t${corpusTable.hashCode}-c$cv-f$cfp"

  /** Build (or refresh) the DERIVED inverted-list serving layout: the
    * corpus vectors CLUSTERED BY their IVF list id, committed with
    * per-file `cid` stats — which makes "search nProbe of k lists"
    * true at the FILE level: a probe's candidate scan manifest-prunes
    * to ~nProbe/k of the files instead of joining across the whole
    * id-clustered corpus (the layout real IVF index files ship). The
    * table is derived, not truth: `ivf_assignments` (id-keyed, O(delta)
    * MoR maintenance) stays authoritative, and the lists commit stamps
    * the (assignments version, corpus version, corpus manifest
    * fingerprint) it derives from — [[searchIvfCommitted]] serves from
    * it ONLY while that stamp matches, else falls back to the join
    * plan, so staleness can never serve wrong rows. Refreshing is
    * O(delta) since r14 ([[tryIncrementalIvfLists]]): only the files
    * whose lists changed rewrite, the rest carry by reference — the
    * full re-cluster is the bootstrap and the fallback, not the steady
    * state. An up-to-date layout returns its current version without
    * committing. */
  def optimizeIvfServing(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      corpusVersion: Long = -1L, force: Boolean = false): Long = {
    val (cT, aT, lT) =
      (ivfCentroidsTable(root), ivfAssignmentsTable(root), ivfListsTable(root))
    val av = Versioned.latestVersion(spark, aT)
    require(av > 0, s"no committed IVF index at $root — ensure first")
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"optimizeIvfServing: $corpusTable has no commits")
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    val txn = listsTxn(av, Versioned.manifestFingerprint(spark, aT, av),
      corpusTable, cv, cfp)
    val lv = Versioned.latestVersion(spark, lT)
    val oldStamp =
      if (lv > 0) effectiveLayoutStamp(spark, lT, lv) else None
    if (!force && oldStamp.contains(txn)) return lv
    // O(delta) path first (r14): a STALE layout refreshes by diffing
    // the stamped source generations against the current ones and
    // rewriting only the files whose lists changed — the full
    // re-cluster below is the bootstrap/fallback, and the explicit
    // door (`force`) for restoring pruning granularity after a
    // whole-layout compaction
    if (!force && lv > 0)
      tryIncrementalIvfLists(spark, root, corpusTable, idCol, embCol,
        lv, oldStamp, av, cv, txn).foreach(return _)
    val emb = VersionedScan.read(spark, corpusTable, cv)
    val asg = VersionedScan.read(spark, aT, av)
    val k = VersionedScan.read(spark, cT).count()
    // a SPILLED root's layout carries each boundary vector in BOTH its
    // lists' files (the derived layout is not keyed, so the duplicate
    // is legal) — that is what keeps the serve's manifest pruning
    // complete under multi-assignment; the `spl` marker column tells
    // the serve to dedup candidates by id
    val spilled = asg.columns.contains("cid2")
    val pairs = Ivf.memberPairs(asg, idCol)
    val base = pairs
      .join(emb.select(col(idCol), col(embCol)), Seq(idCol))
      .select(col("cid"), col(idCol), col(embCol))
    val lists = if (spilled) base.withColumn("spl", lit(true)) else base
    // file count tracks the list count so per-file cid ranges stay
    // tight — for PRUNING precision and for the O(delta) refresh's
    // REWRITE granularity (a file spanning many lists makes every
    // update-heavy delta rewrite most files); cap high enough that a
    // 100 TB-scale list count still gets few-lists-per-file
    Versioned.commit(spark, lT, lists, Some("cid"),
      files = math.max(4, math.min(4096, (k / 4).toInt)),
      txn = Some(txn), op = "OPTIMIZE_SERVING",
      expected = if (lv > 0) Some(lv) else None)
  }

  /** Bound on the collected delta of an incremental layout refresh:
    * past ~100k changed rows the full re-cluster is competitive (and
    * the collected driver-side id sets stop being "tiny") — fall
    * back. Lookups above [[isinLiteralCap]] already ride a broadcast
    * semi-join instead of literal IN, so the binding cost here is the
    * collect + broadcast, not Catalyst planning. */
  private val maxLayoutDelta = 100000

  /** Literal one-column id frame for the anti-join side of a layout
    * refresh — built from COLLECTED ids (delta-bounded) so removed ids
    * participate too (they exist in no current table to select from). */
  private def idFrame(spark: SparkSession, idCol: String,
      idType: org.apache.spark.sql.types.DataType,
      ids: Seq[Any]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        ids.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, idType))))

  /** Literal-IN lists stay cheap only while they are small: near
    * [[maxLayoutDelta]] a ~100k-literal `isin` costs superlinear
    * Catalyst planning time and driver memory — enough to make the
    * O(delta) refresh SLOWER than the full re-cluster it exists to
    * avoid (r14 ADVICE). Above this cap the delta lookups switch to a
    * broadcast semi-join against the collected id frame. */
  private val isinLiteralCap = 4096

  /** Restrict `df` to a collected (delta-bounded) id set: a literal IN
    * while the list is small — literal predicates are what the
    * manifest's per-file stats prune on — and a broadcast-hashed LEFT
    * SEMI join above [[isinLiteralCap]], where the un-pruned but
    * single-pass distributed scan beats a driver-side literal tree. */
  private def restrictToIds(spark: SparkSession, df: DataFrame,
      idCol: String, ids: Seq[Any]): DataFrame =
    if (ids.size <= isinLiteralCap) df.filter(col(idCol).isin(ids: _*))
    else df.join(broadcast(idFrame(spark, idCol,
      df.schema(idCol).dataType, ids)), Seq(idCol), "left_semi")

  /** The capped two-sided id delta of ONE source table between a
    * STAMPED generation and the current one — the shared collection
    * step of every O(delta) layout refresh. None = fall back to the
    * full re-cluster: an unreadable version, a delta past
    * [[maxLayoutDelta]], or a STAMP-IDENTITY mismatch — `fp0` is the
    * manifest fingerprint the layout's stamp recorded for v0, and if
    * v0's manifest no longer hashes to it the version number was
    * REUSED by a drop-root rebuild: a version-pair diff would compare
    * the wrong generation, so the refresh must not trust it (the
    * pre-r14 behavior — a full rebuild — resumes). Verified-equal
    * versions are a genuinely empty delta. */
  private def stampedDeltaSides(spark: SparkSession, table: String,
      idCol: String, v0: Long, fp0: Long,
      v1: Long): Option[(Seq[Any], Seq[Any])] = scala.util.Try {
    if (Versioned.manifestFingerprint(spark, table, v0) != fp0) None
    else if (v0 == v1) Some((Seq.empty[Any], Seq.empty[Any]))
    else Versioned.fileDiffIds(spark, table, v0, v1, idCol).flatMap {
      case (oldSide, newSide) =>
        def capped(df: DataFrame): Option[Seq[Any]] = {
          val r = df.distinct().limit(maxLayoutDelta + 1).collect()
          if (r.length > maxLayoutDelta) None
          else Some(r.map(_.get(0)).toSeq)
        }
        for (o <- capped(oldSide); nw <- capped(newSide)) yield (o, nw)
    }
  }.toOption.flatten

  /** The shared replacement closure of every layout refresh: drop the
    * delta ids' old images from the rewritten files' rows, append the
    * fresh delta rows. */
  private def layoutReplace(spark: SparkSession, idCol: String,
      idType: org.apache.spark.sql.types.DataType, deltaIds: Seq[Any],
      deltaNew: DataFrame)(covered: DataFrame): DataFrame =
    covered.join(broadcast(idFrame(spark, idCol, idType, deltaIds)),
      Seq(idCol), "left_anti").unionByName(deltaNew)

  /** O(delta) refresh of the ivf_lists layout — the r14 close of "every
    * stamp change recommits the ENTIRE clustered layout": parse the
    * stale stamp's source generations, diff them against the current
    * ones (assignments: one slim full-outer join on (id, cid, vh);
    * corpus value-drift invisible to assignments: the manifest-level
    * file diff), then rewrite ONLY the files whose lists are touched,
    * carrying the rest by reference ([[Versioned.rewriteFilesByKey]]).
    * The refreshed layout is row-identical to a from-scratch rebuild
    * (pinned in AnnIndexSpec). None = fall back to the full re-cluster:
    * unparseable/foreign/pre-r14 stamp, a stamped table-hash that is
    * not this corpus table, a stamped generation whose version number
    * was reused by a drop-root rebuild (fingerprint verification in
    * [[stampedDeltaSides]]), a delta past [[maxLayoutDelta]], or dirty
    * lists past half the codebook. DV deltas (MoR corpus DML) are
    * folded in by [[Versioned.fileDiffIds]] itself. */
  private def tryIncrementalIvfLists(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      lv: Long, oldStamp: Option[String], av: Long, cv: Long,
      newTxn: String): Option[Long] = {
    val (cT, aT, lT) =
      (ivfCentroidsTable(root), ivfAssignmentsTable(root), ivfListsTable(root))
    val parsed = oldStamp
      .flatMap("""ivf-lists-a(\d+)-g(-?\d+)-t(-?\d+)-c(\d+)-f(-?\d+)""".r
        .findFirstMatchIn(_))
      .getOrElse(return None)
    val (av0, afp0) = (parsed.group(1).toLong, parsed.group(2).toLong)
    val (cv0, cfp0) = (parsed.group(4).toLong, parsed.group(5).toLong)
    // the stamp names the corpus TABLE too: a layout derived from a
    // different table must never diff against this one
    if (parsed.group(3).toInt != corpusTable.hashCode) return None
    scala.util.Try {
      val asg0 = VersionedScan.read(spark, aT, av0)
      val asg1 = VersionedScan.read(spark, aT, av)
      // BOTH deltas ride the stamped-generation file diff (DV deltas
      // folded in; fingerprints verified against the stamp, so a
      // version-number reuse can never masquerade as a small delta):
      // assignments moves/re-ensures AND corpus drift nobody
      // re-ensured — O(changed files), never a table scan
      val (asgOld, asgNew) = stampedDeltaSides(spark, aT, idCol,
        av0, afp0, av).getOrElse(return None)
      val (corpusOld, corpusNew) = stampedDeltaSides(spark, corpusTable,
        idCol, cv0, cfp0, cv).getOrElse(return None)
      val oldIds: Seq[Any] = (asgOld ++ corpusOld).distinct
      val deltaIds: Seq[Any] =
        (asgOld ++ asgNew ++ corpusOld ++ corpusNew).distinct
      if (deltaIds.size > maxLayoutDelta) return None
      // REWRITE keys are the OLD images' lists only: a changed/removed
      // row's old image must leave its file, but a NEW row simply
      // lands in the refresh's own cid-sorted delta files next to the
      // carried ones (the scan prunes by cid stats across all files) —
      // so an append-mostly delta rewrites NOTHING, however many lists
      // it spreads over. Old cids resolve by an id lookup of the OLD
      // assignments generation (id-clustered; [[restrictToIds]]:
      // file-pruned literal IN while small, broadcast semi-join near
      // the cap); an id with no old assignment had no layout row.
      // a SPILLED root's old image lives in BOTH its lists' files —
      // memberPairs folds cid2 in so both copies rewrite; a scheme
      // mismatch between the stamped and current generations cannot
      // happen (spill freezes at bootstrap), but guard anyway: the
      // full re-cluster is always correct
      val spilled = asg1.columns.contains("cid2")
      if (spilled != asg0.columns.contains("cid2")) return None
      val dirtyCids =
        if (oldIds.isEmpty) Seq.empty[Long]
        else Ivf.memberPairs(
            restrictToIds(spark, asg0, idCol, oldIds), idCol)
          .select("cid").distinct().collect()
          .map(_.getAs[Number](0).longValue).toSeq
      // COST-AWARE fallback (r15 crossover rehearsal at 2.2M: a
      // 50-row random-spread update already rewrites 35/67 files and
      // the refresh reads 4.4 s vs the full re-cluster's 2.3–3.4 s —
      // the binding unit is dirty FILES, not dirty lists): fall back
      // when the rewrite would touch over half the layout's files.
      // Appends stay the incremental win (dirty set empty — nothing
      // rewrites, r14: 1k append carries 67/67).
      val (touchedF, totalF) =
        Versioned.filesTouchedByKey(spark, lT, lv, "cid", dirtyCids)
      if (touchedF * 2 > totalF) return None
      // the fresh rows for the touched lists: same hybrid id lookup —
      // the corpus and assignments are id-clustered, so both prune on
      // the literal form; spilled roots fan the fresh rows to both
      // lists and carry the spl marker the committed layout rows have
      val deltaNew =
        if (deltaIds.isEmpty)
          VersionedScan.read(spark, lT, lv).limit(0)
        else {
          val fresh = Ivf.memberPairs(
              restrictToIds(spark, asg1, idCol, deltaIds), idCol)
            .join(restrictToIds(spark,
                VersionedScan.read(spark, corpusTable, cv), idCol, deltaIds)
              .select(col(idCol), col(embCol)), idCol)
            .select(col("cid"), col(idCol), col(embCol))
          if (spilled) fresh.withColumn("spl", lit(true)) else fresh
        }
      Some(Versioned.rewriteFilesByKey(spark, lT, "cid", dirtyCids,
        Some(newTxn), "OPTIMIZE_SERVING", lv)(
        layoutReplace(spark, idCol, asg1.schema(idCol).dataType,
          deltaIds, deltaNew)))
    }.toOption.flatten
  }

  /** Freshness report for the derived lists layout vs a corpus table —
    * the `ann_stats` surface behind "is my serving still file-pruned?".
    * [[searchIvfCommitted]] silently (and correctly) falls back to the
    * join plan the moment the stamp goes stale; without this an
    * operator could lose the nProbe/k I/O promise for days and only
    * discover it by reading executed plans. SEMANTICS (r14): fresh
    * means the layout's ROWS still match the stamped derivation — a
    * row-preserving OPTIMIZE keeps it fresh even though an aggressive
    * whole-layout binpack coarsens per-file cid ranges (pruning
    * PRECISION, never correctness); `ann_optimize_serving(force =>
    * true)` re-clusters to restore granularity. Keys:
    * `ivf_lists_fresh` (1 = the current (assignments, corpus)
    * identity matches the stamp; 0 = stale or no layout — re-CALL
    * ann_optimize_serving),
    * `ivf_lists_stamped_assignments_version` (what the layout was
    * derived from; -1 when absent). Costs the same three metadata
    * reads the serving-route decision pays. */
  def listsFreshness(spark: SparkSession, root: String,
      corpusTable: String): Map[String, Long] = {
    val lT = ivfListsTable(root)
    val lv = Versioned.latestVersion(spark, lT)
    val stamped =
      if (lv == 0L) -1L
      else effectiveLayoutStamp(spark, lT, lv)
        .flatMap("""ivf-lists-a(\d+)-""".r.findFirstMatchIn(_))
        .map(_.group(1).toLong).getOrElse(-1L)
    val cv = Versioned.latestVersion(spark, corpusTable)
    val fresh = lv > 0L && cv > 0L &&
      freshLists(spark, root, corpusTable, cv).isDefined
    Map(
      "ivf_lists_fresh" -> (if (fresh) 1L else 0L),
      "ivf_lists_stamped_assignments_version" -> stamped)
  }

  /** The fresh lists layout for (root, corpus identity), or None when
    * absent/stale — the routing decision is three metadata reads. */
  private def freshLists(spark: SparkSession, root: String,
      corpusTable: String, cv: Long): Option[DataFrame] = {
    val (aT, lT) = (ivfAssignmentsTable(root), ivfListsTable(root))
    val lv = Versioned.latestVersion(spark, lT)
    if (lv == 0L) return None
    val av = Versioned.latestVersion(spark, aT)
    if (av == 0L) return None
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    if (effectiveLayoutStamp(spark, lT, lv)
        .contains(listsTxn(av, Versioned.manifestFingerprint(spark, aT, av),
          corpusTable, cv, cfp)))
      Some(VersionedScan.read(spark, lT, lv))
    else None
  }

  /** The lists layout that was FRESH AT `tsMillis` for the
    * same-instant corpus identity, paired with the same-instant
    * centroids — Some only when a layout commit existed at the instant
    * AND its stamp names exactly the as-of-resolved (assignments,
    * corpus) versions; anything else (no layout yet, or one that was
    * already stale then) sends the historical serve to the join plan,
    * never to wrong-era files. */
  private def freshListsAsOf(spark: SparkSession, root: String,
      corpusTable: String, cv: Long,
      tsMillis: Long): Option[(DataFrame, DataFrame)] = {
    val (cT, aT, lT) =
      (ivfCentroidsTable(root), ivfAssignmentsTable(root), ivfListsTable(root))
    if (Versioned.latestVersion(spark, lT) == 0L) return None
    // snapshotAsOf throws for an instant before the table's first
    // commit — "no layout existed then" is a fallback, not an error
    scala.util.Try {
      val ls = Versioned.snapshotAsOf(spark, lT, tsMillis)
      val av = Versioned.snapshotAsOf(spark, aT, tsMillis).version
      val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
      if (effectiveLayoutStamp(spark, lT, ls.version).contains(listsTxn(av,
          Versioned.manifestFingerprint(spark, aT, av),
          corpusTable, cv, cfp)))
        Some((VersionedScan.read(spark, cT,
            Versioned.snapshotAsOf(spark, cT, tsMillis).version),
          VersionedScan.read(spark, lT, ls.version)))
      else None
    }.toOption.flatten
  }

  /** [[searchIvf]] for a COMMITTED corpus named by table + version:
    * when the derived lists layout is fresh the candidate scan
    * manifest-prunes to the probe's nProbe lists (~nProbe/k of the
    * files — the IVF promise at the I/O level), else the join plan
    * serves identically. Results are exactly [[Ivf.search]]'s either
    * way (same routing order, same exact rerank, same ties — pinned in
    * AnnIndexSpec). */
  def searchIvfCommitted(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nProbe: Int,
      corpusVersion: Long = -1L,
      allowed: Option[DataFrame] = None): DataFrame = {
    import graft.functions.{vec_cosine_sim, vec_l2}
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"searchIvfCommitted: $corpusTable has no commits")
    freshLists(spark, root, corpusTable, cv) match {
      case Some(lists) =>
        ivfListsServeSingle(
          VersionedScan.read(spark, ivfCentroidsTable(root)), lists,
          idCol, embCol, probeDf, probeCol, k, nProbe, allowed)
      case None =>
        searchIvf(spark, root,
          restrict(VersionedScan.read(spark, corpusTable, cv), idCol,
            allowed),
          idCol, embCol, probeDf, probeCol, k, nProbe)
    }
  }

  /** The corpus view a FILTERED search ranks within: the s13
    * prefiltered composition — membership is exact (only matching rows
    * can appear), ranking stays routing-approximate; a selective
    * filter under-fills k at fixed width, the documented knob being
    * nProbe (FilteredAnnSpec pins the laws). `allowed` is an id-set
    * frame (one idCol column), normally `corpus.filter(pred)`. */
  private def restrict(df: DataFrame, idCol: String,
      allowed: Option[DataFrame]): DataFrame =
    allowed.map(a =>
      df.join(a.select(col(idCol)), Seq(idCol), "left_semi")).getOrElse(df)

  /** [[searchIvfCommitted]] with corpus, index artifacts AND the lists
    * layout all resolved AS OF `tsMillis`: when a layout commit that
    * was FRESH AT the instant exists (its stamp names exactly the
    * same-instant (assignments, corpus) identity), the historical
    * candidate scan file-prunes to the probed lists too — "re-run last
    * week's retrieval" keeps last week's I/O profile; else the join
    * plan serves identically. */
  def searchIvfCommittedAsOf(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nProbe: Int,
      tsMillis: Long, allowed: Option[DataFrame] = None): DataFrame = {
    val cv = Versioned.snapshotAsOf(spark, corpusTable, tsMillis).version
    freshListsAsOf(spark, root, corpusTable, cv, tsMillis) match {
      case Some((cents, lists)) =>
        ivfListsServeSingle(cents, lists, idCol, embCol,
          probeDf, probeCol, k, nProbe, allowed)
      case None =>
        searchIvfAsOf(spark, root,
          restrict(VersionedScan.read(spark, corpusTable, cv), idCol,
            allowed),
          idCol, embCol, probeDf, probeCol, k, nProbe, tsMillis)
    }
  }

  /** The pruned single-probe serve over a fresh lists layout — shared
    * by the current and AS-OF committed forms. Routing collects nProbe
    * list ids (k-row ranking — driver cost is the probe batch, never
    * the corpus) so the scan carries LITERAL cid predicates: that is
    * what lets the manifest prune files — a join could not. */
  private def ivfListsServeSingle(cents: DataFrame, lists: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int, allowed: Option[DataFrame] = None): DataFrame = {
    import graft.functions.{vec_cosine_sim, vec_l2}
    val probe = probeDf.select(col(probeCol).as("__probe"))
    val chosen = broadcast(cents).crossJoin(broadcast(probe))
      .select(col("cid"),
        vec_l2(col("centroid"), col("__probe")).as("cdist"))
      .orderBy(col("cdist"), col("cid")).limit(nProbe)
      .select("cid").collect().map(_.getLong(0)).toSeq
    // the filter semi-joins the PRUNED candidate scan (nProbe/k of the
    // files), never the whole layout — prefilter semantics on the
    // pruned plan
    val scanned =
      restrict(lists.filter(col("cid").isin(chosen: _*)), idCol, allowed)
    val scored = scanned
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        vec_cosine_sim(col(embCol), col("__probe")).as("score"))
    // a SPILLED layout (spl marker) holds boundary vectors in both
    // their lists' files — when both are probed the same id scans
    // twice, so dedup before the top-k. Dedup AFTER scoring: the
    // copies are byte-identical rows, so their scores are equal
    // doubles and (id, score) distinct collapses them in a
    // HashAggregate — deduping the (id, embedding) pairs instead
    // would sort-aggregate (arrays are not hash-aggregable). Plain
    // layouts keep the exact r15 plan, no extra exchange.
    (if (lists.columns.contains("spl")) scored.distinct() else scored)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** The batch serving routes' probe-id contract: integral only (the
    * internal long widen must be lossless, and the result schema
    * byte-identical whichever route freshness picks — a non-integral
    * id would silently cast to NULL and collapse every probe into one
    * rerank partition on the pruned route only). Returns the column's
    * type so the route can cast back at the end. */
  private def requireIntegralPid(probes: DataFrame, probeIdCol: String,
      what: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
      LongType, ShortType}
    val pidType = probes.schema(probeIdCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType,
      LongType)(pidType),
      s"$what: probe id column '$probeIdCol' must be integral, " +
        s"got ${pidType.simpleString}")
    pidType
  }

  /** [[searchIvfBatch]]'s committed-corpus twin — per-probe routing
    * collected driver-side (probes × nProbe pairs), ONE stats-pruned
    * scan over the union of chosen lists, candidates fanned to their
    * probes by a broadcast join, per-probe PARTITIONED-window rerank. */
  def searchIvfBatchCommitted(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, corpusVersion: Long = -1L,
      allowed: Option[DataFrame] = None): DataFrame = {
    // integral probe ids only — validated BEFORE the route split, so a
    // bad id column fails loudly on both routes
    require(probeIdCol != idCol,
      s"probe id column '$probeIdCol' must differ from the corpus id " +
        "column — both appear in the result")
    val pidType = requireIntegralPid(probes, probeIdCol,
      "searchIvfBatchCommitted")
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"searchIvfBatchCommitted: $corpusTable has no commits")
    freshLists(spark, root, corpusTable, cv) match {
      case Some(lists) =>
        ivfListsServeBatch(
          VersionedScan.read(spark, ivfCentroidsTable(root)), lists,
          idCol, embCol, probes, probeIdCol, probeCol, pidType, k, nProbe,
          allowed)
      case None =>
        searchIvfBatch(spark, root,
          restrict(VersionedScan.read(spark, corpusTable, cv), idCol,
            allowed),
          idCol, embCol, probes, probeIdCol, probeCol, k, nProbe)
    }
  }

  /** [[searchIvfBatchCommitted]]'s historical twin — same AS-OF layout
    * resolution as [[searchIvfCommittedAsOf]], so a batched historical
    * serve keeps the file-pruned candidate scan when a fresh-at-that-
    * instant layout exists. */
  def searchIvfBatchCommittedAsOf(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, tsMillis: Long,
      allowed: Option[DataFrame] = None): DataFrame = {
    require(probeIdCol != idCol,
      s"probe id column '$probeIdCol' must differ from the corpus id " +
        "column — both appear in the result")
    val pidType = requireIntegralPid(probes, probeIdCol,
      "searchIvfBatchCommittedAsOf")
    val cv = Versioned.snapshotAsOf(spark, corpusTable, tsMillis).version
    freshListsAsOf(spark, root, corpusTable, cv, tsMillis) match {
      case Some((cents, lists)) =>
        ivfListsServeBatch(cents, lists, idCol, embCol,
          probes, probeIdCol, probeCol, pidType, k, nProbe, allowed)
      case None =>
        searchIvfBatchAsOf(spark, root,
          restrict(VersionedScan.read(spark, corpusTable, cv), idCol,
            allowed),
          idCol, embCol, probes, probeIdCol, probeCol, k, nProbe, tsMillis)
    }
  }

  /** The pruned batch serve over a fresh lists layout — per-probe
    * routing collected driver-side (probes × nProbe pairs), ONE
    * stats-pruned scan over the union of chosen lists, candidates
    * fanned to their probes by a broadcast join, per-probe
    * PARTITIONED-window rerank. The long widen of the (validated
    * integral) probe id is cast BACK at the end, so lists and
    * join-plan serving return byte-identical schemas whichever route
    * freshness picks. */
  private def ivfListsServeBatch(cents: DataFrame, lists: DataFrame,
      idCol: String, embCol: String, probes: DataFrame,
      probeIdCol: String, probeCol: String,
      pidType: org.apache.spark.sql.types.DataType,
      k: Int, nProbe: Int, allowed: Option[DataFrame] = None): DataFrame = {
    import graft.functions.vec_cosine_sim
    import org.apache.spark.sql.expressions.Window
    val spark = probes.sparkSession
    import spark.implicits._
    val p = probes.select(col(probeIdCol).cast("long").as("__pid"),
      col(probeCol).as("__probe"))
    // ONE routing implementation across the ivf and pq tiers
    // (Pq.probeLists) — the collect is probes × nProbe, driver-bounded
    val pairs = Pq.probeLists(cents, p, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chosen = pairs.map(_._2).distinct
    val w = Window.partitionBy("__pid").orderBy(desc("score"), col(idCol))
    val scored =
      restrict(lists.filter(col("cid").isin(chosen: _*)), idCol, allowed)
        .join(broadcast(pairs.toDF("__pid", "cid")), "cid")
        .join(broadcast(p), "__pid")
        .select(col("__pid"), col(idCol),
          vec_cosine_sim(col(embCol), col("__probe")).as("score"))
    // spilled layouts dedup per (probe, id) before the rerank — a
    // boundary vector in two of one probe's lists must score once.
    // Dedup AFTER scoring (the copies are byte-identical, scores are
    // equal doubles): (pid, id, score) distinct hash-aggregates where
    // an (pid, id, embedding) dedup would sort-aggregate. Plain
    // layouts keep the exact r15 plan.
    (if (lists.columns.contains("spl")) scored.distinct() else scored)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
      .select(col("__pid").cast(pidType).as(probeIdCol), col(idCol),
        col("score"))
      .orderBy(col(probeIdCol), desc("score"), col(idCol))
  }

  /** The pq rerank-pool a width knob implies — ONE formula shared by
    * the SQL door (GraftTvfs.annSearch) and [[measureRecall]], so the
    * audited recall always describes what the door serves: the pool
    * scales with the width (the 2.2M rehearsal read recall@10 0.600 at
    * nProbe=32/pool=256 vs 0.388 under a fixed k-derived pool — pool
    * binds before ADC quality once routing widens). */
  def pqRerankPool(k: Int, width: Int): Int =
    math.max(math.max(64, 8 * k), 8 * width)

  /** Subspace count the committed codebooks were trained with — the
    * authoritative `m` for every later encode/search (a caller-supplied
    * m that drifted from the training-time value would silently split
    * delta vectors into incomparable subspaces). */
  private def codebookM(books: DataFrame): Int =
    books.agg(max(col("sub"))).head().getAs[Number](0).intValue + 1

  /** (trained m, centroid lengths uniform?) memoized per (books
    * table, version, manifest fingerprint) — [[residualStampMemo]]'s
    * twin: both are immutable per generation, and every committed pq
    * SERVE (and every steady-state re-ensure) was paying a driver
    * aggregate job just to re-derive two small constants. The
    * fingerprint in the key is the usual reused-version-number
    * guard. */
  private val codebookMMemo =
    new LruMap[(String, Long, Long), (Int, Boolean)](256)
  private def codebookMCached(spark: SparkSession, root: String,
      bv: Long, books: => DataFrame): (Int, Boolean) = {
    val bT = pqCodebooksTable(root)
    val key = (bT, bv, Versioned.manifestFingerprint(spark, bT, bv))
    codebookMMemo.get(key).getOrElse {
      val r = books.agg(max(col("sub")),
        countDistinct(org.apache.spark.sql.functions.size(col("centroid"))))
        .head()
      val v = (r.getAs[Number](0).intValue + 1, r.getLong(1) == 1L)
      codebookMMemo.put(key, v)
      v
    }
  }

  /** The trained m for a root's committed codebooks through the memo —
    * bv <= 0 resolves the latest generation. Refuses RAGGED codebooks
    * (non-uniform centroid lengths — a pre-r15 build whose m did not
    * divide the embedding width): such an index was never coherent
    * (its training stride ⌊D/m⌋ and its encode/serve stride ⌊D/(m+1)⌋
    * disagreed from day one), and max(sub)+1 is NOT its training m,
    * so serving it through [[Pq.subDist]] would be silent garbage —
    * the named remedy is a retrain at a dividing m. */
  private def trainedM(spark: SparkSession, root: String,
      books: => DataFrame, bv: Long = -1L): Int = {
    val (m, uniform) = codebookMCached(spark, root,
      if (bv > 0) bv
      else Versioned.latestVersion(spark, pqCodebooksTable(root)), books)
    require(uniform,
      s"PQ codebooks at $root are RAGGED (non-uniform subspace " +
        "widths — built before r15 with an m that does not divide the " +
        "embedding width; training and encoding never agreed on the " +
        "subspace boundaries): run retrainPq (or CALL ann_ensure after " +
        "dropping the pq artifacts) with an m that divides the width")
    m
  }

  /** Trained (m, k) of committed codebooks — both derivable because the
    * empty-cell repair keeps the codebook DENSE m×k. */
  private def codebookShape(books: DataFrame): (Int, Int) = {
    val r = books.agg(max(col("sub")), max(col("cid"))).head()
    (r.getAs[Number](0).intValue + 1, r.getAs[Number](1).intValue + 1)
  }

  /** ONE predicate for the scalar-degenerate PQ bound — shared by the
    * training-chokepoint refusal below and ann_ensure's defaulted-m
    * divisor search, so the auto-derive can never resolve to an m the
    * build immediately refuses (the r15 chokepoint precedent). m = 1
    * (whole-vector quantization) is allowed; m >= 2 needs >= 2 dims
    * per subspace. */
  def pqSubspacesOk(d: Int, m: Int): Boolean = m == 1 || d / m >= 2

  /** Train PQ codebooks at (m, k) under the scheme the root supports
    * TODAY: committed IVF centroids ⇒ RESIDUAL books stamped to the
    * current generation (version + manifest fingerprint), else raw —
    * the ONE recipe behind ensurePq's bootstrap, its torn-bootstrap
    * repair, and retrainPq (three sites that must stamp identically or
    * the repair paths diverge). Also the chokepoint for FAISS's
    * d % m == 0 rule: [[Pq.components]] splits contiguous ⌊D/m⌋-wide
    * subspaces, so an m that does not divide the width would train and
    * delta-encode the ragged tail on DIFFERENT boundaries — refused
    * loudly here (one stats-bounded 1-row read, build-time cost). */
  private def trainBooks(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int, k: Int): DataFrame = {
    emb.filter(col(embCol).isNotNull)
      .select(org.apache.spark.sql.functions.size(col(embCol)))
      .limit(1).collect().headOption.map(_.getInt(0))
      .foreach { d =>
        require(d % m == 0,
          s"PQ subspace count m=$m must divide the embedding width $d " +
            "(FAISS's d % m == 0 rule): the contiguous-subspace split " +
            "would otherwise leave a ragged tail that trains and encodes " +
            "on different boundaries — pick m from the width's divisors")
        // the scalar-degenerate regime (1-dim subspaces, m == D)
        // REFUSES by name instead of OOMing the build: the training
        // cross materializes n x m*k rows, and at m = D that is the
        // r15 rehearsal's recorded 2.2M build cliff — with no
        // accuracy reason to pay it, because quantizing scalars is
        // exactly what the s05 int8 and s11 IVF-SQ tiers already do
        // without a codebook cross (m <= D/2 keeps >= 2 dims per
        // subspace, the smallest split where PQ beats scalar
        // quantization)
        require(pqSubspacesOk(d, m),
          s"PQ at m=$m over width-$d embeddings is scalar-degenerate " +
            "(each subspace holds < 2 dimensions): the training cross " +
            s"materializes corpus x m*k rows with no accuracy benefit " +
            "over scalar quantization — use the int8 (s05) or IVF-SQ " +
            "(s11) scalar tiers for that regime, or pick m <= " +
            s"${d / 2}")
      }
    val ivfT = ivfCentroidsTable(root)
    val cgv = Versioned.latestVersion(spark, ivfT)
    if (cgv > 0L) stampResidual(
      Pq.codebooks(residualFrame(emb, idCol, embCol,
        VersionedScan.read(spark, ivfT, cgv)), idCol, "__resid", m, k),
      cgv, Versioned.manifestFingerprint(spark, ivfT, cgv))
    else Pq.codebooks(emb, idCol, embCol, m, k)
  }

  /** x − centroid(assigned list): the FAISS IVF-PQ residual. Assignment
    * is recomputed against the FROZEN committed centroids (the same
    * deterministic rule `ensureIvf` stores), so encode-time residuals
    * agree with the assignments table whenever both derive from the
    * same centroids generation — which the codebook stamp enforces.
    * Returns (idCol, __resid). */
  private def residualFrame(rows: DataFrame, idCol: String, embCol: String,
      cents: DataFrame): DataFrame =
    rows.select(col(idCol), col(embCol))
      .join(Ivf.assign(rows, idCol, embCol, cents), idCol)
      .join(broadcast(cents), "cid")
      .select(col(idCol),
        zip_with(col(embCol).cast("array<double>"), col("centroid"),
          (a, b) => a - b).as("__resid"))

  /** Stamp residual codebooks with the centroids GENERATION they were
    * trained against (version AND manifest fingerprint — drop-root
    * rebuilds reuse version numbers): the stamp is both the scheme
    * marker ([[Pq.isResidual]]) and the coherence bond every serve and
    * delta-encode checks — residual codes are only meaningful next to
    * the exact coarse centroids their residuals subtract. */
  private def stampResidual(books: DataFrame, cgv: Long,
      cgf: Long): DataFrame =
    books.withColumn("enc", lit("residual"))
      .withColumn("cgv", lit(cgv)).withColumn("cgf", lit(cgf))

  /** The (version, fingerprint) a residual codebook is stamped with,
    * None for a raw (pre-residual) codebook. */
  private def residualStamp(books: DataFrame): Option[(Long, Long)] =
    if (!Pq.isResidual(books)) None
    else {
      val r = books.select(col("cgv"), col("cgf")).head()
      Some((r.getLong(0), r.getLong(1)))
    }

  /** [[residualStamp]] memoized per (books table, version, manifest
    * fingerprint): the stamp is immutable per generation, and without
    * the memo every pq SERVE would pay a driver-side collect job over
    * the codebooks just to re-read two constants — the fingerprint in
    * the key is the usual reused-version-number guard. */
  private val residualStampMemo =
    new LruMap[(String, Long, Long), Option[(Long, Long)]](256)
  private def residualStampCached(spark: SparkSession, bT: String,
      bv: Long, books: => DataFrame): Option[(Long, Long)] = {
    val key = (bT, bv, Versioned.manifestFingerprint(spark, bT, bv))
    residualStampMemo.get(key).getOrElse {
      val v = residualStamp(books)
      residualStampMemo.put(key, v)
      v
    }
  }

  /** Refuse to serve (or delta-encode) residual codes against a
    * DIFFERENT centroids generation than they were trained for — the
    * torn-chain state an IVF retrain that crashed before its PQ heal
    * leaves behind. Raw codebooks pass untouched (their codes don't
    * reference the coarse centroids). Loud, never silently wrong. */
  private def requireCoherentStamp(spark: SparkSession, root: String,
      stamp: Option[(Long, Long)], centsVersion: Long,
      what: String): Unit =
    stamp.foreach { case (cgv, cgf) =>
      require(cgv == centsVersion &&
        cgf == Versioned.manifestFingerprint(spark,
          ivfCentroidsTable(root), centsVersion),
        s"$what: residual-encoded PQ codes at $root were trained " +
          s"against centroids generation v$cgv but this call resolves " +
          s"v$centsVersion — an IVF retrain landed without its PQ " +
          "re-train (torn chain); run retrainPq (or retrainIvf again, " +
          "which heals the chain) to restore coherence — a chain torn " +
          "during ann_ensure's bootstrap (codebooks committed, no " +
          "codes commit yet) also heals by re-running ann_ensure")
    }

  private def requireResidualCoherent(spark: SparkSession, root: String,
      books: DataFrame, centsVersion: Long, what: String): Unit =
    requireCoherentStamp(spark, root, residualStamp(books), centsVersion,
      what)

  /** Before a residual encode READS the stamped centroids generation,
    * prove v`cgv`'s manifest still hashes to the stamped fingerprint —
    * a drop-root rebuild REUSES version numbers, and re-encoding
    * residuals against an imposter generation would land incoherent
    * codes with no error anywhere ([[stampedDeltaSides]] and
    * [[requireCoherentStamp]] guard the same hazard on their paths;
    * this is the encode-side twin). Loud, never silently wrong. */
  private def requireStampedGeneration(spark: SparkSession, root: String,
      cgv: Long, cgf: Long, what: String): Unit =
    // a MISSING stamped manifest (the generation's version file is
    // gone — a drop-root rebuild with fewer commits) is the same
    // imposter state as a fingerprint mismatch: the named diagnostic,
    // never a raw FileNotFoundException. ONLY that case maps here — a
    // transient storage error must propagate, not masquerade as
    // version-number reuse and send the operator to a rebuild
    require((try Versioned.manifestFingerprint(spark,
        ivfCentroidsTable(root), cgv) == cgf
      catch { case _: java.io.FileNotFoundException => false }),
      s"$what: residual PQ codebooks at $root are stamped to centroids " +
        s"generation v$cgv, but that version's manifest no longer " +
        "hashes to the stamped fingerprint — the version number was " +
        "reused by a drop-root rebuild, so the stamped generation no " +
        "longer exists; run retrainPq (or retrainIvf) to re-train " +
        "against the current generation")

  /** Ensure the persisted PQ index at `root` covers exactly the rows of
    * `emb`: first call trains the per-subspace codebooks and encodes
    * the corpus; later calls encode the NEW/CHANGED/REMOVED delta
    * against the FROZEN committed codebooks — with the subspace count
    * DERIVED from the codebooks, so `m` cannot drift from the
    * training-time value.
    *
    * ENCODING SCHEME: when the root already carries committed IVF
    * centroids (the order serving requires anyway — the pq tier routes
    * through the IVF lists), a FIRST build trains RESIDUAL codebooks
    * over x − centroid(assigned list), the FAISS IVF-PQ recipe:
    * residuals concentrate the quantization range, the standard recall
    * lever (the r13 2.2 M rehearsal read raw ivfpq recall@10 at 0.338
    * vs 0.650 for the IVF routing above it). Without centroids the
    * build stays raw. The scheme is stamped ON the codebooks
    * ([[stampResidual]]), so existing raw indexes keep serving raw
    * forever, every later delta encodes under the STORED scheme, and a
    * residual delta additionally requires the stamped centroids
    * generation to still be current — a torn retrain chain fails
    * loudly instead of landing incoherent codes.
    * Returns (codebooksVersion, codesVersion). */
  def ensurePq(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int, k: Int): (Long, Long) = {
    val (bT, cT) = (pqCodebooksTable(root), pqCodesTable(root))
    val ivfT = ivfCentroidsTable(root)
    val corpus = emb.select(col(idCol), col(embCol))
      .withColumn("vh", xxhash64(col(embCol)))
    // encode under the stored scheme: residual books subtract the
    // centroids generation they are STAMPED with (coherence with the
    // CURRENT generation is checked before any commit lands)
    def encodeRows(rows: DataFrame, books: DataFrame, mUse: Int) = {
      val coded = residualStamp(books) match {
        case Some((cgv, cgf)) =>
          requireStampedGeneration(spark, root, cgv, cgf, "ensurePq")
          Pq.encode(residualFrame(rows, idCol, embCol,
              VersionedScan.read(spark, ivfT, cgv)), idCol, "__resid",
            books, mUse)
        case None => Pq.encode(rows, idCol, embCol, books, mUse)
      }
      coded.join(rows.select(col(idCol), col("vh")), Seq(idCol))
    }
    // same bootstrap-repair shape as ensureIvf: branch on the LAST
    // artifact so a crash between the two commits is recoverable
    if (Versioned.latestVersion(spark, cT) == 0L) {
      val bv0 = Versioned.latestVersion(spark, bT)
      if (bv0 == 0L) {
        Versioned.commit(spark, bT,
          trainBooks(spark, root, emb, idCol, embCol, m, k),
          Some("sub"), files = 1)
      } else {
        // BOOTSTRAP REPAIR of a torn residual chain: the codebooks
        // commit landed but the codes commit never did, and the
        // centroids generation moved meanwhile (an IVF retrain, or a
        // drop-root rebuild reusing the stamped version number). No
        // codes depend on the stranded books, so re-running ann_ensure
        // COMPLETES the bootstrap — re-train at the stored shape
        // against the CURRENT generation (CAS on the stranded slot)
        // instead of refusing with a remedy that cannot run
        val books0 = VersionedScan.read(spark, bT, bv0)
        residualStamp(books0).foreach { case (cgv0, cgf0) =>
          val cvNow = Versioned.latestVersion(spark, ivfT)
          if (cgv0 != cvNow || cgf0 !=
              Versioned.manifestFingerprint(spark, ivfT, cvNow)) {
            val (m0, k0) = codebookShape(books0)
            Versioned.commit(spark, bT,
              trainBooks(spark, root, emb, idCol, embCol, m0, k0),
              Some("sub"), files = 1, op = "RETRAIN",
              txn = Some(s"pq-bootstrap-repair-from$bv0"),
              expected = Some(bv0))
          }
        }
      }
      val books = VersionedScan.read(spark, bT)
      requireResidualCoherent(spark, root, books,
        Versioned.latestVersion(spark, ivfT), "ensurePq")
      // trainedM, not bare codebookM: books trained THIS call are
      // uniform by construction, but a stranded RAW legacy book (torn
      // pre-r15 bootstrap, no residual stamp to trigger the repair
      // above) could be ragged — refuse with the retrain remedy
      // instead of encoding garbage codes (the retrainPq precedent)
      Versioned.commit(spark, cT,
        encodeRows(corpus, books, trainedM(spark, root, books)),
        Some(idCol), files = 4)
    } else {
      // same version pinning as ensureIvf; the stamp read rides the
      // per-generation memo — the zero-rebuild steady state (the s16/
      // s20 bench shape re-ensures every rep) must not pay a driver
      // collect just to re-read two immutable constants
      val cv = Versioned.latestVersion(spark, cT)
      val books = VersionedScan.read(spark, bT)
      requireCoherentStamp(spark, root,
        residualStampCached(spark, bT,
          Versioned.latestVersion(spark, bT), books),
        Versioned.latestVersion(spark, ivfT), "ensurePq")
      val codes = VersionedScan.read(spark, cT, cv)
      val mStored = trainedM(spark, root, books)
      val hasVh = codes.columns.contains("vh")
      val indexed =
        if (hasVh) codes.select(col(idCol), col("vh")).distinct()
        else codes.select(col(idCol)).distinct()
      landDelta(spark, cT, corpus, indexed, idCol, hasVh,
        encodeRows(_, books, mStored))
    }
    (Versioned.latestVersion(spark, bT), Versioned.latestVersion(spark, cT))
  }

  /** Load the committed PQ index: (codebooks, codes). */
  def loadPq(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (VersionedScan.read(spark, pqCodebooksTable(root)),
      VersionedScan.read(spark, pqCodesTable(root)))

  /** [[loadPq]] + the residual coherence gate every pq SERVING path
    * rides: residual codes against a retrained-but-unhealed centroids
    * generation refuse loudly instead of ranking through the wrong
    * coarse space. Raw indexes pass untouched. */
  private def loadPqChecked(spark: SparkSession,
      root: String): (DataFrame, DataFrame, Long) = {
    val bT = pqCodebooksTable(root)
    val bv = Versioned.latestVersion(spark, bT)
    val (books, codes) = loadPq(spark, root)
    requireCoherentStamp(spark, root,
      residualStampCached(spark, bT, bv, books),
      Versioned.latestVersion(spark, ivfCentroidsTable(root)), "pq serving")
    (books, codes, bv)
  }

  /** [[loadPqAsOf]] + the same coherence gate against the SAME-INSTANT
    * centroids generation: a historical serve is coherent iff the
    * books' stamp names the centroids current at that instant. */
  private def loadPqAsOfChecked(spark: SparkSession, root: String,
      tsMillis: Long): (DataFrame, DataFrame, Long) = {
    val bT = pqCodebooksTable(root)
    val bv = Versioned.snapshotAsOf(spark, bT, tsMillis).version
    val (books, codes) = loadPqAsOf(spark, root, tsMillis)
    requireCoherentStamp(spark, root,
      residualStampCached(spark, bT, bv, books),
      Versioned.snapshotAsOf(spark, ivfCentroidsTable(root),
        tsMillis).version, "pq serving (AS OF)")
    (books, codes, bv)
  }

  /** TIME-TRAVEL load of the committed PQ index — [[loadIvfAsOf]]'s
    * quantized twin: codebooks + codes resolve to the versions current
    * AT `tsMillis`. */
  def loadPqAsOf(spark: SparkSession, root: String,
      tsMillis: Long): (DataFrame, DataFrame) = {
    val (bT, cT) = (pqCodebooksTable(root), pqCodesTable(root))
    (VersionedScan.read(spark, bT,
        Versioned.snapshotAsOf(spark, bT, tsMillis).version),
      VersionedScan.read(spark, cT,
        Versioned.snapshotAsOf(spark, cT, tsMillis).version))
  }

  /** [[Pq.searchIvfPq]] over ALL FOUR artifacts AS OF `tsMillis` —
    * historical serving on the quantized tier: IVF routing and PQ
    * codes both pin to the instant, so "re-run last week's retrieval
    * EXACTLY" holds for the billion-scale layout too (the caller
    * supplies the same-instant corpus view to rerank against,
    * normally `graft_table(path, TIMESTAMP ...)`). Costs the same as
    * serving current: version resolution is metadata-only. */
  def searchIvfPqAsOf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int, pool: Int, tsMillis: Long): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    val (books, codes, bv) = loadPqAsOfChecked(spark, root, tsMillis)
    Pq.searchIvfPq(emb, asg, cents, codes, books, idCol, embCol,
      probeDf, probeCol, trainedM(spark, root, books, bv), k, nProbe, pool)
  }

  def nswEdgesTable(root: String): String = s"$root/nsw_edges"
  def nswLayoutTable(root: String): String = s"$root/nsw_layout"

  /** Freshness stamp for the derived HNSW shard layout: binds the
    * commit to the corpus identity AND the shard count it was
    * clustered under — any corpus commit, or a reshard (new shard
    * count), invalidates it; serving then simply ignores it (the
    * corpus table stays authoritative), never serves stale rows. */
  private def nswLayoutTxn(corpusTable: String, cv: Long, cfp: Long,
      gshards: Int): String =
    s"nsw-layout-t${corpusTable.hashCode}-c$cv-f$cfp-s$gshards"

  /** Build (or refresh) the DERIVED shard-clustered serving layout for
    * the committed HNSW index — [[optimizeIvfServing]]'s graph twin:
    * corpus rows keyed by `pmod(id, shards)`, committed CLUSTERED BY
    * shard with per-file shard stats. What it buys is the
    * PARTIAL-MISS serve: a warm session that lost one shard (a
    * SoftReference shed under memory pressure, an executor that never
    * built it) re-reads ONLY that shard's files instead of paying the
    * full corpus+edges cogroup — at 100 TB the difference between a
    * shard-sized read and a corpus-sized one. An up-to-date layout
    * returns its version without committing; a stale one refreshes
    * O(delta) since r14 ([[tryIncrementalNswLayout]]) — only the
    * shards whose membership changed rewrite. */
  def optimizeNswServing(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      corpusVersion: Long = -1L, force: Boolean = false): Long = {
    val (eT, lT) = (nswEdgesTable(root), nswLayoutTable(root))
    val ev = Versioned.latestVersion(spark, eT)
    require(ev > 0, s"no committed HNSW index at $root — ensure first")
    val gshards = storedNswParams(spark, eT, ev,
      VersionedScan.read(spark, eT, ev)).map(_._3).getOrElse(
      throw new IllegalStateException(
        s"index at $root predates build-parameter rows; re-ensure it " +
          "once before optimizing serving"))
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"optimizeNswServing: $corpusTable has no commits")
    val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
    val txn = nswLayoutTxn(corpusTable, cv, cfp, gshards)
    val lv = Versioned.latestVersion(spark, lT)
    val oldStamp =
      if (lv > 0) effectiveLayoutStamp(spark, lT, lv) else None
    if (!force && oldStamp.contains(txn)) return lv
    // O(delta) path first (r14): rewrite only the shards whose corpus
    // membership changed; the full re-cluster is bootstrap/fallback —
    // and the explicit door (`force`) for restoring pruning
    // granularity after a whole-layout compaction
    if (!force && lv > 0)
      tryIncrementalNswLayout(spark, root, corpusTable, idCol, embCol,
        lv, oldStamp, cv, gshards, txn).foreach(return _)
    val emb = VersionedScan.read(spark, corpusTable, cv)
    val layout = emb.select(
      pmod(col(idCol).cast("long"), lit(gshards.toLong)).as("shard"),
      col(idCol), col(embCol))
    // file count tracks the shard count (one file ≈ one shard), so the
    // partial-miss scan prunes to exactly the missing shards' files
    Versioned.commit(spark, lT, layout, Some("shard"),
      files = math.max(4, math.min(4096, gshards)),
      txn = Some(txn), op = "OPTIMIZE_SERVING",
      expected = if (lv > 0) Some(lv) else None)
  }

  /** [[tryIncrementalIvfLists]]'s HNSW twin: the shard layout is the
    * corpus projected under `pmod(id, shards)`, so the delta is exactly
    * the corpus delta — a stamped-generation file diff
    * ([[stampedDeltaSides]]: fingerprint verified, DV deltas folded
    * in). Only the shards holding changed OLD images rewrite; a
    * changed SHARD COUNT (reshard) or a foreign corpus table always
    * rebuilds. */
  private def tryIncrementalNswLayout(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      lv: Long, oldStamp: Option[String], cv: Long, gshards: Int,
      newTxn: String): Option[Long] = {
    val lT = nswLayoutTable(root)
    val parsed = oldStamp
      .flatMap("""nsw-layout-t(-?\d+)-c(\d+)-f(-?\d+)-s(\d+)""".r
        .findFirstMatchIn(_))
      .getOrElse(return None)
    val (cv0, cfp0) = (parsed.group(2).toLong, parsed.group(3).toLong)
    // foreign corpus table or a changed shard count: rebuild; equal or
    // reused versions are settled by the fingerprint check inside
    // stampedDeltaSides
    if (parsed.group(1).toInt != corpusTable.hashCode ||
      parsed.group(4).toInt != gshards) return None
    scala.util.Try {
      // rewrite keys come from the OLD side only: a new id appends into
      // the refresh's own shard-sorted delta files — an append-mostly
      // delta rewrites nothing however many shards it spreads over
      val (oldIds, newIds) = stampedDeltaSides(spark, corpusTable, idCol,
        cv0, cfp0, cv).getOrElse(return None)
      val deltaIds: Seq[Any] = (oldIds ++ newIds).distinct
      if (deltaIds.size > maxLayoutDelta) return None
      val dirtyShards = oldIds
        .map(id => math.floorMod(id.asInstanceOf[Number].longValue,
          gshards.toLong)).distinct
      // same cost-aware file-fraction fallback as the ivf/pq layouts
      val (touchedF, totalF) =
        Versioned.filesTouchedByKey(spark, lT, lv, "shard", dirtyShards)
      if (touchedF * 2 > totalF) return None
      val emb = VersionedScan.read(spark, corpusTable, cv)
      val deltaNew =
        if (deltaIds.isEmpty)
          VersionedScan.read(spark, lT, lv).limit(0)
        else restrictToIds(spark, emb, idCol, deltaIds).select(
          pmod(col(idCol).cast("long"), lit(gshards.toLong)).as("shard"),
          col(idCol), col(embCol))
      Some(Versioned.rewriteFilesByKey(spark, lT, "shard", dirtyShards,
        Some(newTxn), "OPTIMIZE_SERVING", lv)(
        layoutReplace(spark, idCol, emb.schema(idCol).dataType,
          deltaIds, deltaNew)))
    }.toOption.flatten
  }

  /** The fresh shard layout for (root, corpus identity, shard count),
    * or None — the same three metadata reads as [[freshLists]]. */
  private def freshNswLayout(spark: SparkSession, root: String,
      corpusTable: String, cv: Long, gshards: Int,
      cfp: Long): Option[DataFrame] = {
    val lT = nswLayoutTable(root)
    val lv = Versioned.latestVersion(spark, lT)
    if (lv == 0L) return None
    if (effectiveLayoutStamp(spark, lT, lv)
        .contains(nswLayoutTxn(corpusTable, cv, cfp, gshards)))
      Some(VersionedScan.read(spark, lT, lv))
    else None
  }

  /** nsw_layout freshness for `ann_stats` — [[listsFreshness]]'s HNSW
    * twin: 1 = partial-miss serving is file-pruned, 0 = stale or no
    * layout (serving still correct, full cogroup on any miss). */
  def nswLayoutFreshness(spark: SparkSession, root: String,
      corpusTable: String): Map[String, Long] = {
    val eT = nswEdgesTable(root)
    val ev = Versioned.latestVersion(spark, eT)
    val cv = Versioned.latestVersion(spark, corpusTable)
    val fresh = ev > 0L && cv > 0L &&
      Versioned.latestVersion(spark, nswLayoutTable(root)) > 0L &&
      storedNswParams(spark, eT, ev, VersionedScan.read(spark, eT, ev))
        .exists(p => freshNswLayout(spark, root, corpusTable, cv, p._3,
          Versioned.manifestFingerprint(spark, corpusTable, cv)).isDefined)
    Map("nsw_layout_fresh" -> (if (fresh) 1L else 0L))
  }

  /** The NSW vector-hash column: levels/graph walk on FLOAT vectors
    * (cogroupShards casts), so the recorded hash is over the same cast
    * value everywhere. */
  private def nswVh(embCol: String) =
    xxhash64(col(embCol).cast("array<float>"))

  /** Build-parameter row for the committed edge table: one row with
    * `layer = -2` under the out-of-band shard -1 records (m, ef,
    * shards) in (src, rank, dst) — the committed graph's structure
    * parameters, which every resume/search must use regardless of what
    * a caller passes (a graph resumed under a different m/ef/shard
    * count is a silent hybrid matching no deterministic build). */
  private def paramsRow(spark: SparkSession, m: Int, ef: Int,
      shards: Int): DataFrame = {
    import spark.implicits._
    Seq((-1L, m.toLong, -2, ef, shards.toLong))
      .toDF("shard", "src", "layer", "rank", "dst")
  }

  /** Tiny synchronized LRU map — the bound every serve-side memo
    * shares. Exceeding `cap` evicts the least-recently-USED entries
    * only (reads count as use), so a many-index serving session
    * crossing the bound sheds the coldest indexes' state instead of
    * dumping every live one's (the old `size > cap → clear()` cliff:
    * bounded and safe, but one index too many silently re-cooled
    * EVERY warm serve in the session). Locking is per-operation and
    * never held across a computation — callers compute outside and
    * `put` (a racing twin computes the same value; last put wins). */
  private[vector] final class LruMap[K, V](cap: Int) {
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size > cap
    }
    def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
    def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
    def removeIf(p: K => Boolean): Unit = m.synchronized {
      m.keySet.removeIf(k => p(k)); ()
    }
    def keys: Seq[K] = m.synchronized {
      import scala.jdk.CollectionConverters._
      // materialize under the lock — accessOrder iteration is not
      // thread-safe outside it
      m.keySet.asScala.toVector
    }
    def size: Int = m.synchronized(m.size)
  }

  /** (m, ef, shards) recorded by the layer = -2 row, memoized per
    * (table, version, manifest FINGERPRINT) — without the memo every
    * search would pay an O(edges) scan just to fetch three ints
    * (`layer` carries no file stats to prune on). The manifest
    * content fingerprint is part of the key because the documented
    * retrain path (drop the root, rebuild) REUSES version numbers: a
    * (table, version)-only memo — or even one keyed on the commit
    * timestamp, which a rebuild can repeat within the same
    * millisecond — would serve the dead generation's params to the
    * rebuilt index: wrong require() refusals at ensure, silently
    * wrong graph reconstruction at search. LRU-bounded at 256
    * (re-collecting is cheap, staleness is not). */
  private val nswParams =
    new LruMap[(String, Long, Long), Option[(Int, Int, Int)]](256)
  /** ((m, ef, shards) if recorded, the manifest fingerprint). The
    * fingerprint rides along so the serving hot path reads the
    * manifest ONCE per call — recomputing it for the graph-cache key
    * would be a second full manifest read per search. */
  private def storedNswParamsFp(spark: SparkSession, eT: String,
      version: Long, edges: DataFrame): (Option[(Int, Int, Int)], Long) = {
    val fp = Versioned.manifestFingerprint(spark, eT, version)
    val key = (eT, version, fp)
    (nswParams.get(key).getOrElse {
      // computed OUTSIDE the map lock (it runs a Spark job); a racing
      // twin recomputes the same immutable value — last put wins
      val v = edges.filter(col("layer") === -2)
        .select(col("src"), col("rank"), col("dst")).collect().headOption
        .map(r => (r.getLong(0).toInt, r.getInt(1), r.getLong(2).toInt))
      nswParams.put(key, v)
      v
    }, fp)
  }
  private def storedNswParams(spark: SparkSession, eT: String,
      version: Long, edges: DataFrame): Option[(Int, Int, Int)] =
    storedNswParamsFp(spark, eT, version, edges)._1

  /** Vectors-per-shard target for the auto-sized shard count: a shard
    * is materialized in ONE task's memory at build and serve
    * (cogroupShards's `vit.toArray`), so the shard count MUST grow
    * with the corpus — this is the documented sizing rule. 2^18
    * vectors ≈ 256k rows is 100–400 MB of float vectors at typical
    * embedding widths plus O(m) adjacency ints per node: comfortably
    * one task's working set. A grown corpus migrates with
    * [[reshardNsw]] (one commit), never by marching toward task OOM
    * under a build-frozen shard count. */
  val nswShardTarget: Long = 1L << 18

  /** Corpus-derived shard count: ceil(n / [[nswShardTarget]]),
    * floor 4 (small corpora keep the historical default — and enough
    * shards for the scatter-gather to parallelize at all). Counts
    * ABOVE the floor round up to the next PRIME: shard membership is
    * `pmod(id, shards)`, and real id spaces carry strides (sharded
    * ticket servers minting multiples of 10, all-even ids, ...) that
    * a composite count folds onto few residues — a stride-10 corpus
    * at 10 shards would put EVERY row in shard 0, exactly the
    * one-task-holds-the-corpus OOM the sizing exists to prevent. A
    * prime count spreads every stride that is not a multiple of the
    * prime itself; for an id space engineered around that prime, pass
    * an explicit count. The floor stays literal 4: at ≤4·2^18 rows
    * the whole corpus fits a few tasks regardless of residue
    * clustering, and the build-per-run tier ([[NswAnn.search]])
    * defaults to the same 4, keeping the persisted↔per-run equality
    * pins aligned. */
  def nswAutoShards(n: Long): Int = {
    val raw = math.max(4L, (n + nswShardTarget - 1L) / nswShardTarget).toInt
    if (raw <= 4) raw else nextPrime(raw)
  }

  /** Smallest prime ≥ x (trial division — x is a shard count, small). */
  private[vector] def nextPrime(x: Int): Int = {
    def isPrime(v: Int): Boolean =
      v >= 2 && (2 to math.sqrt(v.toDouble).toInt).forall(v % _ != 0)
    Iterator.from(math.max(x, 2)).find(isPrime).get
  }

  /** Ensure the persisted HNSW index at `root` covers exactly the rows
    * of `emb`. The per-shard graphs serialize as an EDGE table
    * `(shard, src, layer, rank, dst)` — `rank` preserves adjacency
    * LIST ORDER so a reconstructed graph walks identically to the
    * built one; a `layer = -1` marker row per node records membership
    * with the vector's hash in `dst` (a single-node shard has no
    * edges), and the `layer = -2` row pins the build parameters —
    * calling ensure with different (m, ef, shards) is REFUSED (drop
    * the root for an explicit retrain, or [[reshardNsw]] to migrate
    * the shard count as one commit). `shards = -1` (the default)
    * means: the stored shard count for an existing index, else
    * [[nswAutoShards]] of the corpus size — the scale-safe sizing an
    * explicit caller value overrides. A refresh RESUMES each shard's
    * insertion-ordered construction from the stored adjacency when
    * every new id sorts after the shard's indexed ids AND every
    * indexed vector is unchanged (the marker hashes prove it);
    * interleaved, updated, or deleted ids rebuild only their own
    * shard. Either way the committed graph is bit-identical to a
    * from-scratch build over the current corpus (insertion order and
    * id-derived levels are deterministic — pinned in AnnIndexSpec),
    * and the new edge set lands as one copy-on-write commit: graph
    * edges mutate under insertion (trim touches old nodes), so the
    * refresh is an index-sized rewrite, never a corpus rescan.
    * Returns the edge-table version; an up-to-date index mints
    * nothing. */
  def ensureNsw(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int = 8, ef: Int = 32,
      shards: Int = -1): Long = {
    val eT = nswEdgesTable(root)
    // optimistic loop: the rebuild lands with an expected-slot CAS
    // against the OBSERVED version, so a racing ensure cannot clobber
    // a fresher committed graph with one built from an older corpus
    // snapshot (last-writer-wins would); the loser re-observes — and
    // usually finds the twin's graph already current
    while (true) {
      val ev = Versioned.latestVersion(spark, eT)
      val prior =
        if (ev == 0L) None
        else Some(VersionedScan.read(spark, eT, ev))
      // shard count for THIS pass: stored params pin it for an
      // existing index (an explicit caller value must match — drift
      // is a retrain); a first build derives it from the corpus size
      // unless the caller pinned one. Stored params resolve ONCE (one
      // manifest read), shared by the derivation and the drift check.
      val stored = prior.flatMap(storedNswParams(spark, eT, ev, _))
      var effShards =
        if (shards > 0) shards
        else stored.map(_._3).getOrElse(nswAutoShards(emb.count()))
      stored.foreach { case (m0, ef0, s0) =>
        require(m0 == m && ef0 == ef && (shards <= 0 || s0 == shards),
          s"ann index at $root was built with (m=$m0, ef=$ef0, " +
            s"shards=$s0); got (m=$m, ef=$ef, shards=$shards) — " +
            "changing build parameters is a retrain: drop the index " +
            "root (or reshardNsw to migrate the shard count)")
        effShards = s0
      }
      prior.foreach { edges =>
        // one full-outer counting pass over (id, vh) pairs: any NEW,
        // CHANGED, or REMOVED row makes the prefix stale
        val markers = edges.filter(col("layer") === -1)
          .select(col("src").as(idCol), col("dst").as("__vh0"),
            lit(1).as("__ix"))
        val cur = emb.select(col(idCol).cast("long").as(idCol),
          nswVh(embCol).as("vh")).withColumn("__c", lit(1))
        val stale = cur.join(markers, Seq(idCol), "full_outer")
          .agg(coalesce(sum(when(col("__c").isNull || col("__ix").isNull ||
            col("__vh0") =!= col("vh"), 1L).otherwise(0L)), lit(0L)))
          .head().getLong(0)
        if (stale == 0L)
          return ev // the version this check VERIFIED covers `emb`
      }
      try {
        // the rebuild makes every cached graph of this table dead (new
        // version + fingerprint) — free them BEFORE the build job
        // needs the heap; if the CAS below loses, the only cost is a
        // re-reconstruction on the next serve of the surviving
        // generation
        invalidateServeCache(eT)
        return Versioned.commit(spark, eT,
          nswEdgeSet(emb, idCol, embCol, m, ef, effShards, prior),
          Some("src"), files = effShards,
          expected = if (ev > 0L) Some(ev) else None)
      } catch {
        case _: java.util.ConcurrentModificationException => () // raced
      }
    }
    -1L // unreachable: the loop exits only through return
  }

  /** Migrate the committed HNSW index to `newShards` shards as ONE
    * commit — the operational alternative to drop-root retrain for a
    * corpus that outgrew its build-time shard count (each shard must
    * fit one task's memory; see [[nswShardTarget]]). Shard membership
    * is `pmod(id, shards)` and insertion order / levels derive from
    * ids alone, so the resharded edge set is BIT-IDENTICAL to a fresh
    * build of the current corpus at `newShards` (pinned in
    * AnnIndexSpec) — but the table keeps its history: time travel to
    * the pre-reshard graph still works, and the expected-slot CAS
    * makes a racing ensure lose cleanly instead of clobbering. The
    * stored (m, ef) are reused; only the shard count changes. */
  def reshardNsw(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, newShards: Int): Long = {
    require(newShards > 0, s"reshardNsw needs a positive shard count")
    val eT = nswEdgesTable(root)
    val ev = Versioned.latestVersion(spark, eT)
    require(ev > 0L, s"no committed index at $root to reshard")
    val edges = VersionedScan.read(spark, eT, ev)
    val (m, ef, _) = storedNswParams(spark, eT, ev, edges).getOrElse(
      throw new IllegalStateException(
        s"index at $root predates build-parameter rows; " +
          "re-ensure it once to migrate before resharding"))
    // prior edges are bucketed under the OLD shard count — useless as
    // a resume prefix under the new one; the rebuild is a full
    // per-shard construction, which is exactly what a fresh build
    // pays. What reshard SAVES vs drop-root is operational: history,
    // version lineage, and the race-safe CAS landing.
    // same eager invalidation as the ensure rebuild: the pre-reshard
    // graphs are dead the moment the commit lands, and the rebuild job
    // is exactly when the heap needs the room
    invalidateServeCache(eT)
    Versioned.commit(spark, eT,
      nswEdgeSet(emb, idCol, embCol, m, ef, newShards, None),
      Some("src"), files = newShards, expected = Some(ev))
  }

  /** Executor-resident reconstructed-graph cache for the SERVING
    * path, keyed (edge table, version, manifest fingerprint, shard,
    * shard-content fingerprint) → the reconstructed (nodes, graph).
    * The manifest fingerprint distinguishes retrain GENERATIONS of
    * the same version number (same hazard as [[storedNswParams]]);
    * the shard-content fingerprint hashes the shard's OWN (id, vh)
    * pairs as delivered by the caller's corpus frame, because the
    * served graph depends on the corpus too (an uncommitted tail
    * resumes in memory) — index identity alone would serve a graph
    * built over a different corpus view. Values are SoftReferences:
    * the cache sheds shard-sized arrays under memory pressure instead
    * of pinning them, and the map itself is LRU-bounded at 256 keys —
    * a many-index session crossing the bound evicts the coldest
    * shards only, never a live index's warm graphs. On a cluster each
    * executor fills its own cache lazily — the standard shard-serving
    * residency model. */
  private val shardGraphs = new LruMap[
    (String, Long, Long, Long, Long),
    java.lang.ref.SoftReference[
      (Array[(Long, Array[Float], Long)], NswAnn.HnswGraph)]](256)

  /** Serving-path shard-graph reconstruction count — the observable
    * contract AnnIndexSpec pins: a batch search reconstructs each
    * shard at most ONCE for the whole probe set, and a repeat search
    * at the same (index, corpus) state reconstructs NOTHING (cache
    * hit). Observable in local mode because executors share the JVM;
    * on a cluster each executor keeps its own cache and counter. */
  private[vector] val serveBuilds =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cache-hit twin of [[serveBuilds]]: shard graphs served from
    * [[shardGraphs]] without reconstruction. builds vs hits is the
    * warm-session signal an operator reads through
    * `CALL graft.system.ann_stats(...)` — the difference between a
    * sub-second serve and a corpus cogroup. */
  private[vector] val serveHits =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cluster-true twins of the JVM-local counters: LongAccumulators
    * registered once per SparkContext and captured into every serve
    * closure, so builds/hits are aggregated back to the DRIVER from
    * whichever executor the task ran on — `ann_stats` reads these and
    * stays truthful on a real cluster, where the statics above only
    * describe the serving JVM they live in (the executor-side cache
    * behavior itself is unchanged). Observability counters: a retried
    * task may re-add (accumulator updates in transformations are
    * at-least-once), which can only over-report a build/hit, never
    * misreport residency. */
  private val serveAccums = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext,
    (org.apache.spark.util.LongAccumulator,
      org.apache.spark.util.LongAccumulator)]()
  private def accumsFor(sc: org.apache.spark.SparkContext)
      : (org.apache.spark.util.LongAccumulator,
         org.apache.spark.util.LongAccumulator) = {
    // a restarted session must not pin its dead predecessor (and the
    // predecessor's accumulators) through the map key forever
    serveAccums.keySet.removeIf(_.isStopped)
    serveAccums.computeIfAbsent(sc, c =>
      (c.longAccumulator("graft.ann.serve_builds"),
        c.longAccumulator("graft.ann.serve_cache_hits")))
  }

  /** The spill-fraction curve — `ann_spill_preview`'s engine, the
    * PICK step for the spill knob ([[tuneWidth]]'s role for the width
    * knob): what fraction of the corpus would multi-assign at each
    * eps on the ladder, measured against the root's OWN committed
    * centroids BEFORE paying a build. ONE pass: the two-nearest pairs
    * ([[graft.vector.Ivf.twoNearest]] — the exact first stage
    * assignSpill runs) reduce to one row of conditional counts, one
    * per rung, through the SAME band predicate the build applies —
    * the preview counts exactly what `ann_ensure(spill => eps)` would
    * land, at assignment-pass cost and zero commits. The fraction IS
    * the knob's price (index and scan grow by it); recall per rung
    * still needs a built root (`ann_recall`/`ann_tune`) — this tells
    * you which builds are worth paying for. */
  def spillCurve(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String,
      epsLadder: Seq[Double]): Seq[(Double, Long, Long)] = {
    require(epsLadder.nonEmpty && epsLadder.forall(_ > 0.0),
      "spillCurve: every eps must be positive")
    val cT = ivfCentroidsTable(root)
    require(Versioned.latestVersion(spark, cT) > 0,
      s"ann_spill_preview: no committed IVF centroids at $root — the " +
        "preview measures the root's own quantizer; CALL " +
        "graft.system.ann_ensure(..., kind => 'ivf') first")
    val cents = VersionedScan.read(spark, cT)
    val pairs = Ivf.twoNearest(emb, idCol, embCol, cents)
      .select(col("m2.d1").as("d1"), col("m2.d2").as("d2"))
    val aggs = count(lit(1)).as("n") +:
      epsLadder.zipWithIndex.map { case (e, i) =>
        sum(when(Ivf.spillBand(col("d1"), col("d2"), e), 1L)
          .otherwise(0L)).as(s"s$i")
      }
    val row = pairs.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    epsLadder.zipWithIndex.map { case (e, i) =>
      (e, row.getLong(i + 1), n)
    }
  }

  /** `ann_stats`'s spill surface: the frozen multi-assignment eps of
    * the root's IVF assignments as eps x 1e6 (the recall_e6
    * convention) — 0 for a single-assignment root, -1 when no
    * assignments are committed. Metadata + one memoized 1-row read on
    * spilled roots. */
  def spillEpsE6(spark: SparkSession, root: String): Long = {
    val aT = ivfAssignmentsTable(root)
    val av = Versioned.latestVersion(spark, aT)
    if (av == 0L) -1L
    else {
      val asg = VersionedScan.read(spark, aT, av)
      if (!asg.columns.contains("cid2")) 0L
      else math.round(storedSpillEps(spark, root, av, asg) * 1e6)
    }
  }

  /** Serving-cache observability snapshot for the index at `root` —
    * the SQL-surfaced view behind `CALL graft.system.ann_stats`:
    * cumulative reconstruction/hit counters (JVM-wide — the serve work
    * happens wherever the executor is) plus the cache residency for
    * THIS index's edge table (every committed generation/version's
    * entries count; `live` excludes entries the JVM already shed under
    * memory pressure — values are SoftReferences). Local-mode
    * semantics: executors share this JVM, so the numbers describe the
    * whole session; on a cluster each executor keeps its own cache and
    * counters and this reads the DRIVER's (typically zero builds) —
    * per-executor aggregation would ride metrics, not this call. */
  def serveStats(spark: SparkSession, root: String): Map[String, Long] = {
    val eT = nswEdgesTable(root)
    val keys = shardGraphs.keys.filter(_._1 == eT)
    val live = keys.count(k =>
      shardGraphs.get(k).exists(_.get() != null))
    val (ba, ha) = accumsFor(spark.sparkContext)
    Map(
      "serve_builds_total" -> ba.value.longValue,
      "serve_cache_hits_total" -> ha.value.longValue,
      "cached_shard_graphs" -> keys.size.toLong,
      "cached_shard_graphs_live" -> live.toLong)
  }

  /** Drop every cached shard graph for `eT` — called after a commit
    * that replaces the table's edge set (ensure rebuild, reshard):
    * the old generation can never be served again (the cache key's
    * version + manifest fingerprint changed), so holding its graphs
    * is pure heap pressure. Relying on SoftReference clearing alone
    * is NOT enough: the 2.2M-row rehearsal OOM'd a post-reshard
    * rebuild under JDK's GCLocker-starved allocation path, which
    * throws before soft references are guaranteed cleared (PLANS
    * r12) — eager invalidation of provably-dead entries closes it. */
  private def invalidateServeCache(eT: String): Unit = {
    shardGraphs.removeIf(_._1 == eT)
  }

  /** Drop one shard's cached graphs for `eT` — the deterministic
    * stand-in for a SoftReference shed / executor loss, so specs,
    * gates and operators can exercise the partial-miss serve on
    * demand. */
  def evictShard(eT: String, shard: Long): Unit =
    shardGraphs.removeIf(kk => kk._1 == eT && kk._4 == shard)

  /** FNV-1a over an id-ascending (id, vector-hash) stream — the cheap
    * (O(n) longs, no distance math) corpus-consistency component of
    * the [[shardGraphs]] key. The ONE implementation both serve paths
    * share: the cogroup path feeds it node triples, the warm fast
    * path feeds it the light (id, vh) pass — identical folds or the
    * cache could never hit across paths. */
  private def pairsFingerprint(pairs: Iterator[(Long, Long)]): Long = {
    var h = 0xcbf29ce484222325L
    pairs.foreach { case (id, vh) =>
      h = (h ^ id) * 0x100000001b3L
      h = (h ^ vh) * 0x100000001b3L
    }
    h
  }

  private def shardFingerprint(
      nodes: Array[(Long, Array[Float], Long)]): Long =
    pairsFingerprint(nodes.iterator.map(n => (n._1, n._3)))

  /** Scatter-gather top-k for a PROBE SET over the COMMITTED per-shard
    * graphs — the serving path a retrieval session should call. The
    * corpus+edges cogroup runs ONCE for the whole set (not once per
    * probe), each shard's graph is reconstructed at most once per job
    * — and not at all when [[shardGraphs]] already holds it from a
    * previous search at the same (index, corpus) state — and every
    * probe beam-searches the in-memory graph. Probes are a
    * serving-API argument (a session's question batch): they collect
    * to the driver and broadcast, bounded by the batch size, never by
    * the corpus. An EXPLICIT `ef` (> 0) sets the SEARCH beam to
    * max(ef, k) — a serve-time recall/latency choice on the frozen
    * graph, independent of the committed construction beam; left
    * unset (<= 0, the default) the serve uses the stored build beam,
    * so an index built wide keeps its recall through default doors.
    * Graph structure always follows the committed parameters
    * (m/ef/shards arguments are the legacy-table fallback only).
    * Returns one row per (probe, neighbor): (probeIdCol, idCol, cos),
    * top-k per probe by (cos desc, id). */
  def searchNswBatch(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame,
      probeIdCol: String, probeCol: String, k: Int,
      m: Int = 8, ef: Int = -1, shards: Int = 4): DataFrame =
    searchNswBatchAt(spark, root, emb, idCol, embCol, probeDf,
      probeIdCol, probeCol, k, m, ef, shards,
      Versioned.latestVersion(spark, nswEdgesTable(root)))

  /** [[searchNswBatch]] over the edge table AS OF `tsMillis` —
    * historical graph serving ([[loadIvfAsOf]]'s HNSW twin): the
    * committed adjacency resolves to the version current at the
    * instant and reconstructs exactly the graph that generation built
    * (the serve cache keys on (version, manifest fingerprint, shard
    * content), so historical and current serves cache independently).
    * Pair with the same-instant corpus snapshot: the graph's markers
    * prove which (id, vh) set it was built over, and a caller corpus
    * that drifted from it simply rebuilds per job (the legacy-table
    * rule) instead of serving a hybrid. */
  def searchNswBatchAsOf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame,
      probeIdCol: String, probeCol: String, k: Int,
      tsMillis: Long, ef: Int = -1): DataFrame = {
    val eT = nswEdgesTable(root)
    searchNswBatchAt(spark, root, emb, idCol, embCol, probeDf,
      probeIdCol, probeCol, k, 8, ef, 4,
      Versioned.snapshotAsOf(spark, eT, tsMillis).version)
  }

  /** Non-empty shard ids of a committed corpus version under a shard
    * count — memoized per (table, version, manifest fingerprint,
    * shards): the ONE id-column-only scan a corpus version ever pays
    * for committed serving (later warm serves are zero corpus I/O).
    * Bounded like the other memos. */
  private val committedShardSets =
    new LruMap[(String, Long, Long, Int), Array[Long]](256)

  /** Cache-key component for committed-corpus serving: the identity of
    * an immutable pinned snapshot — as strong as hashing every row,
    * because manifests reference immutable files. Salted so it can
    * never collide with the content-fingerprint scheme's fold. */
  private def corpusIdentityKey(table: String, cv: Long, cfp: Long,
      gshards: Int): Long =
    pairsFingerprint(Iterator(
      (0x636f6d6d69747464L ^ table.hashCode.toLong, cv),
      (cfp, gshards.toLong)))

  /** [[searchNswBatch]] for a COMMITTED corpus, named by table +
    * version instead of an arbitrary DataFrame — the form a serving
    * session (and the SQL door) should use. Because the corpus is a
    * pinned immutable snapshot, consistency needs NO row hashing: the
    * (table, version, manifest fingerprint) identity keys the graph
    * cache, so a WARM serve costs zero corpus I/O — probes beam-search
    * the resident graphs directly (the 2.2M rehearsal's 16 B/row light
    * pass drops to nothing; at 100 TB the warm serve cost is
    * independent of corpus size). A cold serve pays one id-column scan
    * (the memoized shard list) + the reconstruction cogroup, exactly
    * like the frame form. `corpusVersion <= 0` = latest, resolved ONCE
    * so the probe fetch and the serve read the same snapshot. */
  def searchNswBatchCommitted(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeIdCol: String, probeCol: String, k: Int,
      corpusVersion: Long = -1L, ef: Int = -1): DataFrame =
    searchNswBatchCommittedAt(spark, root, corpusTable, idCol, embCol,
      probeDf, probeIdCol, probeCol, k, corpusVersion,
      Versioned.latestVersion(spark, nswEdgesTable(root)), ef)

  /** [[searchNswBatchCommitted]] with BOTH the edge table and the
    * corpus resolved AS OF `tsMillis` — the zero-I/O-when-warm form of
    * [[searchNswBatchAsOf]]. */
  def searchNswBatchCommittedAsOf(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeIdCol: String, probeCol: String, k: Int,
      tsMillis: Long, ef: Int = -1): DataFrame =
    searchNswBatchCommittedAt(spark, root, corpusTable, idCol, embCol,
      probeDf, probeIdCol, probeCol, k,
      Versioned.snapshotAsOf(spark, corpusTable, tsMillis).version,
      Versioned.snapshotAsOf(spark, nswEdgesTable(root), tsMillis).version,
      ef)

  private def searchNswBatchCommittedAt(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeIdCol: String, probeCol: String, k: Int,
      corpusVersion: Long, ev: Long, ef: Int = -1): DataFrame = {
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"searchNswBatchCommitted: $corpusTable has no commits")
    val emb = VersionedScan.read(spark, corpusTable, cv)
    val eT = nswEdgesTable(root)
    val params =
      if (ev > 0) storedNswParams(spark, eT, ev,
        VersionedScan.read(spark, eT, ev))
      else None
    params match {
      case Some((_, _, gshards)) =>
        val cfp = Versioned.manifestFingerprint(spark, corpusTable, cv)
        val ssKey = (corpusTable, cv, cfp, gshards)
        val shardsOf = committedShardSets.get(ssKey).getOrElse {
          // one id-only scan, computed OUTSIDE the map lock
          val v = emb.select(pmod(col(idCol).cast("long"),
              lit(gshards.toLong)).as("s"))
            .distinct().collect().map(_.getLong(0)).sorted
          committedShardSets.put(ssKey, v)
          v
        }
        searchNswBatchAt(spark, root, emb, idCol, embCol, probeDf,
          probeIdCol, probeCol, k, 8, ef, gshards, ev,
          identity = Some(corpusIdentityKey(corpusTable, cv, cfp, gshards)),
          knownShards = Some(shardsOf),
          layout = freshNswLayout(spark, root, corpusTable, cv, gshards,
            cfp))
      case None =>
        // legacy table (or no index yet — let the frame path produce
        // its usual diagnostics): never cached, identity buys nothing
        searchNswBatchAt(spark, root, emb, idCol, embCol, probeDf,
          probeIdCol, probeCol, k, 8, ef, 4, ev)
    }
  }

  private def searchNswBatchAt(spark: SparkSession, root: String,
      emb: DataFrame, idCol: String, embCol: String, probeDf: DataFrame,
      probeIdCol: String, probeCol: String, k: Int,
      m: Int, ef: Int, shards: Int, ev: Long,
      identity: Option[Long] = None,
      knownShards: Option[Array[Long]] = None,
      layout: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    require(probeIdCol != idCol,
      s"probe id column '$probeIdCol' must differ from the corpus id " +
        "column — both appear in the result")
    val eT = nswEdgesTable(root)
    val edges = VersionedScan.read(spark, eT, ev)
    val (params, fp) = storedNswParamsFp(spark, eT, ev, edges)
    val (gm, gef, gshards) =
      params.getOrElse((m, if (ef > 0) ef else 32, shards))
    val probes = probeDf
      .select(col(probeIdCol).cast("long"), col(probeCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    require(probes.nonEmpty, "searchNswBatch: empty probe set")
    val bc = spark.sparkContext.broadcast(probes)
    // driver-registered, task-incremented: the adds ride back with
    // task completion, so ann_stats aggregates across executors
    val (buildsAcc, hitsAcc) = accumsFor(spark.sparkContext)
    // the SEARCH beam: an EXPLICIT ef (> 0) is the caller's serve-time
    // choice, floored at k only (a beam narrower than the result
    // cannot fill it) — callers trade recall for latency downward as
    // well as upward; UNSET (<= 0, the doors' default) serves at the
    // stored construction beam, so an index deliberately built with a
    // large ef keeps its recall through default-serving doors instead
    // of silently dropping to a fixed 32
    val beam = if (ef > 0) math.max(ef, k) else math.max(gef, k)
    val verified = params.isDefined
    // one tiny task per entry, executor-local cache lookup; None
    // reported on ANY miss so the caller can fall back — never a
    // partial answer from a half-resident batch
    def serveFromCache(entries: Array[(Long, Long)])
        : Option[Seq[(Long, Long, Double)]] = {
      val served = spark.sparkContext
        .parallelize(entries.toSeq, entries.length)
        .map { case (shard, cfp) =>
          shardGraphs.get((eT, ev, fp, shard, cfp))
            .flatMap(r => Option(r.get)) match {
            case Some((cn, g)) =>
              serveHits.incrementAndGet()
              hitsAcc.add(1L)
              val vecs = cn.map(_._2)
              val cnt = new NswAnn.DistCounter
              Some(bc.value.iterator.flatMap { case (pid, pv) =>
                NswAnn.searchLocal(g, vecs, pv, beam, cnt)
                  .take(k).map { case (i, cos) => (pid, cn(i)._1, cos) }
              }.toVector)
            case None => None
          }
        }.collect()
      if (served.forall(_.isDefined)) Some(served.toSeq.flatMap(_.get))
      else None
    }
    def serveCogroup(embSrc: DataFrame, edgesSrc: DataFrame): DataFrame =
      cogroupShards(embSrc, idCol, embCol, edgesSrc, gshards) {
        (shard, nodes, edgeRows) =>
          val (cn, g) =
            if (!verified) {
              // a pre-params legacy table's markers carry ids, not
              // hashes — it cannot PROVE the stored adjacency matches
              // current vector values (or that gm/gef match its build),
              // so legacy searches rebuild per job and never cache; one
              // ensureNsw migrates the table and restores cached serve
              serveBuilds.incrementAndGet()
              buildsAcc.add(1L)
              (nodes, resumeShard(nodes, edgeRows, gm, gef,
                new NswAnn.DistCounter, vhMarkers = false))
            } else {
              val key = (eT, ev, fp, shard,
                identity.getOrElse(shardFingerprint(nodes)))
              val cached = shardGraphs.get(key).flatMap(r => Option(r.get))
              cached.foreach { _ =>
                serveHits.incrementAndGet()
                hitsAcc.add(1L)
              }
              cached.getOrElse {
                  serveBuilds.incrementAndGet()
                  buildsAcc.add(1L)
                  val built = (nodes, resumeShard(nodes, edgeRows, gm, gef,
                    new NswAnn.DistCounter))
                  shardGraphs.put(key,
                    new java.lang.ref.SoftReference(built))
                  built
                }
            }
          val vecs = cn.map(_._2)
          val cnt = new NswAnn.DistCounter
          bc.value.iterator.flatMap { case (pid, pv) =>
            NswAnn.searchLocal(g, vecs, pv, beam, cnt)
              .take(k).map { case (i, cos) => (pid, cn(i)._1, cos) }
          }
      }.toDF(probeIdCol, idCol, "cos")
    // the driver fast path can be disabled by conf — the multi-JVM
    // SIMULATION hook: a 100-executor cluster is exactly a session
    // where this JVM's map is empty while executor caches are warm,
    // and the spec that pins what such a session pays warm drives the
    // cogroup path below with caches intact through this flag
    val fastPathOn = spark.conf
      .get("spark.graft.ann.residencyFastPath", "true") != "false"
    if (verified && fastPathOn) {
      // WARM FAST PATH — the 2.2M-row rehearsal (PLANS r12) showed a
      // fully-cached serve still paying the full-vector cogroup just
      // to re-derive the consistency fingerprint. The vectors are only
      // needed on RECONSTRUCTION (the cached nodes carry them), so the
      // check shrinks to a light pass shuffling (id, vh, shard) —
      // ~16 bytes/row instead of the whole embedding — and when every
      // shard is resident at this exact (index generation, corpus
      // content) state the probes beam-search the cached graphs in one
      // tiny task per shard, zero vector I/O. ANY miss (first serve, a
      // SoftReference shed under memory pressure, a task landing on an
      // executor that never built the shard) falls back to the full
      // cogroup below, which rebuilds and re-caches — results are
      // identical either way (same cached nodes, same beam search;
      // the batch≡single and zero-on-repeat pins in AnnIndexSpec run
      // through this path).
      //
      // CLUSTER SCOPE — the honest cost model, stated precisely. The
      // pre-checks read the SERVING JVM's cache map, so the fast path
      // engages where that map is the real one: local mode and
      // driver-colocated serving sessions. On a multi-executor
      // cluster the driver's map is empty, the fast path self-disables
      // (the generation guard sees no keys), and a WARM serve pays:
      // the corpus+edges COGROUP SHUFFLE (for a committed corpus with
      // a fresh shard layout, a shard-pruned read; else corpus-sized
      // I/O) — but ZERO graph reconstruction: the cogroup's task-side
      // lookups hit each executor's own cache (the standard
      // shard-serving residency model; the residencyFastPath=false
      // spec pins exactly this shuffle-but-no-rebuild behavior in one
      // JVM). Closing the remaining shuffle would need placement-aware
      // cache fill (shard→executor-pinned build tasks) — deliberately
      // NOT attempted: Dataset cogroup tasks place by shuffle
      // partition, and a bolted-on preferredLocations serve layer
      // could never converge to where the builds actually cached.
      // The generation guard also spares every COLD serve the light
      // pass: no key of this (table, version, manifest) generation in
      // the map → nothing can possibly be warm.
      val anyOfGeneration = shardGraphs.keys
        .exists(kk => kk._1 == eT && kk._2 == ev && kk._3 == fp)
      // identity route (committed-corpus serving): the corpus is a
      // pinned immutable snapshot, so its (table, version, manifest
      // fingerprint) identity IS its content — no row scan needed at
      // all; the shard list arrives memoized from the wrapper
      val light: Array[(Long, Long)] = (identity, knownShards) match {
        case (Some(ik), Some(ss)) => ss.map(sh => (sh, ik))
        case _ if !anyOfGeneration => Array.empty
        case _ => emb.select(col(idCol).cast("long").as("id"),
            nswVh(embCol).as("vh"))
          .withColumn("shard", pmod(col("id"), lit(gshards.toLong)))
          .as[(Long, Long, Long)]
          .groupByKey(_._3)
          .mapGroups { (shard, it) =>
            (shard, pairsFingerprint(
              it.map(t => (t._1, t._2)).toArray.sortBy(_._1).iterator))
          }.collect()
      }
      // per-shard residency (driver pre-check; the task-side lookup
      // below is the executor-local truth): fully-resident serves skip
      // all I/O, and a PARTIAL miss with a fresh shard layout reads
      // only the missing shards' files — never all-or-nothing
      val (resident, missing) = light.partition { case (shard, cfp) =>
        shardGraphs.get((eT, ev, fp, shard, cfp)).exists(_.get() != null)
      }
      if (light.nonEmpty && missing.isEmpty) {
        serveFromCache(light) match {
          case Some(rows) => return perProbeTopK(
            spark.createDataset(rows).toDF(probeIdCol, idCol, "cos"),
            probeIdCol, idCol, k)
          case None => () // raced a SoftReference shed — full path below
        }
      } else if (resident.nonEmpty && missing.nonEmpty && layout.isDefined) {
        // PARTIAL MISS on a committed corpus with a fresh shard
        // layout: resident shards beam-search their cached graphs
        // (zero I/O), and the rebuild cogroup scans ONLY the missing
        // shards — the layout's per-file shard stats prune the rest
        // of the corpus out of the read. Rebuilt graphs re-cache
        // under the identity key, so the next serve is fully warm.
        serveFromCache(resident) match {
          case Some(cachedRows) =>
            val missSet = missing.map(_._1).toSeq
            val fetched = serveCogroup(
              layout.get.filter(col("shard").isin(missSet: _*)),
              edges.filter(col("shard").isin(missSet: _*)))
            return perProbeTopK(
              spark.createDataset(cachedRows)
                .toDF(probeIdCol, idCol, "cos")
                .unionByName(fetched),
              probeIdCol, idCol, k)
          case None => () // pre-check raced — full path below
        }
      }
    }
    perProbeTopK(serveCogroup(emb, edges), probeIdCol, idCol, k)
  }

  /** Per-probe global top-k over per-shard candidates: a PARTITIONED
    * window (one partition per probe), never a global funnel — the
    * shared tail of both serve paths. */
  private def perProbeTopK(local: DataFrame, probeIdCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(probeIdCol).orderBy(desc("cos"), col(idCol))
    local.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
      .orderBy(col(probeIdCol), desc("cos"), col(idCol))
  }

  /** Single-probe convenience over [[searchNswBatch]] — one probe
    * rides the batch path (same reconstruction cache), returning
    * (idCol, cos) exactly as [[NswAnn.search]] does. */
  def searchNsw(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probe: Array[Float], k: Int,
      m: Int = 8, ef: Int = -1, shards: Int = 4): DataFrame = {
    import spark.implicits._
    val probeDf = Seq((0L, probe)).toDF("__probe_id", "__probe")
    searchNswBatch(spark, root, emb, idCol, embCol, probeDf,
      "__probe_id", "__probe", k, m, ef, shards)
      .drop("__probe_id")
  }

  /** Full edge set for the current corpus: per shard, resume (or
    * rebuild) the graph, then serialize markers + ordered adjacency,
    * plus the one build-parameter row. */
  private def nswEdgeSet(emb: DataFrame, idCol: String, embCol: String,
      m: Int, ef: Int, shards: Int, prior: Option[DataFrame]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val priorEdges = prior.getOrElse(
      Seq.empty[(Long, Long, Int, Int, Long)]
        .toDF("shard", "src", "layer", "rank", "dst"))
    cogroupShards(emb, idCol, embCol, priorEdges, shards) {
      (shard, nodes, edgeRows) =>
        val cnt = new NswAnn.DistCounter
        val g = resumeShard(nodes, edgeRows, m, ef, cnt)
        val markers = nodes.iterator.map(n => (shard, n._1, -1, 0, n._3))
        val links = g.adj.iterator.zipWithIndex.flatMap { case (layers, i) =>
          layers.iterator.zipWithIndex.flatMap { case (ns, layer) =>
            ns.iterator.zipWithIndex.map { case (j, rank) =>
              (shard, nodes(i)._1, layer, rank, nodes(j)._1)
            }
          }
        }
        markers ++ links
    }.toDF("shard", "src", "layer", "rank", "dst")
      .unionByName(paramsRow(spark, m, ef, shards))
  }

  /** Co-partition vectors and index edges by shard and run `f` once
    * per shard with the sorted node array (id, vector, vector-hash) +
    * its edge rows. The params row's shard -1 carries no nodes and is
    * skipped. */
  private def cogroupShards[T: org.apache.spark.sql.Encoder](
      emb: DataFrame, idCol: String, embCol: String,
      edges: DataFrame, shards: Int)(
      f: (Long, Array[(Long, Array[Float], Long)],
          Array[(Long, Long, Int, Int, Long)]) => Iterator[T])
      : org.apache.spark.sql.Dataset[T] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vds = emb.select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<float>").as("v"))
      .withColumn("vh", xxhash64(col("v")))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
      .as[(Long, Array[Float], Long, Long)]
      .groupByKey(_._4)
    val eds = edges
      .select(col("shard").cast("long"), col("src").cast("long"),
        col("layer").cast("int"), col("rank").cast("int"),
        col("dst").cast("long"))
      .as[(Long, Long, Int, Int, Long)]
      .groupByKey(_._1)
    vds.cogroup(eds) { (shard, vit, eit) =>
      val nodes = vit.toArray.map(t => (t._1, t._2, t._3)).sortBy(_._1)
      if (nodes.isEmpty) Iterator.empty
      else f(shard, nodes, eit.toArray)
    }
  }

  /** Reconstruct a shard's graph from stored edges and CONTINUE the
    * insertion-ordered build for any ids past the indexed prefix.
    * Stored adjacency is usable as a resume prefix only when the
    * indexed ids are EXACTLY the ascending-id prefix of the current
    * shard contents AND every indexed vector still hashes to what the
    * marker recorded (an UPDATEd embedding invalidates the graph built
    * over the old value); otherwise (interleaved inserts, foreign or
    * deleted rows, changed vectors, a pre-vh legacy index whose
    * markers carry ids) the shard rebuilds from scratch — both paths
    * land on the same graph a full build produces. */
  private def resumeShard(nodes: Array[(Long, Array[Float], Long)],
      edgeRows: Array[(Long, Long, Int, Int, Long)], m: Int, ef: Int,
      cnt: NswAnn.DistCounter, vhMarkers: Boolean = true)
      : NswAnn.HnswGraph = {
    val ids = nodes.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val oldVh = edgeRows.iterator.filter(_._3 == -1)
      .map(e => e._2 -> e._5).toMap
    val p = ids.segmentLength(oldVh.contains, 0)
    // vhMarkers=false (pre-params legacy markers carry ids): the
    // prefix is NEVER usable — there is no proof the stored adjacency
    // was built over the current vector values or these (m, ef)
    val prefixUsable = vhMarkers && oldVh.nonEmpty && p == oldVh.size &&
      oldVh.keysIterator.forall(idx.contains) &&
      (0 until p).forall(i => oldVh(ids(i)) == nodes(i)._3)
    val prefix =
      if (!prefixUsable) None
      else {
        val adj = Array.tabulate(p)(i =>
          Array.fill(NswAnn.levelOf(ids(i), m) + 1)(
            scala.collection.mutable.ArrayBuffer.empty[Int]))
        edgeRows.filter(e => e._3 >= 0)
          .sortBy(e => (e._2, e._3, e._4))
          .foreach { case (_, src, layer, _, dst) =>
            for (si <- idx.get(src); di <- idx.get(dst))
              if (si < p && layer < adj(si).length) adj(si)(layer) += di
          }
        Some(adj.map(_.map(_.toArray)))
      }
    NswAnn.build(ids, nodes.map(_._2), m, ef, cnt, prefix)
  }

  /** [[Pq.searchIvfPqBatch]] over the COMMITTED artifacts — the
    * probe-SET serving path on the quantized tier (the caller's `m`
    * is likewise ignored: codes are only comparable under their
    * training-time subspace count). */
  def searchIvfPqBatch(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probes: DataFrame,
      probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, pool: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    val (books, codes, bv) = loadPqChecked(spark, root)
    Pq.searchIvfPqBatch(emb, asg, cents, codes, books, idCol, embCol,
      probes, probeIdCol, probeCol, trainedM(spark, root, books, bv),
      k, nProbe, pool)
  }

  /** [[searchIvfPqBatch]] over all four artifacts AS OF `tsMillis` —
    * the quantized batch door's historical twin. */
  def searchIvfPqBatchAsOf(spark: SparkSession, root: String,
      emb: DataFrame, idCol: String, embCol: String, probes: DataFrame,
      probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, pool: Int, tsMillis: Long): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    val (books, codes, bv) = loadPqAsOfChecked(spark, root, tsMillis)
    Pq.searchIvfPqBatch(emb, asg, cents, codes, books, idCol, embCol,
      probes, probeIdCol, probeCol, trainedM(spark, root, books, bv),
      k, nProbe, pool)
  }

  /** [[Pq.searchIvfPq]] for a COMMITTED corpus — the quantized tier's
    * committed-serving form: the ADC scan over the slim codes table is
    * the tier's designed cost, but the FULL-PRECISION pool fetch
    * (`corpus ⋈ pool ids`) need not scan the corpus at all — the pool
    * ranking is collected (≤ `pool` ids, a serving-bounded action) and
    * the fetch becomes a LITERAL id-IN scan that manifest-prunes to
    * the files actually holding pool rows (the corpus is id-clustered
    * by its commit key): at 100 TB the fetch touches ≤ pool files
    * instead of every file. Results are exactly [[searchIvfPq]]'s —
    * the collected ranking is the same `ORDER BY adist, id LIMIT pool`
    * the in-plan form computes (pinned in AnnIndexSpec). */
  def searchIvfPqCommitted(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nProbe: Int,
      pool: Int, corpusVersion: Long = -1L,
      allowed: Option[DataFrame] = None): DataFrame = {
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"searchIvfPqCommitted: $corpusTable has no commits")
    val (cents, asg) = loadIvf(spark, root)
    val (books, codes, bv) = loadPqChecked(spark, root)
    ivfPqSingleLiteralized(spark, corpusTable, cv, idCol, embCol,
      probeDf, probeCol, cents, asg, books, codes, k, nProbe, pool,
      freshPqLists(spark, root), allowed,
      mTrained = trainedM(spark, root, books, bv))
  }

  /** [[searchIvfPqCommitted]] with all four artifacts AND the corpus
    * resolved AS OF `tsMillis` — historical single-probe serving on
    * the quantized tier keeps the file-pruned pool fetch. */
  def searchIvfPqCommittedAsOf(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nProbe: Int,
      pool: Int, tsMillis: Long,
      allowed: Option[DataFrame] = None): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    val (books, codes, bv) = loadPqAsOfChecked(spark, root, tsMillis)
    ivfPqSingleLiteralized(spark, corpusTable,
      Versioned.snapshotAsOf(spark, corpusTable, tsMillis).version,
      idCol, embCol, probeDf, probeCol, cents, asg, books, codes,
      k, nProbe, pool, freshPqListsAsOf(spark, root, tsMillis), allowed,
      mTrained = trainedM(spark, root, books, bv))
  }

  private def ivfPqSingleLiteralized(spark: SparkSession,
      corpusTable: String, cv: Long, idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String,
      cents: DataFrame, asg: DataFrame, books: DataFrame,
      codes: DataFrame, k: Int, nProbe: Int, pool: Int,
      pqLists: Option[DataFrame] = None,
      allowed: Option[DataFrame] = None, mTrained: Int = -1): DataFrame = {
    import graft.functions.{vec_cosine_sim, vec_l2}
    val emb = VersionedScan.read(spark, corpusTable, cv)
    val m = if (mTrained > 0) mTrained else codebookM(books)
    val probe = probeDf.select(col(probeCol).as("__probe"))
    // routing collects the nProbe chosen lists (k-row ranking, a
    // serving-bounded action) so a fresh pq_lists layout can carry
    // LITERAL cid predicates into the ADC scan
    val chosen = broadcast(cents).crossJoin(broadcast(probe))
      .select(col("cid"), vec_l2(col("centroid"), col("__probe")).as("cdist"))
      .orderBy(col("cdist"), col("cid")).limit(nProbe)
      .select("cid").collect().map(_.getLong(0)).toSeq
    // raw codes look up one probe table keyed (sub, code); residual
    // codes look up per-probed-list residual tables keyed by the
    // candidate's own list id — same literal-cid pruning either way
    val (dt, dtKeys) =
      if (!Pq.isResidual(books))
        (Pq.distanceTable(probe, "__probe", books, m), Seq("sub", "code"))
      else
        (Pq.residualTableSingle(probe, "__probe",
          cents.filter(col("cid").isin(chosen: _*)), books, m),
          Seq("cid", "sub", "code"))
    // the ADC scan: the fresh cid-clustered layout manifest-prunes to
    // the chosen lists' files (~nProbe/k of the codes); else the join
    // form filters the same cids in-plan — identical candidates. A
    // filter applies HERE, before the pool cut: post-pool filtering
    // would under-fill k whenever the filter is selective (the
    // anti-pattern FilteredAnnSpec pins)
    val codesSrc = restrict(pqLists match {
      case Some(pl) => pl.filter(col("cid").isin(chosen: _*))
      case None => codes.join(asg, idCol)
        .filter(col("cid").isin(chosen: _*))
    }, idCol, allowed)
    // the pool ranking collects — bounded by `pool`, never the corpus —
    // so the fetch below carries literal id predicates the manifest
    // can prune on. Ids are read GENERICALLY (the corpus id column may
    // be any integral type — Pq.searchIvfPq is type-agnostic and this
    // path must match); keeping the native values also keeps the isin
    // literals in the column's own type, exactly what the stats prune on
    val poolIds = codesSrc
      .join(broadcast(dt), dtKeys)
      .groupBy(idCol)
      .agg(sum(col("pdist")).as("adist"))
      .orderBy(col("adist"), col(idCol)).limit(pool)
      .select(idCol).collect().map(_.get(0)).toSeq
    emb.filter(col(idCol).isin(poolIds: _*))
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        vec_cosine_sim(col(embCol), col("__probe")).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** [[Pq.searchIvfPqBatch]] for a COMMITTED corpus — the batch twin
    * of [[searchIvfPqCommitted]], and the close of the last
    * corpus-scanning serving path: the per-probe pool ranking is
    * COLLECTED (≤ probes × pool rows — the ADC scan over the slim
    * codes table is the tier's designed cost, and the collect is
    * bounded by the serving batch, never the corpus), so the
    * full-precision fetch becomes ONE literal id-IN scan that
    * manifest-prunes to the files actually holding pool rows. The
    * in-plan form's `emb ⋈ broadcast(pooled)` read EVERY corpus file
    * for the same ≤ probes × pool rows — at 100 TB that was a full
    * corpus scan per question batch. Results are exactly
    * [[Pq.searchIvfPqBatch]]'s (same ranking, same ties — pinned in
    * AnnIndexSpec). */
  def searchIvfPqBatchCommitted(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, pool: Int,
      corpusVersion: Long = -1L,
      allowed: Option[DataFrame] = None): DataFrame = {
    val cv = if (corpusVersion > 0) corpusVersion
      else Versioned.latestVersion(spark, corpusTable)
    require(cv > 0, s"searchIvfPqBatchCommitted: $corpusTable has no commits")
    val (cents, asg) = loadIvf(spark, root)
    val (books, codes, bv) = loadPqChecked(spark, root)
    ivfPqBatchLiteralized(spark, corpusTable, cv, idCol, embCol,
      probes, probeIdCol, probeCol, cents, asg, books, codes,
      k, nProbe, pool, freshPqLists(spark, root), allowed = allowed,
      mTrained = trainedM(spark, root, books, bv))
  }

  /** [[searchIvfPqBatchCommitted]] with all four artifacts AND the
    * corpus resolved AS OF `tsMillis` — historical serving keeps the
    * file-pruned fetch: the literalized pool ids prune any pinned
    * snapshot's manifest, current or not, so "re-run last week's
    * question batch" costs ≤ probes × pool files too. */
  def searchIvfPqBatchCommittedAsOf(spark: SparkSession, root: String,
      corpusTable: String, idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int, pool: Int, tsMillis: Long,
      allowed: Option[DataFrame] = None): DataFrame = {
    val (cents, asg) = loadIvfAsOf(spark, root, tsMillis)
    val (books, codes, bv) = loadPqAsOfChecked(spark, root, tsMillis)
    ivfPqBatchLiteralized(spark, corpusTable,
      Versioned.snapshotAsOf(spark, corpusTable, tsMillis).version,
      idCol, embCol, probes, probeIdCol, probeCol,
      cents, asg, books, codes, k, nProbe, pool,
      freshPqListsAsOf(spark, root, tsMillis),
      door = "searchIvfPqBatchCommittedAsOf", allowed = allowed,
      mTrained = trainedM(spark, root, books, bv))
  }

  /** Shared core of the committed batch PQ forms: rank through the
    * given artifacts, collect the bounded pool, fetch full-precision
    * rows via a literal id-IN scan of the pinned corpus snapshot. */
  private def ivfPqBatchLiteralized(spark: SparkSession,
      corpusTable: String, cv: Long, idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      cents: DataFrame, asg: DataFrame, books: DataFrame,
      codes: DataFrame, k: Int, nProbe: Int, pool: Int,
      pqLists: Option[DataFrame] = None,
      door: String = "searchIvfPqBatchCommitted",
      allowed: Option[DataFrame] = None, mTrained: Int = -1): DataFrame = {
    import graft.functions.vec_cosine_sim
    import org.apache.spark.sql.expressions.Window
    require(probeIdCol != idCol,
      s"probe id column '$probeIdCol' must differ from the corpus id " +
        "column — both appear in the result")
    val pidType = requireIntegralPid(probes, probeIdCol, door)
    val emb = VersionedScan.read(spark, corpusTable, cv)
    val m = if (mTrained > 0) mTrained else codebookM(books)
    val p = probes.select(col(probeIdCol).cast("long").as("__pid"),
      col(probeCol).as("__probe"))
    // with a fresh cid-clustered layout the routing pairs collect too
    // (probes × nProbe — serving-bounded) so the ADC scan carries
    // literal cid predicates and manifest-prunes to the probed lists'
    // files; else the join form computes identical candidates in-plan
    // a filter applies BEFORE the pool cut (post-pool filtering would
    // under-fill k — the FilteredAnnSpec anti-pattern): the restricted
    // candidate set rides the same pruned/join ADC either way
    val pooled = pqLists match {
      case Some(pl) =>
        val listsDf = Pq.probeLists(cents, p, nProbe)
        val pairRows = listsDf.collect()
        val chosenCids = pairRows.map(_.getLong(1)).distinct.toSeq
        val pairsLists = spark.createDataFrame(
          java.util.Arrays.asList(pairRows: _*), listsDf.schema)
        Pq.adcPool(
          restrict(pl.filter(col("cid").isin(chosenCids: _*)), idCol,
            allowed),
          broadcast(pairsLists), cents, books, idCol, p, m, pool)
      case None =>
        Pq.pooledRanking(asg, cents,
          restrict(codes, idCol, allowed), books, idCol,
          p, m, nProbe, pool)
    }
    // the per-probe pool ranking COLLECTS — bounded by probes × pool,
    // the same serving-bounded action the single-probe form uses — so
    // the fetch below carries literal id predicates the manifest can
    // prune on; ids keep the codes column's own type (= the corpus
    // id type they were encoded from)
    val sel = pooled.select(col("__pid"), col(idCol))
    val pairs = sel.collect()
    val ids = pairs.map(_.get(1)).distinct.toSeq
    val pairsDf = spark.createDataFrame(
      java.util.Arrays.asList(pairs: _*), sel.schema)
    val wk = Window.partitionBy("__pid").orderBy(desc("score"), col(idCol))
    emb.filter(if (ids.isEmpty) lit(false) else col(idCol).isin(ids: _*))
      .join(broadcast(pairsDf), idCol)
      .join(broadcast(p), "__pid")
      .select(col("__pid"), col(idCol),
        vec_cosine_sim(col(embCol), col("__probe")).as("score"))
      .withColumn("__rk", row_number().over(wk))
      .filter(col("__rk") <= k).drop("__rk")
      .select(col("__pid").cast(pidType).as(probeIdCol), col(idCol),
        col("score"))
      .orderBy(col(probeIdCol), desc("score"), col(idCol))
  }

  /** [[Pq.searchIvfPq]] over the COMMITTED IVF routing + PQ codes —
    * the full billion-scale serving layout with every build artifact
    * loaded, none rebuilt. The subspace count is DERIVED from the
    * committed codebooks (the caller's `m` is ignored when codebooks
    * exist — codes are only comparable under their training-time m). */
  def searchIvfPq(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      m: Int, k: Int, nProbe: Int, pool: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    val (books, codes, bv) = loadPqChecked(spark, root)
    Pq.searchIvfPq(emb, asg, cents, codes, books, idCol, embCol,
      probeDf, probeCol, trainedM(spark, root, books, bv), k, nProbe, pool)
  }
}
