package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.ZOrder
import graft.sources.{Lake, Tables}
import graft.text.TextFunctions

/** Training-data curation & layout operators beyond the reference
  * surface — the operations a 100 TB pretraining pipeline runs between
  * "documents exist" and "batches reach the trainer":
  *
  *  - q53: Z-order (Morton) layout keys for two-dimensional data
  *    skipping ([[graft.functions.ZOrder]], [[Lake.zorderWrite]]).
  *  - q54: context-window packing — greedy in-order binning of
  *    documents into fixed token budgets, partitioned by source so the
  *    packing shuffle is per-source, never a global sort.
  *  - q55: deterministic stratified sampling — per-source rates applied
  *    via an md5 hash gate, so the sample is reproducible row-exact on
  *    any cluster size (no `rand()`), and mirrored exactly in SQL.
  *  - q56: sharded export — hash-sharded, shard-partitioned parquet
  *    round-trip, the layout handed to a data loader.
  *  - q57: table profiler — per-column non-null/distinct/min/max, one
  *    pruned-scan union branch per column.
  *  - q58: deterministic train/val/test split by md5 hash range.
  *  - t11: percentile quality-band filter (rank-based decile trim).
  *  - p05: the composed pipeline — quality gate → exact dedup → split
  *    → packing → bin manifest, one declarative plan.
  *
  * All are oracle-gated (DuckDB SQL mirrors below); where the Spark
  * expression and the SQL must agree bit-for-bit on hash math the SQL
  * is GENERATED from the same Scala spec (ZOrder.sql16, mdBucket).
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(tag: String): String =
    Files.createDirectories(Paths.get("target", "curation",
      tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12))).toString

  /** Deterministic hash bucket in [0, 1000): first 8 hex chars of
    * md5(key-as-string) read as an integer, mod 1000. Stable across
    * engines, partitionings and cluster sizes — the reproducible
    * alternative to `rand()` sampling. Mirrored by [[mdBucketSql]]. */
  def mdBucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000L

  def mdBucketSql(key: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::UBIGINT % 1000 AS BIGINT)"

  /** q55's per-source keep-rate in permille: sources `src0`..`src19`
    * get (n % 9 + 1) * 100 ∈ {100..900} — a fixed mixing-weight table
    * expressed as arithmetic so both engines derive it identically. */
  private def rateMillis(sourceNum: Column): Column =
    (sourceNum % 9 + 1) * 100

  /** Greedy in-order packing-bin assignment, shared VERBATIM by q54,
    * p06 and m04 (each pairs it with the same DuckDB window mirror):
    * bin = floor(cost-before-this-row / budget) over a source-
    * partitioned, doc_id-ordered cumulative sum — an item whose
    * cumulative start crosses a bin boundary opens the next bin. The
    * window partitions by source, so packing is one source-keyed
    * shuffle, never a global sort. */
  private[operators] def packBins(df: DataFrame, costCol: String,
      budget: Long, out: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, floor((sum(costCol).over(w) - col(costCol)) / budget))
  }

  /** Tempered (α=0.5) domain-mixture keep-rates at a half-corpus
    * character budget — shared VERBATIM by t17 and the p06 pipeline.
    * Input needs (source, n_chars) rows; output is one
    * (r_source, w, permille) row per source, broadcast-sized.
    * Cross-engine determinism: the sqrt weight is rounded to an
    * INTEGER per source before the global sums, so every cross-row sum
    * is integer arithmetic; the only double math is one sqrt and one
    * division per source. The sources-sized localCheckpoint stops the
    * totals aggregation from running once for the global sums and once
    * for the rates. target_s = (T/2)·w_s/W; permille_s =
    * round(1000·target_s/tot_s) = round(500.0·T·w/(W·tot_s)), capped
    * at 1000. */
  private[operators] def temperedRates(docs: DataFrame): DataFrame = {
    // a zero-character source has w=0 and its permille is 0/0 = NaN —
    // Spark 4's ANSI cast of NaN to long throws at runtime (and the
    // DuckDB mirror errors the same way), so degenerate sources drop
    // out HERE and the mirrored HAVING keeps both engines aligned
    val tot = docs.groupBy("source").agg(sum("n_chars").as("tot_chars"))
      .filter(col("tot_chars") > 0)
      .withColumn("w", round(sqrt(col("tot_chars")), 0).cast("long"))
      .localCheckpoint(true)
    val glob = tot.agg(sum(col("w")).as("big_w"), sum(col("tot_chars")).as("t"))
    tot.crossJoin(broadcast(glob))
      .withColumn("permille",
        least(lit(1000L),
          round(lit(500.0) * col("t") * col("w") / (col("big_w") * col("tot_chars")), 0)
            .cast("long")))
      .select(col("source").as("r_source"), col("w"), col("permille"))
  }

  /** t02's quality score per non-empty document — shared by the exact
    * (t11) and approx-percentile (t15) band tiers so both filter the
    * SAME scored population. */
  private[operators] def qualityScored(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
    val n = size(TextFunctions.tokens(col("text"))).cast("double")
    val punctRatio = TextFunctions.punctCount(col("text")).cast("double") /
      length(col("text")).cast("double")
    docs.select(col("doc_id"), col("source"),
      round(least(lit(1.0), n / 100.0) * (lit(1.0) - punctRatio), 4).as("q"))
  }

  /** EXACT decile band trim, distributed — keeps the rows whose global
    * rank by (q, doc_id) lies in (n/10, n - n/10], bit-identical to a
    * `row_number() OVER (ORDER BY q, doc_id)` filter but without the
    * single-task WindowExec funnel: the oracle's global rank is
    * reproduced TeraSort-style — range partition on (q, doc_id)
    * (sampled boundaries, parallel per-partition sorts), then an
    * O(partitions) size pass whose prefix sums turn each partition's
    * local index into the exact global rank. (q, doc_id) is a total
    * order (doc_id unique), so the kept band is identical wherever the
    * range boundaries land — RankEquivSpec pins the equivalence against
    * the window form. Driver-side data = one long per partition; the
    * band filter is per-partition arithmetic. This is the rare genuine
    * mapPartitions case: Catalyst has no distributed exact-rank
    * operator, and both passes are per-partition imperative loops.
    *
    * `finish` runs over the kept rows while the sorted frame is still
    * persisted (MEMORY_AND_DISK — pass 2 must not pay the
    * scan+score+sort again; at 100 TB the frame spills to local disk
    * rather than re-sorting); its result is materialized eagerly
    * (small by contract: an aggregate) before the persist is dropped.
    *
    * AVAILABILITY CAVEAT: the returned frame is localCheckpoint'ed —
    * lineage is CUT (deliberately: the offsets were computed against
    * one specific materialization, and a silent recompute against a
    * moved source could mis-rank), so checkpoint blocks lost to a
    * later executor failure FAIL the read instead of recomputing. The
    * contract is land-or-retry: consume the result promptly (commit it
    * to a table, collect the aggregate) and re-run the closure on
    * block-lost failure; a long-lived cluster job wanting
    * survive-executor-loss durability should write the kept band to a
    * table (reliable storage) instead of holding this handle. */
  private[graft] def exactDecileBand(s: SparkSession, scored: DataFrame)(
      finish: DataFrame => DataFrame): DataFrame = {
    val sorted = scored
      .repartitionByRange(col("q"), col("doc_id"))
      .sortWithinPartitions("q", "doc_id")
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Long arithmetic end to end: Iterator.size and zipWithIndex are
      // Int-valued and would silently wrap past 2^31 rows in one
      // partition — exactly the regime this function exists for
      val sizes = rdd.mapPartitionsWithIndex { (i, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator((i, c))
      }.collect().toMap
      val offsets = new Array[Long](rdd.getNumPartitions)
      var acc = 0L
      offsets.indices.foreach { i => offsets(i) = acc; acc += sizes.getOrElse(i, 0L) }
      val nn = acc
      val lo = nn / 10 // drop ranks 1..lo and hi+1..nn, keep (lo, hi]
      val hi = nn - nn / 10
      val bOff = s.sparkContext.broadcast(offsets)
      val kept = rdd.mapPartitionsWithIndex { (i, it) =>
        var rank = bOff.value(i) // global rank of the previous row
        it.filter { _ => rank += 1; rank > lo && rank <= hi }
      }
      try finish(s.createDataFrame(kept, sorted.schema)).localCheckpoint(true)
      // the eager checkpoint above is the last read of the offsets —
      // destroy the broadcast rather than leaving it to GC pressure
      finally bOff.destroy()
    } finally rdd.unpersist(blocking = false)
  }

  val queries: Map[String, Q] = Map(
    // q53: Morton-bucket layout stats — the zkey interleaves
    // (l_partkey, l_suppkey); bucketing by the top bits shows the
    // clustering a zorderWrite lands on disk (per-bucket ranges tight
    // in BOTH dimensions). Pure codegen'd integer expressions.
    "q53_zorder_key" -> ((s, d) => {
      val z = ZOrder.interleave16(col("l_partkey"), col("l_suppkey"))
      Tables.lineitem(s, d)
        .select(shiftrightunsigned(z, 16).as("z_bucket"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy("z_bucket")
        .agg(count(lit(1)).as("cnt"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .orderBy("z_bucket")
    }),

    // q54: context packing — greedy in-order fill of 512-token bins,
    // per source. bin = floor(tokens-before-this-doc / budget): a doc
    // whose cumulative start crosses a bin boundary opens the next bin.
    // The window partitions by source — at 100 TB each source packs
    // independently (one shuffle keyed by source), and the trainer
    // consumes (source, bin) groups; there is NO global ordering.
    "q54_context_packing" -> ((s, d) => {
      val budget = 512L
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
        .select(col("doc_id"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
      packBins(docs, "toks", budget, "bin")
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tot_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "bin")
    }),

    // p06: END-TO-END corpus curation — the round-7 primitives composed
    // into the pipeline a pretraining data team actually runs:
    // (1) passage-level exact-dup gate (Dedup.passageChunks — the SAME
    // chunker d10 gates, shared so the composition cannot drift; drop
    // documents whose duplicated-passage share is ≥20%), (2) tempered
    // α=0.5 domain-mixture resample over the CLEANED corpus
    // (temperedRates — t17's recipe, thresholds recomputed post-dedup;
    // order matters and is part of the contract), (3) 512-token context
    // packing of the survivors (q54's in-order bin fill). One chunk-
    // keyed shuffle pair for the dedup gate, a sources-sized broadcast
    // for the mixture, one source-keyed window for the packing. Cost
    // note: the chunk subplan evaluates TWICE before the doc-level
    // checkpoint (dup-set build + probe side — the exchanges don't
    // canonicalize equal, so ReuseExchange can't dedupe them); the
    // checkpoint then stops the mixture and packing branches from
    // re-running it, and a corpus-sized chunk checkpoint is the
    // deliberately-avoided alternative.
    "p06_corpus_curation" -> ((s, d) => {
      val budget = 512L
      val chunks = graft.dedup.Dedup.passageChunks(
        Tables.documents(s, d), Seq("source", "n_chars"))
      val dupTexts = graft.dedup.Dedup.duplicatedPassages(chunks)
      val clean = chunks
        .join(dupTexts.withColumn("__dup", lit(1)), Seq("chunk"), "left")
        .groupBy("doc_id", "source")
        .agg(max("n_chars").as("n_chars"), max("n_toks").as("n_toks"),
          count(lit(1)).as("n_chunks"), count(col("__dup")).as("n_dup"))
        .filter(col("n_dup") * 5 < col("n_chunks"))
        .localCheckpoint(true)
      val kept = clean
        .join(broadcast(temperedRates(clean)), col("source") === col("r_source"))
        .filter(mdBucket(col("doc_id")) < col("permille"))
      packBins(kept, "n_toks", budget, "bin")
        .groupBy("source")
        .agg(max(col("permille")).as("permille"), count(lit(1)).as("n_kept"),
          sum("n_toks").cast("long").as("toks_kept"),
          (max("bin") + 1).cast("long").as("n_bins"))
        .orderBy("source")
    }),

    // q55: deterministic stratified sample — keep a doc iff its hash
    // bucket clears the source's rate. Reproducible row-exact (the
    // oracle replays the identical gate); per-source keep counts and
    // volume land within binomial noise of rate × 25 docs.
    "q55_stratified_sample" -> ((s, d) => {
      val srcNum = substring(col("source"), 4, 8).cast("long")
      Tables.documents(s, d)
        .filter(mdBucket(col("doc_id")) < rateMillis(srcNum))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
        .orderBy("source")
    }),

    // q56: sharded export — md5-shard the corpus, land a
    // shard-partitioned parquet layout (the real sink a loader reads),
    // then re-read THAT layout for the shard manifest. Partition count
    // scales with the shard key, not the input size.
    "q56_sharded_export" -> ((s, d) => {
      val out = tmpDir("shards")
      val sharded = Tables.documents(s, d)
        .withColumn("shard", mdBucket(col("doc_id")) % 8L)
      Lake.writeParquetPartitioned(sharded, out, Seq("shard"))
      Lake.readParquet(s, out)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tot_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard")
        .select(col("shard").cast("long").as("shard"), col("n_docs"),
          col("tot_chars"), col("min_doc"), col("max_doc"))
    }),

    // q57: table profiler — per-column non-null count, exact distinct
    // count and min/max, one UNION branch per column. NOT the
    // single-scan 44-aggregate form: multiple exact count(distinct)
    // forces an Expand (×12 row multiplication) + SortAggregate, which
    // measured 28 s at sf0.1 vs ~2 s for the per-column unions — and the
    // same ×12 shuffle blow-up binds at 100 TB. Per-column branches each
    // read exactly ONE column from parquet (columnar pruning: 11 pruned
    // passes read the same bytes as one full-width pass), each gets a
    // clean two-phase hash aggregate, and the branches run as
    // independent stages. The sketch tier (approx_count_distinct) would
    // allow a true single pass, but exact distinct is the oracle
    // contract here. Numerics and timestamps profile as doubles,
    // strings as strings, in separate columns so no cross-type cast
    // ever reformats a value.
    "q57_table_profiler" -> ((s, d) => {
      val df = Tables.lineitem(s, d)
      val string = Set("l_returnflag", "l_linestatus")
      val ts = Set("l_shipdate")
      def profile(c: String): DataFrame = {
        val nums =
          if (string(c))
            Seq(lit(null).cast("double").as("min_num"),
              lit(null).cast("double").as("max_num"),
              min(col(c)).as("min_str"), max(col(c)).as("max_str"))
          else {
            // TIMESTAMP_NTZ has no direct double cast; via TIMESTAMP in
            // the UTC session = epoch seconds, same as DuckDB's epoch().
            val toNum: Column => Column =
              if (ts(c)) _.cast("timestamp").cast("double") else _.cast("double")
            Seq(toNum(min(col(c))).as("min_num"), toNum(max(col(c))).as("max_num"),
              lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
          }
        val aggs = count(col(c)).as("n_nonnull") +:
          count_distinct(col(c)).as("n_distinct") +: nums
        df.select(col(c)).agg(aggs.head, aggs.tail: _*)
          .select(lit(c).as("col_name"), col("n_nonnull"), col("n_distinct"),
            col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      }
      df.columns.toSeq.map(profile).reduce(_ unionByName _).orderBy("col_name")
    }),

    // q58: deterministic train/val/test split — hash-range assignment
    // (80/10/10) from the same md5 gate as q55, so the split is stable
    // under re-runs, repartitioning and incremental appends (a doc's
    // split never changes when other docs arrive — the property random
    // splits lack). Per-(split, source) manifest out.
    "q58_train_split" -> ((s, d) => {
      val b = mdBucket(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("split",
          when(b < 800, lit("train")).when(b < 900, lit("val")).otherwise(lit("test")))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tot_chars"))
        .orderBy("split", "source")
    }),

    // p05: the composed curation pipeline end to end — what a training
    // run actually executes: quality-gate the corpus (t02 score),
    // exact-dedup it (keep the lowest doc_id per text), assign
    // train/val/test by hash range (q58), pack each (split, source)
    // stream into 512-token bins (q54), and emit the bin manifest the
    // loader consumes. Every stage is an already-gated operator; this
    // entry proves they compose — one declarative plan, no
    // materialization between stages, so Catalyst sees (and prunes/
    // pushes through) the whole flow.
    "p05_curation_e2e" -> ((s, d) => {
      val budget = 512L
      val toks = TextFunctions.tokens(col("text"))
      val n = size(toks).cast("double")
      val punctRatio = TextFunctions.punctCount(col("text")).cast("double") /
        length(col("text")).cast("double")
      val scored = Tables.documents(s, d).filter(length(col("text")) > 0)
        .select(col("doc_id"), col("source"), col("text"),
          size(toks).cast("long").as("toks"),
          round(least(lit(1.0), n / 100.0) * (lit(1.0) - punctRatio), 4).as("q"))
        .filter(col("q") >= 0.2)
      val deduped = scored
        .withColumn("keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("text")))
        .filter(col("doc_id") === col("keep"))
      val b = mdBucket(col("doc_id"))
      val split = deduped.withColumn("split",
        when(b < 800, lit("train")).when(b < 900, lit("val")).otherwise(lit("test")))
      val w = Window.partitionBy("split", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      split
        .withColumn("bin", floor((sum("toks").over(w) - col("toks")) / budget))
        .groupBy("split", "source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("tot_tokens"),
          // integer sum, not avg: distributed double accumulation order
          // vs DuckDB's would make a float mean engine-dependent
          sum(round(col("q") * 10000, 0).cast("long")).as("q_e4_sum"))
        .orderBy("split", "source", "bin")
    }),

    // q66: incremental stats maintenance — the foundation of
    // incremental ANALYZE: per-ingest-batch PARTIAL stats (count / min /
    // max / sum are associative-mergeable) later re-aggregated to the
    // exact full-table stats, proving stats can be maintained
    // batch-by-batch without rescanning history. The non-mergeable stat
    // (exact distinct) merges as a DataSketches HLL union instead —
    // exercised with a tolerance in ApproxDistinctSpec since sketches
    // are approximate by construction.
    "q66_incremental_stats" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      def partial(b: DataFrame): DataFrame = b.agg(
        count(lit(1)).as("n_rows"), count("o_totalprice").as("n_price"),
        min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"),
        sum("o_totalprice").as("sum_price"))
      partial(orders.filter(col("o_orderkey") % 2 === 0))
        .unionByName(partial(orders.filter(col("o_orderkey") % 2 === 1)))
        .agg(sum("n_rows").as("n_rows"), sum("n_price").as("n_price"),
          min("min_price").as("min_price"), max("max_price").as("max_price"),
          round(sum("sum_price"), 2).as("sum_price"))
    }),

    // q64: weighted sampling WITHOUT replacement, one distributed pass —
    // Efraimidis–Spirakis exponential keys: rank every row by
    // ln(u)/w (u uniform in (0,1), w = weight) and take the top-k;
    // inclusion probability is then proportional to weight, with no
    // sequential scan and no replacement bookkeeping. u comes from the
    // md5 hash (full 32-bit value scaled into (0,1)), so the "random"
    // sample is reproducible row-exact and the oracle replays it. The
    // top-k is a TakeOrderedAndProject — per-partition heaps, k rows to
    // the driver, never a global sort.
    "q64_weighted_sample" -> ((s, d) => {
      val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long")
      val u = (h + 1).cast("double") / 4294967297.0
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .withColumn("es_key", round(log(u) / col("n_chars").cast("double") * 1e6, 6))
        .orderBy(desc("es_key"), col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("es_key"))
        .limit(20)
    }),

    // q59: the curation primitives through the SQL front door — the
    // SAME expression trees as mdBucket/interleave16, reached via the
    // GraftExtensions function registry (`md_bucket`, `zorder_key`)
    // from a spark.sql string. Proves dialect parity for the layer the
    // other curation queries use from the Column API.
    "q59_sql_curation_funcs" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT md_bucket(doc_id) % 10 AS bucket,
               count(*) AS n_docs,
               sum(CAST(zorder_key(doc_id, n_chars) % 1000 AS BIGINT)) AS z_mod_sum
        FROM documents_v GROUP BY bucket ORDER BY bucket""")
    }),

    // t15: t11's SKETCH TIER, shipped and executable — t11's exact
    // rank costs a full range-sort of the corpus plus a second pass;
    // here the decile thresholds come from approx_percentile (GK
    // sketch, mergeable across partitions — ONE aggregation, no sort
    // at all), broadcast back as a 1-row crossJoin, and the band
    // filter itself stays embarrassingly parallel. Sketch cut points
    // depend on merge order, so this is a ROWS-ONLY driver entry (like
    // s01–s04); accuracy vs the exact tier is pinned in
    // QualityBandApproxSpec.
    "t15_quality_band_approx" -> ((s, d) => {
      // cache(): the scored scan feeds BOTH the sketch aggregation and
      // the band filter — uncached, the document scan + scoring would
      // run twice in what is explicitly the scale-tier entry. At
      // cluster scale the same role is played by checkpointing the
      // thresholds (collect the 1-row sketch result and inline it).
      val scored = qualityScored(s, d).cache()
      try {
        val thresholds = scored.agg(
          expr("approx_percentile(q, array(0.1, 0.9), 10000)").as("th"))
          .select(col("th").getItem(0).as("lo"), col("th").getItem(1).as("hi"))
        scored.crossJoin(broadcast(thresholds))
          .filter(col("q") > col("lo") && col("q") <= col("hi"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            sum(round(col("q") * 10000, 0).cast("long")).as("q_e4_sum"),
            min("q").as("min_q"), max("q").as("max_q"))
          .orderBy("source")
          .localCheckpoint(true)
      } finally scored.unpersist(blocking = false)
    }),

    // t11: percentile band filter — trim the bottom and top decile of
    // the t02 quality score (rank-based: exact, no interpolation to
    // disagree over) and profile what survives per source. EXACT *and*
    // distributed — the rank machinery (and its 100 TB story) lives in
    // [[exactDecileBand]]; CurationScaleProbe measures it against the
    // window form at 2.2 M rows.
    "t11_quality_band" -> ((s, d) =>
      exactDecileBand(s, qualityScored(s, d)) { kept =>
        kept.groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            // round() before the long cast: Spark's double→long cast
            // truncates while DuckDB's rounds — 4999.9999… must not split.
            sum(round(col("q") * 10000, 0).cast("long")).as("q_e4_sum"),
            min("q").as("min_q"), max("q").as("max_q"))
          .orderBy("source")
      }),

    // t17: tempered domain-mixture rebalance — resample the corpus to a
    // α=0.5 (sqrt-tempered) domain mixture at a 50%-of-corpus character
    // budget, the public multilingual/domain sampling scheme (mBERT/XLM
    // exponent-smoothed sampling). Two passes: (1) per-source totals —
    // a dim-sized aggregate; (2) broadcast the per-source keep-rates
    // back and gate each doc with the deterministic md5 bucket (q55's
    // reproducible alternative to rand()). Cross-engine determinism:
    // the tempered weight is ROUNDED TO AN INTEGER per source before
    // the global sums, so every cross-row sum is integer arithmetic;
    // the only double math is one sqrt and one division per source —
    // both single IEEE ops. At 100 TB the rates table stays
    // sources-sized (broadcast), the gate is map-side, and pass 1 is
    // one partial-aggregated groupBy of the corpus.
    "t17_domain_mixture" -> ((s, d) => {
      val rates = temperedRates(Tables.documents(s, d))
      Tables.documents(s, d)
        .join(broadcast(rates), col("source") === col("r_source"))
        .filter(mdBucket(col("doc_id")) < col("permille"))
        .groupBy("source")
        .agg(max(col("w")).as("w"), max(col("permille")).as("permille"),
          count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
        .orderBy("source")
    }),

    // q136: DISTRIBUTION DRIFT MONITORING — PSI + KL between a
    // baseline and a current population of the corpus (here the
    // deterministic doc_id-parity split; in production, yesterday's
    // snapshot vs today's via time travel). The length distribution
    // bins into 10 fixed bands, ONE scan computes both populations'
    // histograms as conditional aggregates (no second pass — totals
    // come from a global window over the bounded 10-row histogram,
    // never a self-join that would re-run the scan), and the per-bin
    // PSI/KL contributions use Laplace-smoothed proportions
    // (+0.5/bin) so empty bins never produce ln(0). This is the pipeline gate that catches a crawler
    // or filter change shifting the corpus before a model trains on
    // it. At 100 TB: one scan + a 10-row aggregate — nothing else.
    "q136_drift_psi" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("bin", least(lit(9L), floor(col("n_chars") / 100)))
        .withColumn("pop", col("doc_id") % 2)
      val hist = docs.groupBy("bin").agg(
        sum(when(col("pop") === 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("pop") === 1, 1L).otherwise(0L)).as("n_cur"))
      // totals via a single-partition window over the 10-row aggregate
      // — NOT a self-join (which would re-run the scan subtree:
      // Catalyst does not reuse an uncached aggregate referenced
      // twice). The partition key is `pmod(bin, 1)`: constant-valued
      // (one partition — the input is the bounded bin histogram, so
      // that is the POINT, not a funnel) but non-foldable, so the
      // partition spec survives the optimizer's arithmetic
      // simplifications (`bin * 0` does not) and the plan carries a
      // real partitioning instead of WindowExec's unpartitioned
      // warning — which the bench tail reserves for declared exact
      // tiers.
      // coalesce keeps the key constant for NULL bins too — a null
      // would otherwise form its own window partition and silently
      // vanish from every other bin's totals (unreachable today: bin
      // is least(9, floor(...)) over non-null n_chars — but the
      // constant-partition property must not depend on that)
      val w = Window.partitionBy(pmod(coalesce(col("bin"), lit(0L)), lit(1L)))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val withTot = hist
        .withColumn("tb", sum("n_base").over(w))
        .withColumn("tc", sum("n_cur").over(w))
      val pB = (col("n_base") + 0.5) / (col("tb") + 5.0)
      val pC = (col("n_cur") + 0.5) / (col("tc") + 5.0)
      withTot
        .select(col("bin"), col("n_base"), col("n_cur"),
          round((pC - pB) * log(pC / pB), 6).as("psi_contrib"),
          round(pC * log(pC / pB), 6).as("kl_contrib"))
        .orderBy("bin")
    }),

    // q137: LENGTH-BUCKETED BATCH ASSEMBLY — the dynamic-padding
    // recipe every seq2seq/LLM data loader runs: group documents into
    // pow-2 length bands (floor(log2(tokens))), pad each to the
    // band's ceiling, and pack fixed-token-budget batches per
    // (source, band) so padding waste is bounded by the band ratio
    // instead of the corpus-wide max length. Batch ids come from a
    // row_number windowed PER (source, band) — partition-parallel,
    // never a global sort — and the output is the per-band efficiency
    // report (batches, padded vs real tokens, padding fraction) that
    // tells you which bands to split further. Token counts derive
    // deterministically from n_chars/4 (the usual chars-per-token
    // heuristic) so the oracle mirrors bit-for-bit.
    "q137_length_buckets" -> ((s, d) => {
      val budget = 4096L
      val docs = Tables.documents(s, d)
        .withColumn("n_tok", greatest(lit(1L), floor(col("n_chars") / 4)))
        .withColumn("band", floor(log(2.0, col("n_tok"))).cast("long"))
        .withColumn("padded", pow(lit(2.0), col("band") + 1).cast("long"))
      val batched = docs
        .withColumn("rn", row_number().over(
          Window.partitionBy("source", "band").orderBy("doc_id")) - 1)
        .withColumn("batch_size",
          greatest(lit(1L), (lit(budget) / col("padded")).cast("long")))
        .withColumn("batch_id", (col("rn") / col("batch_size")).cast("long"))
      batched.groupBy("band").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source"), col("batch_id")).as("n_batches"),
        sum("n_tok").cast("long").as("real_tokens"),
        sum("padded").cast("long").as("padded_tokens"),
        round(lit(1.0) - sum("n_tok") / sum("padded").cast("double"), 6)
          .as("pad_frac"))
        .orderBy("band")
    }))

  private val zSql = ZOrder.sql16("l_partkey", "l_suppkey")

  val oracles: Map[String, String] = Map(
    // Same parity split, fixed bins, Laplace smoothing and 6dp
    // rounding; ln agreement at this precision is the repo's standard
    // cross-engine convention (t13 entropy, q105 BM25).
    "q136_drift_psi" ->
      """WITH h AS (
        |  SELECT least(9, CAST(floor(n_chars / 100) AS BIGINT)) AS bin,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_base,
        |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cur
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |  CAST(sum(n_cur) AS BIGINT) AS tc FROM h)
        |SELECT bin, n_base, n_cur,
        |  round(((n_cur + 0.5) / (tc + 5.0) - (n_base + 0.5) / (tb + 5.0)) *
        |    ln(((n_cur + 0.5) / (tc + 5.0)) / ((n_base + 0.5) / (tb + 5.0))),
        |    6) AS psi_contrib,
        |  round((n_cur + 0.5) / (tc + 5.0) *
        |    ln(((n_cur + 0.5) / (tc + 5.0)) / ((n_base + 0.5) / (tb + 5.0))),
        |    6) AS kl_contrib
        |FROM h, t ORDER BY bin""".stripMargin,
    // row_number per (source, band) ordered by doc_id, integer batch
    // arithmetic — bit-identical across engines.
    "q137_length_buckets" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    greatest(1, CAST(floor(n_chars / 4) AS BIGINT)) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(floor(log2(n_tok)) AS BIGINT) AS band,
        |    CAST(power(2, CAST(floor(log2(n_tok)) AS BIGINT) + 1) AS BIGINT)
        |      AS padded
        |  FROM d),
        |r AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY source, band ORDER BY doc_id) - 1 AS rn,
        |    greatest(1, CAST(4096 / padded AS BIGINT)) AS batch_size
        |  FROM b)
        |SELECT band, count(*) AS n_docs,
        |  CAST(count(DISTINCT (source, CAST(rn / batch_size AS BIGINT)))
        |    AS BIGINT) AS n_batches,
        |  CAST(sum(n_tok) AS BIGINT) AS real_tokens,
        |  CAST(sum(padded) AS BIGINT) AS padded_tokens,
        |  round(1.0 - sum(n_tok) / CAST(sum(padded) AS DOUBLE), 6)
        |    AS pad_frac
        |FROM r GROUP BY band ORDER BY band""".stripMargin,
    // d10's chunk CTEs → dedup gate → t17's mixture CTEs over the
    // cleaned corpus → q54's window packing, composed verbatim.
    "p06_corpus_curation" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, n_chars,
         |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
         |  FROM documents WHERE length(text) > 0),
         |t2 AS (
         |  SELECT doc_id, source, n_chars, l, len(l) AS n_toks
         |  FROM t WHERE len(l) > 0),
         |toks AS (
         |  SELECT doc_id, source, n_chars, n_toks,
         |    unnest(l) AS tok, unnest(range(len(l))) AS i
         |  FROM t2),
         |ch AS (
         |  SELECT doc_id, source, n_chars, n_toks, i // 10 AS ci,
         |    string_agg(tok, ' ' ORDER BY i) AS chunk
         |  FROM toks GROUP BY 1, 2, 3, 4, 5),
         |dup AS (
         |  SELECT chunk FROM ch GROUP BY chunk
         |  HAVING count(DISTINCT doc_id) >= 2),
         |clean AS (
         |  SELECT doc_id, source, max(n_chars) AS n_chars,
         |    max(n_toks) AS n_toks, count(*) AS n_chunks,
         |    sum(CASE WHEN chunk IN (SELECT chunk FROM dup)
         |      THEN 1 ELSE 0 END) AS n_dup
         |  FROM ch GROUP BY 1, 2
         |  HAVING n_dup * 5 < n_chunks),
         |tot AS (
         |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tot_chars
         |  FROM clean GROUP BY source HAVING sum(n_chars) > 0),
         |wt AS (
         |  SELECT source, tot_chars,
         |    CAST(round(sqrt(tot_chars), 0) AS BIGINT) AS w FROM tot),
         |g AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS big_w,
         |    CAST(sum(tot_chars) AS BIGINT) AS t FROM wt),
         |r AS (
         |  SELECT source,
         |    least(1000, CAST(round(500.0 * g.t * w / (g.big_w * tot_chars), 0)
         |      AS BIGINT)) AS permille
         |  FROM wt, g),
         |kept AS (
         |  SELECT c.doc_id, c.source, c.n_toks, r.permille
         |  FROM clean c JOIN r USING (source)
         |  WHERE ${mdBucketSql("c.doc_id")} < r.permille),
         |binned AS (
         |  SELECT source, permille, n_toks,
         |    CAST((sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_toks) // 512 AS BIGINT) AS bin
         |  FROM kept)
         |SELECT source, max(permille) AS permille, count(*) AS n_kept,
         |  CAST(sum(n_toks) AS BIGINT) AS toks_kept,
         |  CAST(max(bin) + 1 AS BIGINT) AS n_bins
         |FROM binned GROUP BY source ORDER BY source""".stripMargin,
    "t17_domain_mixture" ->
      s"""WITH tot AS (
         |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tot_chars
         |  FROM documents GROUP BY source HAVING sum(n_chars) > 0),
         |wt AS (
         |  SELECT source, tot_chars,
         |    CAST(round(sqrt(tot_chars), 0) AS BIGINT) AS w FROM tot),
         |g AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS big_w,
         |    CAST(sum(tot_chars) AS BIGINT) AS t FROM wt),
         |r AS (
         |  SELECT source, w,
         |    least(1000, CAST(round(500.0 * g.t * w / (g.big_w * tot_chars), 0)
         |      AS BIGINT)) AS permille
         |  FROM wt, g)
         |SELECT d.source, max(r.w) AS w, max(r.permille) AS permille,
         |  count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
         |FROM documents d JOIN r ON d.source = r.source
         |WHERE ${mdBucketSql("d.doc_id")} < r.permille
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q53_zorder_key" ->
      s"""WITH z AS (
         |  SELECT ($zSql >> 16) AS z_bucket, l_partkey, l_suppkey
         |  FROM lineitem)
         |SELECT z_bucket, count(*) AS cnt,
         |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
         |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin,
    "q54_context_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
        |      AS toks
        |  FROM documents WHERE length(text) > 0),
        |b AS (
        |  SELECT source, doc_id, toks,
        |    CAST((sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING) - toks) // 512 AS BIGINT) AS bin
        |  FROM t)
        |SELECT source, bin, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS tot_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q55_stratified_sample" ->
      s"""SELECT source, count(*) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
         |FROM documents
         |WHERE ${mdBucketSql("doc_id")} <
         |  (CAST(substr(source, 4) AS BIGINT) % 9 + 1) * 100
         |GROUP BY source ORDER BY source""".stripMargin,
    "q56_sharded_export" ->
      s"""SELECT ${mdBucketSql("doc_id")} % 8 AS shard,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS tot_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
    "q57_table_profiler" -> {
      val numericOrTs = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      val stringCols = Seq("l_returnflag", "l_linestatus")
      def row(c: String): String =
        if (stringCols.contains(c))
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
             |FROM lineitem""".stripMargin
        else {
          val (mn, mx) =
            if (c == "l_shipdate") (s"epoch(min($c))", s"epoch(max($c))")
            else (s"min($c)", s"max($c)")
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST($mn AS DOUBLE) AS min_num, CAST($mx AS DOUBLE) AS max_num,
             |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM lineitem""".stripMargin
        }
      (numericOrTs ++ stringCols).map(row).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q58_train_split" ->
      s"""SELECT CASE WHEN ${mdBucketSql("doc_id")} < 800 THEN 'train'
         |  WHEN ${mdBucketSql("doc_id")} < 900 THEN 'val'
         |  ELSE 'test' END AS split,
         |  source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS tot_chars
         |FROM documents GROUP BY split, source ORDER BY split, source""".stripMargin,
    "p05_curation_e2e" ->
      s"""WITH m AS (
         |  SELECT doc_id, source, text,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
         |      AS BIGINT) AS toks,
         |    round(least(CAST(1.0 AS DOUBLE),
         |      CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
         |        AS DOUBLE) / 100) *
         |      (CAST(1.0 AS DOUBLE) -
         |       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
         |         AS DOUBLE) / length(text)), 4) AS q
         |  FROM documents WHERE length(text) > 0),
         |f AS (SELECT * FROM m WHERE q >= 0.2),
         |dd AS (
         |  SELECT * FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY text) AS keep FROM f)
         |  WHERE doc_id = keep),
         |sp AS (
         |  SELECT *, CASE WHEN ${mdBucketSql("doc_id")} < 800 THEN 'train'
         |    WHEN ${mdBucketSql("doc_id")} < 900 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM dd),
         |bins AS (
         |  SELECT split, source, doc_id, toks, q,
         |    CAST((sum(toks) OVER (PARTITION BY split, source ORDER BY doc_id
         |       ROWS UNBOUNDED PRECEDING) - toks) // 512 AS BIGINT) AS bin
         |  FROM sp)
         |SELECT split, source, bin, count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS tot_tokens,
         |  CAST(sum(CAST(round(q * 10000, 0) AS BIGINT)) AS BIGINT) AS q_e4_sum
         |FROM bins GROUP BY split, source, bin
         |ORDER BY split, source, bin""".stripMargin,
    "q66_incremental_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(o_totalprice) AS BIGINT) AS n_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders""".stripMargin,
    "q64_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
        |      / 4294967297.0) / CAST(n_chars AS DOUBLE) * 1e6, 6) AS es_key
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, source, n_chars, es_key
        |FROM s ORDER BY es_key DESC, doc_id LIMIT 20""".stripMargin,
    "q59_sql_curation_funcs" ->
      s"""SELECT ${mdBucketSql("doc_id")} % 10 AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(${ZOrder.sql16("doc_id", "n_chars")} % 1000) AS BIGINT) AS z_mod_sum
         |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    "t11_quality_band" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    round(least(CAST(1.0 AS DOUBLE),
        |      CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |        AS DOUBLE) / 100) *
        |      (CAST(1.0 AS DOUBLE) -
        |       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |         AS DOUBLE) / length(text)), 4) AS q
        |  FROM documents WHERE length(text) > 0),
        |r AS (
        |  SELECT doc_id, source, q,
        |    row_number() OVER (ORDER BY q, doc_id) AS r,
        |    count(*) OVER () AS nn
        |  FROM m)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(CAST(round(q * 10000, 0) AS BIGINT)) AS BIGINT) AS q_e4_sum,
        |  min(q) AS min_q, max(q) AS max_q
        |FROM r
        |WHERE r > nn // 10 AND r <= nn - nn // 10
        |GROUP BY source ORDER BY source""".stripMargin)
}
