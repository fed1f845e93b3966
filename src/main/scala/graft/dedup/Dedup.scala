package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are built from
  * shuffle-conscious Spark primitives:
  *
  *  - shingling/hashing is pure column-level expression work (codegen'd,
  *    no UDFs);
  *  - MinHash signatures are K parallel `min` aggregates of ONE
  *    `groupBy(doc)` shuffle over the shingle set (never K× the data);
  *  - LSH banding turns the O(n²) all-pairs problem into an equi-join on
  *    (band, signature) — the only pairs materialized are bucket
  *    collisions, which is what makes near-dup detection feasible at
  *    100 TB (all-pairs is quadratic; banded candidates are ~linear for
  *    realistic dup rates);
  *  - candidate pairs are then verified with exact Jaccard over the
  *    shingle sets (a semi-join back against the shingle table).
  *
  * Hashes are md5-prefix based so an external SQL engine (the DuckDB
  * oracle) reproduces them bit-for-bit.
  */
object Dedup {
  /** 2^31 - 1, the classic MinHash modulus. */
  val P: Long = 2147483647L

  /** Fixed (a, c) parameters for the K=12 MinHash permutations
    * `h_i(x) = (a_i * x + c_i) mod P` — literal on both engine and oracle
    * side so signatures agree exactly. */
  val MinHashParams: Seq[(Int, Int, Int)] = Seq(
    (0, 1103, 12345), (1, 2357, 98765), (2, 4093, 54321), (3, 8191, 13579),
    (4, 16381, 24680), (5, 32749, 11223), (6, 65521, 44556), (7, 131071, 77889),
    (8, 262139, 99001), (9, 524287, 22334), (10, 1048573, 55667), (11, 2097143, 88990))

  /** Rows per LSH band (K=12 hashes → 4 bands of 3). */
  val BandRows = 3

  /** Stable 32-bit token hash both Spark and DuckDB can compute:
    * first 8 hex chars of md5, as a long. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Stable 60-bit token hash (md5 15-hex prefix) for SimHash. */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens, empties dropped. `array_remove` (a regular
    * collection expression) rather than a `filter` HOF — cheaper eval and
    * safe to reference repeatedly. */
  def tokens(c: Column): Column = array_remove(split(c, "\\s+"), "")

  /** Word n-gram shingles over an ALREADY-BOUND token array column.
    *
    * PERFORMANCE CONTRACT: `toks` must be a column reference (staged in a
    * prior projection), never an inline expression. Higher-order
    * functions are interpreted, and an expression referenced inside the
    * lambda (here via `element_at`) is RE-EVALUATED per element — an
    * inline split+filter would run O(tokens²) regex work per document.
    * [[withShingleArray]] does the staging.
    */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + lit(1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Adds `out` = DISTINCT word-n-gram shingle array for `textCol`,
    * with the token array staged in its own projection (see
    * [[shinglesOf]]; Catalyst's CollapseProject will not re-inline a
    * non-trivial alias into multiple consumers). */
  def withShingleArray(df: DataFrame, textCol: String, n: Int, out: String): DataFrame = {
    val t = "__graft_toks"
    df.withColumn(t, tokens(col(textCol)))
      .withColumn(out, array_distinct(shinglesOf(col(t), n)))
      .drop(t)
  }

  /** Adds `shsOut` (distinct shingle strings) AND `hsOut` (their
    * xxhash64 hashes), BOTH sorted by (hash, string) — the creation
    * point for PAIR-DENSE verifies ([[ngramJaccardPairs]]; the minHash
    * family stays on plain [[shingleArrays]] — see the note there).
    *
    * The sort + hash happen ONCE PER DOCUMENT here (materialized by
    * the callers' existing checkpoints), so the verify's per-PAIR
    * overlap is a hash-guided linear merge
    * ([[graft.functions.HashedOverlapCount]]): the measured verify
    * cost is per-element STRING materialization, which the merge
    * replaces with allocation-free long reads, touching strings only
    * to confirm hash-equal elements — exact by construction. Sorting
    * or hashing inside the verify instead re-evaluates per PAIR (the
    * r17 jaccard-alias lesson: the optimizer collapses non-trivial
    * aliases into the join output). Every consumer is order-free
    * (explode / size / merge), so the (hash, string) order is a free
    * invariant. */
  def withHashedShingleArray(df: DataFrame, textCol: String, n: Int,
      shsOut: String, hsOut: String): DataFrame = {
    val t = "__graft_toks"
    val hs = "__graft_hsh"
    df.withColumn(t, tokens(col(textCol)))
      // xxhash64, not the md5-derived tokenHash60: `hs` never crosses
      // to the oracle (only jaccard does, and the merge confirms every
      // hash match by string), so the cheap codegen'd hash is free to
      // use — md5+conv per element measured ~2x the whole sort
      .withColumn(hs, sort_array(transform(array_distinct(shinglesOf(col(t), n)),
        s => struct(xxhash64(s).as("h"), s.as("s")))))
      .withColumn(shsOut, transform(col(hs), x => x.getField("s")))
      .withColumn(hsOut, transform(col(hs), x => x.getField("h")))
      .drop(t, hs)
  }

  /** Exact dedup: survivors per identical text, with duplicate counts. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")

  /** Explode an (already staged) array column without triggering
    * `InferFiltersFromGenerate`: that rule synthesizes a
    * `size(arr) > 0 AND isnotnull(arr)` pre-filter with the array's
    * DEFINING EXPRESSION re-inlined — for a shingle array that means
    * re-running the whole HOF pipeline per row. `explode_outer` blocks
    * the inference; the null rows it adds for empty arrays are dropped
    * by a cheap post-filter on the generated column. */
  private def explodeStaged(df: DataFrame, arrCol: String, out: String): DataFrame =
    df.withColumn(out, explode_outer(col(arrCol)))
      .filter(col(out).isNotNull)
      .drop(arrCol)

  /** Non-overlapping fixed-width token passages for exact-substring
    * dedup (d10 and the p06 pipeline share this EXACT chunker — the
    * composed pipeline must not drift from the primitive). Input needs
    * `doc_id` and `text`; `extraCols` ride along per chunk row. Emits
    * (doc_id, extras…, n_toks, chunk). Tokens are STAGED before the
    * generator and exploded via the `explode_outer` + isNotNull idiom
    * (the two documented HOF/generator traps). */
  def passageChunks(docs: DataFrame, extraCols: Seq[String],
      width: Int = 10): DataFrame = {
    val staged = docs
      .filter(length(col("text")) > 0)
      .select((col("doc_id") +: extraCols.map(col)) :+ tokens(col("text")).as("toks"): _*)
      .filter(size(col("toks")) > 0)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("cis", expr(s"sequence(0, (size(toks) - 1) div $width)"))
    staged
      .withColumn("ci", explode_outer(col("cis")))
      .filter(col("ci").isNotNull)
      .select((col("doc_id") +: extraCols.map(col)) ++ Seq(col("n_toks"),
        array_join(slice(col("toks"), col("ci") * width + 1, lit(width)), " ")
          .as("chunk")): _*)
  }

  /** Passages of [[passageChunks]] output appearing in ≥2 distinct
    * documents corpus-wide. */
  def duplicatedPassages(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select("chunk")

  /** Distinct (id, shingle) pairs. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    explodeStaged(
      withShingleArray(docs.select(col(idCol).as("id"), col(textCol)), textCol, n, "shs")
        .select("id", "shs"),
      "shs", "sh")

  /** MinHash signatures, single-pass: all K min-hashes as K aggregate
    * columns of ONE `groupBy(id)` — the shuffle moves each shingle hash
    * once, and the K permutations are evaluated map-side inside the
    * partial aggregate. (The explode-K-rows formulation shuffles K× the
    * shingle volume; at 100 TB that multiplier is the bottleneck.)
    * Output: one row per id with columns mh0..mh{K-1}.
    */
  def minHashSignatures(sh: DataFrame): DataFrame = {
    // Stage the md5-derived base hash as a column FIRST: each of the K
    // min-aggregates then reads `x` instead of re-computing the md5 K
    // times per shingle.
    val hashed = sh.select(col("id"), pmod(tokenHash(col("sh")), lit(P)).as("x"))
    val aggs = MinHashParams.map { case (i, a, c) =>
      min(pmod(lit(a.toLong) * col("x") + lit(c.toLong), lit(P))).as(s"mh$i")
    }
    hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band signatures: (id, band, sig-string). Pure projection over the
    * wide signature row (stack generator) — no extra shuffle. */
  def bandSignatures(sigs: DataFrame): DataFrame = {
    val nBands = MinHashParams.size / BandRows
    val interleaved = (0 until nBands).flatMap { b =>
      Seq(lit(b),
        concat_ws("-", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}").cast("string")): _*))
    }
    sigs.select(col("id"), stack(Seq(lit(nBands)) ++ interleaved: _*).as(Seq("band", "sig")))
  }

  /** Candidate pairs = docs sharing any (band, sig) bucket. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band").as("band_a"), col("sig").as("sig_a"), col("id").as("da"))
    val b = bands.select(col("band").as("band_b"), col("sig").as("sig_b"), col("id").as("db"))
    a.join(b, col("band_a") === col("band_b") && col("sig_a") === col("sig_b") &&
        col("da") < col("db"))
      .select("da", "db").distinct()
  }

  /** Exact Jaccard verification of candidate pairs against per-doc
    * DISTINCT-shingle ARRAYS — two id-keyed joins of compact array
    * rows + one overlap evaluation per pair, never a re-explode of the
    * shingle table (which would shuffle the full shingle volume again
    * just to verify a small candidate set).
    *
    * DUAL-MODE on the docsh layout: with `(id, shs)`
    * ([[shingleArrays]]) the overlap is `array_intersect` — right for
    * collision-sized candidate sets where creation cost dominates
    * (the minHash family); with `(id, shs, hs)`
    * ([[withHashedShingleArray]]) it is the codegen'd hash-guided
    * merge [[graft.functions.HashedOverlapCount]] — right for
    * pair-dense verifies (d04's 74k pairs), where per-pair STRING
    * materialization is ~75% of verify wall-clock (DedupProbe r18).
    * Same result by ArrayOverlapSpec's pinned law. */
  def jaccardVerifyArrays(cands: DataFrame, docsh: DataFrame): DataFrame = {
    // BOTH verify joins reference the array table through the SAME
    // projection (aliases live in the join output, not in per-side
    // pre-projections): the planner then builds ONE exchange over the
    // arrays and reuses it for the second join (ReusedExchange),
    // instead of collecting + serializing the whole corpus-array
    // broadcast twice per query — which measured as the dominant
    // verify cost (guide §2.4/§7.2: duplicated subtrees feeding two
    // joins). Strategy choice stays size-based (broadcast at bench SF,
    // shuffle at corpus scale).
    val hashed = docsh.columns.contains("hs")
    val arr =
      if (hashed) docsh.select(col("id"), col("shs"), col("hs"))
      else docsh.select(col("id"), col("shs"))
    val a = arr.as("A")
    val b = arr.as("B")
    val ix =
      if (hashed)
        graft.functions.hashed_overlap_count(
          col("A.hs"), col("A.shs"), col("B.hs"), col("B.shs"))
      else size(array_intersect(col("A.shs"), col("B.shs"))).cast("long")
    cands
      .join(a, col("da") === col("A.id"))
      .join(b, col("db") === col("B.id"))
      .select(col("da"), col("db"), ix.as("ix"),
        size(col("A.shs")).cast("long").as("na"),
        size(col("B.shs")).cast("long").as("nb"))
      .select(col("da"), col("db"),
        (col("ix").cast("double") / (col("na") + col("nb") - col("ix"))).as("jaccard"))
      // Materialize the pair-bounded (da, db, jaccard) rows: every
      // caller filters on `jaccard`, and predicate pushdown re-inlines
      // the alias BELOW the projection — array_intersect then runs
      // TWICE per pair (once in the pushed filter, once in the
      // projection), measured as ~2/3 of verify wall-clock. The
      // checkpoint is a plan barrier a few MB wide (3 columns ×
      // candidate count), so the intersect runs exactly once and the
      // threshold filter reads materialized doubles. Eager:
      // minHashNearDups note above.
      .localCheckpoint(true)
  }

  /** Band signatures straight from a per-doc distinct-shingle-array
    * frame (`id`, `shs`) — the shared front half of
    * [[minHashNearDups]], exposed so the streaming ingest-time dedup
    * (st21) computes each batch's bands with EXACTLY the batch
    * operator's expressions (batch-equivalence is its gate). */
  def bandSignaturesOf(docsh: DataFrame): DataFrame =
    bandSignatures(minHashSignatures(explodeStaged(docsh, "shs", "sh")))

  /** Per-doc distinct-shingle arrays (id, shs) — the persisted half of
    * a signature index: [[bandSignaturesOf]] derives the bands from it
    * and [[jaccardVerifyArrays]] verifies candidates against it, so a
    * corpus signed once never re-shingles (d11's incremental gate).
    * Plain string arrays, NOT the hashed layout: for the minHash
    * family the candidate sets are collision-sized, and the r18
    * interleaved A/B measured the hashed creation (+hash +sort
    * +double-width checkpoint blocks) costing MORE than its verify
    * win there (+0.12 s on the d02 shape); the hashed layout pays
    * only where the verify is pair-dense (d04 — see
    * [[withHashedShingleArray]]). */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    withShingleArray(docs.select(col(idCol).as("id"), col(textCol)), textCol, n, "shs")
      .select("id", "shs")

  /** Candidate pairs touching at least one NEW doc: the increment's
    * bands bucket-joined against the ACCUMULATED band index (old ∪
    * new) on (band, sig), ids canonicalized with least/greatest. The
    * incremental complement of [[lshCandidates]] — old-old pairs were
    * emitted when the old docs were signed (a doc's bands never change
    * when other docs arrive), so an increment never joins the index
    * against itself: per-increment cost is O(new bands + collisions),
    * not O(corpus). */
  def lshCandidatesIncremental(bandsNew: DataFrame, bandsAll: DataFrame): DataFrame = {
    val a = bandsNew.select(col("band").as("band_a"), col("sig").as("sig_a"), col("id").as("ia"))
    val b = bandsAll.select(col("band").as("band_b"), col("sig").as("sig_b"), col("id").as("ib"))
    a.join(b, col("band_a") === col("band_b") && col("sig_a") === col("sig_b") &&
        col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("da"), greatest(col("ia"), col("ib")).as("db"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verify → threshold. */
  def minHashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    // three consumers (signature branch + two verify joins): materialize
    // the compact per-doc arrays once (lazy; ContextCleaner-reclaimed)
    // EAGER checkpoint everywhere in this repo: a LAZILY-marked RDD
    // whose first materialization lands on an AQE broadcast-exchange
    // thread can deadlock against the DAG scheduler's cache-locs walk
    // (RDDCheckpointData's GLOBAL lock vs the RDD monitor, taken in
    // opposite orders — observed as a full-suite hang in exactly this
    // method); eager materialization completes before any concurrent
    // consumer exists.
    val docsh = shingleArrays(docs, idCol, textCol, n).localCheckpoint(true)
    val sh = explodeStaged(docsh, "shs", "sh")
    // bands feed BOTH sides of the lshCandidates self-join; without the
    // checkpoint each side re-runs the whole shingle-explode + md5 +
    // 12-way min-aggregate pipeline (the physical plan showed the
    // signature subtree twice). Bands are 4 short rows per doc —
    // materializing them costs one tiny write and halves the
    // signature compute (guide §2.4: share work feeding a self-join).
    val bands = bandSignatures(minHashSignatures(sh)).localCheckpoint(true)
    val cands = lshCandidates(bands)
    jaccardVerifyArrays(cands, docsh).filter(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash per document (md5-based, multiplicity-weighted):
    * one `groupBy(id)` whose single custom aggregate
    * ([[graft.functions.SimHashAgg]]) folds each token hash into a
    * 60-counter buffer — one aggregate slot per group, 240 bytes per
    * partial through the shuffle. (Earlier formulations: a 60×-row
    * explode shuffled 60× the token volume; 60 parallel `sum(when)`
    * columns carried 60 long fields per partial. Equivalence with the
    * wide-aggregate form is asserted in DedupSpec.) */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    explodeStaged(
      docs.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks")),
      "__toks", "tok")
      .select(col("id"), tokenHash60(col("tok")).as("h"))
      .groupBy("id")
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))

  /** The wide-aggregate SimHash formulation (60 parallel `sum(when)`
    * columns) — kept as the equivalence reference for DedupSpec. */
  private[graft] def simHashWide(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bitAggs = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"v$j")
    }
    explodeStaged(
      docs.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks")),
      "__toks", "tok")
      .select(col("id"), tokenHash60(col("tok")).as("h"))
      .groupBy("id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until 60).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming,
    * via EXACT pigeonhole banding: split the B-bit hash into `bands`
    * disjoint bit-bands; if two hashes differ in at most `bands - 1`
    * bits, at least one band is bit-identical (pigeonhole), so an
    * equi-join on (band, band-bits) generates a candidate superset —
    * exact for any maxHamming <= bands - 1 — and a popcount filter
    * verifies. This is the classic web-scale near-dup-detection design
    * (Manku et al., WWW'07, public literature): candidates are hash
    * buckets, never all pairs.
    */
  def simHashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, bands: Int = 0, bits: Int = 60): DataFrame = {
    // Exactly maxHamming+1 bands unless overridden: more bands stay
    // exact but shrink each band's key space exponentially — bucket
    // occupancy (and the candidate pair count) grows quadratically with
    // docs-per-bucket, so the WIDEST bands that still guarantee the
    // pigeonhole bound are the scale-optimal choice.
    val nBands = if (bands > 0) bands else maxHamming + 1
    require(maxHamming <= nBands - 1,
      s"pigeonhole needs bands > maxHamming (got $nBands bands, $maxHamming)")
    // uneven contiguous chunks when bits % bands != 0 (e.g. 60/7 → 9,9,9,9,8,8,8)
    val base = bits / nBands
    val extra = bits % nBands
    val widths = Seq.tabulate(nBands)(b => if (b < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    // The hash table feeds three DAG branches (banding + two verify
    // joins); a LAZY localCheckpoint materializes the 60-aggregate scan
    // once on first action and reuses it — the blocks are reclaimed by
    // the ContextCleaner when the plan is garbage-collected. One row
    // per document, so the materialization is tiny relative to the
    // token scan it saves twice.
    val h = simHash(docs, idCol, textCol).localCheckpoint(true) // eager: see minHashNearDups
    val banded = h.select(col("id"), col("simhash"),
      posexplode(array(widths.zip(offsets).map { case (w, off) =>
        shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1L))
      }: _*)).as(Seq("band", "key")))
    // The 8-byte hash rides each side of the bucket join, so the
    // popcount verification runs ON the join output — BEFORE the
    // distinct. Bucket collisions are the quadratic bulk (every
    // same-bucket pair), verified matches the tiny survivor set; the
    // old shape paid a full-width distinct over every collision and
    // then two more joins back to `h` just to fetch the hashes it had
    // already seen (guide §2.3: shuffle the decision bytes, not extra
    // passes). Result set identical: hamming is a function of the
    // pair, so distinct-on-(da,db,hamming) == distinct-on-(da,db).
    banded.select(col("band"), col("key"), col("id").as("da"), col("simhash").as("ha"))
      .join(banded.select(col("band"), col("key"), col("id").as("db"), col("simhash").as("hb")),
        Seq("band", "key"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard pairs within a blocking column (e.g. lang),
    * via PREFIX FILTERING (Chaudhuri et al. SSJoin / Bayardo et al.
    * "Scaling Up All Pairs Similarity Search" — public literature).
    *
    * The naive formulation self-joins the full shingle table on
    * (block, shingle); a frequent shingle with document frequency f
    * contributes f² candidate rows, which is quadratic within a block and
    * dies at 100 TB. Prefix filtering is the EXACT fix:
    *
    *   1. order every document's shingle set by one global total order —
    *      ascending document frequency, ties broken by the shingle string
    *      (rarest first);
    *   2. keep only each document's first `n - ceil(t*n) + 1` shingles
    *      (its "prefix"). Any pair with Jaccard >= t must share at least
    *      one shingle lying in BOTH prefixes (pigeonhole: J >= t implies
    *      overlap >= ceil(t*n) for each side's n, and skipping a whole
    *      prefix leaves at most ceil(t*n) - 1 shared elements);
    *   3. generate candidates by equi-joining prefixes only — frequent
    *      shingles sort to the END of the order and never enter a prefix,
    *      so join fan-out stays bounded by the rare-shingle frequencies;
    *   4. verify candidates with exact Jaccard over the full shingle sets.
    *
    * Result set is IDENTICAL to the naive join (the filter is lossless by
    * construction), so the DuckDB oracle is unchanged.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // four consumers (freq/rank branch + candidate self-join sides via
    // prefix + two verify joins): materialize once, as in minHashNearDups
    val docsh = withHashedShingleArray(
      docs.select(col(idCol).as("id"), col(blockCol).as("blk"), col(textCol)),
      textCol, n, "shs", "hs")
      .select("id", "blk", "shs", "hs")
      .localCheckpoint(true) // eager: see minHashNearDups
    // Size travels with each exploded row (a projection) — no separate
    // per-doc sizes shuffle.
    val sh = explodeStaged(
      docsh.select(col("id"), col("blk"), size(col("shs")).as("cnt"), col("shs")),
      "shs", "sh")
    // Document frequency as a WINDOW over (blk, sh) rather than a
    // groupBy + join-back: one shuffle of the shingle table instead of
    // two, and the shingle array is derived once for this branch.
    // Global order (df asc, sh asc) is document-independent, so the
    // prefix principle applies.
    val ranked = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("blk", "sh")))
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy(col("df"), col("sh"))))
    // The prefix feeds BOTH sides of the candidate self-join; without
    // the checkpoint each side re-runs the explode + two window
    // shuffles over the full shingle table (the physical plan showed
    // the window subtree twice). The prefix itself is the FILTERED
    // small output — n - ceil(t·n) + 1 shingles per doc — so
    // materializing it is cheap and halves the heavy front end
    // (guide §2.4: share work feeding a self-join).
    val prefix = ranked
      .filter(col("pos") <= col("cnt") - ceil(lit(threshold) * col("cnt")).cast("long") + 1)
      .select(col("blk"), col("sh"), col("id"))
      .localCheckpoint(true) // eager: see minHashNearDups
    val cands = prefix.select(col("blk"), col("sh"), col("id").as("da"))
      .join(prefix.select(col("blk"), col("sh"), col("id").as("db")), Seq("blk", "sh"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    jaccardVerifyArrays(cands, docsh.select("id", "shs", "hs"))
      .filter(col("jaccard") >= threshold)
  }
}
