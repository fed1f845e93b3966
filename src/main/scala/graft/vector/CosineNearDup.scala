package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.vec_cosine_sim

/** Embedding-cosine near-duplicate pair detection, in two tiers.
  *
  * WHY TWO TIERS — the threshold decides the algorithm:
  *
  *  - An EXACT cosine-threshold join at low thresholds (t ~ 0.4, i.e.
  *    pair angles up to ~66°) admits no lossless candidate pruning:
  *    sign-LSH disagrees per hyperplane with probability θ/π ≈ 0.37 at
  *    that angle, so any bucketing that prunes a meaningful fraction of
  *    the pair space also misses qualifying pairs — and all-pairs
  *    similarity lower bounds say sub-quadratic exact algorithms don't
  *    exist for dense vectors at near-orthogonal thresholds. The exact
  *    tier therefore blocks on a user-supplied key (label, shard, ...)
  *    and verifies every in-block pair; it is the verification /
  *    oracle-checkable tier, and its cost is quadratic in block size BY
  *    CONSTRUCTION — the caller bounds block size, not the operator.
  *
  *  - At the thresholds real near-dup pipelines use (t >= ~0.85, the
  *    SemDeDup-style regime), banded sign-LSH candidates are the 100 TB
  *    path: nPlanes sign bits split into `bands` bands; a pair is a
  *    candidate iff it agrees on EVERY bit of at least one band
  *    (OR-of-ANDs amplification). Recall at cosine c is
  *    1 - (1 - p^r)^b with p = 1 - arccos(c)/π — e.g. ~0.96 at c = 0.9
  *    with 4 bands of 4 — and candidates are verified with the exact
  *    codegen'd cosine, so precision is always 1. Recall is measured
  *    against the exact tier in CosineNearDupSpec.
  */
object CosineNearDup {

  /** Exact pairs with cosine >= threshold within a blocking column.
    * Output: (da, db, cos) with da < db. One shuffle on the block key;
    * pair space is quadratic per block (see object doc). */
  def exactPairs(
      df: DataFrame, idCol: String, embCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("da"), col(embCol).as("ea"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("db"), col(embCol).as("eb"))
    a.join(b, Seq("blk"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), vec_cosine_sim(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate pairs via banded sign-LSH candidates + exact verify.
    * Deterministic hyperplanes ([[Knn.hyperplanes]]); candidates are an
    * equi-join on (band, band-bits) — the scale shape. Precision 1
    * (exact rerank); recall < 1 by construction, threshold-dependent.
    *
    * MULTIPROBE (`probeBits = 1`, the default): one join side also
    * emits every band key with `probeBits` bits flipped, so a pair is
    * a candidate when some band agrees on all bits OR differs in at
    * most that many — LSH multiprobe (Lv et al., VLDB'07), buying
    * recall with a few cheap integer probe rows per band instead of
    * more hash tables. Per-band match probability rises from p^r to
    * Σ_{k≤probeBits} C(r,k)·p^(r-k)·(1-p)^k where p = 1 - θ/π.
    * Probing ONE side only suffices: Hamming distance is symmetric,
    * so x's flipped key meeting y's exact key covers the pair
    * regardless of which side carries the differing bit.
    *
    * Defaults (24 planes, 6 bands of 4, flip-1) are tuned for the
    * LOW-threshold verification regime CosineNearDupSpec measures:
    * recall 0.86 at t = 0.35 on the fixture (theory: 1-(1-0.499)^6 ≈
    * 0.98 at the threshold angle; pairs near it drag the average),
    * floor-pinned ≥ 0.8. The trade is candidate selectivity — at
    * near-orthogonal thresholds high recall FORCES a dense candidate
    * set (see the object doc: no lossless pruning exists there), so
    * at 100 TB run the SemDeDup-style regime the doc prescribes
    * (t ≥ 0.85) with WIDER bands (`rows` ≥ 16, i.e. nPlanes = 16 ×
    * bands) and flip-1/2 probes: band width sets the random-pair
    * collision rate (≈ (1 + r + C(r,2))/2^r per band — vanishing at
    * r = 16), while multiprobe holds recall without extra tables. */
  def approxPairs(
      df: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double, nPlanes: Int = 24, bands: Int = 6,
      probeBits: Int = 1): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes $nPlanes must be divisible by bands $bands")
    require(probeBits >= 0 && probeBits <= 2, s"probeBits 0..2, got $probeBits")
    val rows = nPlanes / bands
    val mask = (1L << rows) - 1L
    // flip masks: 0 (exact), each single bit, each bit pair — the probe
    // side emits one key per mask per band
    val flips: Seq[Long] = 0L +:
      ((if (probeBits >= 1) (0 until rows).map(1L << _) else Seq.empty) ++
        (if (probeBits >= 2)
          for { i <- 0 until rows; j <- i + 1 until rows }
            yield (1L << i) | (1L << j)
        else Seq.empty))
    // Banding carries ONLY (id, band, key) — never the embedding arrays.
    // Candidate generation shuffles small integer rows; the (few)
    // surviving pairs join back to the vector table for the exact rerank.
    // bucketed feeds BOTH sides of the candidate self-join (probe +
    // exact); without staging each side re-scans the vectors and
    // re-computes all nPlanes sign dots (the plan showed the bucketing
    // Generate twice). 16 bytes/row checkpointed vs a second full
    // hashing pass (guide §2.4; Dedup.minHashNearDups pattern).
    val bucketed = Knn.withBuckets(df, embCol, nPlanes, dim)
      .select(col(idCol).as("id"), col("bucket"))
      .localCheckpoint(true) // eager: Dedup.minHashNearDups note
    def bandKey(b: Int) =
      shiftright(col("bucket"), b * rows).bitwiseAND(lit(mask))
    val exact = bucketed.select(col("id"),
      posexplode(array((0 until bands).map(bandKey): _*))
        .as(Seq("band", "key")))
    // probe side: the exact key plus (optionally) each single-bit flip
    val probed =
      if (probeBits == 0) exact
      else bucketed.select(col("id"),
        explode(array((for {
          b <- 0 until bands
          f <- flips
        } yield struct(
          lit(b).cast("int").as("band"),
          bandKey(b).bitwiseXOR(lit(f)).as("key")
        )): _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = probed.select(col("band"), col("key"), col("id").as("da"))
      .join(exact.select(col("band"), col("key"), col("id").as("db")), Seq("band", "key"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val vecs = df.select(col(idCol).as("id"), col(embCol).as("emb"))
    cands
      .join(vecs.select(col("id").as("da"), col("emb").as("ea")), "da")
      .join(vecs.select(col("id").as("db"), col("emb").as("eb")), "db")
      .select(col("da"), col("db"), vec_cosine_sim(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
