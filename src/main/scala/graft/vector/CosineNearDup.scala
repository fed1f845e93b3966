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
    * (exact rerank); recall < 1 by construction, threshold-dependent. */
  def approxPairs(
      df: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double, nPlanes: Int = 16, bands: Int = 4): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes $nPlanes must be divisible by bands $bands")
    val rows = nPlanes / bands
    val mask = (1L << rows) - 1L
    // Banding carries ONLY (id, band, key) — never the embedding arrays.
    // Candidate generation shuffles small integer rows; the (few)
    // surviving pairs join back to the vector table for the exact rerank.
    val bucketed = Knn.withBuckets(df, embCol, nPlanes, dim)
      .select(col(idCol).as("id"), col("bucket"))
    val banded = bucketed.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("bucket"), b * rows).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "key")))
    val cands = banded.select(col("band"), col("key"), col("id").as("da"))
      .join(banded.select(col("band"), col("key"), col("id").as("db")), Seq("band", "key"))
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
