package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{vec_cosine_sim, vec_l2}

/** IVF-style approximate nearest neighbor: a coarse quantizer assigns
  * every vector to its nearest centroid ("inverted list"); a probe
  * searches only the nProbe nearest lists and exact-reranks. The
  * second ANN family next to sign-LSH ([[Knn]]): LSH partitions by
  * random projection, IVF by data-dependent clustering — at 100 TB the
  * inverted lists are the partition/bucket layout, so a probe touches
  * nProbe/k of the data.
  *
  * The quantizer here is deterministic (stratified means by id, one
  * Lloyd refinement) — a stand-in with the same plan shape as k-means||
  * centroids, which would plug in unchanged. Everything is lazy
  * DataFrame work: centroids broadcast (k rows), assignment is a
  * per-row argmin, search is a semi-join on the list id.
  */
object Ivf {

  /** Deterministic coarse centroids: stratify by `id mod k`, take
    * elementwise means, then one Lloyd refinement (re-assign, re-mean).
    * Output: (cid, centroid array<double>). */
  def centroids(emb: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val seed = meanByGroup(
      emb.withColumn("cid", pmod(col(idCol), lit(k.toLong))), embCol)
    val refined = meanByGroup(assign(emb, idCol, embCol, seed).join(
      emb.select(col(idCol), col(embCol)), idCol), embCol)
    // k tiny rows hiding ~3 corpus passes (seed means + re-assign +
    // re-mean): materialize once so consumers that reference the
    // quantizer more than once (assign + search in one plan — s03/
    // s12/s13's shape) never re-run the training (guide §2.4). Eager:
    // Dedup.minHashNearDups note.
    refined.localCheckpoint(true)
  }

  private def meanByGroup(df: DataFrame, embCol: String): DataFrame =
    df.select(col("cid"), posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy("cid", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        t => t.getField("m")).as("centroid"))

  /** Nearest-centroid assignment: (id, cid). Centroids broadcast; the
    * argmin is a per-row aggregate over the k broadcast rows. */
  def assign(emb: DataFrame, idCol: String, embCol: String, cents: DataFrame): DataFrame =
    emb.select(col(idCol), col(embCol))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"), vec_l2(col(embCol), col("centroid")).as("dist"))
      .groupBy(idCol)
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))

  /** Multi-assignment ([[assign]] + boundary SPILL — the FAISS/ScaNN
    * recipe for the routing-recall ceiling): every vector gets its
    * nearest list (`cid`, identical to [[assign]] — same lexicographic
    * (dist, cid) tie-break), and a vector whose SECOND-nearest
    * centroid nearly ties (d2 <= (1+eps) * d1 in L2) also joins that
    * list (`cid2`, else null). A probe at nProbe lists then finds
    * boundary vectors its routing would otherwise drop — the recall
    * lever that does NOT widen the scan for interior vectors: the
    * index grows by the spill fraction only (eps=0.2 spilled ~24% of
    * the 2.2M rehearsal corpus). Plan shape is [[assign]]'s one
    * broadcast cross; the two-slot runner-up rides
    * [[graft.functions.Min2ByAgg]] (mergeable O(1) partials — never a
    * per-id k-wide sort). */
  /** THE spill-band predicate over [[graft.functions.Min2ByAgg]]'s
    * (d1, d2) pair — one definition shared by [[assignSpill]] and the
    * spill-curve preview, so what the preview counts is exactly what
    * the build would land. Spills only off a FINITE nearest distance:
    * a NULL embedding's distances all map to the nulls-first sentinel
    * (-Inf) and a NaN-component embedding's are all NaN (NaN <= NaN
    * holds under Spark's NaN-equals-NaN semantics) — both keep the
    * plain path's primary WITHOUT fabricating a spill into an
    * arbitrary second list. */
  private[vector] def spillBand(d1: org.apache.spark.sql.Column,
      d2: org.apache.spark.sql.Column,
      eps: Double): org.apache.spark.sql.Column =
    d2.isNotNull && !isnan(d1) &&
      d1 > lit(Double.NegativeInfinity) && d2 <= d1 * (1.0 + eps)

  /** The (d1, d2) two-nearest-centroid pairs per id — the shared
    * first stage of [[assignSpill]] and the preview curve. */
  private[vector] def twoNearest(emb: DataFrame, idCol: String,
      embCol: String, cents: DataFrame): DataFrame = {
    import graft.functions.Min2ByAgg.min2_by
    emb.select(col(idCol), col(embCol))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"),
        vec_l2(col(embCol), col("centroid")).as("dist"))
      .groupBy(idCol)
      .agg(min2_by(col("dist"), col("cid")).as("m2"))
  }

  def assignSpill(emb: DataFrame, idCol: String, embCol: String,
      cents: DataFrame, eps: Double): DataFrame = {
    require(eps > 0.0,
      s"assignSpill: eps must be positive (got $eps) — eps = 0 is " +
        "single assignment, call assign")
    twoNearest(emb, idCol, embCol, cents)
      .select(col(idCol), col("m2.c1").as("cid"),
        when(spillBand(col("m2.d1"), col("m2.d2"), eps), col("m2.c2"))
          .as("cid2"))
  }

  /** The (id, cid) MEMBERSHIP pairs of an assignment frame: one row
    * per list a vector belongs to — the spilled runner-up rows ride
    * along when the frame carries them, and a plain single-assignment
    * frame passes through unchanged (no union in the plan). Every
    * routing consumer (search, layout build, refresh dirty-list
    * resolution) goes through here so spilled and plain roots cannot
    * diverge. */
  private[vector] def memberPairs(asg: DataFrame, idCol: String): DataFrame =
    if (!asg.columns.contains("cid2")) asg.select(col(idCol), col("cid"))
    else asg.select(col(idCol), col("cid")).unionByName(
      asg.filter(col("cid2").isNotNull)
        .select(col(idCol), col("cid2").as("cid")))

  /** Int8 component levels for the stored scan layout: per-tensor
    * symmetric quantization (q = floor(v / max|v| * 127 + 0.5), the
    * s05 recipe — one global scale, so integer dots are the true dots
    * times one constant, ranking-preserving). Returns (levels, scale):
    * levels = (id, d, qv) exploded components, scale = the 1-row
    * global max|v| kept so a PROBE can be quantized into the same
    * level space at search time. At 100 TB the levels table IS the
    * index file layout — 1 byte per component instead of 4 — and the
    * scale is index metadata computed once at build. */
  def quantize(emb: DataFrame, idCol: String, embCol: String): (DataFrame, DataFrame) = {
    val comp = emb.select(col(idCol), posexplode(col(embCol)).as(Seq("d", "v")))
      .select(col(idCol), col("d"), col("v").cast("double").as("v"))
    val g = comp.agg(max(abs(col("v"))).as("g"))
    val levels = comp.crossJoin(broadcast(g))
      .select(col(idCol), col("d"),
        floor(col("v") / col("g") * 127.0 + 0.5).cast("long").as("qv"))
    (levels, g)
  }

  /** IVF + int8 scan + exact rerank — the composed serving tier
    * (FAISS IVF-SQ shape): route the probe to its nProbe nearest
    * lists, scan ONLY those lists' quantized levels with an integer
    * dot, keep a bounded candidate `pool`, then exact-cosine-rerank
    * the pool against full-precision vectors. At 100 TB the three
    * stages are the whole memory story: routing touches k centroid
    * rows, the scan streams 1-byte levels for nProbe/k of the data,
    * and full-precision vectors are fetched for `pool` rows only.
    * The levels travel pre-joined with their list id (`levels` ⋈
    * `assigned` below) — stored clustered BY list, so "search nProbe
    * lists" is partition pruning, not a join, in the stored layout. */
  def searchQuantized(
      emb: DataFrame, assigned: DataFrame, cents: DataFrame,
      levels: DataFrame, scale: DataFrame,
      idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int, pool: Int): DataFrame = {
    val probe = probeDf.select(col(probeCol).as("__probe"))
    val lists = broadcast(cents).crossJoin(broadcast(probe))
      .select(col("cid"), vec_l2(col("centroid"), col("__probe")).as("cdist"))
      .orderBy(col("cdist"), col("cid")).limit(nProbe)
      .select("cid")
    // probe levels in the index's own level space (same global scale)
    val pv = probe.select(posexplode(col("__probe")).as(Seq("d", "v")))
      .crossJoin(broadcast(scale))
      .select(col("d"),
        floor(col("v").cast("double") / col("g") * 127.0 + 0.5).cast("long").as("pv"))
    val poolIds = levels.join(assigned, idCol)
      .join(broadcast(lists), "cid")
      .join(broadcast(pv), "d")
      .groupBy(idCol)
      .agg(sum(col("qv") * col("pv")).as("qscore"))
      .orderBy(desc("qscore"), col(idCol)).limit(pool)
      .select(idCol)
    emb.join(broadcast(poolIds), idCol)
      .crossJoin(broadcast(probe))
      .select(col(idCol), vec_cosine_sim(col(embCol), col("__probe")).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Approximate top-k for a PROBE SET — the serving path a retrieval
    * session should call instead of one [[search]] plan per question:
    * centroids rank against every probe in one broadcast cross
    * (probes × k rows, both serving-batch-sized), each probe keeps its
    * nProbe lists, ONE pass over the assignment fans candidate rows to
    * the probes whose lists they sit in, and the exact cosine rerank
    * is a per-probe PARTITIONED window — never a global funnel.
    * Returns (probeIdCol, idCol, score), top-k per probe by
    * (score desc, id); per-probe results are exactly [[search]]'s
    * (pinned in IvfSpec). */
  def searchBatch(
      emb: DataFrame, assigned: DataFrame, cents: DataFrame,
      idCol: String, embCol: String,
      probes: DataFrame, probeIdCol: String, probeCol: String,
      k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probeIdCol != idCol,
      s"probe id column '$probeIdCol' must differ from the corpus id " +
        "column — both appear in the result")
    val p = probes.select(col(probeIdCol).as("__pid"),
      col(probeCol).as("__probe"))
    val ranked = broadcast(cents).crossJoin(broadcast(p))
      .select(col("__pid"), col("cid"),
        vec_l2(col("centroid"), col("__probe")).as("cdist"))
    val w0 = Window.partitionBy("__pid").orderBy(col("cdist"), col("cid"))
    val lists = ranked.withColumn("__r", row_number().over(w0))
      .filter(col("__r") <= nProbe).select("__pid", "cid")
    // spilled roots dedup per (probe, id) BEFORE the rerank — a
    // boundary vector in two of one probe's lists must score once;
    // plain roots keep the exact r15 plan
    val fanned =
      if (!assigned.columns.contains("cid2"))
        emb.select(col(idCol), col(embCol))
          .join(assigned, idCol)
          .join(broadcast(lists), "cid")
      else emb.select(col(idCol), col(embCol))
        .join(memberPairs(assigned, idCol)
          .join(broadcast(lists), "cid")
          .select(col("__pid"), col(idCol)).distinct(), idCol)
    val cand = fanned
      .join(broadcast(p), "__pid")
      .select(col("__pid"), col(idCol),
        vec_cosine_sim(col(embCol), col("__probe")).as("score"))
    val w = Window.partitionBy("__pid").orderBy(desc("score"), col(idCol))
    cand.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
      .select(col("__pid").as(probeIdCol), col(idCol), col("score"))
      .orderBy(col(probeIdCol), desc("score"), col(idCol))
  }

  /** Approximate top-k for a one-row probe DataFrame: rank centroids
    * against the probe, keep nProbe lists, semi-join the assignment,
    * exact-rerank by cosine. Fully lazy. */
  def search(
      emb: DataFrame, assigned: DataFrame, cents: DataFrame,
      idCol: String, embCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nProbe: Int): DataFrame = {
    val probe = probeDf.select(col(probeCol).as("__probe"))
    val lists = broadcast(cents).crossJoin(broadcast(probe))
      .select(col("cid"), vec_l2(col("centroid"), col("__probe")).as("cdist"))
      .orderBy(col("cdist"), col("cid")).limit(nProbe)
      .select("cid")
    // a SPILLED assignment can route the same id through two probed
    // lists — dedup the candidate id set before the rerank (the
    // distinct is spilled-roots-only; a plain root keeps the exact
    // r15 plan, no extra exchange)
    val cand =
      if (!assigned.columns.contains("cid2"))
        emb.select(col(idCol), col(embCol))
          .join(assigned, idCol)
          .join(broadcast(lists), "cid")
      else emb.select(col(idCol), col(embCol))
        .join(memberPairs(assigned, idCol)
          .join(broadcast(lists), "cid")
          .select(col(idCol)).distinct(), idCol)
    cand
      .crossJoin(broadcast(probe))
      .select(col(idCol), vec_cosine_sim(col(embCol), col("__probe")).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
