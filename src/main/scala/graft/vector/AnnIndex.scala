package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Versioned, VersionedScan}

/** PERSISTED ANN indexes — the vector-side twin of the d11 MinHash
  * signature index: the expensive build artifacts (IVF centroids +
  * inverted-list assignments, PQ codebooks + codes) are committed as
  * ordinary versioned graft tables, so a retrieval session LOADS the
  * index instead of rebuilding it per query run, and an append to the
  * corpus extends the index incrementally instead of retraining.
  *
  * The incremental contract mirrors FAISS's operational model: the
  * trained structures (coarse quantizer, codebooks) are FROZEN at
  * build; `ensure*` assigns/encodes ONLY the not-yet-indexed vectors
  * against the frozen structures and appends them — bit-identical to
  * what a full assignment/encode pass over the grown corpus would
  * produce with the same frozen structures (pinned in AnnIndexSpec).
  * Retraining the quantizer itself is an explicit rebuild (drop the
  * index root), the same way d11 re-shingles only under an explicit
  * recompute.
  *
  * Staleness detection is a distributed anti-join on the id column —
  * O(corpus ⋈ index-ids), no driver-side id set. When nothing is new
  * the append lands zero rows and [[Versioned.appendCommit]]'s
  * empty-batch path mints NO version — "run 2 reuses the committed
  * index with zero rebuild" is observable as an unchanged version
  * number, which the s15 gate emits as columns.
  *
  * At 100 TB: the centroids/codebooks are model-sized broadcast tables;
  * the assignments/codes tables are the bucketed serving layout
  * (clustered by id via the commit key) and an incremental refresh
  * costs O(delta) assignment work + one manifest — never a rescan of
  * the indexed corpus.
  */
object AnnIndex {

  def ivfCentroidsTable(root: String): String = s"$root/ivf_centroids"
  def ivfAssignmentsTable(root: String): String = s"$root/ivf_assignments"
  def pqCodebooksTable(root: String): String = s"$root/pq_codebooks"
  def pqCodesTable(root: String): String = s"$root/pq_codes"

  /** Ensure the persisted IVF index at `root` covers every row of
    * `emb`: the first call trains the coarse quantizer and assigns the
    * whole corpus (one commit per index table); later calls append
    * assignments for ONLY the unindexed ids against the FROZEN
    * committed centroids, and mint nothing when the index is already
    * current. Returns (centroidsVersion, assignmentsVersion). */
  def ensureIvf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, k: Int): (Long, Long) = {
    val (cT, aT) = (ivfCentroidsTable(root), ivfAssignmentsTable(root))
    // bootstrap-complete is judged by the LAST artifact: a crash
    // between the two bootstrap commits leaves centroids without
    // assignments, and the repair path must stay reachable (training
    // only re-runs if the centroids commit itself is missing)
    if (Versioned.latestVersion(spark, aT) == 0L) {
      if (Versioned.latestVersion(spark, cT) == 0L)
        Versioned.commit(spark, cT,
          Ivf.centroids(emb, idCol, embCol, k), Some("cid"), files = 1)
      // assign against the COMMITTED centroids (doubles round-trip
      // parquet exactly), so the stored assignment is the one every
      // later load reproduces
      Versioned.commit(spark, aT,
        Ivf.assign(emb, idCol, embCol, VersionedScan.read(spark, cT)),
        Some(idCol), files = 4)
    } else {
      val (cents, asg) = loadIvf(spark, root)
      val delta = emb.join(asg.select(idCol), Seq(idCol), "left_anti")
      Versioned.appendCommit(spark, aT,
        Ivf.assign(delta, idCol, embCol, cents), Some(idCol), files = 1)
    }
    (Versioned.latestVersion(spark, cT), Versioned.latestVersion(spark, aT))
  }

  /** Load the committed IVF index: (centroids, assignments). */
  def loadIvf(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (VersionedScan.read(spark, ivfCentroidsTable(root)),
      VersionedScan.read(spark, ivfAssignmentsTable(root)))

  /** [[Ivf.search]] over the COMMITTED index — the serving path that
    * pays load, not build. */
  def searchIvf(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    Ivf.search(emb, asg, cents, idCol, embCol, probeDf, probeCol, k, nProbe)
  }

  /** Ensure the persisted PQ index at `root` covers every row of
    * `emb`: first call trains the per-subspace codebooks and encodes
    * the corpus; later calls encode ONLY unindexed ids against the
    * FROZEN committed codebooks. Returns (codebooksVersion,
    * codesVersion). */
  def ensurePq(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int, k: Int): (Long, Long) = {
    val (bT, cT) = (pqCodebooksTable(root), pqCodesTable(root))
    // same bootstrap-repair shape as ensureIvf: branch on the LAST
    // artifact so a crash between the two commits is recoverable
    if (Versioned.latestVersion(spark, cT) == 0L) {
      if (Versioned.latestVersion(spark, bT) == 0L)
        Versioned.commit(spark, bT,
          Pq.codebooks(emb, idCol, embCol, m, k), Some("sub"), files = 1)
      Versioned.commit(spark, cT,
        Pq.encode(emb, idCol, embCol, VersionedScan.read(spark, bT), m),
        Some(idCol), files = 4)
    } else {
      val (books, codes) = loadPq(spark, root)
      val delta = emb.join(codes.select(idCol).distinct(),
        Seq(idCol), "left_anti")
      Versioned.appendCommit(spark, cT,
        Pq.encode(delta, idCol, embCol, books, m), Some(idCol), files = 1)
    }
    (Versioned.latestVersion(spark, bT), Versioned.latestVersion(spark, cT))
  }

  /** Load the committed PQ index: (codebooks, codes). */
  def loadPq(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (VersionedScan.read(spark, pqCodebooksTable(root)),
      VersionedScan.read(spark, pqCodesTable(root)))

  def nswEdgesTable(root: String): String = s"$root/nsw_edges"

  /** Ensure the persisted HNSW index at `root` covers every row of
    * `emb`. The per-shard graphs serialize as an EDGE table
    * `(shard, src, layer, rank, dst)` — `rank` preserves adjacency
    * LIST ORDER so a reconstructed graph walks identically to the
    * built one; a `layer = -1` marker row per node records membership
    * (a single-node shard has no edges). A refresh RESUMES each
    * shard's insertion-ordered construction from the stored adjacency
    * when every new id sorts after the shard's indexed ids (the
    * ascending-id append pattern — identity-keyed corpora always
    * qualify), computing O(delta · ef) distances; interleaved ids
    * rebuild only their own shard. Either way the committed graph is
    * bit-identical to a from-scratch build over the grown corpus
    * (insertion order and id-derived levels are deterministic —
    * pinned in AnnIndexSpec), and the new edge set lands as one
    * copy-on-write commit: graph edges mutate under insertion (trim
    * touches old nodes), so the refresh is an index-sized rewrite,
    * never a corpus rescan. Returns the edge-table version; an
    * up-to-date index mints nothing. */
  def ensureNsw(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, m: Int = 8, ef: Int = 32,
      shards: Int = 4): Long = {
    val eT = nswEdgesTable(root)
    val prior =
      if (Versioned.latestVersion(spark, eT) == 0L) None
      else Some(VersionedScan.read(spark, eT))
    prior.foreach { edges =>
      val indexed = edges.filter(col("layer") === -1)
        .select(col("src").as(idCol))
      if (emb.join(indexed, Seq(idCol), "left_anti").isEmpty)
        return Versioned.latestVersion(spark, eT)
    }
    Versioned.commit(spark, eT,
      nswEdgeSet(emb, idCol, embCol, m, ef, shards, prior),
      Some("src"), files = shards)
  }

  /** Scatter-gather top-k over the COMMITTED per-shard graphs: load
    * edges, reconstruct each shard's adjacency (inserting any
    * not-yet-committed tail in memory, without committing), beam-search,
    * merge via global top-k — [[NswAnn.search]]'s plan with the build
    * replaced by a load. */
  def searchNsw(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probe: Array[Float], k: Int,
      m: Int = 8, ef: Int = 32, shards: Int = 4): DataFrame = {
    import spark.implicits._
    val edges = VersionedScan.read(spark, nswEdgesTable(root))
    val local = cogroupShards(emb, idCol, embCol, edges, shards) {
      (_, nodes, edgeRows) =>
        val cnt = new NswAnn.DistCounter
        val g = resumeShard(nodes, edgeRows, m, ef, cnt)
        NswAnn.searchLocal(g, nodes.map(_._2), probe, math.max(ef, k), cnt)
          .take(k).map { case (i, cos) => (nodes(i)._1, cos) }.iterator
    }.toDF(idCol, "cos")
    local.orderBy(desc("cos"), col(idCol)).limit(k)
  }

  /** Full edge set for the grown corpus: per shard, resume (or
    * rebuild) the graph, then serialize markers + ordered adjacency. */
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
        val markers = nodes.iterator.map(n => (shard, n._1, -1, 0, n._1))
        val links = g.adj.iterator.zipWithIndex.flatMap { case (layers, i) =>
          layers.iterator.zipWithIndex.flatMap { case (ns, layer) =>
            ns.iterator.zipWithIndex.map { case (j, rank) =>
              (shard, nodes(i)._1, layer, rank, nodes(j)._1)
            }
          }
        }
        markers ++ links
    }.toDF("shard", "src", "layer", "rank", "dst")
  }

  /** Co-partition vectors and index edges by shard and run `f` once
    * per shard with the sorted node array + its edge rows. */
  private def cogroupShards[T: org.apache.spark.sql.Encoder](
      emb: DataFrame, idCol: String, embCol: String,
      edges: DataFrame, shards: Int)(
      f: (Long, Array[(Long, Array[Float])],
          Array[(Long, Long, Int, Int, Long)]) => Iterator[T])
      : org.apache.spark.sql.Dataset[T] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vds = emb.select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<float>").as("v"))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
      .as[(Long, Array[Float], Long)]
      .groupByKey(_._3)
    val eds = edges
      .select(col("shard").cast("long"), col("src").cast("long"),
        col("layer").cast("int"), col("rank").cast("int"),
        col("dst").cast("long"))
      .as[(Long, Long, Int, Int, Long)]
      .groupByKey(_._1)
    vds.cogroup(eds) { (shard, vit, eit) =>
      val nodes = vit.toArray.map(t => (t._1, t._2)).sortBy(_._1)
      if (nodes.isEmpty) Iterator.empty
      else f(shard, nodes, eit.toArray)
    }
  }

  /** Reconstruct a shard's graph from stored edges and CONTINUE the
    * insertion-ordered build for any ids past the indexed prefix.
    * Stored adjacency is usable as a resume prefix only when the
    * indexed ids are EXACTLY the ascending-id prefix of the current
    * shard contents; otherwise (interleaved inserts, foreign rows)
    * the shard rebuilds from scratch — both paths land on the same
    * graph a full build produces. */
  private def resumeShard(nodes: Array[(Long, Array[Float])],
      edgeRows: Array[(Long, Long, Int, Int, Long)], m: Int, ef: Int,
      cnt: NswAnn.DistCounter): NswAnn.HnswGraph = {
    val ids = nodes.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val oldIds = edgeRows.iterator.filter(_._3 == -1).map(_._2).toSet
    val p = ids.segmentLength(oldIds.contains, 0)
    val prefixUsable = oldIds.nonEmpty && p == oldIds.size &&
      oldIds.forall(idx.contains)
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

  /** [[Pq.searchIvfPq]] over the COMMITTED IVF routing + PQ codes —
    * the full billion-scale serving layout with every build artifact
    * loaded, none rebuilt. */
  def searchIvfPq(spark: SparkSession, root: String, emb: DataFrame,
      idCol: String, embCol: String, probeDf: DataFrame, probeCol: String,
      m: Int, k: Int, nProbe: Int, pool: Int): DataFrame = {
    val (cents, asg) = loadIvf(spark, root)
    val (books, codes) = loadPq(spark, root)
    Pq.searchIvfPq(emb, asg, cents, codes, books, idCol, embCol,
      probeDf, probeCol, m, k, nProbe, pool)
  }
}
