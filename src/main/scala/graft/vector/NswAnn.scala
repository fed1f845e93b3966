package graft.vector

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ANN of the HNSW family: partition-sharded hierarchical
  * navigable-small-world graphs (HNSW, Malkov & Yashunin 2018) — the
  * third ANN tier next to sign-LSH ([[Knn]]) and IVF ([[Ivf]]),
  * covering the reference's actual vector store (HNSW via Chroma,
  * `/root/reference/src/api.py:38-42`).
  *
  * DISTRIBUTION MODEL. A graph walk is pointer-chasing: distributing ONE
  * graph across executors would pay a network hop per step, so nobody
  * does — production HNSW serving shards the corpus, builds an
  * independent per-shard graph, and scatter-gathers probes. That maps
  * exactly onto Spark: shard = partition (hash of the id), graph build +
  * beam search run inside `mapPartitions` (the one justified use: a
  * genuinely imperative in-memory structure per partition), and the
  * gather is a global top-k (`TakeOrderedAndProject`). Each shard must
  * fit one executor's memory — the same contract every HNSW shard has.
  * At 100 TB the shard count scales with the data and probes fan out to
  * all shards in parallel; build cost is one pass, O(n·ef) distance
  * computations per shard.
  *
  * HIERARCHY. Every node draws a top level from the standard geometric
  * distribution (`floor(-ln(u) · 1/ln(m))`), with `u` derived
  * DETERMINISTICALLY from the node's GLOBAL id via a splitmix64 mix —
  * the published distribution, but stable across runs AND across
  * partitionings of the same shard contents (no RNG state). Search
  * greedily descends from the top layer's entry point to layer 1
  * (ef=1 — one step of pointer chasing per layer, the log-factor
  * entry-point locator), then runs the `ef`-beam only on layer 0. Vs
  * the flat single-layer NSW this replaces, the beam starts next to
  * the query instead of at a fixed entry node, so it expands fewer
  * nodes for equal-or-better recall — asserted with counted distance
  * computations in NswAnnSpec, which pins hierarchical recall ≥ flat
  * recall at ≤ comparisons on the fixture. The log-scale descent is
  * what keeps per-shard search sublinear as shards grow past ~10⁶
  * vectors.
  *
  * Everything is deterministic — insertion in ascending id order,
  * levels from id bits, entry point = highest-level node (first
  * inserted wins ties), every comparator breaks ties by index — so
  * results are stable across runs and partitionings.
  *
  * Approximate by construction → rows-only driver gate (s04); recall vs
  * the exact brute-force tier is measured in NswAnnSpec.
  */
object NswAnn {

  /** Scatter-gather top-k: shard `emb` by id hash, build a per-shard
    * HNSW graph, descend + beam-search each shard for `probe`, merge
    * via global top-k. Returns (idCol, cos) — cosine similarity,
    * descending. */
  def search(
      emb: DataFrame, idCol: String, embCol: String, probe: Array[Float],
      k: Int, m: Int = 8, ef: Int = 32, shards: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb
      .select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .repartition(shards, pmod(col(idCol), lit(shards.toLong)))
    val local = ds.mapPartitions { it =>
      val nodes = it.toArray.sortBy(_._1)
      if (nodes.isEmpty) Iterator.empty
      else {
        val cnt = new DistCounter
        val g = build(nodes.map(_._1), nodes.map(_._2), m, ef, cnt)
        searchLocal(g, nodes.map(_._2), probe, math.max(ef, k), cnt)
          .take(k).map { case (i, cos) => (nodes(i)._1, cos) }.iterator
      }
    }.toDF(idCol, "cos")
    local.orderBy(desc("cos"), col(idCol)).limit(k)
  }

  // ---- shard-local graph (plain JVM, runs inside one task) ----

  /** Distance-computation counter — threaded through build and search
    * so NswAnnSpec can pin the hierarchy's cost claim. */
  private[vector] final class DistCounter { var n: Long = 0L }

  /** Per-node, per-layer adjacency plus the descent state. */
  private[vector] final class HnswGraph(
      val adj: Array[Array[mutable.ArrayBuffer[Int]]],
      val levels: Array[Int],
      val entry: Int,
      val maxLevel: Int)

  private def cosineDist(
      a: Array[Float], b: Array[Float], cnt: DistCounter): Double = {
    cnt.n += 1
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 1.0 else 1.0 - dot / den
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Geometric level draw, capped at 16 (a 16-layer entry path covers
    * m^16 nodes — far past any shard): the HNSW distribution with the
    * uniform taken from the id's mixed bits instead of RNG state. */
  private[vector] def levelOf(id: Long, m: Int): Int = {
    val bits = splitmix64(id) >>> 11 // 53 mantissa-grade bits
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0, 1]
    val l = math.floor(-math.log(u) / math.log(m.toDouble)).toInt
    math.min(l, 16)
  }

  /** HNSW construction: insert nodes in index order. Each new node
    * greedily descends from the current entry to its own top level,
    * then at every layer ≤ its level runs an `ef`-beam, links
    * bidirectionally to its `m` nearest, and trims overfull neighbors
    * to the closest (degree cap 2m on layer 0, m above — the published
    * maxM0/maxM split, neighbor selection simplified to pure
    * distance). */
  private[vector] def build(
      ids: Array[Long], vecs: Array[Array[Float]], m: Int, ef: Int,
      cnt: DistCounter, prefixAdj: Option[Array[Array[Array[Int]]]] = None)
      : HnswGraph = {
    val n = vecs.length
    val levels = Array.tabulate(n)(i => levelOf(ids(i), m))
    // RESUME (persisted-index refresh): `prefixAdj` is the stored
    // adjacency of the first p nodes IN INSERTION (ascending-id)
    // ORDER; construction continues from node p exactly where the
    // original build left off — insertion order and the deterministic
    // id-derived levels make the result bit-identical to building all
    // n nodes in one pass (pinned in AnnIndexSpec).
    val p = prefixAdj.map(_.length).getOrElse(0)
    val adj: Array[Array[mutable.ArrayBuffer[Int]]] =
      Array.tabulate(n) { i =>
        if (i < p) prefixAdj.get(i).map(ns => mutable.ArrayBuffer(ns: _*))
        else Array.fill(levels(i) + 1)(mutable.ArrayBuffer.empty[Int])
      }
    // entry after nodes 0..j: the FIRST node attaining the running
    // max level (build only moves the entry on a STRICT increase)
    var entry = 0
    var maxLevel = levels(0)
    (1 until math.max(p, 1)).foreach { j =>
      if (levels(j) > maxLevel) { entry = j; maxLevel = levels(j) }
    }
    var i = math.max(p, 1)
    while (i < n) {
      val li = levels(i)
      var ep = entry
      // phase 1: greedy descent through layers above the node's level
      var lc = maxLevel
      while (lc > li) {
        ep = greedyStep(adj, vecs, vecs(i), ep, lc, limit = i, cnt)
        lc -= 1
      }
      // phase 2: beam + link at every shared layer, top-down
      lc = math.min(maxLevel, li)
      while (lc >= 0) {
        val found = beamLayer(adj, vecs, vecs(i), ep, lc, ef, limit = i, cnt)
        val maxDeg = if (lc == 0) 2 * m else m
        found.take(m).foreach { case (j, _) =>
          adj(i)(lc) += j
          adj(j)(lc) += i
          if (adj(j)(lc).length > maxDeg) {
            val trimmed = adj(j)(lc).toArray
              .map(x => (x, cosineDist(vecs(j), vecs(x), cnt)))
              .sortBy { case (x, d) => (d, x) }
              .take(maxDeg).map(_._1)
            adj(j)(lc).clear(); adj(j)(lc) ++= trimmed
          }
        }
        if (found.nonEmpty) ep = found.head._1
        lc -= 1
      }
      if (li > maxLevel) { entry = i; maxLevel = li }
      i += 1
    }
    new HnswGraph(adj, levels, entry, maxLevel)
  }

  /** One greedy layer walk (the ef=1 descent primitive): follow the
    * steepest-improvement neighbor at `layer` until no neighbor is
    * closer. Ties break by index via strict improvement. */
  private def greedyStep(
      adj: Array[Array[mutable.ArrayBuffer[Int]]],
      vecs: Array[Array[Float]], q: Array[Float], start: Int, layer: Int,
      limit: Int, cnt: DistCounter): Int = {
    var cur = start
    var curD = cosineDist(vecs(cur), q, cnt)
    var improved = true
    while (improved) {
      improved = false
      val nbs = if (layer < adj(cur).length) adj(cur)(layer)
        else mutable.ArrayBuffer.empty[Int]
      nbs.foreach { nb =>
        if (nb < limit) {
          val d = cosineDist(vecs(nb), q, cnt)
          if (d < curD) { cur = nb; curD = d; improved = true }
        }
      }
    }
    cur
  }

  /** Beam search at one layer from entry `ep` over nodes `< limit`:
    * expand the nearest unexpanded candidate until the best `ef`
    * results cannot improve. Returns (index, dist) ascending by
    * (dist, index). */
  private def beamLayer(
      adj: Array[Array[mutable.ArrayBuffer[Int]]],
      vecs: Array[Array[Float]], q: Array[Float], ep: Int, layer: Int,
      ef: Int, limit: Int, cnt: DistCounter): Array[(Int, Double)] = {
    // min-heap of frontier, max-heap of current best `ef` (both (dist, id))
    val frontier = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.Tuple2[Double, Int].reverse)
    val best = mutable.PriorityQueue.empty[(Double, Int)]
    val visited = new java.util.BitSet(limit)
    val d0 = cosineDist(vecs(ep), q, cnt)
    frontier.enqueue((d0, ep)); best.enqueue((d0, ep)); visited.set(ep)
    while (frontier.nonEmpty) {
      val (dc, c) = frontier.dequeue()
      if (dc > best.head._1 && best.size >= ef) {
        frontier.clear() // nearest frontier node can't improve the beam
      } else {
        val nbs = if (layer < adj(c).length) adj(c)(layer)
          else mutable.ArrayBuffer.empty[Int]
        nbs.foreach { nb =>
          if (nb < limit && !visited.get(nb)) {
            visited.set(nb)
            val d = cosineDist(vecs(nb), q, cnt)
            if (best.size < ef || d < best.head._1) {
              frontier.enqueue((d, nb)); best.enqueue((d, nb))
              if (best.size > ef) best.dequeue()
            }
          }
        }
      }
    }
    best.dequeueAll.toArray.map { case (d, i) => (i, d) }
      .sortBy { case (i, d) => (d, i) }
  }

  /** Hierarchical search: greedy descent from the top layer to layer 1,
    * then the full `ef`-beam on layer 0. Returns (index, cosine
    * similarity) best-first. */
  private[vector] def searchLocal(
      g: HnswGraph, vecs: Array[Array[Float]], probe: Array[Float],
      ef: Int, cnt: DistCounter): Array[(Int, Double)] = {
    var ep = g.entry
    var lc = g.maxLevel
    while (lc >= 1) {
      ep = greedyStep(g.adj, vecs, probe, ep, lc, limit = vecs.length, cnt)
      lc -= 1
    }
    beamLayer(g.adj, vecs, probe, ep, 0, ef, limit = vecs.length, cnt)
      .map { case (i, d) => (i, 1.0 - d) } // back to cosine similarity
  }

  /** The flat-NSW baseline the hierarchy replaced: the same layer-0
    * beam but from the FIXED first-inserted entry node — kept
    * package-private so NswAnnSpec can pin the hierarchy's
    * equal-or-better-recall-at-lower-cost claim with counted distance
    * computations. */
  private[vector] def flatSearchLocal(
      g: HnswGraph, vecs: Array[Array[Float]], probe: Array[Float],
      ef: Int, cnt: DistCounter): Array[(Int, Double)] =
    beamLayer(g.adj, vecs, probe, 0, 0, ef, limit = vecs.length, cnt)
      .map { case (i, d) => (i, 1.0 - d) }
}
