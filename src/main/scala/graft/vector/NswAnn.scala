package graft.vector

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ANN of the HNSW family: partition-sharded navigable-small-world
  * graphs (NSW, Malkov et al. 2014) — the third ANN tier next to
  * sign-LSH ([[Knn]]) and IVF ([[Ivf]]), covering the reference's actual
  * vector store (HNSW via Chroma, `/root/reference/src/api.py:38-42`).
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
  * Single-layer NSW rather than hierarchical HNSW: at executor-sized
  * shards the hierarchy's log-factor entry-point speedup is marginal,
  * while a single layer keeps construction deterministic and memory
  * bounded. Everything is deterministic — insertion in ascending id
  * order, entry point = first inserted node, every comparator breaks
  * ties by id — so results are stable across runs and partitionings of
  * the same shard contents.
  *
  * Approximate by construction → rows-only driver gate (s04); recall vs
  * the exact brute-force tier is measured in NswAnnSpec.
  */
object NswAnn {

  /** Scatter-gather top-k: shard `emb` by id hash, build a per-shard NSW
    * graph, beam-search each shard for `probe`, merge via global top-k.
    * Returns (idCol, cos) — cosine similarity, descending. */
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
        val g = build(nodes.map(_._2), m, ef)
        topOf(g, nodes.map(_._2), probe, math.max(ef, k))
          .take(k).map { case (i, cos) => (nodes(i)._1, cos) }.iterator
      }
    }.toDF(idCol, "cos")
    local.orderBy(desc("cos"), col(idCol)).limit(k)
  }

  // ---- shard-local graph (plain JVM, runs inside one task) ----

  private type Graph = Array[mutable.ArrayBuffer[Int]]

  private def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 1.0 else 1.0 - dot / den
  }

  /** NSW construction: insert nodes in index order; each new node links
    * bidirectionally to its `m` nearest among the already-inserted,
    * found by beam search over the graph built so far. Degrees are
    * capped at 2m, trimming to the closest (HNSW's neighbor-selection
    * rule, simplified to pure distance). */
  private def build(vecs: Array[Array[Float]], m: Int, ef: Int): Graph = {
    val adj: Graph = Array.fill(vecs.length)(mutable.ArrayBuffer.empty[Int])
    val maxDeg = 2 * m
    var i = 1
    while (i < vecs.length) {
      val found = beam(adj, vecs, vecs(i), ef, limit = i)
      found.take(m).foreach { case (j, _) =>
        adj(i) += j
        adj(j) += i
        if (adj(j).length > maxDeg) {
          val trimmed = adj(j).toArray
            .map(x => (x, cosineDist(vecs(j), vecs(x))))
            .sortBy { case (x, d) => (d, x) }
            .take(maxDeg).map(_._1)
          adj(j).clear(); adj(j) ++= trimmed
        }
      }
      i += 1
    }
    adj
  }

  /** Greedy beam search from the entry node (index 0) over nodes
    * `< limit`: expand the nearest unexpanded candidate until the best
    * `ef` results cannot improve. Returns (index, dist) ascending by
    * (dist, index). */
  private def beam(
      adj: Graph, vecs: Array[Array[Float]], q: Array[Float],
      ef: Int, limit: Int): Array[(Int, Double)] = {
    // min-heap of frontier, max-heap of current best `ef` (both (dist, id))
    val frontier = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.Tuple2[Double, Int].reverse)
    val best = mutable.PriorityQueue.empty[(Double, Int)]
    val visited = new java.util.BitSet(limit)
    val d0 = cosineDist(vecs(0), q)
    frontier.enqueue((d0, 0)); best.enqueue((d0, 0)); visited.set(0)
    while (frontier.nonEmpty) {
      val (dc, c) = frontier.dequeue()
      if (dc > best.head._1 && best.size >= ef) {
        frontier.clear() // nearest frontier node can't improve the beam
      } else {
        adj(c).foreach { nb =>
          if (nb < limit && !visited.get(nb)) {
            visited.set(nb)
            val d = cosineDist(vecs(nb), q)
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

  private def topOf(
      g: Graph, vecs: Array[Array[Float]], probe: Array[Float],
      ef: Int): Array[(Int, Double)] =
    beam(g, vecs, probe, ef, limit = vecs.length)
      .map { case (i, d) => (i, 1.0 - d) } // back to cosine similarity
}
