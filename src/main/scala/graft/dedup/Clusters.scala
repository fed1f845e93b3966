package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: connected components over a near-dup
  * pair list (the "connected grouping" step that turns pairwise
  * matches into dedup groups, SURVEY.md §2-B dedup row).
  *
  * Iterative min-label propagation — each node repeatedly adopts the
  * smallest label among itself and its neighbors; converges in
  * O(component diameter) rounds, and near-dup components are shallow
  * (dups of one source document), so a handful of rounds suffice. This
  * is the standard Pregel-style formulation: a per-round action drives
  * the fixpoint check, and `localCheckpoint` truncates lineage so plans
  * don't grow with iteration count (both inherent to iterate-to-
  * fixpoint on Spark, not driver-side data processing — per-round work
  * is joins/aggregations on the cluster).
  */
object Clusters {

  /** Components of the undirected graph given by (aCol, bCol) edges.
    * Output: (node, cluster) where cluster = min node id reachable. */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint(true)
    // Init FUSES the first propagation round: lbl = min(self, direct
    // neighbors) comes out of the same groupBy that would otherwise
    // just enumerate nodes — one round (join + materialize + count)
    // saved on every graph, and pair components (the dominant near-dup
    // shape) are already converged here.
    var labels = sym.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), col("u")).as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("v"), col("lbl").as("vlbl")), "v")
        .groupBy(col("u").as("node")).agg(min("vlbl").as("nbr_lbl"))
      // POINTER JUMP (label-of-label): every label is itself a node of
      // the same component, so adopting lbl(lbl(node)) propagates two
      // hops per round — O(log diameter) rounds instead of
      // O(diameter), each round one extra tiny label self-join. Same
      // fixpoint (min reachable node), just reached faster.
      val ptr = labels.select(col("node").as("pn"), col("lbl").as("plbl"))
      val updated = labels
        .join(nbrMin, Seq("node"), "left")
        .join(ptr, col("lbl") === col("pn"), "left")
        .select(col("node"), col("lbl"),
          least(col("lbl"),
            least(coalesce(col("nbr_lbl"), col("lbl")),
              coalesce(col("plbl"), col("lbl")))).as("new_lbl"))
        .localCheckpoint(true)
      changed = updated.filter(col("new_lbl") < col("lbl")).count()
      labels = updated.select(col("node"), col("new_lbl").as("lbl"))
      iter += 1
    }
    // A silent exit at maxIter with propagation still in flight would
    // return labels that are NOT components (nodes of one component
    // carrying different labels) — fail loudly instead; the caller
    // raises maxIter for unusually deep graphs.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still changing); raise maxIter for deep components")
    labels.select(col("node"), col("lbl").as("cluster"))
  }
}
