package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vec_l2

/** Distributed Lloyd's k-means over an embedding column — the semantic
  * clustering primitive of a training-data pipeline (cluster-balanced
  * mixture sampling, semantic dedup blocking, topic discovery). The
  * reference ships embeddings to a single-node vector store
  * (`jobs/embedder.py`); clustering 100 TB of them is exactly the job
  * that must stay on the cluster.
  *
  * Execution shape (the MLlib pattern, re-expressed declaratively):
  *
  *  - '''Assignment is a pure map''': the k current centroids are a
  *    k×dim driver-side model (a few KB), embedded in the plan as
  *    literal arrays; per-row distance to each runs through the
  *    codegen'd [[graft.functions.VectorL2Distance]] expression and the
  *    argmin is an `array_min` over (dist, cid) structs — no join, no
  *    shuffle, whole-stage codegen end to end.
  *  - '''Update is one partial-aggregated groupBy''': `posexplode` the
  *    vector and average by (cid, pos). Map-side combine reduces the
  *    shuffle to k×dim rows per map partition regardless of row count —
  *    the same wire volume a hand-written treeAggregate would move.
  *  - '''Driver state is model-sized only''': the k×dim centroid matrix
  *    is collected per iteration (control flow, not data — identical in
  *    kind to MLlib's KMeans driver loop).
  *
  * Determinism across engines (the DuckDB oracle mirrors every rule):
  * centroids initialize from the k smallest-id rows (cid = id rank);
  * assignment ties break toward the smaller cid via struct ordering;
  * each new centroid component is rounded to 6 decimals so float-sum
  * association drift cannot compound across iterations.
  */
object KMeans {

  /** The (dist, cid)-struct argmin over a fixed centroid model, applied
    * to a `v: array<double>` column — literal arrays through the
    * codegen'd vec_l2, so assignment is a pure map on ANY DataFrame,
    * batch or streaming. */
  private def nearest(c: Seq[(Int, Seq[Double])]): Column = {
    val dists = c.map { case (cid, ctr) =>
      struct(vec_l2(col("v"), typedlit(ctr)).as("d"), lit(cid).as("cid"))
    }
    array_min(array(dists: _*))
  }

  private def asV(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))

  /** Fit the k×dim centroid model with fixed-iteration Lloyd's. Init:
    * the k smallest-id rows, cid by id order (deterministic — the same
    * rule the oracle's row_number applies). */
  def centroids(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Seq[Double])] = {
    val v = asV(emb, idCol, vecCol)
    var cs: Seq[(Int, Seq[Double])] =
      v.orderBy(col(idCol)).limit(k).collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Double](1)
      }.toSeq
    (1 to iters).foreach { _ =>
      val assigned = v.withColumn("cid", nearest(cs).getField("cid"))
      cs = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => round(s.getField("m"), 6)).as("ctr"))
        .orderBy("cid")
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
    }
    cs
  }

  /** Score any relation (batch OR stream — the assignment is stateless)
    * against a frozen model. Returns (idCol, cid, dist@4dp). */
  def assignTo(
      df: DataFrame, cs: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val fin = nearest(cs)
    asV(df, idCol, vecCol).select(col(idCol), fin.getField("cid").as("cid"),
      round(fin.getField("d"), 4).as("dist"))
  }

  /** Fixed-iteration Lloyd's end to end. Returns (idCol, cid, dist) —
    * dist is the final L2 distance to the assigned centroid, 4dp. */
  def assign(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignTo(emb, centroids(emb, k, iters, idCol, vecCol), idCol, vecCol)

  /** Per-cluster profile of an assignment: size and mean distance —
    * the shape a mixture-rebalance step consumes. */
  def profile(assigned: DataFrame, idCol: String = "vec_id"): DataFrame =
    assigned.groupBy("cid")
      .agg(count(lit(1)).as("n"), round(avg("dist"), 4).as("mean_dist"))
      .orderBy("cid")
}
