package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{vec_cosine_sim, vec_dot, vec_l2}

/** k-nearest-neighbor retrieval over an embedding column.
  *
  * Two tiers, mirroring the exact/approximate boundary documented in
  * SURVEY.md §7.3 (the reference delegates this to Chroma's HNSW;
  * `/root/reference/src/api.py:38-42`):
  *
  *  - [[exactTopK]]: brute-force scored scan + `orderBy(score).limit(k)`.
  *    Catalyst plans this as TakeOrderedAndProject: each partition keeps
  *    a k-heap and only k rows per partition reach the driver — no global
  *    sort, no shuffle. At 100 TB this is one bandwidth-bound scan, which
  *    is the correct baseline and the oracle-testable path.
  *  - [[approxTopK]]: random-hyperplane LSH (sign buckets). The table is
  *    bucketed once; a probe scans only its bucket (optionally hamming-
  *    neighbor buckets), then exact-reranks. Deterministic planes so
  *    results are reproducible; recall is property-tested, not
  *    hash-matched.
  */
object Knn {

  /** Deterministic pseudo-random hyperplane matrix (nPlanes x dim). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { i =>
      Array.tabulate(dim) { j =>
        // LCG-style mix; values in [-1, 1); fixed across runs/engines.
        val h = (i.toLong * 2654435761L + j.toLong * 40503L + 12289L) % 1000003L
        (h.toDouble / 1000003.0) * 2.0 - 1.0
      }
    }

  /** Sign-bucket id of a vector column against the given planes. */
  def bucketCol(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(vec_dot(emb, typedLit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def score(emb: Column, probe: Seq[Double], metric: String): (Column, Boolean) =
    metric match {
      case "cosine" => (vec_cosine_sim(emb, typedLit(probe)), false) // higher = closer
      case "l2"     => (vec_l2(emb, typedLit(probe)), true)          // lower = closer
      case other    => throw new IllegalArgumentException(s"metric $other")
    }

  /** Brute-force exact top-k; deterministic tiebreak on `idCol`. */
  def exactTopK(
      df: DataFrame, embCol: String, idCol: String,
      probe: Seq[Double], k: Int, metric: String = "cosine"): DataFrame = {
    val (sc, asc) = score(col(embCol), probe, metric)
    val scored = df.withColumn("score", sc)
    val ordered = if (asc) scored.orderBy(col("score"), col(idCol))
                  else scored.orderBy(desc("score"), col(idCol))
    ordered.limit(k)
  }

  /** Attach a deterministic LSH bucket to every row (one-time prep). */
  def withBuckets(df: DataFrame, embCol: String, nPlanes: Int, dim: Int): DataFrame =
    df.withColumn("bucket", bucketCol(col(embCol), hyperplanes(nPlanes, dim)))

  /** Approximate top-k with the probe supplied as a ONE-ROW DataFrame —
    * fully lazy: the probe's bucket is computed in-plan and broadcast, so
    * building the query runs no driver-side action (no `.head()`, no
    * global sort job). This is the form queries should use; the
    * driver-side-probe overload below is for tests and ad-hoc use. */
  def approxTopKPlan(
      bucketed: DataFrame, embCol: String, idCol: String,
      probeDf: DataFrame, probeCol: String, k: Int, nPlanes: Int, dim: Int,
      hammingRadius: Int = 1, metric: String = "cosine"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val probe = probeDf.select(col(probeCol).as("__probe"))
      .withColumn("__pbucket", bucketCol(col("__probe"), planes))
    val cand = bucketed.crossJoin(broadcast(probe))
      .filter(expr(s"bit_count(bucket ^ __pbucket) <= $hammingRadius"))
    val (sc, asc) = metric match {
      case "cosine" => (vec_cosine_sim(col(embCol), col("__probe")), false)
      case "l2"     => (vec_l2(col(embCol), col("__probe")), true)
      case other    => throw new IllegalArgumentException(s"metric $other")
    }
    val scored = cand.withColumn("score", sc).drop("__probe", "__pbucket")
    val ordered = if (asc) scored.orderBy(col("score"), col(idCol))
                  else scored.orderBy(desc("score"), col(idCol))
    ordered.limit(k)
  }

  /** Approximate top-k: probe its own bucket plus buckets within the
    * given hamming radius, exact-reranked. */
  def approxTopK(
      bucketed: DataFrame, embCol: String, idCol: String,
      probe: Seq[Double], k: Int, nPlanes: Int,
      hammingRadius: Int = 1, metric: String = "cosine"): DataFrame = {
    val planes = hyperplanes(nPlanes, probe.length)
    val probeBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(probe).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    val candidate = bucketed.filter(
      expr(s"bit_count(bucket ^ ${probeBucket}L) <= $hammingRadius"))
    val (sc, asc) = score(col(embCol), probe, metric)
    val scored = candidate.withColumn("score", sc)
    val ordered = if (asc) scored.orderBy(col("score"), col(idCol))
                  else scored.orderBy(desc("score"), col(idCol))
    ordered.limit(k)
  }
}
