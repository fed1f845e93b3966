package graft

import org.apache.spark.sql.{Column, GraftShims}

/** Column-level API over graft's custom Catalyst expressions — the
  * engine's equivalent of `org.apache.spark.sql.functions` for vector
  * math. All of these stay inside whole-stage codegen.
  *
  * Contract: the binary functions THROW on vector-dimension mismatch
  * (never silently truncate); null inputs yield null.
  */
package object functions {
  private def wrap2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                        org.apache.spark.sql.catalyst.expressions.Expression) =>
                        org.apache.spark.sql.catalyst.expressions.Expression)
                   (a: Column, b: Column): Column =
    GraftShims.column(f(GraftShims.expression(a), GraftShims.expression(b)))

  /** `sum(a_i * b_i)` as double. */
  def vec_dot(a: Column, b: Column): Column = wrap2(VectorDot.apply)(a, b)

  /** Euclidean distance (the reference's retrieval metric). */
  def vec_l2(a: Column, b: Column): Column = wrap2(VectorL2Distance.apply)(a, b)

  /** Cosine similarity in [-1, 1]; 0.0 on zero-norm input. */
  def vec_cosine_sim(a: Column, b: Column): Column = wrap2(VectorCosineSim.apply)(a, b)

  /** L2 norm of one vector. */
  def vec_norm(a: Column): Column =
    GraftShims.column(VectorL2Norm(GraftShims.expression(a)))

  /** `size(array_intersect(sa, sb))` via a hash-guided linear merge
    * over (hash, string) parallel arrays, both sorted by (hash,
    * string) — see [[HashedOverlapCount]] for the contract; unsorted
    * or misaligned input undercounts or throws. */
  def hashed_overlap_count(ha: Column, sa: Column, hb: Column, sb: Column): Column =
    GraftShims.column(HashedOverlapCount(
      GraftShims.expression(ha), GraftShims.expression(sa),
      GraftShims.expression(hb), GraftShims.expression(sb)))
}
