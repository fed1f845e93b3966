package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md "partitioning &
  * shuffle": salting for skew).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in
  * Sessions.local) handles most skew at runtime; explicit salting is
  * the PLAN-level tool for the pathological case — a hot key whose
  * single shuffle partition exceeds an executor — or when AQE is
  * unavailable (e.g. a required distribution). The transform is
  * result-identical to the plain join:
  *
  *  - fact side: deterministic salt in [0, n) derived by hashing the
  *    whole row (`xxhash64`), spreading one hot key over n partitions;
  *  - dim side: exploded ×n so every (key, salt) pair finds its match;
  *  - join on (key, salt) — the shuffle now distributes by the salted
  *    composite.
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, salted ×`salts`.
    * Produces exactly the rows of `fact.join(dim, key)` (verified in
    * SkewSpec); `dim` is replicated n× — size accordingly.
    *
    * The salt hashes the WHOLE fact row (deterministic — required for
    * reproducible results): a hot key spreads because its rows differ
    * in non-key columns, the typical fact-table case. Fully identical
    * duplicate rows share one salt; if that is the skew shape, salt on
    * a physical row id (or `rand()`) and give up determinism. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val factCols: Array[Column] = fact.columns.map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
