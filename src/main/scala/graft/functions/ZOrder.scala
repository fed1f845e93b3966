package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the data-skipping technique Delta's `OPTIMIZE ZORDER BY` and
  * Iceberg's sort-order use: sorting by the interleaved-bit key keeps
  * rows that are close in BOTH dimensions close in the file layout, so
  * parquet min/max footer stats prune range predicates on EITHER
  * column, not just the leading sort key.
  *
  * Two generators from one bit spec: [[interleave16]] builds the Spark
  * `Column` and [[sql16]] builds the identical DuckDB SQL, so the
  * oracle can never drift from the engine.
  */
object ZOrder {

  /** Morton key of the low 16 bits of `a` and `b` (non-negative
    * inputs): bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Pure integer expressions — codegen'd, no UDF. */
  def interleave16(a: Column, b: Column): Column = {
    val a16 = pmod(a.cast("long"), lit(65536L))
    val b16 = pmod(b.cast("long"), lit(65536L))
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(a16, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(b16, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as DuckDB SQL over expressions `a` and `b`
    * (already-non-negative integer expressions). */
  def sql16(a: String, b: String): String = {
    val a16 = s"(($a) % 65536)"
    val b16 = s"(($b) % 65536)"
    (0 until 16).map { i =>
      s"((($a16 >> $i) & 1) << ${2 * i}) | ((($b16 >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }
}
