package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left ("probe") row, the right ("quote") row with
  * the greatest time <= the probe time, per key (SURVEY.md §2-B).
  *
  * Spark has no native as-of join; the scalable composite here is the
  * union + ordered-window `last(ignoreNulls)` formulation:
  *
  *   1. tag both inputs and union them (no join at all);
  *   2. one shuffle on the key, one in-partition sort by (time, side);
  *   3. `last(payload, ignoreNulls) over rowsBetween(unboundedPreceding,
  *      current)` carries the most recent right row forward;
  *   4. keep probe rows.
  *
  * Cost is a single shuffle of |L|+|R| rows — no range explosion, no
  * per-probe scan — and AQE handles key skew. Right rows sort before
  * probe rows at equal times, so an exact-time match is taken (DuckDB
  * `ASOF JOIN ... ON l.t >= r.t` semantics).
  *
  * The right side must be unique per (key, time); pre-aggregate if not
  * (ties are otherwise nondeterministic in any engine).
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column): DataFrame = {
    val lCols = left.columns
    val rCols = right.columns
    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
      struct(lCols.map(left(_)): _*).as("__probe"),
      lit(null).cast(right.select(struct(rCols.map(right(_)): _*)).schema.head.dataType)
        .as("__quote"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      lit(null).cast(left.select(struct(lCols.map(left(_)): _*)).schema.head.dataType)
        .as("__probe"),
      struct(rCols.map(right(_)): _*).as("__quote"))
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__quote"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val probeCols = lCols.map(c => col(s"__probe.$c").as(c))
    val quoteCols = rCols.map(c => col(s"__m.$c").as(c))
    matched.select(probeCols ++ quoteCols: _*)
  }
}
