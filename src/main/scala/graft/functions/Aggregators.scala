package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY.md §2-B "UDF surface"): custom
  * aggregations with compile-time-checked state, registered through
  * `functions.udaf` so they run as real partial/final aggregates
  * (map-side combine included) rather than collect-and-fold. */
object Aggregators {

  final case class WeightedState(var weightedSum: Double, var weightSum: Double)

  /** Weight-averaged value: sum(v*w)/sum(w); null-safe on empty input
    * (returns 0.0 — callers on non-empty groups never see it). */
  object WeightedAvg extends Aggregator[(Double, Double), WeightedState, Double] {
    override def zero: WeightedState = WeightedState(0.0, 0.0)
    override def reduce(b: WeightedState, a: (Double, Double)): WeightedState = {
      b.weightedSum += a._1 * a._2
      b.weightSum += a._2
      b
    }
    override def merge(x: WeightedState, y: WeightedState): WeightedState = {
      x.weightedSum += y.weightedSum
      x.weightSum += y.weightSum
      x
    }
    override def finish(r: WeightedState): Double =
      if (r.weightSum == 0.0) 0.0 else r.weightedSum / r.weightSum
    override def bufferEncoder: Encoder[WeightedState] = Encoders.product[WeightedState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
