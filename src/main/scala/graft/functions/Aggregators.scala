package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (the UDAF extension point, SURVEY §2.6).
  *
  * The declared query surface deliberately needs ZERO custom
  * aggregates — every aggregation lands on Catalyst built-ins, which
  * partial-aggregate and codegen for free. This module exists to keep
  * the extension point exercised and tested: when a future operator
  * genuinely needs custom merge state (a new sketch type, an exotic
  * accumulator), `Aggregator[IN, BUF, OUT]` is the typed, Encoder-
  * backed way in — it gets map-side partial aggregation automatically
  * (`merge` is the shuffle contract), unlike a naive UDF-over-groups.
  */
object Aggregators {

  /** Weighted mean Σ(v·w)/Σ(w) as a typed Aggregator — the typed twin
    * of `SliQueries.weightedAvg` (cross-checked in AggregatorSpec).
    * Buffer is two doubles; null-on-zero-weight matches the column
    * form's `nullif` guard (represented as Double.NaN in the typed
    * output, since primitive encoders can't carry null).
    */
  object WeightedMean extends Aggregator[(Double, Long), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Long)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
