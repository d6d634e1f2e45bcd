package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (the `Aggregator` UDAF extension point,
  * SURVEY §2.6).
  *
  * Relational queries land on Catalyst built-ins (partial aggregation
  * + codegen for free); when an operator genuinely needs custom merge
  * state there are two ways in, both exercised in this codebase:
  * `Aggregator[IN, BUF, OUT]` (this module — typed, Encoder-backed,
  * map-side partial aggregation via `merge`) and
  * `TypedImperativeAggregate` (SketchAgg.scala — raw-buffer sketches
  * where the buffer is an opaque object and updates are tight JVM
  * loops; the round-3 sketch plane runs on it).
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
