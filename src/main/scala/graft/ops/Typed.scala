package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset API surface: custom aggregation as an `Aggregator` over a
  * case-class-encoded Dataset — the Spark-native replacement for the
  * reference's pandas `groupby().apply()` reductions. An Aggregator's
  * merge is executed map-side (partial aggregation) exactly like built-in
  * aggregates, unlike a groupByKey+mapGroups which shuffles raw rows.
  */
object Typed {

  /** Weighted mean: Σ(value·weight) / Σ(weight). Input rows are
    * (key, value, weight); the buffer is the two running sums.
    */
  class WeightedMean extends Aggregator[(String, Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (String, Double, Double)): (Double, Double) =
      (b._1 + a._2 * a._3, b._2 + a._3)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
