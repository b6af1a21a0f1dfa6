package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation via the public Aggregator API (SURVEY.md §2.B
  * q_agg_udaf): weight-averaged value, e.g. quantity-weighted average
  * price. Partial aggregation (reduce) runs map-side; merge combines
  * partial buffers across partitions — the same two-phase shape as Spark's
  * built-in aggregates, so it scales like a native sum.
  */
case class WeightedIn(value: Double, weight: Double)

object WeightedAvg extends Aggregator[WeightedIn, (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: WeightedIn): (Double, Double) =
    (b._1 + a.value * a.weight, b._2 + a.weight)
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Double)): Double = r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
