package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed algebraic aggregate — the Spark-native form of the reference's
  * "incrementation" requirement f(A+B) = f(A) + f(B)
  * (/root/reference/README.txt:18): `reduce` is the map-side partial,
  * `merge` combines partials, so Spark runs it as partial + final
  * aggregation and shuffle volume is one buffer per (task, key), not one
  * record per row. The reference's reduce fn hybrid (a whole-group
  * callback, /root/reference/reducer.py:85-88) cannot be partially
  * aggregated at all.
  */
final case class WAvgBuf(weightedSum: Double, weight: Double)

/** Weighted mean of `value` with weight `weight` over (value, weight)
  * pairs. */
object WeightedAverage extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
    WAvgBuf(b.weightedSum + in._1 * in._2, b.weight + in._2)
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.weightedSum + b.weightedSum, a.weight + b.weight)
  override def finish(b: WAvgBuf): Double =
    if (b.weight == 0.0) Double.NaN else b.weightedSum / b.weight
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
