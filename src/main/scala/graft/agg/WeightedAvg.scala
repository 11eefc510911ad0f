package graft.agg

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY.md §2.4-J): exact weighted average via an
  * `Aggregator[(value, weight), (sumProd, sumW), Double]`.
  *
  * Merge-associative (two running sums), so Spark runs it as partial
  * (map-side) + final aggregation like any built-in — no extra shuffle
  * vs `sum(v*w)/sum(w)`, which is also its oracle formulation.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
