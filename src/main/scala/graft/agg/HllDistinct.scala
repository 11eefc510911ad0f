package graft.agg

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** HyperLogLog distinct-count sketch as a typed Aggregator (SURVEY.md
  * §2.4-J): 2^p byte registers, merge = element-wise max — fully
  * mergeable, so Spark runs partial sketches map-side and merges at
  * the final aggregation exactly like a built-in.
  *
  * Approximate ⇒ never declared with an oracle (§2.2-7); the spec
  * property-tests relative error < 5% (p=11 → σ ≈ 1.04/√2048 ≈ 2.3%).
  *
  * Register logic lives in [[HllCore]], shared with the
  * `TypedImperativeAggregate` surface ([[HllSketchAgg]], SQL function
  * `graft_hll_distinct`) — both produce bit-identical registers.
  */
class HllDistinct(p: Int = 11) extends Aggregator[Long, Array[Byte], Long] {

  override def zero: Array[Byte] = new Array[Byte](1 << p)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    HllCore.add(buf, v, p)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllCore.merge(a, b)
    a
  }

  override def finish(buf: Array[Byte]): Long = HllCore.estimate(buf)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
