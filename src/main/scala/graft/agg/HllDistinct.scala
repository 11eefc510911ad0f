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
  * The hash is a fixed 64-bit finalizer (splitmix64) — deterministic
  * across JVMs, no dependence on Spark-internal hashing.
  */
class HllDistinct(p: Int = 11) extends Aggregator[Long, Array[Byte], Long] {
  private val m = 1 << p

  private def hash(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    val h = hash(v)
    val idx = (h >>> (64 - p)).toInt
    // rank of the remaining 64-p bits: leading zeros + 1, capped
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
