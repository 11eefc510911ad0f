package graft.agg

/** The HyperLogLog register logic shared by both aggregation surfaces:
  * [[HllDistinct]] (typed `Aggregator`, Dataset API) and
  * [[HllSketchAgg]] (`TypedImperativeAggregate`, SQL function). One
  * implementation ⇒ the two surfaces produce bit-identical registers
  * and therefore identical estimates (asserted in MediaHllSpec).
  *
  * The hash is a fixed 64-bit finalizer (splitmix64) — deterministic
  * across JVMs, no dependence on Spark-internal hashing.
  */
object HllCore {

  def hash(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Fold one value into the 2^p-byte register array (mutates buf). */
  def add(buf: Array[Byte], v: Long, p: Int): Unit = {
    val h = hash(v)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
  }

  /** Element-wise max merge (mutates a — fully mergeable map-side). */
  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** Bias-corrected estimate with small-range linear counting. */
  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
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
}
