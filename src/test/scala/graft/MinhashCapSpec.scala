package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupOps

/** The MinHash band-skew cap (DedupOps.MaxBandBucket): buckets above
  * the cap are dropped from candidate generation. On the fixtures no
  * bucket comes near the cap (max observed 20 of 5 000 docs at sf0.1),
  * so the capped declared key must equal the uncapped computation
  * exactly — and a tiny cap must actually bite, proving the guard is
  * live code, not a no-op.
  */
class MinhashCapSpec extends SparkSpec {

  test("capped minhash ≡ uncapped on the fixture (cap far above observed buckets)") {
    val capped = DedupOps.qDedupMinhash(spark, sf)
    val uncapped = DedupOps.qDedupMinhashCapped(spark, sf, Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "default cap changed fixture results — cap set too low or guard broken")
  }

  test("a cap of 1 drops every multi-doc bucket — the guard is live") {
    val n = DedupOps.qDedupMinhashCapped(spark, sf, 1).count()
    assert(n === 0, s"cap=1 must eliminate all candidate pairs, got $n")
  }
}
