package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._

/** Incremental-dedup algebra the oracle can't see directly: with cap
  * guards on the full population, the batch pair set decomposes
  * EXACTLY into base-self ∪ increment-self ∪ cross, and the
  * incremental key computes precisely the cross term. Repeated
  * increments reproduce the full re-run EXACTLY when every step's cap
  * guards evaluate against the final population (as every term here
  * does); a deployment capping per step drifts on buckets that cross
  * the cap between increments — the single-step identity is the
  * engine property, the cap policy is the deployment's. */
class IncrementalDedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private lazy val mh = DedupOps.minhashSignatures(Tables.documents(spark, sf))
  private lazy val inc = mh.filter(col("doc_id") % 10 === 0)
  private lazy val base = mh.filter(col("doc_id") % 10 =!= 0)
  private lazy val batch = pairSet(DedupOps.minhashPairsBetween(
    mh, mh, mh, DedupOps.MaxBandBucket, selfJoin = true))

  test("incremental == batch pairs restricted to cross pairs") {
    val crossGot = pairSet(DedupOps.minhashPairsBetween(
      inc, base, mh, DedupOps.MaxBandBucket, selfJoin = false))
    val crossWant = batch.filter { case (a, b, _) =>
      (a % 10 == 0) != (b % 10 == 0) }
    assert(crossGot === crossWant)
    assert(crossGot.nonEmpty, "fixture should yield cross pairs")
  }

  test("batch == base-self ∪ increment-self ∪ cross (exact decomposition)") {
    // every side evaluates its cap guards on the FULL population —
    // the property that makes increments composable
    val baseSelf = pairSet(DedupOps.minhashPairsBetween(
      base, base, mh, DedupOps.MaxBandBucket, selfJoin = true))
    val incSelf = pairSet(DedupOps.minhashPairsBetween(
      inc, inc, mh, DedupOps.MaxBandBucket, selfJoin = true))
    val cross = pairSet(DedupOps.minhashPairsBetween(
      inc, base, mh, DedupOps.MaxBandBucket, selfJoin = false))
    assert((baseSelf ++ incSelf ++ cross) === batch)
    assert(baseSelf.intersect(cross).isEmpty && incSelf.intersect(cross).isEmpty)
  }
}
