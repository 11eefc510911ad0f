package graft

import graft.tools.DedupScaleAudit
import org.apache.spark.sql.functions._

/** Validates the 100×-campaign INSTRUMENT (SCALE.md §100×): the
  * audit's pair arithmetic must equal what the real candidate joins
  * emit, or every number in the scaling tables is unverified. */
class DedupScaleAuditSpec extends SparkSpec {

  private def prefixSizes(dir: String) =
    Tables.documents(spark, dir)
      .select(lower(substring(col("text"), 1, 60)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("bsz"))

  test("pairs_uncapped ≡ the real uncapped prefix-block candidate join's row count") {
    // qDedupLevenshteinCapped(MaxValue) emits exactly the in-block
    // (doc_a < doc_b) pairs — Σ b·(b−1)/2 over blocks, the quantity
    // the audit derives from populations alone.
    val (_, _, overCap, pairsUncapped, pairsCapped) =
      DedupScaleAudit.bucketStats(prefixSizes(sf), Long.MaxValue)
    val joined = queries.DedupOps
      .qDedupLevenshteinCapped(spark, sf, Int.MaxValue).count()
    assert(pairsUncapped === joined,
      s"audit says $pairsUncapped pairs, join emitted $joined")
    assert(overCap === 0L && pairsCapped === pairsUncapped,
      "an infinite cap must not drop anything")
  }

  test("capping subtracts exactly the over-cap buckets' pairs (mega-cluster surgical removal)") {
    // AdvFixture construction in miniature: the fixture corpus plus a
    // 40-doc identical-text block, audited at cap 10 — uncapped gains
    // exactly 40·39/2 pairs, capped is byte-identical to the organic
    // corpus (every organic block is ≤ 4 docs on the fixtures).
    import spark.implicits._
    val mega = (0 until 40)
      .map(i => (1000000L + i, DedupScaleAudit.MegaText)).toDF("doc_id", "text")
    val organic = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val sizes = organic.unionAll(mega)
      .select(lower(substring(col("text"), 1, 60)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("bsz"))
    val (_, maxB, overCap, uncapped, capped) =
      DedupScaleAudit.bucketStats(sizes, 10L)
    val (_, _, _, organicPairs, _) =
      DedupScaleAudit.bucketStats(prefixSizes(sf), Long.MaxValue)
    assert(maxB === 40L && overCap === 1L, s"mega block not dominant: max=$maxB over=$overCap")
    assert(uncapped === organicPairs + 40L * 39 / 2,
      "uncapped must gain exactly the mega block's pairs")
    assert(capped === organicPairs,
      "capping must remove the mega block and NOTHING else")
  }
}
