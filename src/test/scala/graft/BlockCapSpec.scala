package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, LlmOps}

/** The prefix-block skew cap (DedupOps.MaxBlockBucket) on the two
  * verify joins (Levenshtein, n-gram Jaccard), plus the adversarial
  * corpus-skew rehearsal for the whole capped dedup stack.
  *
  * Proof structure mirrors MinhashCapSpec: (1) on the real fixtures no
  * block comes near the cap (max observed 4 docs per 60-char prefix
  * across all SFs), so the capped declared keys must equal the
  * uncapped computation exactly; (2) a cap of 1 must eliminate every
  * pair, proving the guard is live code; (3) on a synthesized
  * adversarial corpus — 10× the fixture plus a 600-doc boilerplate
  * mega-cluster, i.e. one block/band-bucket above the 500 cap — the
  * capped keys must drop exactly the mega-cluster's n²/2 pair blowup
  * and nothing else, while the cheap exact/prefix dedup pass
  * (LlmOps.qDedupNear) still reports the cluster. That is the
  * documented degradation contract (SCALE.md): over-cap blocks are
  * exact-duplicate territory, owned by the hash-agg pass, never by
  * pairwise verification.
  */
class BlockCapSpec extends SparkSpec {

  test("capped levenshtein ≡ uncapped on the fixture (cap far above observed blocks)") {
    val capped = DedupOps.qDedupLevenshtein(spark, sf)
    val uncapped = DedupOps.qDedupLevenshteinCapped(spark, sf, Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "default cap changed fixture results — cap set too low or guard broken")
  }

  test("capped jaccard ≡ uncapped on the fixture") {
    val capped = DedupOps.qDedupNgramJaccard(spark, sf)
    val uncapped = DedupOps.qDedupNgramJaccardCapped(spark, sf, Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "default cap changed fixture results — cap set too low or guard broken")
  }

  test("a cap of 1 drops every multi-doc block — the guard is live") {
    assert(DedupOps.qDedupLevenshteinCapped(spark, sf, 1).count() === 0L)
    assert(DedupOps.qDedupNgramJaccardCapped(spark, sf, 1).count() === 0L)
  }

  // --- adversarial corpus-skew rehearsal -------------------------------

  /** One doc_id region per population so assertions can tell them
    * apart. Corpus construction shared with CurationPipelineSpec via
    * [[AdvFixture]] (built once per JVM). */
  private val MegaBase = AdvFixture.MegaBase
  private val MegaN = AdvFixture.MegaN // one bucket above the 500 cap
  private lazy val advDir: String = AdvFixture.dir(spark, sf)
  private val MegaPairs = AdvFixture.MegaPairs

  test("adversarial: capped verify joins drop exactly the mega-cluster blowup") {
    for ((capped, uncapped) <- Seq(
      (DedupOps.qDedupLevenshtein(spark, advDir),
        DedupOps.qDedupLevenshteinCapped(spark, advDir, Int.MaxValue)),
      (DedupOps.qDedupNgramJaccard(spark, advDir),
        DedupOps.qDedupNgramJaccardCapped(spark, advDir, Int.MaxValue)))) {
      val megaSurvivors = capped.filter(col("doc_a") >= MegaBase).count()
      assert(megaSurvivors === 0L, "mega-cluster pairs leaked past the cap")
      val c = capped.count(); val u = uncapped.count()
      assert(c > 0L, "cap must not suppress the legitimate 10× corpus pairs")
      assert(u - c === MegaPairs,
        s"cap should remove exactly the ${MegaPairs} mega pairs, removed ${u - c}")
    }
  }

  test("adversarial: capped MinHash drops the mega band buckets, keeps the rest") {
    // The untruncated pair set (the declared key LIMITs to 200, which
    // would mask leakage behind lower-doc_id ties at jacc_est 1.0).
    val capped = DedupOps.minhashPairs(spark, advDir, DedupOps.MaxBandBucket)
    assert(capped.filter(col("doc_a") >= MegaBase).count() === 0L,
      "mega-cluster candidates leaked past the band cap")
    assert(capped.count() > 0L,
      "cap must not suppress legitimate near-dup candidates")
    // The uncapped run DOES surface mega pairs — the cap is what bounds it.
    val uncappedMega = DedupOps.minhashPairs(spark, advDir, Int.MaxValue)
      .filter(col("doc_a") >= MegaBase).count()
    assert(uncappedMega === MegaPairs,
      "fixture failed to trigger the hazard being guarded")
  }

  test("adversarial: the exact/prefix dedup pass still catches the mega-cluster") {
    val top = LlmOps.qDedupNear(spark, advDir).limit(1).collect()(0)
    assert(top.getAs[Long]("n") === MegaN.toLong,
      s"top duplicate group should be the $MegaN-doc mega-cluster")
    assert(top.getAs[Long]("keep") === MegaBase)
  }
}
