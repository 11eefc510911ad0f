package graft

import graft.api.BuildCounters
import graft.queries.{DedupOps, TextOps, VectorOps}

/** The stored-index fence, executable (r20, VERDICT r19 wrong #1 /
  * next #8): every store-serving key family must keep a fresh-build
  * twin in the bench so the learn cost stays measured — converting
  * the last twin (e.g. q_dedup_minhash itself) to the store would be
  * gaming, not optimization. SCALE.md §"Stored-index fence" carries
  * the key→twin table; this spec enforces both directions at runtime
  * via [[graft.api.BuildCounters]]:
  *  - each fresh twin still executes its learn IN-SESSION;
  *  - each store-serving key does NOT (the store exists and is read).
  */
class StoredIndexFenceSpec extends SparkSpec {

  private def run(key: String): Unit = {
    SparkEntry.queries(key)(spark, sf).count(); ()
  }

  test("fresh-build twins execute their learn in-session; store-serving keys do not") {
    // prime the stores (idempotent loadOrBuild — a cold checkout pays
    // the build here, a warm one just validates the sentinel)
    DedupOps.minhashIndex(spark, sf)
    VectorOps.ivfIndex(spark, sf, k = 8, iters = 2)
    TextOps.bpeStored(spark, sf, batched = false)

    // fresh twins: the measured build walls must tick their counters
    BuildCounters.reset()
    run("q_dedup_minhash")
    assert(BuildCounters.minhashSignatureBuilds.get() >= 1L,
      "q_dedup_minhash no longer computes signatures fresh — the measured " +
        "signature wall was converted to the store (the gaming boundary)")
    run("q_kmeans_build")
    assert(BuildCounters.lloydBuilds.get() >= 1L,
      "q_kmeans_build no longer runs Lloyd in-session")
    run("q_bpe_merges")
    assert(BuildCounters.bpeLearns.get() >= 1L,
      "q_bpe_merges no longer runs the merge loop in-session")

    // store-serving keys: with a warm store, none of the learns run
    BuildCounters.reset()
    run("q_dedup_clusters")
    run("q_dedup_semantic")
    run("q_bpe_tokenize")
    assert(BuildCounters.minhashSignatureBuilds.get() === 0L,
      "a store-serving dedup key re-ran the corpus signature pass")
    assert(BuildCounters.lloydBuilds.get() === 0L,
      "a store-serving ANN/SemDeDup key re-ran the Lloyd build")
    assert(BuildCounters.bpeLearns.get() === 0L,
      "a BPE serving key re-ran the merge loop")
  }
}
