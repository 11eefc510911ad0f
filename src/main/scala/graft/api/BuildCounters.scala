package graft.api

import java.util.concurrent.atomic.AtomicLong

/** Executable stored-index fence (r20, VERDICT r19 wrong #1 / next
  * #8): the engine's store-serving keys (SemDeDup, dedup clustering,
  * k-NN serving, BPE serving, the curation pipeline) read persisted
  * StagedArtifact indexes, and the doctrine that keeps that honest is
  * that every such family retains a FRESH-BUILD TWIN in the bench —
  * q_dedup_minhash (signature+pair wall), q_kmeans_build (Lloyd
  * wall), q_bpe_merges{,_batched} (merge-loop wall) — so the build
  * cost stays measured. Until r20 the fence was tribal (a VERDICT
  * paragraph); these counters make it executable: each expensive
  * learn path ticks its counter at call time, and
  * StoredIndexFenceSpec asserts the twins still tick it in-session
  * while the store-serving keys do not. Converting a twin to the
  * store (deleting the last measured build wall — the gaming boundary
  * VERDICT r19 drew) now fails a spec instead of needing a judge to
  * notice.
  *
  * Counters are increment-only AtomicLongs read by tests; the
  * increment is nanoseconds against builds that run seconds. */
object BuildCounters {

  /** Fresh corpus MinHash signature passes (DedupOps.minhashSignatures). */
  val minhashSignatureBuilds = new AtomicLong(0L)

  /** Lloyd k-means builds (GraftOps.kmeansModel — every kmeans entry
    * point routes through it). */
  val lloydBuilds = new AtomicLong(0L)

  /** BPE merge-loop learns (TextOps.bpeLearn / bpeLearnBatched). */
  val bpeLearns = new AtomicLong(0L)

  def reset(): Unit = {
    minhashSignatureBuilds.set(0L)
    lloydBuilds.set(0L)
    bpeLearns.set(0L)
  }
}
