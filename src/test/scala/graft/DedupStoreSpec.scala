package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._

/** r19 (optimization): q_dedup_clusters / q_dedup_keep cluster over
  * the PERSISTED signature index (DedupOps.minhashIndex) instead of
  * re-hashing the corpus per execution — the same store the
  * incremental key, the curation pipeline and the streaming probe
  * already read. Signatures are a pure function of each doc's text,
  * so the candidate pair set, the CC fixpoint and the declared hashes
  * cannot move; this spec pins that end to end by computing the
  * clustering frame BOTH ways (through the store vs the all-fresh
  * pre-r19 spelling) and asserting row-for-row equality.
  * IncrementalDedupSpec separately pins the store's VALUES ≡ a fresh
  * signature pass; this covers the composed path the declared keys
  * actually execute (pairs → adaptive CC → labeling). */
class DedupStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("clusterFrame through the store == the all-fresh spelling") {
    val fresh = graft.api.GraftOps.connectedComponentsAdaptive(
        DedupOps.minhashPairs(spark, sf, DedupOps.MaxBandBucket),
        "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("cluster"))
    val stored = DedupOps.clusterFrame(spark, sf)
    val got = rows(stored)
    assert(got === rows(fresh),
      "stored-signature clustering diverged from the all-fresh spelling")
    assert(got.nonEmpty, "fixture should yield near-dup clusters")
  }

  test("q_dedup_keep survivors are unchanged by the store seam") {
    // the survivor aggregate consumes clusterFrame; a divergence here
    // would mean the max(struct) tie-breaking saw different inputs
    val keep = DedupOps.qDedupKeep(spark, sf)
    assert(keep.columns.toSeq ===
      Seq("cluster", "keep_doc", "keep_score", "n_dups"))
    val perCluster = keep.groupBy(col("cluster"))
      .count().filter(col("count") > 1).count()
    assert(perCluster === 0, "one survivor row per cluster")
  }
}
