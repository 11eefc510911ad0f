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
    // r20 (ADVICE r19): the first cut of this test was tautological —
    // qDedupKeep ends in groupBy(cluster), so one-row-per-cluster
    // could never fail and pinned nothing about the seam. Now it
    // mirrors the first test: the SAME survivor aggregate computed
    // over the all-fresh clusterFrame spelling, compared row for row.
    val fresh = graft.api.GraftOps.connectedComponentsAdaptive(
        DedupOps.minhashPairs(spark, sf, DedupOps.MaxBandBucket),
        "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("cluster"))
    val q = Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"),
        graft.queries.TextOps.qualityScoreCol(col("t")).as("score"))
    val freshKeep = fresh.join(q, "doc_id")
      .groupBy(col("cluster"))
      .agg(
        max(struct(col("score"), (-col("doc_id")).as("__nd"),
          col("doc_id").as("__d"))).as("__w"),
        count(lit(1)).as("n_dups"))
      .select(col("cluster"), col("__w.__d").as("keep_doc"),
        col("__w.score").as("keep_score"), col("n_dups"))
    val keep = DedupOps.qDedupKeep(spark, sf)
    assert(keep.columns.toSeq ===
      Seq("cluster", "keep_doc", "keep_score", "n_dups"))
    val got = rows(keep)
    assert(got === rows(freshKeep),
      "store-seam survivors diverged from the all-fresh aggregate")
    assert(got.nonEmpty, "fixture should yield survivor rows")
  }
}
