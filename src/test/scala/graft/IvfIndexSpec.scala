package graft

import graft.queries.VectorOps
import org.apache.spark.sql.functions._

/** The persisted IVF index (r16): stored ≡ fresh for both tables and
  * for a declared key's full result. Generic staging behavior (warm
  * reuse, invalidation, the publish race) is pinned once in
  * PqIndexSpec — both indexes ride the same StagedArtifact. */
class IvfIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stored IVF index equals a fresh in-session build, value for value") {
    val (cents, cells) = VectorOps.ivfIndex(spark, sf, k = 8, iters = 2)
    val (fCent, fAssigned) = graft.api.GraftOps
      .kmeansModel(Tables.embeddings(spark, sf), "vec_id", "embedding", 8, 2)
    assert(rows(cents) === rows(fCent), "stored centroids diverged")
    assert(rows(cells) ===
      rows(fAssigned.select(col("vec_id"), col("cell"), col("embedding"))),
      "stored cell assignment diverged")
  }

  test("declared key through the store == the in-session build path") {
    val viaStore = rows(VectorOps.qKnnIvfMp(spark, sf))
    val fresh = rows(VectorOps.qKnnIvfKmeansGeo(spark, sf,
      k = 64, iters = 2, nprobe = 16, store = false))
    assert(viaStore === fresh)
  }

  test("semantic dedup through the stored model == the fresh Lloyd build, both probe depths") {
    // r19: the declared SemDeDup keys pass the persisted (k=8, i=2)
    // model into semanticNearDups instead of re-running the Lloyd
    // build per execution. Pin pair-set equality across that seam for
    // probes = 1 (stored cell assignment reused directly) and
    // probes = 2 (stored centroids, in-session top-2 assignment).
    val emb = Tables.embeddings(spark, sf)
    val stored = VectorOps.ivfIndex(spark, sf, k = 8, iters = 2)
    for (p <- Seq(1, 2)) {
      val viaStore = rows(graft.api.GraftOps.semanticNearDups(
        emb, "vec_id", "embedding", 0.4, probes = p, model = Some(stored)))
      val fresh = rows(graft.api.GraftOps.semanticNearDups(
        emb, "vec_id", "embedding", 0.4, probes = p))
      assert(viaStore === fresh, s"stored-model pair set diverged at probes=$p")
    }
  }
}
