package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Bridge check: the spark.ml MinHashLSH estimator runs over the same
  * documents our custom SQL MinHash key handles (SURVEY.md §2.4-F
  * noted both options; the declared key uses the engine-neutral SQL
  * form because ml hashing isn't DuckDB-reproducible). This spec pins
  * the ml pipeline's plumbing: tokens → hashed term sets →
  * approxSimilarityJoin candidates with sane distances, and the known
  * shared-prefix near-dup pairs being discoverable. */
class MlLshSpec extends SparkSpec {

  test("ml MinHashLSH approxSimilarityJoin runs over documents and finds near-dup candidates") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
    val feats = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(5).setSeed(42L)
    val model = lsh.fit(feats)
    val pairs = model.approxSimilarityJoin(feats, feats, 0.9, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"), col("dist"))
      .filter(col("a") < col("b"))
    val collected = pairs.collect()
    assert(collected.nonEmpty, "LSH should surface candidate pairs at distance < 0.9")
    assert(collected.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // tiny-vocab corpus: token sets overlap heavily, so the very
    // closest exact-Jaccard pair must appear among LSH candidates
    val exact = queries.DedupOps.qDedupNgramJaccard(spark, sf)
      .orderBy(col("jac").desc).limit(1).collect()
    if (exact.nonEmpty) {
      val (ea, eb) = (exact(0).getLong(0), exact(0).getLong(1))
      assert(collected.exists(r => r.getLong(0) == ea && r.getLong(1) == eb),
        s"closest exact pair ($ea,$eb) missing from ml LSH candidates")
    }
  }
}
