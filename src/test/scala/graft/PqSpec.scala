package graft

import graft.queries.VectorOps
import org.apache.spark.sql.functions._

/** PQ-ADC properties the oracle can't see (r14). The fixtures are
  * ISOTROPIC random vectors — PQ's documented worst case (no cluster
  * structure for the per-subspace codebooks to exploit; 4×4-bit codes
  * on 64 structureless dims), so exact-top-k recall here is the floor
  * of the operator's range, not its typical value (the q_knn_ivf
  * recall-vs-fixture discussion, SCALE.md §ANN, applies verbatim).
  * What must hold regardless of data shape, and is pinned here:
  * shape, the quantization-error envelope of the ADC estimate, and
  * non-degeneracy of retrieval.
  */
class PqSpec extends SparkSpec {

  private lazy val pq = VectorOps.qKnnPq(spark, sf).cache()

  test("shape: exactly 3 neighbors per probe, self excluded") {
    val per = pq.groupBy("vec_id").count().collect()
    assert(per.length === 10 && per.forall(_.getLong(1) === 3L))
    assert(pq.filter(col("vec_id") === col("neighbor")).count() === 0)
  }

  test("ADC estimate sits inside the measured quantization-error envelope") {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val p = emb.select(col("vec_id"), col("embedding").as("pe"))
    val t = emb.select(col("vec_id").as("neighbor"), col("embedding").as("te"))
    val err = pq.join(p, "vec_id").join(t, "neighbor")
      .select(abs(col("adc") - expr("graft_dot_product(pe, te)")).as("e"))
      .agg(max(col("e")).as("mx"), avg(col("e")).as("av")).head()
    // measured sf0.001/sf0.01: max 0.23/0.20, avg 0.079/0.087 — the
    // 16-bit-code envelope on unit vectors; bounds carry slack for
    // fixture regeneration, not for a broken lookup table (a wrong
    // LUT join lands near the ~0.3 scale of the cosines themselves)
    assert(err.getDouble(0) <= 0.35, s"max ADC error ${err.getDouble(0)}")
    assert(err.getDouble(1) <= 0.15, s"avg ADC error ${err.getDouble(1)}")
  }

  test("retrieval is not degenerate: overlaps exact top-3, neighbors are spread") {
    val emb = Tables.embeddings(spark, sf)
    val exact = graft.api.GraftOps
      .cosineTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 3)
      .select(col("probe_id").as("vec_id"), col("neighbor"))
    val hit = pq.select(col("vec_id"), col("neighbor"))
      .join(exact, Seq("vec_id", "neighbor"), "left_semi").count()
    // isotropic-fixture floor (measured 0.10/0.17 at two SFs): any
    // code/LUT regression to effectively-random retrieval would need
    // luck ~ (3/N)^k to clear even this
    assert(hit >= 2, s"PQ ∩ exact top-3 = $hit of 30 — retrieval degenerated")
    // and the 30 picks are not one hot row repeated
    assert(pq.select("neighbor").distinct().count() >= 10)
  }
}
