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

  private lazy val pqSampled = VectorOps.qKnnPqSampled(spark, sf).cache()
  private lazy val ivfPq = VectorOps.qKnnIvfPq(spark, sf).cache()

  /** (max, avg) |adc − exact dot| over a result frame. */
  private def adcEnvelope(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val p = emb.select(col("vec_id"), col("embedding").as("pe"))
    val t = emb.select(col("vec_id").as("neighbor"), col("embedding").as("te"))
    val r = df.join(p, "vec_id").join(t, "neighbor")
      .select(abs(col("adc") - expr("graft_dot_product(pe, te)")).as("e"))
      .agg(max(col("e")), avg(col("e"))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("sampled-codebook build (r15): shape + ADC-envelope parity with the full build") {
    val per = pqSampled.groupBy("vec_id").count().collect()
    assert(per.length === 10 && per.forall(_.getLong(1) === 3L))
    assert(pqSampled.filter(col("vec_id") === col("neighbor")).count() === 0)
    val (fMax, fAvg) = adcEnvelope(pq)
    val (sMax, sAvg) = adcEnvelope(pqSampled)
    info(f"full build: max $fMax%.3f avg $fAvg%.3f; sampled build: max $sMax%.3f avg $sAvg%.3f")
    // parity: training on the 25% hash-sample must keep the estimate
    // in the SAME error class as the full-corpus build — the property
    // that makes the amortized production build safe to ship
    assert(sMax <= 0.35, s"sampled max ADC error $sMax")
    assert(sAvg <= 0.15, s"sampled avg ADC error $sAvg")
    assert(sAvg <= fAvg * 2.0 + 0.02,
      f"sampled avg error $sAvg%.3f not within 2x of full-build $fAvg%.3f")
  }

  test("IVF-PQ (r15): shape; gate only restricts — common pairs score identically") {
    val per = ivfPq.groupBy("vec_id").count().collect()
    assert(per.length === 10 && per.forall(_.getLong(1) === 3L))
    assert(ivfPq.filter(col("vec_id") === col("neighbor")).count() === 0)
    // same sampled codebooks on both keys ⇒ wherever the two outputs
    // share a (probe, neighbor) pair, the ADC estimate is bit-equal;
    // the gate changes WHICH pairs are scored, never their score
    val joined = ivfPq.select(col("vec_id"), col("neighbor"), col("adc").as("a1"))
      .join(pqSampled.select(col("vec_id"), col("neighbor"), col("adc").as("a2")),
        Seq("vec_id", "neighbor"))
    val n = joined.count()
    assert(n > 0, "IVF-PQ shares no pair with the ungated sampled key")
    assert(joined.filter(col("a1") =!= col("a2")).count() === 0L,
      "gated and ungated ADC scores diverged on a common pair")
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

  // the OLD interpreted argmin spelling (CellArgminSpec's reference),
  // reused here as the independent assignment path
  private def minStructCell(vec: String) =
    expr(
      s"""array_min(transform(__cs, c -> struct(
         |  round(c.__cn - 2.0d * graft_num_dot($vec, c.__c), 6) AS __d,
         |  c.__cell AS __cell))).__cell""".stripMargin)

  test("sampled-gate split (r16): sample ⊊ corpus, probes outside the sample, " +
    "full corpus assigns against sample-trained centroids under both spellings") {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    import graft.api.GraftOps
    val emb = Tables.embeddings(spark, sf)
    val train = GraftOps.sampleByHash(emb, "cast(vec_id as string)", VectorOps.PqSamplePct)
    val (nAll, nTrain) = (emb.count(), train.count())
    // the fixture must EXERCISE the trainSrc/encodeSrc split — a
    // sample equal to (or empty of) the corpus makes this pin vacuous
    assert(nTrain > 0 && nTrain < nAll,
      s"sample $nTrain of $nAll does not split the corpus")
    // probes live in the CORPUS, not the sample: the oracle's
    // lutSrc = f / pcCte(src = vf) rule is only tested if some probe
    // id is missing from the train set (measured: 9 of 10 are)
    val probesOutside = emb.filter(col("vec_id") < 10)
      .join(train.select(col("vec_id")), Seq("vec_id"), "left_anti").count()
    assert(probesOutside > 0,
      "all 10 probes landed in the sample — the corpus-probe rule is untested")
    // sample-trained gate centroids must differ from full-corpus ones
    // (the split changes training)...
    val cent = GraftOps.kmeansModel(train, "vec_id", "embedding",
      VectorOps.IvfPqCells, VectorOps.PqIters)._1
    val centFull = GraftOps.kmeansModel(emb, "vec_id", "embedding",
      VectorOps.IvfPqCells, VectorOps.PqIters)._1
    val moved = cent.select(col("__cell"), col("__c").as("cs"))
      .join(centFull.select(col("__cell"), col("__c").as("cf")), "__cell")
      .filter(col("cs") =!= col("cf")).count()
    assert(moved > 0, "sampled and full-corpus training produced identical centroids")
    // ...and the FULL corpus (sample members and non-members alike)
    // assigns against the sampled centroids identically under the
    // codegen'd argmin and the independent min-struct spelling — the
    // engine-side half of the oracle's `${p}af FROM ${p}f` contract
    val scored = emb
      .crossJoin(broadcast(GraftOps.centroidArray(cent)))
      .select(col("vec_id"),
        GraftOps.cellColumn("embedding").as("cg"),
        minStructCell("transform(embedding, x -> cast(x as double))").as("ci"))
    assert(scored.filter(col("cg") =!= col("ci")).count() === 0,
      "corpus assignment diverged between argmin spellings under sampled training")
  }
}
