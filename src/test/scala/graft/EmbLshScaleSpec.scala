package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalyst.GraftFunctions

/** The wide-band scale path of sign-LSH embedding dedup (r8, VERDICT
  * r7 follow-through from the sf1 scaling sweep).
  *
  * The declared q_dedup_embedding geometry (6 bits × 21 bands) targets
  * the driver fixture's adversarial loose-threshold regime (answer
  * pairs at cos ∈ [0.4, 0.5], LSH exponent ρ ≈ 0.62) — there its
  * candidate volume is Θ(N²·bands/2^bits), effectively quadratic,
  * measured at sf1 in BASELINE.md. This spec proves the SAME
  * construction with scale-chosen parameters (bits ≈ log2 N + slack,
  * bands from the target recall) is the linear-ish production shape
  * for a REAL near-dup threshold:
  *
  *   corpus: 2 000 near-isotropic 64-dim vectors (same construction
  *   as the sf1 fixture, tools.GenData) with 40 PLANTED twin pairs at
  *   cos ≈ 0.88–0.91 — the linear duplication structure an actual
  *   crawl carries.
  *
  *   geometry (12, 24): per-bit sign-agreement at cos 0.88 is
  *   p₁ = 1 − θ/π ≈ 0.842 → band collision 0.842¹² ≈ 0.13, recall
  *   over 24 bands ≈ 1 − 0.87²⁴ ≈ 0.96; random pairs (p ≈ 0.5)
  *   collide at 24/2¹² ≈ 0.6% of all pairs. Both ends are asserted:
  *   recall on the planted pairs AND a ≥ 20× join-fan-out reduction
  *   vs the narrow declared geometry on the same corpus.
  *
  * Everything is deterministic (hash-derived vectors, fixed
  * hyperplanes), so the measured values are exact and the floors
  * guard structure, not noise.
  */
class EmbLshScaleSpec extends SparkSpec {

  private val N = 2000
  private val PlantEvery = 50 // vec_id ≡ 1 (mod 50) twins vec_id−1 → 40 pairs

  /** GenData's sf1 embedding construction at spec scale: base noise
    * ±1 keyed by the twin group, perturbation ±0.33 keyed by the row
    * (⇒ twin cos ≈ 0.90), L2-normalized. */
  private lazy val corpus: DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    spark.range(N).toDF("vec_id")
      .withColumn("base", when(pmod(col("vec_id"), lit(PlantEvery)) === 1,
        col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("raw", expr(
        """transform(sequence(0, 63), d ->
          |  (cast(pmod(xxhash64(concat('n', cast(base as string), '_', cast(d as string))), 2001) as double) - 1000) / 1000.0
          |  + (cast(pmod(xxhash64(concat('p', cast(vec_id as string), '_', cast(d as string))), 661) as double) - 330) / 1000.0)""".stripMargin))
      .withColumn("nrm", expr("sqrt(aggregate(raw, 0d, (a, x) -> a + x * x))"))
      .withColumn("embedding", expr("transform(raw, x -> cast(x / nrm as float))"))
      .select("vec_id", "embedding")
      .localCheckpoint(true)
  }

  private lazy val plantedPairs: Set[(Long, Long)] =
    (1 until N by PlantEvery).map(i => (i.toLong - 1, i.toLong)).toSet

  /** Join fan-out of a geometry = Σ_buckets c·(c−1)/2 — the exact row
    * count the band self-join produces before dedup, i.e. the cost
    * that must not be quadratic at scale. */
  private def fanOut(bits: Int, bands: Int): Long =
    corpus.select(explode(expr(s"graft_emb_lsh_keys(embedding, $bits, $bands)")).as("k"))
      .groupBy("k").count()
      .agg(sum(expr("count * (count - 1) / 2")).as("fo"))
      .head().getDouble(0).toLong

  test("planted twin pairs sit at the production near-dup cosine (0.85–0.95)") {
    val e = corpus
    val cs = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb")),
        col("vb") === col("va") + 1 && pmod(col("vb"), lit(PlantEvery)) === 1)
      .select(expr("graft_dot_product(ea, eb)").as("cos"))
      .collect().map(_.getDouble(0))
    assert(cs.length == plantedPairs.size)
    assert(cs.forall(c => c >= 0.85 && c <= 0.95),
      s"planted cos out of band: min=${cs.min} max=${cs.max}")
  }

  test("wide geometry (12 bits × 24 bands): recall ≥ 0.90 on planted pairs at τ = 0.85") {
    val found = graft.api.GraftOps
      .embeddingNearDups(corpus, "vec_id", "embedding", 0.85, bits = 12, bands = 24)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (found & plantedPairs).size
    info(s"wide-band recall on planted twins = $hit/${plantedPairs.size}")
    assert(hit >= math.ceil(plantedPairs.size * 0.90).toInt,
      s"wide-band recall collapsed: $hit/${plantedPairs.size}")
  }

  /** The DECLARED production-dial key (r13): q_dedup_embedding_scaled
    * augments the fixture with a dim-0-negated twin per vector
    * (cos = 1 − 2·x₀² on unit vectors). On the isotropic driver
    * fixture every answer pair must BE a twin pair (no native pair
    * reaches 0.85), its cosine must satisfy the analytic identity,
    * and the LSH must recover ≥ 90% of the twins whose true cosine
    * clears τ — the recall the oracle hash pins pair-for-pair. */
  test("declared scaled key: twin-pair identity, cos = 1 − 2·x₀², recall ≥ 0.90") {
    val out = graft.queries.VectorOps
      .qDedupEmbeddingScaled(spark, sf).collect()
    val x0 = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("cast(element_at(embedding, 1) as double)").as("x0"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.nonEmpty, "scaled key returned an empty frame on the fixture")
    out.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(b == a + 10000000L, s"non-twin pair in answer: ($a, $b)")
      val expect = BigDecimal(1.0 - 2.0 * x0(a) * x0(a))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(c - expect) <= 2e-4,
        s"cos deviates from 1−2·x₀²: got $c expected ~$expect for vec $a")
      assert(c >= 0.85 && c <= 1.0, s"cos out of τ band: $c")
    }
    val eligible = x0.values.count(v => 1.0 - 2.0 * v * v >= 0.85)
    assert(out.length >= math.ceil(eligible * 0.90).toInt,
      s"recall collapsed: found ${out.length} of $eligible eligible twins")
  }

  test("wide geometry cuts band-join fan-out ≥ 20× vs the declared narrow geometry") {
    val narrow = fanOut(graft.queries.EmbLsh.Bits, graft.queries.EmbLsh.Bands)
    val wide = fanOut(12, 24)
    val allPairs = N.toLong * (N - 1) / 2
    info(f"fan-out: narrow=$narrow (${narrow.toDouble / allPairs}%.3f of all pairs), " +
      f"wide=$wide (${wide.toDouble / allPairs}%.4f of all pairs)")
    assert(narrow >= 20L * wide,
      s"expected ≥20× fan-out reduction, got narrow=$narrow wide=$wide")
    assert(wide <= allPairs / 50,
      s"wide-geometry fan-out $wide exceeds 2% of all pairs ($allPairs)")
  }
}
