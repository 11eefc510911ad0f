package graft.queries

/** Shared construction of the signed-random-projection (SimHash-style)
  * LSH used by q_dedup_embedding: L bands of B sign bits each, over
  * hyperplanes with deterministic ±1 weights. Both the Spark key
  * expression and the DuckDB oracle SQL are generated from the SAME
  * weight source, so candidate generation is bit-identical across
  * engines (the projections are rounded to 6 decimals before the sign
  * test so a near-zero projection cannot flip sign between engines'
  * float summation).
  *
  * Parameter choice (measured on the fixtures, see AnnRecallSpec +
  * SCALE.md): the fixture's near-dup pairs sit at cos ∈ [0.4, 0.5] —
  * per-bit sign agreement p₁ = 1 − θ/π ≈ 0.65 vs p₂ = 0.5 for random
  * pairs, i.e. the adversarially hard low-similarity regime with LSH
  * exponent ρ = ln p₁ / ln p₂ ≈ 0.62. B=6, L=21 gives measured recall
  * 0.74 (sf0.001) / 0.75 (sf0.1) with a candidate set ≈ 0.30 of all
  * pairs spread over ~1340 buckets (max bucket 27 of 500 vectors).
  *
  * Scale honesty (r8, corrected after the sf1 sweep measured it): with
  * B fixed, bucket occupancy grows linearly in N, so once buckets are
  * saturated candidates are Θ(N²·L/2^B) — the measured sf1 fraction
  * stays ≈ 0.28 of all pairs, i.e. this geometry is ~quadratic and is
  * the right tool ONLY for the loose-τ regime it was tuned for (where
  * the ANSWER itself is a constant fraction of pairs — no algorithm
  * emits fewer rows than the answer). The production near-dup regime
  * (cos ≥ 0.85, p₁ ≈ 0.84) uses the classic LSH parameterization
  * B ≈ log2(N/occupancy) with L sized from the target recall: e.g.
  * (B=12, L=24) gives per-band collision 0.842¹² ≈ 0.13 → recall
  * ≈ 0.96 over 24 bands while random pairs collide at L/2^B ≈ 0.6%
  * of all pairs. Both ends are proven in EmbLshScaleSpec and measured
  * at sf1 in BASELINE.md §sf1; the geometry is a parameter of
  * catalyst.EmbLshKeys / GraftOps.embeddingNearDups.
  */
object EmbLsh {

  val Dims = 64
  val Bits = 6 // per band → 2^6 = 64 buckets per band
  val Bands = 21 // OR-of-bands: collide on any band ⇒ candidate

  /** splitmix64 finalizer — the same deterministic, engine-neutral
    * generator used by agg.HllDistinct. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** ±1 weight of hyperplane `plane` at dimension `dim`. */
  def weight(plane: Int, dim: Int): Int =
    if ((splitmix64(plane.toLong * Dims + dim) & 1L) == 1L) 1 else -1

  private def lits(plane: Int): String =
    (0 until Dims).map(d => if (weight(plane, d) > 0) "1.0" else "-1.0").mkString(",")

  /** Spark SQL expression: array of the `Bands` band keys for column
    * `embedding`. Key i lives in [i·2^B, (i+1)·2^B) so one int column
    * carries (band, bucket) and a single equi join covers all bands.
    * Delegates to the codegen'd catalyst.EmbLshKeys expression
    * (requires GraftFunctions.ensureRegistered) — the unrolled-SQL
    * spelling of the same arithmetic builds a ~20k-node tree that
    * falls out of codegen and costs ~10 µs/projection interpreted. */
  def sparkKeysExpr: String = "graft_emb_lsh_keys(embedding)"

  /** DuckDB list literal mirroring [[sparkKeysExpr]] exactly (same
    * weights, same rounding, same band offsets). Parameterized on the
    * geometry (r13) so the production-dial key
    * (q_dedup_embedding_scaled: 12 bits × 24 bands) is generated from
    * the SAME plane source as the default loose-τ key — any
    * (bits, bands) pair the Spark expression accepts has a
    * bit-identical oracle spelling. */
  def duckKeysSql: String = duckKeysSql(Bits, Bands)

  def duckKeysSql(bits: Int, bands: Int): String = {
    val keys = (0 until bands).map { band =>
      val terms = (0 until bits).map { j =>
        s"(CASE WHEN round(list_dot_product(CAST(embedding AS DOUBLE[]), [${lits(band * bits + j)}]), 6) > 0 THEN ${1 << j} ELSE 0 END)"
      }
      s"(${band * (1 << bits)} + ${terms.mkString(" + ")})"
    }
    s"[${keys.mkString(",")}]"
  }
}
