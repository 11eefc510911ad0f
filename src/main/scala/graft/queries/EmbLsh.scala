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
  * pairs spread over ~1340 buckets (max bucket 27 of 500 vectors) —
  * candidates scale as N^(1+ρ) ≈ N^1.6, not N². At a production dedup
  * threshold (cos ≥ 0.9, p₁ ≈ 0.86) the same construction with wider
  * bands (e.g. B=16, L=8) reaches recall > 0.95 at ~1e-4 of all pairs;
  * the fixture geometry, not the construction, is what caps recall
  * here.
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
    * weights, same rounding, same band offsets). */
  def duckKeysSql: String = {
    val keys = (0 until Bands).map { band =>
      val bits = (0 until Bits).map { j =>
        s"(CASE WHEN round(list_dot_product(CAST(embedding AS DOUBLE[]), [${lits(band * Bits + j)}]), 6) > 0 THEN ${1 << j} ELSE 0 END)"
      }
      s"(${band * (1 << Bits)} + ${bits.mkString(" + ")})"
    }
    s"[${keys.mkString(",")}]"
  }
}
