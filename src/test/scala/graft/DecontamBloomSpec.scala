package graft

import graft.api.GraftOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-accelerated semi-join (GraftOps.bloomSemiJoin — the engine of
  * q_decontam_bloom): proves the two properties the 100 TB design
  * rests on, on a fixture built so they are non-trivial —
  *  1. NO FALSE NEGATIVES: every exactly-shared (doc, gram) pair
  *     survives the bloom prefilter (one-sided error), so the final
  *     confirm-join answer equals a direct exact join.
  *  2. THE PREFILTER FILTERS: corpus grams that share nothing with
  *     the benchmark are overwhelmingly rejected before the join
  *     (map-side kill), which is the whole point at corpus scale.
  *
  * Fixture: 5 "benchmark" docs (ids 0–4) with a distinctive shared
  * phrase; 40 corpus docs of which 8 embed that phrase (contaminated)
  * and 32 are built from a disjoint vocabulary (clean — every gram
  * should die in the bloom, modulo the designed ~0.02% FP rate).
  */
class DecontamBloomSpec extends SparkSpec {

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val phrase = "the secret benchmark answer sequence"
    val bench = (0L to 4L).map(i => (i, s"eval question $i asks about $phrase variant $i"))
    val contaminated = (5L to 12L).map(i =>
      (i, s"web page $i copied $phrase into its body text number $i"))
    val clean = (13L to 44L).map(i =>
      (i, s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i hotel$i india$i"))
    (bench ++ contaminated ++ clean).toDF("doc_id", "text")
  }

  /** distinct word-trigrams per doc, no bloom anywhere */
  private lazy val grams: DataFrame = fixture
    .select(col("doc_id"), split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 3)
    .select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
    ))).as("gram"))

  private lazy val bench: DataFrame =
    grams.filter(col("doc_id") < 5).select("gram").distinct()
  private lazy val corpus: DataFrame = grams.filter(col("doc_id") >= 5)

  test("no false negatives: bloom candidates ⊇ exact shared pairs; semi-join exact") {
    val candidates = GraftOps.bloomCandidates(corpus, bench, "gram", 65536)
    val exactShared = corpus.join(bench, "gram").select("doc_id", "gram")
    val missed = exactShared.except(candidates.select("doc_id", "gram"))
    assert(missed.count() === 0, "bloom dropped a truly-shared gram (false negative)")
    // the full bloomSemiJoin equals the direct exact join per doc
    val viaBloom = GraftOps.bloomSemiJoin(corpus, bench, "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val exact = exactShared.groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    assert(viaBloom.orderBy("doc_id").collect().toSeq ===
      exact.orderBy("doc_id").collect().toSeq)
    // all 8 contaminated docs flagged, none of the clean ones
    val flagged = viaBloom.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(flagged === (5L to 12L))
  }

  test("the prefilter filters: clean-vocabulary grams die before the join") {
    val candidates = GraftOps.bloomCandidates(corpus, bench, "gram", 65536)
    // clean docs (13+) contribute ~32×7 distinct grams; with a 65536-bit
    // k=2 bloom holding ~40 benchmark grams the expected FP count is
    // ≪ 1 — allow a couple, but the mass must be gone
    val cleanSurvivors = candidates.filter(col("doc_id") >= 13).count()
    assert(cleanSurvivors <= 2,
      s"bloom passed $cleanSurvivors clean grams — prefilter is not filtering")
  }

  test("declared key still reports via the API path") {
    import spark.implicits._
    val viaKey = GraftOps.bloomSemiJoin(corpus, bench, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("doc_id"))
      .as[(Long, Long)].collect().toSeq
    assert(viaKey.nonEmpty && viaKey.forall { case (id, n) => id >= 5 && n > 0 })
  }
}
