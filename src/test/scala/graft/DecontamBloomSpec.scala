package graft

import graft.queries.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom decontamination (TextOps.qDecontamBloom): proves the two
  * properties the 100 TB design rests on, on a fixture built so they
  * are non-trivial —
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

  test("no false negatives: bloom candidates ⊇ exact shared pairs; final answer exact") {
    val (bench, candidates) = TextOps.bloomStages(fixture)
    // direct exact computation, no bloom anywhere
    val grams = fixture
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
      ))).as("gram"))
    val exactShared = grams.filter(col("doc_id") >= 5)
      .join(grams.filter(col("doc_id") < 5).select("gram").distinct(), "gram")
      .select("doc_id", "gram")
    val missed = exactShared.except(candidates)
    assert(missed.count() === 0, "bloom dropped a truly-shared gram (false negative)")
    // final key output equals the exact per-doc count
    val viaBloom = candidates.join(bench, "gram")
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
    val (_, candidates) = TextOps.bloomStages(fixture)
    // clean docs (13+) contribute ~32×7 distinct grams; with a 65536-bit
    // k=2 bloom holding ~40 benchmark grams the expected FP count is
    // ≪ 1 — allow a couple, but the mass must be gone
    val cleanSurvivors = candidates.filter(col("doc_id") >= 13).count()
    assert(cleanSurvivors <= 2,
      s"bloom passed $cleanSurvivors clean grams — prefilter is not filtering")
  }
}
