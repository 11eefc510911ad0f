package graft

import graft.api.CurationPipeline
import org.apache.spark.sql.functions._

/** End-to-end curation (CurationPipeline): a fixture with one planted
  * victim per stage proves each stage kills exactly its target and
  * nothing else — the composition test the per-key oracles can't do.
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val benchPhrase = "the holdout eval answer string nobody may train on"

  private lazy val docs = {
    val repetitive = Seq((100L, Seq.fill(30)("spam").mkString(" "), "en"))
    val exactPair = Seq(
      (101L, "a perfectly ordinary document about spark physical plans and shuffles", "en"),
      (102L, "a perfectly ordinary document about spark physical plans and shuffles", "en"))
    val nearPair = Seq(
      (103L, "tungsten codegen collapses operators into one tight loop over rows yielding speed", "en"),
      (104L, "tungsten codegen collapses operators into one tight loop over rows yielding throughput", "en"))
    val contaminated = Seq(
      (105L, s"a scraped page that quotes $benchPhrase verbatim in its body", "en"))
    val clean = (106L to 120L).map(i =>
      (i, s"unique$i body$i text$i token$i filler$i words$i extra$i tail$i", if (i % 2 == 0) "en" else "fr"))
    (repetitive ++ exactPair ++ nearPair ++ contaminated ++ clean)
      .toDF("doc_id", "text", "lang")
  }

  private lazy val bench =
    Seq((1L, s"question one asks $benchPhrase as its expected response"))
      .toDF("doc_id", "text")

  test("each stage kills its planted victim; funnel is monotone and complete") {
    val (kept, funnel) = CurationPipeline.curate(
      docs, bench, "doc_id", "text", "lang", target = 100)
    val f = funnel.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(f.map(_._1).toSeq ===
      Seq("quality_gate", "exact_dedup", "near_dedup", "decontaminate", "stratum_cap"))
    // monotone, chained (stage N's out is stage N+1's in), starts at 21
    assert(f.head._2 === 21L)
    f.foreach { case (s, in, out) => assert(out <= in, s"$s grew: $in -> $out") }
    assert(f.sliding(2).forall { case Array(a, b) => a._3 == b._2 })
    // per-stage victims: 100 repetitive, 102 exact-dup loser, 104
    // near-dup loser, 105 contaminated; 101/103 and all clean docs
    // survive (target=100 ≫ stratum sizes, so the cap keeps all)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(100L) && !ids.contains(102L) &&
      !ids.contains(104L) && !ids.contains(105L), s"victim survived: $ids")
    assert(ids.contains(101L) && ids.contains(103L))
    assert((106L to 120L).forall(ids.contains), s"clean doc lost: $ids")
    assert(f.map(_._3).toSeq === Seq(20L, 19L, 18L, 17L, 17L))
  }

  test("stratum cap engages when target is small; lazy form defers the funnel counts") {
    val stages = CurationPipeline.curateLazy(
      docs, bench, "doc_id", "text", "lang", target = 3)
    // lazy form skips curate()'s five funnel counts; stage 3's
    // clustering loop still executes during construction (documented
    // exception — connectedComponents is iterative, ADVICE r7)
    val capped = stages.last._2
    val perStratum = capped.groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // balanced-allocation sampling: strata land NEAR the target
    // (hash-bucketed, not exact) and far below their input sizes
    assert(perStratum.values.forall(n => n >= 1 && n <= 6), s"$perStratum")
  }
}
