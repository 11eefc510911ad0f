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

  test("funnel audit on the 10× adversarial mega-cluster corpus (VERDICT r7 #7)") {
    // The composed pipeline on AdvFixture: 5 000 docs (10× sf0.001,
    // each text appearing 10× under distinct ids) + the 600-doc
    // identical-text mega-cluster. The load-bearing property is the
    // STAGE ORDERING: exact dedup (skew-immune hash agg) reduces the
    // mega-cluster to ONE representative BEFORE the pairwise LSH
    // stage ever runs, so the n²/2 blowup BlockCapSpec has to cap in
    // the standalone operators never even reaches stage 3 here.
    // Bench shares a shingle with the mega text → decontamination
    // must then kill that lone representative.
    val adv = spark.read.parquet(s"${AdvFixture.dir(spark, sf)}/documents.parquet")
    val megaBench = Seq(
      (1L, "terms of service header repeated verbatim says the eval set"))
      .toDF("doc_id", "text")
    val (kept, funnel) = CurationPipeline.curate(
      adv, megaBench, "doc_id", "text", "lang", target = 100000)
    val f = funnel.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byStage = f.map(x => x._1 -> (x._2, x._3)).toMap

    assert(f.head._2 === 5600L, "corpus in must be 10x500 replicas + 600 mega docs")
    // funnel stays monotone and chained under skew
    f.foreach { case (s, in, out) => assert(out <= in, s"$s grew: $in -> $out") }
    assert(f.sliding(2).forall { case Array(a, b) => a._3 == b._2 })

    // exact dedup must collapse the replicated corpus ~10:1 AND the
    // mega-cluster 600:1 — its output is bounded by the number of
    // distinct surviving texts (≤ 501 here), proving the pairwise
    // stage's input is small no matter how skewed the corpus
    val (exIn, exOut) = byStage("exact_dedup")
    assert(exOut <= 501L, s"exact dedup left $exOut docs — 10x replicas or mega leaked")
    assert(exIn - exOut >= 599L + 9 * 400L,
      "exact dedup removed fewer than the planted replica mass")

    // the mega representative (min id of the identical group) entered
    // stage 3 alone, and decontamination then killed it via the
    // shared shingle
    val megaKept = kept.filter(col("doc_id") >= AdvFixture.MegaBase).count()
    assert(megaKept === 0L, "mega representative survived decontamination")
    val (dcIn, dcOut) = byStage("decontaminate")
    assert(dcIn - dcOut >= 1L, "decontamination stage removed nothing")
    // and the pipeline kept a real corpus — skew handling must not
    // degenerate into dropping everything
    assert(kept.count() > 300L, "adversarial corpus over-filtered")
  }

  test("stage 3 caps DISTINCT-text band-bucket skew (VERDICT r14 #1)") {
    // The hazard exact dedup can NOT absorb: 1200 DISTINCT texts —
    // the boilerplate sentence plus one unique trailing token each —
    // all survive stage 2 (distinct normalized texts), and most share
    // the base text's band signatures (the one new shingle rarely
    // displaces a 13-shingle minimum). Pre-r15, stage 3's uncapped
    // band join materialized their ~n²/2 candidate pairs; now
    // lshCandidates routes through the MaxBandBucket pair engine.
    val varFrame = (0 until 1200).map(i =>
      (AdvFixture.MegaBase + i, s"${AdvFixture.MegaText} uniq$i", "en"))
      .toDF("doc_id", "text", "lang")

    // precondition: the skew is real — over-cap buckets in BOTH bands
    // among DISTINCT texts, and uncapped candidates are quadratic
    val sigs = graft.api.GraftOps.minhashSignatures(varFrame, "doc_id", "text")
      .localCheckpoint(true)
    val b1max = sigs.groupBy("mh1", "mh2").count().agg(max("count")).head().getLong(0)
    val b2max = sigs.groupBy("mh3", "mh4").count().agg(max("count")).head().getLong(0)
    val cap = graft.queries.DedupOps.MaxBandBucket
    assert(b1max > cap && b2max > cap,
      s"fixture failed to trigger the hazard: band buckets $b1max/$b2max ≤ cap $cap")
    val uncapped = graft.api.GraftOps.lshCandidates(sigs, "doc_id", Int.MaxValue).count()
    assert(uncapped > 100000L, s"uncapped blowup missing: $uncapped pairs")

    // the capped generator: over-cap buckets out of candidate
    // generation; a displaced-minimum variant's band key is unique
    // (its new shingle is), so NO variant pair survives
    assert(graft.api.GraftOps.lshCandidates(sigs, "doc_id").count() === 0L)
    // and the guard is live at cap=1 on any corpus with real pairs
    assert(graft.api.GraftOps.lshCandidates(sigs, "doc_id", 1).count() === 0L)

    // degradation contract end-to-end: the composed pipeline passes
    // the variants THROUGH stage 3 untouched (over-cap buckets are
    // the exact/boilerplate passes' territory, never pairwise)
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang")).unionAll(varFrame)
    val disjointBench =
      Seq((1L, "completely disjoint benchmark sentence sharing nothing"))
        .toDF("doc_id", "text")
    val nearOut = CurationPipeline.curateLazy(
      corpus, disjointBench, "doc_id", "text", "lang", target = 100000)
      .toMap.apply("near_dedup")
    assert(nearOut.filter(col("doc_id") >= AdvFixture.MegaBase).count() === 1200L,
      "capped stage 3 must keep every distinct-text variant")
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

  test("stored-signature stage 3 (r16) == the computed-signature pipeline, every stage") {
    // the declared key feeds stage 3 the persisted corpus signature
    // index; signatures are a pure function of text, so feeding a
    // pre-built table covering a SUPERSET of the docs (here: all of
    // them, like the store) must leave every stage's frame identical
    val pre = graft.api.GraftOps.minhashSignatures(docs, "doc_id", "text")
    val withStore = CurationPipeline.stages(
      docs, bench, "doc_id", "text", "lang", target = 100000,
      minJaccard = 0.5, materialize = true, storedSignatures = Some(pre))
    val computed = CurationPipeline.stages(
      docs, bench, "doc_id", "text", "lang", target = 100000,
      minJaccard = 0.5, materialize = true)
    withStore.zip(computed).foreach { case ((n1, a), (n2, b)) =>
      assert(n1 === n2)
      assert(a.collect().map(_.toString).sorted.toSeq ===
        b.collect().map(_.toString).sorted.toSeq, s"stage $n1 diverged")
    }
  }
}
