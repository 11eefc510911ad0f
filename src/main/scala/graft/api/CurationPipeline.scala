package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the engine's operators
  * composed the way a real pipeline runs them, over ANY
  * (id, text, stratum) frame:
  *
  *   1. quality gate    — drop repetitive docs (Gopher signals)
  *   2. exact dedup     — one representative per normalized text
  *   3. near-dup dedup  — MinHash/LSH candidates ≥ `minJaccard`
  *                        (band-skew capped: [[GraftOps.lshCandidates]]
  *                        routes through the one MaxBandBucket pair
  *                        engine, so DISTINCT texts sharing a band
  *                        bucket — boilerplate variants — cannot blow
  *                        up the join at corpus scale), connected
  *                        components, keep each cluster's min-id
  *                        representative
  *   4. decontamination — drop docs sharing an n-gram shingle with
  *                        the benchmark set (bloom prefilter + exact
  *                        confirm; answer exact)
  *   5. stratum cap     — balanced per-stratum sampling to `target`
  *
  * Every stage is the same declarative shape as its oracle-verified
  * declared key (SCALE.md rows apply unchanged); the composition adds
  * no new shuffle beyond the stages' own. `curate` returns the kept
  * frame plus a funnel audit (one row per stage, rows in/out).
  *
  * The funnel counts are ACTIONS — five counts over progressively
  * smaller frames, the standard curation-report cost. Callers who
  * want one lazy plan use [[curateLazy]] and count nothing.
  */
object CurationPipeline {

  /** Stage-by-stage plans: (name, frame-after-stage), in order.
    *
    * MOSTLY lazy, with one documented exception (ADVICE r7): stage 3
    * calls [[GraftOps.connectedComponentsAdaptive]], whose convergence
    * loop is inherently iterative — building that stage's frame runs
    * Spark jobs for the pipeline prefix up to clustering
    * (localCheckpoint + per-round convergence counts). Stages 1-2 and
    * 4-5 stay pure plans. Callers needing a zero-execution dry run
    * should stop at stage 2 or inspect `queryExecution` before forcing
    * stage 3. */
  def curateLazy(docs: DataFrame, bench: DataFrame,
                 idCol: String, textCol: String, stratumCol: String,
                 target: Int, minJaccard: Double = 0.5): Seq[(String, DataFrame)] =
    stages(docs, bench, idCol, textCol, stratumCol, target, minJaccard,
      materialize = false)

  /** `materialize = true` cuts lineage after every stage
    * (localCheckpoint), so [[curate]]'s five funnel counts are scans
    * of in-memory blocks instead of re-executing the whole stage
    * prefix per count (quadratic recompute) — the same pattern as the
    * connected-components loop. The lazy form keeps pure plans. */
  /** `storedSignatures`: an optional pre-built minhash signature
    * table in the standard (idCol, mh1..mh4) shape covering AT LEAST
    * every doc in `docs` — e.g. the persisted corpus index
    * ([[graft.queries.DedupOps.minhashIndex]]). When present, stage 3
    * joins it (left-semi on the surviving ids) instead of re-running
    * the shingle+minhash pass over the survivors: signatures are a
    * pure function of each doc's text, so the candidate set — and
    * every downstream stage — is value-identical
    * (CurationPipelineSpec pins it), while the pipeline's text pass
    * count drops by one. This is how a pipeline runs over an indexed
    * corpus at 100 TB: the signature store already exists, only NEW
    * text gets hashed. */
  private[graft] def stages(docs: DataFrame, bench: DataFrame,
                            idCol: String, textCol: String, stratumCol: String,
                            target: Int, minJaccard: Double,
                            materialize: Boolean,
                            onStage: (String, Double) => Unit = (_, _) => (),
                            storedSignatures: Option[DataFrame] = None): Seq[(String, DataFrame)] = {
    def m(df: DataFrame): DataFrame = if (materialize) df.localCheckpoint(true) else df
    // per-stage wall attribution (tools.FunnelBench — the CcRoundAudit
    // callback pattern): with materialize=true each block below IS the
    // stage's execution; the default no-op adds nothing to curate()
    def timed(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime(); val r = f
      onStage(name, (System.nanoTime() - t0) / 1e9); r
    }
    // 1. quality gate: keep docs the repetition signals pass
    val q = timed("quality_gate") {
      val ok = GraftOps.repetitionSignals(docs, idCol, textCol)
        .filter(!col("repetitive")).select(col(idCol))
      m(docs.join(ok, Seq(idCol), "left_semi"))
    }

    // 2. exact dedup on normalized text: min id per content group
    val exact = timed("exact_dedup") {
      val reps = GraftOps.normalizeText(q, textCol, "__norm")
        .groupBy(col("__norm")).agg(min(col(idCol)).as(idCol))
        .select(col(idCol))
      m(q.join(reps, Seq(idCol), "left_semi"))
    }

    // 3. near-dup clustering: non-representative cluster members out
    val near = timed("near_dedup") {
      val sigs = storedSignatures
        .map(_.join(exact.select(col(idCol)), Seq(idCol), "left_semi"))
        .getOrElse(GraftOps.minhashSignatures(exact, idCol, textCol))
      val cand = GraftOps.lshCandidates(sigs, idCol)
        .filter(col("jacc_est") >= minJaccard)
      // adaptive dispatch (VERDICT r15 #1): the sf10 candidate graph is
      // 13.4 M capped pairs — 13× past the measured 1 M-edge crossover
      // where the large/small-star loop beats plain propagation (the
      // flood rounds re-ship the full edge frame every round). Below
      // the crossover the dispatch picks propagation; fixpoint is
      // identical either way, so declared hashes cannot move.
      val losers = GraftOps.connectedComponentsAdaptive(cand, "id_a", "id_b")
        .filter(col("id") =!= col("component"))
        .select(col("id").as(idCol))
      m(exact.join(losers, Seq(idCol), "left_anti"))
    }

    // 4. decontamination: any shared shingle with the benchmark → out
    val clean = timed("decontaminate") {
      val corpusGrams = GraftOps.wordShingles(near, idCol, textCol)
      val benchGrams = GraftOps.wordShingles(bench, idCol, textCol)
        .select(col("gram"))
      val dirty = GraftOps.bloomSemiJoin(corpusGrams, benchGrams, "gram")
        .select(col(idCol)).distinct()
      m(near.join(dirty, Seq(idCol), "left_anti"))
    }

    // 5. balanced per-stratum cap (content-hash keyed → reproducible)
    val capped = timed("stratum_cap") {
      m(GraftOps.stratifiedSample(clean, stratumCol, textCol, target))
    }

    Seq("quality_gate" -> q, "exact_dedup" -> exact, "near_dedup" -> near,
      "decontaminate" -> clean, "stratum_cap" -> capped)
  }

  /** Run the pipeline and report: (kept frame, funnel audit with one
    * (stage, rows_in, rows_out) row per stage). */
  def curate(docs: DataFrame, bench: DataFrame,
             idCol: String, textCol: String, stratumCol: String,
             target: Int, minJaccard: Double = 0.5): (DataFrame, DataFrame) = {
    val st = stages(docs, bench, idCol, textCol, stratumCol, target, minJaccard,
      materialize = true)
    val counts = docs.count() +: st.map(_._2.count())
    val funnel = st.map(_._1).zip(counts.zip(counts.tail))
      .map { case (name, (in, out)) => (name, in, out) }
    val spark = docs.sparkSession
    import spark.implicits._
    (st.last._2, funnel.toDF("stage", "rows_in", "rows_out"))
  }
}
