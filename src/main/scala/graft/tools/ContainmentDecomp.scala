package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of q_dedup_containment's wall — VERDICT
  * r11 #3: the r11 rewrite removed three Exchanges and improved sf1
  * 3.49 → 2.05 s, yet sf10 sat flat at 14.4 s, so something OTHER
  * than the candidate-pair machinery dominates the third decade.
  * This instrument times the pipeline's stages separately (the
  * DedupScaleAudit discipline: populations and stage walls, never a
  * quadratic execution), in ONE fresh JVM per scale:
  *
  *  - `shingle_scan`: wordShingles explode + count — the raw
  *    token-window scan, no materialization;
  *  - `checkpoint`: localCheckpoint(true) of the gram table — the
  *    [[graft.queries.DedupOps.containmentPairs]] prologue that
  *    materializes every (doc_id, gram) row into block storage;
  *  - `df_filter`: the shared-capable gram count (groupBy gram,
  *    df ∈ [2, RareGramDf]) off the checkpointed table;
  *  - `doc_fold`: the one-corpus-shuffle per-doc aggregate (gram
  *    set + n + rgs blocking subset);
  *  - `e2e`: the declared key, end to end (re-runs the above — the
  *    difference e2e − (checkpoint + df_filter + doc_fold) is the
  *    block join + verification stage).
  *
  * Volume counters ride along: total grams, Σ|rgs| (the exploded
  * block-join side cardinality), uncapped candidate pairs
  * (Σ_rare-gram df·(df−1)/2), and final pairs.
  *
  * An optional duplication overlay (`dupFrac` ∈ (0,1]) re-emits that
  * fraction of docs verbatim under fresh ids — ADVICE r11's
  * pathological corpus: a doc with exactly one wholesale copy has
  * EVERY gram at df = 2, so its rgs array approaches its full gram
  * set and the block-join sides carry (grams, rgs) arrays ≈ doc
  * length on both columns. This is the worst case for the r11
  * carried-array design, measurable without any quadratic blowup
  * (pairs stay ≈ dupFrac·N).
  *
  * Usage: `runMain graft.tools.ContainmentDecomp <sfDir> [label]
  * [dupFrac]`. One JSON line per run.
  */
object ContainmentDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val label = args.lift(1).getOrElse(new java.io.File(sfDir).getName)
    val dupFrac = args.lift(2).map(_.toDouble).getOrElse(0.0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-containment-decomp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val base = graft.Tables.documents(spark, sfDir)
    // dupFrac is REALIZED as pmod(doc_id, round(1/dupFrac)) == 0 —
    // i.e. rounded to 1/round(1/dupFrac) (0.3 → 1/3; anything > 0.5
    // rounds to duplicating every doc). The realized count is emitted
    // (ADVICE r12): dup_docs / realized_dup_frac, derived from the
    // actual doc counts, are the numbers to read, not the request.
    val docs = if (dupFrac <= 0.0) base else {
      val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
      base.unionAll(
        base.filter(pmod(col("doc_id"), lit(math.round(1.0 / dupFrac))) === 0)
          .withColumn("doc_id", col("doc_id") + lit(maxId + 1)))
    }
    val nBase = base.count()
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

    // warm the scan path once so stage walls aren't first-touch noise
    docs.count()

    // the SAME frames the declared key executes (r12 review:
    // single-sourced via DedupOps.containmentGrams/containmentStages
    // so a pipeline change cannot decouple instrument from key)
    val gramsLazy = graft.queries.DedupOps.containmentGrams(docs)
    val (nGrams, tScan) = timed(gramsLazy.count())
    // checkpoint_sec RE-RUNS the shingle scan (count() above does not
    // cache gramsLazy), so it is scan + materialization; the emitted
    // materialize_est_sec = checkpoint − scan is the materialization
    // estimate (ADVICE r12 — the stage table should not double-count
    // the scan into the checkpoint row).
    val (g, tCkpt) = timed(gramsLazy.localCheckpoint(true))
    val (dfs, sets) = graft.queries.DedupOps.containmentStages(g)
    val (candUncapped, tDf) = timed(
      dfs.agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)))
        .collect()(0).getLong(0))
    val (rgsMass, tFold) = timed(
      sets.agg(coalesce(sum(size(col("rgs"))), lit(0L)))
        .collect()(0).getLong(0))
    val (nPairs, tE2e) = timed(
      graft.queries.DedupOps.containmentPairs(docs).count())

    println(s"""{"metric":"containment_decomp","label":"$label",""" +
      s""""dup_frac":$dupFrac,"dup_docs":${nDocs - nBase},""" +
      s""""realized_dup_frac":${fmt((nDocs - nBase).toDouble / nBase)},""" +
      s""""docs":$nDocs,"grams":$nGrams,""" +
      s""""rgs_mass":$rgsMass,"cand_pairs_uncapped":$candUncapped,""" +
      s""""pairs_out":$nPairs,""" +
      s""""shingle_scan_sec":${fmt(tScan)},"checkpoint_sec":${fmt(tCkpt)},""" +
      s""""materialize_est_sec":${fmt(math.max(0.0, tCkpt - tScan))},""" +
      s""""df_filter_sec":${fmt(tDf)},"doc_fold_sec":${fmt(tFold)},""" +
      s""""e2e_sec":${fmt(tE2e)}}""")
    spark.stop()
  }
}
