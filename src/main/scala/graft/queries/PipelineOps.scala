package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-pipeline assembly operators: packing a corpus into
  * fixed-token-budget shards, and sketch-based heavy-hitter counting.
  */
object PipelineOps {

  /** Token budget per training shard (≈15 shards at sf0.01). */
  val ShardBudget = 2000L

  /** Greedy sequential shard packing: docs in doc_id order are
    * assigned to shards of ≤~ShardBudget tokens — `shard = (tokens
    * before this doc) div budget` — and the result reports each
    * shard's docs/tokens/boundaries.
    *
    * The core is a GLOBAL prefix sum, and the implementation is the
    * scale-correct two-pass form rather than a global-order window
    * (which Spark executes as a single-partition WindowExec — the
    * whole corpus through one task): range-partition by doc_id, cum-
    * sum within each partition (parallel, sorted-run windows), then
    * add broadcast per-partition offsets (a ~#partitions-row cumsum).
    * The result is the exact global cumsum regardless of where the
    * sampled range boundaries fall, so the output stays deterministic
    * and oracle-comparable while no single task ever sees more than
    * one partition of the corpus. */
  def qPackShards(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.api.GraftOps.packShards(d, "doc_id", "n_tok", ShardBudget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
  }

  /** Sequence packing at a 256-token context: the per-sequence doc
    * manifest summary. Every sequence is exactly full except the
    * last (PackSequencesSpec pins it). */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.api.GraftOps.packSequences(d, "doc_id", "n_tok", 256L)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("span_toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("seq_id"))
  }

  /** Data mixing: per-source token budgets (even-indexed sources get
    * 2× the odd ones — a deterministic stand-in for the tuned mixture
    * weights a real run supplies), filled from a deterministic md5
    * shuffle order via GraftOps.mixSources. Emits the per-source
    * realized mixture. */
  def qMixSources(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val budgets = d.select(col("source")).distinct()
      .withColumn("budget",
        when(expr("cast(substring(source, 4) as int) % 2 = 0"), lit(4000L))
          .otherwise(lit(2000L)))
    graft.api.GraftOps.mixSources(d, "doc_id", "source", "n_tok", budgets)
      .groupBy(col("source"))
      .agg(max(col("budget")).as("budget"), count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"))
      .orderBy(col("source"))
  }

  /** DECLARED: the COMPOSED curation pipeline (r14, VERDICT r13 #3) —
    * api.CurationPipeline's five stages run end to end over the
    * fixture corpus, verified as ONE key: quality gate (repetition
    * signals) → exact dedup (normalized text, min-id representative)
    * → near-dup dedup (MinHash/LSH ≥ 0.5, connected components,
    * min-id survivor) → decontamination (shared 3-shingle with the
    * doc_id < 5 benchmark slice, bloom prefilter + exact confirm) →
    * per-stratum cap (~20 docs/lang). Stage COMPOSITION is where real
    * pipelines break (order effects, funnel accounting), so the
    * declared result is the funnel itself: one row per stage with the
    * surviving row count AND the surviving doc_id sum — the id_sum
    * pins stage CONTENT, not just cardinality, so two offsetting
    * stage errors cannot cancel. The oracle chains the five stages'
    * existing CTE vocabularies (repetition verdict, nfc-normalize
    * chain, minhash bands ∪-distinct + recursive-CTE components,
    * shingle semi-join, integer stratum keep rule) over the same
    * survivor frames.
    *
    * Scale: every stage is the same declarative shape as its
    * oracle-verified standalone key (SCALE.md rows apply unchanged);
    * the composition adds no new shuffle beyond the stages' own, and
    * CurationPipelineSpec separately proves the stage ORDER is the
    * skew story (exact dedup collapses replica mass before anything
    * pairwise runs). materialize=true cuts lineage per stage, so the
    * six funnel aggregates scan in-memory blocks instead of
    * re-executing the pipeline prefix quadratically. */
  def qPipelineCurate(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir)
    val docs = all.filter(col("doc_id") >= 5)
      .select(col("doc_id"), col("text"), col("lang"))
    val bench = all.filter(col("doc_id") < 5).select(col("doc_id"), col("text"))
    val st = graft.api.CurationPipeline.stages(
      docs, bench, "doc_id", "text", "lang", target = 20, minJaccard = 0.5,
      materialize = true,
      // r16: the pipeline runs over an INDEXED corpus — stage 3 joins
      // the persisted signature store (the incremental-dedup artifact)
      // restricted to survivors instead of re-hashing their text;
      // signatures are text-pure, so values cannot move
      storedSignatures = Some(DedupOps.minhashIndex(spark, dir)))
    (("input", docs) +: st).zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("rows_out"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
        .select(lit(i).as("stage_no"), lit(name).as("stage"),
          col("rows_out"), col("id_sum"))
    }.reduce(_.unionAll(_)).orderBy(col("stage_no"))
  }

  /** Count-min sketch depth (independent hash rows) and width
    * (counters per row). Width 16 on a ~31-token vocabulary forces
    * collisions, so the fixture actually exercises the min-over-rows
    * estimate, not the collision-free trivial case. */
  val CmsDepth = 4
  val CmsWidth = 16

  /** Count-min-sketch heavy hitters: build a CmsDepth×CmsWidth counter
    * table over the token stream, then report the exact top-15 tokens
    * with their sketch estimates (est ≥ exact always; equality iff no
    * collision survives the min).
    *
    * Unlike HLL (agg/HllSketchAgg), a CMS is expressible as PLAIN
    * relational algebra — counters are `groupBy(row, bucket).count`,
    * merge is `+` — so the whole sketch is one partial-aggregated
    * shuffle of 64 counter rows, deterministic given the fixed md5
    * bucket hash, and therefore DuckDB-oracle-verifiable, which no
    * randomized sketch is. The exact side is the verification baseline
    * at fixture scale; at 100 TB the exact groupBy is replaced by any
    * candidate stream (the sketch itself answers point queries), while
    * the sketch side is already the scalable shape. */
  def qSketchCms(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.GraftOps
    // ONE pass over the token stream: the (token, n) aggregate feeds
    // both the sketch (counters are additive) and the exact baseline;
    // localCheckpoint keeps the tiny counts frame from recomputing the
    // corpus shuffle for each branch.
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .localCheckpoint(true)
    val sketch = GraftOps.cmsSketchFromCounts(counts, "token", "exact_n", CmsDepth, CmsWidth)
    val exact = counts.orderBy(col("exact_n").desc, col("token")).limit(15)
    GraftOps.cmsEstimate(sketch, exact, "token", CmsDepth, CmsWidth)
      .orderBy(col("exact_n").desc, col("token"))
  }
}
