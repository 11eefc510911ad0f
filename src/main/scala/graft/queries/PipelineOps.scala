package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    val parted = d.repartitionByRange(col("doc_id"))
    val local = parted.withColumn("pid", spark_partition_id())
      .withColumn("local_cum",
        sum(col("n_tok")).over(Window.partitionBy(col("pid")).orderBy(col("doc_id"))))
    val offsets = local.groupBy(col("pid")).agg(max(col("local_cum")).as("pt"))
      .withColumn("offset",
        coalesce(sum(col("pt")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    local.join(broadcast(offsets), "pid")
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("shard", expr(s"(cum - n_tok) div $ShardBudget"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
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
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    // (row, bucket) pairs: bucket_d(token) = md5(d||token) mod width
    val entries = toks.select(col("token"),
        explode(expr(
          s"""transform(sequence(0, ${CmsDepth - 1}), d ->
             |  named_struct('r', d,
             |    'b', cast(conv(substring(md5(concat(cast(d as string), token)),1,8),16,10) as bigint) % $CmsWidth))
             |""".stripMargin)).as("rb"))
    val sketch = entries.groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token")).limit(15)
    // estimate: min over the candidate's CmsDepth counters
    val cand = exact.select(col("token"), col("exact_n"),
      explode(expr(
        s"""transform(sequence(0, ${CmsDepth - 1}), d ->
           |  named_struct('r', d,
           |    'b', cast(conv(substring(md5(concat(cast(d as string), token)),1,8),16,10) as bigint) % $CmsWidth))
           |""".stripMargin)).as("rb"))
    cand.join(broadcast(sketch),
        col("rb.r") === col("r") && col("rb.b") === col("b"))
      .groupBy(col("token"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }
}
