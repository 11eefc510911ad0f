package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.PipelineOps

/** The properties of the pipeline-assembly operators their oracles
  * don't directly state.
  */
class PipelineOpsSpec extends SparkSpec {

  test("two-pass distributed prefix sum == naive single-partition global window") {
    val twoPass = PipelineOps.qPackShards(spark, sf)
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val naive = d
      .withColumn("cum", sum(col("n_tok")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard", expr(s"(cum - n_tok) div ${PipelineOps.ShardBudget}"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    assert(twoPass.exceptAll(naive).isEmpty && naive.exceptAll(twoPass).isEmpty,
      "range-partitioned cumsum must be layout-independent")
  }

  test("every shard except the last holds at least the budget; none started above it") {
    val rows = PipelineOps.qPackShards(spark, sf).collect()
    assert(rows.length > 1, "fixture should need multiple shards")
    // greedy rule: a shard closes once its running total crosses the
    // budget, so every non-final shard's tokens >= budget - (max doc)
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("tokens") >= PipelineOps.ShardBudget - 200,
        s"shard ${r.getAs[Long]("shard")} underfilled: ${r.getAs[Long]("tokens")}")
    }
  }

  test("sequence packing: every sequence exactly full except the last; spans conserve tokens") {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val spans = graft.api.GraftOps.packSequences(d, "doc_id", "n_tok", 256L).cache()
    // per-sequence totals: exactly 256 everywhere but the last cut
    val seqs = spans.groupBy("seq_id").agg(sum("span_toks").as("n"))
      .orderBy("seq_id").collect()
    assert(seqs.length > 1, "fixture should need multiple sequences")
    seqs.dropRight(1).foreach(r =>
      assert(r.getLong(1) == 256L, s"seq ${r.getLong(0)} not full: ${r.getLong(1)}"))
    assert(seqs.last.getLong(1) <= 256L)
    // conservation: each doc's spans sum back to its token count
    val bad = spans.groupBy("doc_id").agg(sum("span_toks").as("got"))
      .join(d, "doc_id").filter(col("got") =!= col("n_tok"))
    assert(bad.count() == 0, "doc spans must conserve token counts")
    // span geometry: offsets within [0, 256), lengths positive
    assert(spans.filter(col("span_start") < 0 || col("span_start") >= 256 ||
      col("span_toks") <= 0).count() == 0)
    spans.unpersist()
  }

  test("CMS estimate is always >= exact and within the N/width error bound") {
    val total = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val rows = PipelineOps.qSketchCms(spark, sf).collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= exact, s"${r.getString(0)}: CMS must never underestimate")
      // classic CMS guarantee shape: excess ≤ e·N/width w.h.p.; the
      // deliberately tiny width (collisions on a 31-token vocab) still
      // keeps the min-over-depth excess within ~2N/width here
      assert(est - exact <= 2 * total / PipelineOps.CmsWidth,
        s"${r.getString(0)}: est $est vs exact $exact (N=$total)")
    }
  }
}
