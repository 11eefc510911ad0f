package graft

import graft.api.GraftOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning

/** Data-mixing properties the oracle can't see: the grouped prefix
  * sum equals the naive per-group global window at any input layout
  * (so no per-group single-partition sort is ever needed), the plan
  * blocks on a deterministic key-prefix slice — ZERO sampled range
  * exchanges — and broadcasts the offsets, and the greedy keep rule
  * fills each source's budget with at most one overshooting
  * document. */
class MixSourcesSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def base = Tables.documents(spark, "/root/testdata/sf0.01")
    .select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      concat(md5(col("doc_id").cast("string")),
        lpad(col("doc_id").cast("string"), 20, "0")).as("h"))

  test("grouped prefix sum == naive per-group global window, any layout") {
    val naive = base.withColumn("cum",
      sum(col("n_tok")).over(Window.partitionBy(col("source"))
        .orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum")
    for (layout <- Seq(base, base.repartition(7), base.repartition(3, col("n_tok")))) {
      val got = GraftOps.groupedPrefixSum(layout, "source", "h", "n_tok")
        .select("doc_id", "cum")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        "grouped prefix sum must be layout-independent")
    }
  }

  test("plan: NO sampled range exchange anywhere + broadcast offsets — no per-group sort") {
    // determinism by construction: blocks derive from the key prefix,
    // so the plan must contain ZERO RangePartitioning exchanges — a
    // sampled boundary set traversed by two un-reused subtrees (the
    // offsets branch and the main branch) could disagree per execution
    // (r13 self-review)
    val plan = GraftOps.groupedPrefixSum(base, "source", "h", "n_tok")
      .queryExecution.executedPlan
    val range = collectWithSubqueries(plan) {
      case s: ShuffleExchangeLike
        if s.outputPartitioning.isInstanceOf[RangePartitioning] => s
    }
    assert(range.isEmpty,
      "no sampled range exchange may appear, got:\n" + plan)
    val bc = collectWithSubqueries(plan) { case b: BroadcastExchangeExec => b }
    assert(bc.nonEmpty, "offsets must broadcast, got:\n" + plan)
  }

  // r14 (ADVICE r13): out-of-contract keys must FAIL FAST, not
  // silently drop (null block → inner offsets join) or silently
  // corrupt (conv parses the longest valid digit prefix, so a non-hex
  // key lands in a block non-monotone with the string order)
  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("fail fast: prefixSum raises on a NULL id instead of dropping the row") {
    val df = Seq((Some(1L), 10L), (None: Option[Long], 20L), (Some(3L), 30L))
      .toDF("id", "n")
    val e = intercept[Throwable] {
      GraftOps.prefixSum(df, "id", "n").collect()
    }
    assert(messages(e).contains("graft.prefixSum"), messages(e))
  }

  test("fail fast: groupedPrefixSum raises on a non-hex ordCol prefix") {
    val df = Seq(("g", "zzzz0001", 1L), ("g", "00aa0002", 2L)).toDF("g", "h", "n")
    val e = intercept[Throwable] {
      GraftOps.groupedPrefixSum(df, "g", "h", "n").collect()
    }
    assert(messages(e).contains("graft.groupedPrefixSum"), messages(e))
    // and a short key (< 4 chars) is equally out of contract
    val df2 = Seq(("g", "0a", 1L)).toDF("g", "h", "n")
    val e2 = intercept[Throwable] {
      GraftOps.groupedPrefixSum(df2, "g", "h", "n").collect()
    }
    assert(messages(e2).contains("graft.groupedPrefixSum"), messages(e2))
  }

  test("greedy keep: budget fills with at most one overshooting doc per source") {
    val budgets = base.select("source").distinct()
      .withColumn("budget",
        when(expr("cast(substring(source, 4) as int) % 2 = 0"), lit(4000L))
          .otherwise(lit(2000L)))
    val kept = GraftOps.mixSources(
      base.select("doc_id", "source", "n_tok"),
      "doc_id", "source", "n_tok", budgets).cache()
    // every kept doc STARTS under budget; total overshoot < last doc
    assert(kept.filter(col("cum") - col("n_tok") >= col("budget")).count() == 0)
    val per = kept.groupBy("source").agg(
      sum("n_tok").as("tokens"), max("budget").as("budget"),
      max(col("cum") - col("n_tok")).as("last_start"))
    assert(per.filter(col("last_start") >= col("budget")).count() == 0)
    // and the next doc (first dropped) would start at or past budget:
    // tokens >= budget whenever the source had enough supply
    val supply = base.groupBy("source").agg(sum("n_tok").as("avail"))
    val under = per.join(supply, "source")
      .filter(col("tokens") < col("budget") && col("avail") >= col("budget"))
    assert(under.count() == 0,
      "a source with enough supply must fill its budget")
    kept.unpersist()
  }
}
