package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** hashedLinearScore properties the oracle can't see: the model join
  * broadcasts (never shuffles the corpus on bucket), hashing disperses
  * the vocabulary, and the score is the sigmoid of the mean bucket
  * weight — monotone in the planted weight mass. */
class QualityLinearSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private lazy val scored = GraftOps.hashedLinearScore(
    Tables.documents(spark, "/root/testdata/sf0.01"), "doc_id", "text")

  test("every doc scored once, score in (0,1), keep = score >= 0.5") {
    val df = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = scored.cache()
    assert(out.count() == df.count())
    assert(out.filter(col("score") <= 0.0 || col("score") >= 1.0).count() == 0)
    assert(out.filter(col("keep") =!= (col("score") >= 0.5)).count() == 0)
    out.unpersist()
  }

  test("the model side broadcasts — no corpus shuffle on bucket") {
    val plan = scored.queryExecution.executedPlan
    def find(p: SparkPlan): Boolean =
      collectWithSubqueries(p) { case b: BroadcastExchangeExec => b }.nonEmpty
    assert(find(plan), "weights join must be a broadcast, got:\n" + plan)
  }

  test("hashing disperses: distinct buckets track the vocabulary") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.select("tok").distinct().count()
    val n = toks.select(expr(
        "cast(conv(substring(md5(tok),1,8),16,10) as bigint) % 1024")
        .as("b")).distinct().count()
    // vocab ≪ 1024 ⇒ collisions should collapse almost nothing
    assert(n >= vocab * 8 / 10,
      s"expected ≥80% of $vocab vocab tokens in distinct buckets, got $n")
  }

  test("score is monotone in planted weight mass") {
    // find one positive-weight and one negative-weight single token
    val w = spark.range(2048).select(
      expr("cast(id as string)").as("tok"),
      expr("(cast(conv(substring(md5(cast(" +
        "cast(conv(substring(md5(cast(id as string)),1,8),16,10) as bigint)" +
        " % 1024 as string)),1,8),16,10) as bigint) % 2001 - 1000) / 1000.0")
        .as("w"))
    val pos = w.filter(col("w") > 0.5).select("tok").first().getString(0)
    val neg = w.filter(col("w") < -0.5).select("tok").first().getString(0)
    val docs = Seq(
      1L -> Seq.fill(30)(pos).mkString(" "),
      2L -> Seq.fill(30)(neg).mkString(" "),
      3L -> (Seq.fill(15)(pos) ++ Seq.fill(15)(neg)).mkString(" "))
      .toDF("doc_id", "text")
    val out = GraftOps.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 0.6 && out(2L) < 0.4)
    assert(out(1L) > out(3L) && out(3L) > out(2L))
  }
}
