package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** DSIR importance-resampling properties the oracle can't see: the
  * scores separate target-like from non-target documents, the dim-row
  * model broadcasts (the corpus never shuffles on bucket), the global
  * selection is a TakeOrderedAndProject (per-partition heads, no
  * global sort), and the bigint accumulator is exactly the dot product
  * of the doc's bucket counts with the integer log-ratio grid. */
class SampleImportanceSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  private lazy val scored = GraftOps.importanceScores(
    docs, "doc_id", "text", col("lang") === "en").cache()

  test("scores separate the target: mean logw(en) > mean logw(non-en)") {
    val j = scored.join(docs.select("doc_id", "lang"), "doc_id")
    val Array(en, rest) = j
      .groupBy(col("lang") === "en")
      .agg(avg("logw").as("m"))
      .orderBy(col("lang") === "en")
      .collect()
      .map(_.getDouble(1)) match {
        case Array(nonEn, isEn) => Array(isEn, nonEn)
      }
    assert(en > rest,
      s"en mean logw $en should exceed non-en mean $rest")
  }

  test("selection enriches the target class beyond its corpus share") {
    val picked = GraftOps.importanceResample(
        docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val enPicked = picked.filter($"lang" === "en").count().toDouble /
      picked.count()
    val enCorpus = docs.filter($"lang" === "en").count().toDouble /
      docs.count()
    assert(enPicked > enCorpus,
      s"selected en share $enPicked should beat corpus share $enCorpus")
  }

  test("the log-ratio model broadcasts — no corpus shuffle on bucket") {
    // dim=512 so the cache manager can't substitute the cached
    // `scored` plan (an identical logical plan would InMemoryTableScan)
    val plan = GraftOps.importanceScores(
        docs, "doc_id", "text", col("lang") === "en", dim = 512)
      .queryExecution.executedPlan
    val bc = collectWithSubqueries(plan) {
      case b: BroadcastExchangeExec => b
    }
    assert(bc.nonEmpty, "model join must broadcast, got:\n" + plan)
  }

  test("top-k is a TakeOrderedAndProject — no global sort") {
    val plan = GraftOps.importanceResample(
        docs, "doc_id", "text", col("lang") === "en")
      .queryExecution.executedPlan
    val topk = collectWithSubqueries(plan) {
      case t: TakeOrderedAndProjectExec => t
    }
    assert(topk.nonEmpty, "selection must be TakeOrdered, got:\n" + plan)
  }

  test("swi is the exact integer dot product of counts and the grid") {
    // rebuild the model independently and sum one doc on the driver
    val row = scored.orderBy("doc_id").first()
    val docId = row.getLong(0)
    val toks = docs.select($"doc_id", ($"lang" === "en").as("t"),
      explode(split($"text", " ")).as("tok"))
      .select($"doc_id", $"t", expr(
        "cast(conv(substring(md5(tok),1,8),16,10) as bigint) % 1024")
        .as("bucket"))
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("cq"), sum(when($"t", 1L).otherwise(0L)).as("cp"))
    val (tq, tp) = counts.agg(sum("cq"), sum("cp")).as[(Long, Long)].first()
    val lri = spark.range(1024).select($"id".as("bucket"))
      .join(counts, Seq("bucket"), "left").na.fill(0L, Seq("cq", "cp"))
      .select($"bucket", expr(
        s"cast(round(1000000.0 * ln((cast(cp + 1 as double) * cast(${tq} + 1024 as double)) / " +
          s"(cast(cq + 1 as double) * cast(${tp} + 1024 as double)))) as bigint)")
        .as("lri"))
      .as[(Long, Long)].collect().toMap
    val want = toks.filter($"doc_id" === docId)
      .select("bucket").as[Long].collect()
      .map(lri).sum
    assert(row.getLong(1) == want,
      s"doc $docId swi ${row.getLong(1)} != recomputed $want")
  }
}
