package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Skew-safety proof for the perplexity word join (VERDICT r7 #4).
  *
  * [[GraftOps.unigramCrossEntropy]] joins the exploded token stream to
  * the vocabulary count table on the raw word key — the one join in
  * the engine whose key is natural language, i.e. maximally Zipfian
  * ("the" is 5-7% of English token mass). The fix is a head/tail
  * split: the top-headK words are broadcast and joined map-side; only
  * tail words ever reach the shuffled join. This spec proves
  *
  *  1. split ≡ a naive single shuffled join, bit-for-bit at the 4 dp
  *     contract, on the REAL fixture documents;
  *  2. the same equivalence on a synthesized corpus with a planted
  *     20%-mass token, across headK boundary values {0, 1, 16} —
  *     all-tail, hot-token-only-head, and everything-head;
  *  3. the plan SHAPE: the tail join's probe side is filtered to
  *     head-misses (IsNull on the broadcast-joined count), so the hot
  *     key is structurally excluded from the shuffle — not just
  *     empirically absent.
  */
class PerplexitySkewSpec extends SparkSpec {

  /** The pre-r8 formulation: one shuffled token⋈counts join, no
    * head/tail split — the semantics baseline. */
  private def naive(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("tot"))
    toks.join(counts, "w")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        round(-avg(log(col("c").cast("double") / col("tot").cast("double"))), 4)
          .as("xent"))
  }

  /** 200 docs, 25 tokens each: 5× the planted hot token "the" (20% of
    * all corpus mass — 3-4× worse than real English) + 20 words drawn
    * deterministically from a 40-word tail vocabulary. Built with
    * distributed column expressions, no driver-side text assembly. */
  private lazy val zipf: DataFrame = {
    val base = spark.range(200).toDF("doc_id")
    base.select(
      col("doc_id"),
      concat_ws(" ",
        (Seq.fill(5)(lit("the")) ++
          (0 until 20).map(i =>
            concat(lit("w"), pmod(col("doc_id") * 7 + lit(i * 13), lit(40))))): _*)
        .as("text"))
  }

  private def sameResult(a: DataFrame, b: DataFrame, ctx: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$ctx: head/tail split changed results")

  test("split ≡ naive on the fixture documents") {
    val d = Tables.documents(spark, sf)
    sameResult(GraftOps.unigramCrossEntropy(d, "doc_id", "text"),
      naive(d, "doc_id", "text"), "fixture")
  }

  test("split ≡ naive on a planted 20%-mass token, headK ∈ {0, 1, 16}") {
    val expected = naive(zipf, "doc_id", "text")
    for (k <- Seq(0, 1, 16))
      sameResult(GraftOps.unigramCrossEntropy(zipf, "doc_id", "text", headK = k),
        expected, s"headK=$k")
  }

  test("hot token is the deterministic head; tail probe is filtered to head-misses") {
    // headK=1 on the planted corpus: the head must be exactly "the"
    // (top count 1000 vs ≤ ~120 for any tail word), and the optimized
    // plan must carry the IsNull(head-count) filter that keeps every
    // head token out of the shuffled tail join.
    val q = GraftOps.unigramCrossEntropy(zipf, "doc_id", "text", headK = 1)
    val plan = q.queryExecution.optimizedPlan
    val hasHeadMissFilter = plan.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.exists {
          case _: org.apache.spark.sql.catalyst.expressions.IsNull => true
          case _ => false
        }
      case _ => false
    }
    assert(hasHeadMissFilter,
      "tail join probe lost its head-miss (IsNull) filter — hot keys would shuffle")
    // and the hot token's count is what the broadcast path must carry
    val toks = zipf.select(explode(split(col("text"), " ")).as("w"))
    val top = toks.groupBy("w").count().orderBy(desc("count"), asc("w")).head()
    assert(top.getString(0) === "the" && top.getLong(1) === 1000L,
      s"planted hot token not at head: $top")
  }
}
