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

  test("gopher rules: each rule individually gates a planted violator") {
    import spark.implicits._
    val good = (Seq.fill(28)("the") ++ Seq.fill(12)("data")).mkString(" ")
    val docs = Seq(
      1L -> good,                                        // passes all
      2L -> Seq.fill(10)("the data").mkString(" "),      // too few tokens? 20 < 30
      3L -> (Seq.fill(28)("the") ++ Seq.fill(12)("a")).mkString(" "), // csum < 3n
      4L -> (Seq.fill(28)("the") ++                      // 84 + 12*34 =
        Seq.fill(12)("supercalifragilisticexpialidocious"))
        .mkString(" "),                                  // 492 > 10n = 400
      5L -> (Seq.fill(2)("the") ++ Seq.fill(18)("12345") ++
        Seq.fill(20)("data")).mkString(" "),             // alpha < 4/5
      6L -> (Seq.fill(40)("data")).mkString(" "))        // no stop words
      .toDF("doc_id", "text").createOrReplaceTempView("gopher_probe")
    val out = queries.TextOps.qQualityGopher(spark, sf) // fixture smoke
    assert(out.filter(col("keep")).count() > 0 &&
      out.filter(!col("keep")).count() > 0,
      "rules must discriminate on the fixture")
    // planted probes through the same rule expressions
    val probe = spark.table("gopher_probe")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(length(col("tok"))).as("csum"),
        sum(when(col("tok").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
        sum(when(col("tok").isin("the", "a", "of", "and", "to", "in"), 1L)
          .otherwise(0L)).as("n_stop"))
      .withColumn("keep",
        col("n_tok") >= 30 && col("n_tok") <= 100000 &&
        col("csum") >= col("n_tok") * 3 && col("csum") <= col("n_tok") * 10 &&
        col("n_alpha") * 5 >= col("n_tok") * 4 && col("n_stop") >= 2)
      .select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probe(1L), "the control doc must pass")
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(!probe(id), s"planted violator $id must be dropped"))
  }

  test("graft_hashed_swi ≡ the SQL lambda spelling AND the batch join sum (both eval paths)") {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    // per-token integer weight, spelled as the interpreted SQL lambda
    val wi = "cast(conv(substring(md5(cast(" +
      "(cast(conv(substring(md5(t),1,8),16,10) as bigint) % 1024)" +
      " as string)),1,8),16,10) as bigint) % 2001 - 1000"
    val rows = docs.select(
      col("doc_id"), col("text"),
      expr("graft_hashed_swi(text)").as("fast"),
      expr(s"aggregate(transform(split(text, ' '), t -> $wi), " +
        "cast(0 as bigint), (acc, x) -> acc + x)").as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"doc ${r.getLong(0)}: expression ${r.getLong(2)} != lambda ${r.getLong(3)}"))
    // interpreted path must agree with the codegen'd one
    rows.take(200).foreach { r =>
      val interp = graft.catalyst.HashedLinearSwi.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)), 1024)
      assert(interp == r.getLong(2), s"doc ${r.getLong(0)}: interpreted != codegen")
    }
  }
}
