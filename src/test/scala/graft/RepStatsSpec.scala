package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_rep_stats (catalyst/RepStats): the one-pass codegen'd
  * repetition statistics must be bit-equal to the interpreted SQL
  * spelling it replaced (the pre-r15 repetitionSignals body), on the
  * fixture corpus AND the adversarial token shapes the fixture lacks.
  */
class RepStatsSpec extends SparkSpec {

  /** The pre-r15 interpreted spelling, kept verbatim as the test
    * oracle for the codegen'd expression. */
  private def sqlSpelling(d: DataFrame): DataFrame =
    d.withColumn("t", split(col("text"), " "))
      .withColumn("b",
        expr("filter(sequence(0, size(t)-1), i -> i = 0 OR t[i] != t[i-1])"))
      .select(
        col("doc_id"),
        size(col("t")).as("n_tok"),
        expr("array_max(transform(array_distinct(t), u -> size(filter(t, w -> w = u))))")
          .as("top1"),
        expr("CASE WHEN size(t) >= 2 THEN size(array_distinct(transform(" +
          "sequence(0, size(t)-2), i -> concat_ws(' ', t[i], t[i+1])))) ELSE 0 END")
          .as("bi_dis"),
        expr("CASE WHEN size(t) >= 3 THEN size(array_distinct(transform(" +
          "sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) ELSE 0 END")
          .as("tri_dis"),
        expr("array_max(transform(sequence(0, size(b)-1), " +
          "j -> (CASE WHEN j+1 < size(b) THEN b[j+1] ELSE size(t) END) - b[j]))")
          .as("max_run"))

  private def codegen(d: DataFrame): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    d.withColumn("__rs", expr("graft_rep_stats(text)"))
      .select(col("doc_id"),
        col("__rs.n_tok").as("n_tok"), col("__rs.top1").as("top1"),
        col("__rs.bi_dis").as("bi_dis"), col("__rs.tri_dis").as("tri_dis"),
        col("__rs.max_run").as("max_run"))
  }

  private def assertEq(d: DataFrame): Unit = {
    val a = codegen(d)
    val b = sqlSpelling(d)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "codegen rep_stats != interpreted SQL spelling")
  }

  test("≡ the interpreted SQL spelling on the fixture corpus") {
    assertEq(Tables.documents(spark, sf).select(col("doc_id"), col("text")))
  }

  test("≡ on adversarial shapes: multi-space, dup-heavy, short, runs") {
    import spark.implicits._
    val adv = Seq(
      (1L, ""),                       // split("") = [""] → n_tok 1
      (2L, "a"),
      (3L, "a a"),
      (4L, "a  a"),                   // empty middle token
      (5L, "a a a a a a"),            // one long run
      (6L, "a b a b a b"),            // bigram dup without runs
      (7L, "  leading and trailing  "),
      (8L, "x y z x y z x y z w"),
      (9L, Seq.fill(50)("spam").mkString(" ")),
      (10L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (11L, "a a b b a a b b"),
      (12L, "one two"),
      (13L, "one two three")
    ).toDF("doc_id", "text")
    assertEq(adv)
  }

  test("interpreted eval path == SQL/codegen path (shared compute)") {
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "x  y"), (3L, "solo"))
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val viaSql = docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_rep_stats(text) AS r").collect()
      .map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    docs.foreach { case (id, s) =>
      val row = graft.catalyst.RepStats.compute(UTF8String.fromString(s))
      assert(viaSql(id) === (0 until 5).map(row.getInt), s"doc $id text '$s'")
    }
  }
}
