package graft

import org.apache.spark.sql.functions._
import graft.catalyst.GraftFunctions

/** The fused SimHash expression must be indistinguishable from the
  * relational spelling (explode → md5-prefix hash → 8 bit-vote sums →
  * signature assembly) that the DuckDB oracle mirrors — including the
  * empty-token votes a space run produces and the strictly-positive
  * vote rule for setting a bit. q_dedup_simhash rides this
  * equivalence: its only Exchange is the final signature group-by.
  */
class SimHashSpec extends SparkSpec {

  test("expression signature equals the relational spelling on the fixture corpus, doc by doc") {
    GraftFunctions.ensureRegistered(spark)
    val fused = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("graft_simhash(text)").as("s_expr"))
    val relational = queries.DedupOps.simhashRelational(spark, sf)
      .withColumnRenamed("simhash", "s_rel")
    val joined = fused.join(relational, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("s_expr") =!= col("s_rel")).count() === 0)
  }

  test("adversarial strings: space runs, single token, leading/trailing spaces") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "a  b   c"),          // empty tokens vote
      (2L, "solo"),
      (3L, " leading"),
      (4L, "trailing "),
      (5L, "a a a a a a a a"),   // repeated token dominates every vote
      (6L, "x y z x y z")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("simhash_adv_docs")
    // relational spelling inlined over the adversarial frame
    val hs = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(w),1,8),16,10) as bigint)").as("h"))
    val bitSums = (0 until 8).map(bit =>
      expr(s"sum(CASE WHEN shiftright(h, $bit) % 2 = 1 THEN 1 ELSE -1 END)").as(s"b$bit"))
    val rel = hs.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("s_rel",
        (0 until 8).map(bit =>
          when(col(s"b$bit") > 0, 1 << bit).otherwise(0): org.apache.spark.sql.Column
        ).reduce(_ + _))
      .select(col("doc_id"), col("s_rel"))
    val fused = docs.select(col("doc_id"), expr("graft_simhash(text)").as("s_expr"))
    val joined = fused.join(rel, "doc_id")
    assert(joined.count() === 6)
    assert(joined.filter(col("s_expr") =!= col("s_rel")).count() === 0)
    // interpreted eval path agrees with the codegen'd one
    val lit5 = graft.catalyst.SimHash(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a  b   c")))
    val viaDf = fused.filter(col("doc_id") === 1L).head().getInt(1)
    assert(lit5.eval(null) === viaDf)
  }
}
