package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** scrubSharedSpans (ExactSubstr removal) semantics the oracle can't
  * isolate: in-place cut at unaligned offsets, pass-through of
  * span-free and sub-width docs, the full-coverage empty rewrite, and
  * the token-conservation identity vs its own detection step. */
class ScrubSubstringSpec extends SparkSpec {

  import spark.implicits._

  private def toks(p: String, n: Int): String =
    (1 to n).map(i => s"$p$i").mkString(" ")

  private def run(rows: Seq[(Long, String)], width: Int = 20,
                  minDocs: Int = 2): Map[Long, (String, Int, Int)] =
    GraftOps.scrubSharedSpans(
        rows.toDF("doc_id", "text"), "doc_id", "text", width, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap

  test("exact-dup pair rewrites to empty; bystander untouched") {
    val a = toks("a", 30)
    val c = toks("c", 25)
    val out = run(Seq(1L -> a, 2L -> a, 3L -> c))
    assert(out(1L) == (("", 30, 30)) && out(2L) == (("", 30, 30)))
    assert(out(3L) == ((c, 25, 0)))
  }

  test("unaligned embedded copy cut at its offset, prefix kept") {
    val a = toks("a", 30)
    val b = toks("y", 7) + " " + a // copy starts at token 8
    val out = run(Seq(1L -> a, 2L -> b))
    assert(out(2L) == ((toks("y", 7), 37, 30)))
  }

  test("sub-width docs pass through even when they repeat verbatim") {
    val s = toks("a", 19)
    val out = run(Seq(1L -> s, 2L -> s))
    assert(out(1L) == ((s, 19, 0)) && out(2L) == ((s, 19, 0)))
  }

  test("disjoint spans cut independently, gap survives") {
    val d1 = toks("a", 20)
    val d3 = toks("c", 20)
    val gap = toks("g", 25)
    val d2 = d1 + " " + gap + " " + d3
    val out = run(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    assert(out(2L) == ((gap, 65, 40)))
  }

  test("conservation: n_tokens - n_removed = tokens kept; spans agree with detection") {
    val df = Tables.documents(spark, "/root/testdata/sf0.01")
    val scrub = GraftOps.scrubSharedSpans(df, "doc_id", "text")
    val bad = scrub.filter(
      size(split(col("clean_text"), " ")) =!=
        (col("n_tokens") - col("n_removed")) &&
      // split("") yields [""] (size 1), not [] — exempt the empty rewrite
      length(col("clean_text")) > 0)
    assert(bad.count() == 0)
    // removal mass equals the detection key's span mass, doc for doc
    val spans = GraftOps.sharedSpans(df, "doc_id", "text")
      .groupBy("doc_id").agg(sum("span_toks").as("span_mass"))
    val drift = scrub.join(spans, Seq("doc_id"))
      .filter(col("n_removed") =!= col("span_mass"))
    assert(drift.count() == 0)
    // and docs without spans removed nothing
    val untouched = scrub.join(spans, Seq("doc_id"), "left_anti")
    assert(untouched.filter(col("n_removed") =!= 0).count() == 0)
  }
}
