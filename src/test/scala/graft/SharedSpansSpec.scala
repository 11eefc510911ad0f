package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** sharedSpans (ExactSubstr) semantics the oracle can't isolate:
  * unaligned discovery, island merging, the sub-width guard, the
  * distinct-docs rule, and the contrast with the aligned boilerplate
  * chunks on the same planted geometry. */
class SharedSpansSpec extends SparkSpec {

  import spark.implicits._

  private def toks(p: String, n: Int): String =
    (1 to n).map(i => s"$p$i").mkString(" ")

  private def run(rows: Seq[(Long, String)], width: Int = 20,
                  minDocs: Int = 2): Map[(Long, Int), (Int, Long)] =
    GraftOps.sharedSpans(
        rows.toDF("doc_id", "text"), "doc_id", "text", width, minDocs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getLong(3))))
      .toMap

  test("exact-dup pair reports one full-doc span each") {
    val a = toks("a", 30)
    val out = run(Seq(1L -> a, 2L -> a))
    assert(out == Map((1L, 1) -> ((30, 11L)), (2L, 1) -> ((30, 11L))))
  }

  test("unaligned embedded copy found at its offset (boilerplate-blind)") {
    val a = toks("a", 30)
    val b = toks("y", 7) + " " + a // copy starts at token 8
    val out = run(Seq(1L -> a, 2L -> b, 3L -> toks("c", 25)))
    assert(out == Map((1L, 1) -> ((30, 11L)), (2L, 8) -> ((30, 11L))))
    // the aligned 10-token chunker misses the shifted copy entirely
    val bp = GraftOps.removeBoilerplate(
        Seq(1L -> a, 2L -> b).toDF("doc_id", "text"), "doc_id", "text")
      .agg(sum("n_removed")).collect()(0).getLong(0)
    assert(bp == 0L)
  }

  test("disjoint shared spans stay separate islands") {
    // doc 2 copies a-tokens 1..20 and c-tokens 1..20 with a gap
    val d1 = toks("a", 20)
    val d3 = toks("c", 20)
    val d2 = d1 + " " + toks("g", 25) + " " + d3
    val out = run(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    assert(out((2L, 1)) == ((20, 1L)) && out((2L, 46)) == ((20, 1L)))
  }

  test("sub-width docs are excluded, not descending-sequence garbage") {
    val out = run(Seq(1L -> toks("a", 19), 2L -> toks("a", 19)))
    assert(out.isEmpty)
  }

  test("within-doc repetition alone is not a shared span (distinct docs)") {
    val a = toks("a", 20)
    val out = run(Seq(1L -> (a + " " + a), 2L -> toks("z", 25)))
    assert(out.isEmpty)
  }

  test("declared key: planted embedded dups surface at sf fixtures") {
    val out = queries.DedupOps.qDedupSubstring(spark, "/root/testdata/sf0.01")
    assert(out.count() > 0)
    // every span is at least width tokens and window-covered
    assert(out.filter(col("span_toks") < 20 || col("n_windows") < 1)
      .count() == 0)
  }
}
