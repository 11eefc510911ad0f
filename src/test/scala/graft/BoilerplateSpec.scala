package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** removeBoilerplate semantics the DuckDB oracle can't isolate:
  * exact reassembly of untouched docs, full scrub of exact-dup pairs,
  * aligned-span removal with order-preserving survivors, and the
  * within-doc-repeat exemption (minDocs counts DISTINCT docs). */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], width: Int = 3,
                  minDocs: Int = 2): Map[Long, (String, Long, Long)] =
    GraftOps.removeBoilerplate(
        rows.toDF("doc_id", "text"), "doc_id", "text", width, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("unique docs reassemble to their exact original text") {
    val out = run(Seq(
      1L -> "a b c d e f g",   // 3 chunks: abc / def / g
      2L -> "h i j k"))        // 2 chunks: hij / k
    assert(out(1L) == (("a b c d e f g", 3L, 0L)))
    assert(out(2L) == (("h i j k", 2L, 0L)))
  }

  test("exact-dup pair scrubs to empty on both sides") {
    val out = run(Seq(1L -> "x y z w v u", 2L -> "x y z w v u"))
    assert(out(1L) == (("", 2L, 2L)) && out(2L) == (("", 2L, 2L)))
  }

  test("shared aligned span removed, unique survivors keep order") {
    // shared first chunk (a b c); doc 1 keeps 'p q r s', doc 2 'm n'
    val out = run(Seq(1L -> "a b c p q r s", 2L -> "a b c m n"))
    assert(out(1L) == (("p q r s", 3L, 1L)))
    assert(out(2L) == (("m n", 2L, 1L)))
  }

  test("within-doc repetition alone is not boilerplate (distinct docs)") {
    val out = run(Seq(1L -> "a b c a b c a b c", 2L -> "q r s"))
    assert(out(1L) == (("a b c a b c a b c", 3L, 0L)))
  }

  test("minDocs threshold: a 2-doc passage survives at minDocs=3") {
    val out = run(Seq(1L -> "a b c", 2L -> "a b c", 3L -> "z z z"),
      minDocs = 3)
    assert(out(1L) == (("a b c", 1L, 0L)) && out(2L) == (("a b c", 1L, 0L)))
  }

  test("declared key: removal fires on the fixture; clean docs round-trip") {
    val out = queries.ScrubOps.qScrubBoilerplate(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count())
    // planted exact dups guarantee removals at every SF
    assert(out.filter(col("n_removed") > 0).count() > 0)
    // untouched docs reassemble byte-identically to the source text
    val joined = out.filter(col("n_removed") === 0)
      .join(docs, "doc_id")
      .filter(col("clean_text") =!= col("text"))
    assert(joined.count() == 0)
  }
}
