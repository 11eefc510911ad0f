package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** q_text_repetition's signals on synthetic docs the fixture lacks:
  * pathological repetition, single tokens, and sub-n-gram docs — the
  * cases the DuckDB cross-check never reaches because the fixture is
  * uniformly mid-length random text.
  */
class RepetitionSpec extends SparkSpec {

  private def signalsOf(texts: (Long, String)*): Map[Long, org.apache.spark.sql.Row] = {
    import spark.implicits._
    TextOps.repetitionSignals(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("pathological repetition maxes every signal") {
    val r = signalsOf((1L, "spam spam spam spam spam spam"))(1L)
    assert(r.getAs[Int]("n_tok") === 6)
    assert(r.getAs[Double]("top1_frac") === 1.0)
    assert(r.getAs[Double]("dup_bi_frac") === 0.8) // 5 bigrams, 1 distinct
    assert(r.getAs[Double]("dup_tri_frac") === 0.75) // 4 trigrams, 1 distinct
    assert(r.getAs[Int]("max_run") === 6)
    assert(r.getAs[Boolean]("repetitive"))
  }

  test("distinct tokens yield zero duplicate signals and runs of 1") {
    val r = signalsOf((2L, "a b c d e"))(2L)
    assert(r.getAs[Double]("top1_frac") === 0.2)
    assert(r.getAs[Double]("dup_bi_frac") === 0.0)
    assert(r.getAs[Double]("dup_tri_frac") === 0.0)
    assert(r.getAs[Int]("max_run") === 1)
    assert(!r.getAs[Boolean]("repetitive"))
  }

  test("interior run is found, not just runs at the edges") {
    val r = signalsOf((3L, "a b b b c"))(3L)
    assert(r.getAs[Int]("max_run") === 3)
    assert(r.getAs[Double]("top1_frac") === 0.6)
    assert(r.getAs[Boolean]("repetitive")) // 3*5 > 5
  }

  test("exact-integer ratio rounding == BigDecimal HALF_UP of the rational, exhaustively near boundaries") {
    // the frac columns compute round-half-up(10⁴·k/n) as
    // floor((2·10⁴·k + n)/(2n)) — prove that integer form equals the
    // definitional BigDecimal division for every k ≤ n over a dense
    // sweep including all boundary-prone denominators (n=800 family)
    for (n <- (1 to 128) ++ Seq(200, 300, 500, 777, 800, 801, 1000, 9999); k <- 0 to math.min(n, 512)) {
      val intForm = (20000L * k + n) / (2L * n)
      val bdForm = new java.math.BigDecimal(k)
        .divide(new java.math.BigDecimal(n), 4, java.math.RoundingMode.HALF_UP)
        .movePointRight(4).longValueExact()
      assert(intForm === bdForm, s"k=$k n=$n")
    }
  }

  test("sub-n-gram docs are guarded: no spurious grams, fractions are 0") {
    val m = signalsOf((4L, "one"), (5L, "one two"))
    val one = m(4L)
    assert(one.getAs[Int]("n_tok") === 1)
    assert(one.getAs[Double]("dup_bi_frac") === 0.0)
    assert(one.getAs[Double]("dup_tri_frac") === 0.0)
    assert(one.getAs[Int]("max_run") === 1)
    assert(one.getAs[Boolean]("repetitive")) // top1_frac = 1 by definition
    val two = m(5L)
    assert(two.getAs[Double]("dup_bi_frac") === 0.0)
    assert(two.getAs[Double]("dup_tri_frac") === 0.0)
    assert(two.getAs[Int]("max_run") === 1)
  }
}
