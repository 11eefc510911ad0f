package graft

import graft.queries.TextOps

/** q_sample_stratified's balance property — the part its oracle can't
  * express: the broadcast-rate rule must adapt each stratum's keep
  * rate so every language lands near the 20-doc target even though
  * stratum sizes differ by 3× on the fixture.
  */
class SamplingSpec extends SparkSpec {

  test("every stratum is pulled toward the 20-doc target, independent of its size") {
    val rows = TextOps.qSampleStratified(spark, sf).collect()
    assert(rows.length >= 4, "expected one row per language")
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= total)
      // binomial(total, 20/total) stays within [6, 40] with huge margin
      assert(kept >= 6 && kept <= 40,
        s"${r.getAs[String]("lang")}: kept $kept of $total, target 20")
    }
    val sizes = rows.map(_.getAs[Long]("n_total"))
    assert(sizes.max > sizes.min * 2,
      "fixture strata should be imbalanced for this test to mean anything")
  }
}
