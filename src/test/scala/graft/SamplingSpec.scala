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

  test("temperature sampling sits between proportional and uniform; API matches declared key") {
    val rows = TextOps.qSampleTemperature(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_total"), r.getAs[Long]("n_kept")))
    val totalDocs = rows.map(_._2).sum.toDouble
    val totalKept = rows.map(_._3).sum.toDouble
    val (_, maxTotal, maxKept) = rows.maxBy(_._2)
    // the head stratum's share of the sample must be damped below its
    // share of the corpus (that is the point of τ < 1)...
    assert(maxKept / totalKept < maxTotal / totalDocs + 0.02,
      s"head stratum not damped: ${maxKept / totalKept} vs ${maxTotal / totalDocs}")
    // ...but still above the uniform share (τ > 0)
    assert(maxKept / totalKept > 1.0 / rows.length - 0.05)
    // API twin agrees with the declared summary
    val api = graft.api.GraftOps.temperatureSample(
        Tables.documents(spark, sf), "lang", "text", 100)
      .groupBy(org.apache.spark.sql.functions.col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rows.foreach { case (lang, _, kept) => assert(api.getOrElse(lang, 0L) === kept, lang) }
  }
}
