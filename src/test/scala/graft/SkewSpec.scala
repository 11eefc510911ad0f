package graft

import org.apache.spark.sql.functions._

/** Skew-handling and approximation techniques for the 100 TB story
  * (SURVEY.md §7.5): two-stage salted aggregation equals the direct
  * aggregation, AQE is live, and percentile_approx lands within its
  * accuracy bound of the exact percentile.
  */
class SkewSpec extends SparkSpec {

  test("two-stage salted aggregation == direct aggregation on a skewed key") {
    // l_returnflag: 3 values over 6k rows — maximal key skew. The
    // salted plan first aggregates (key, salt) — spreading each hot
    // key over 8 reducers — then merges partials per key.
    val l = Tables.lineitem(spark, sf)
    val direct = l.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
    val salted = l
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
    val d = direct.withColumn("s", round(col("s"), 2))
    val s = salted.withColumn("s", round(col("s"), 2))
    assert(d.exceptAll(s).isEmpty && s.exceptAll(d).isEmpty)
  }

  test("AQE is enabled in the engine session config") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }

  test("percentile_approx within its rank-error bound of exact percentile") {
    val l = Tables.lineitem(spark, sf)
    val r = l.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // accuracy=1000 → rank error ≤ n/1000; translate to a generous
    // value-space sanity band via the observed spread
    val q4049 = l.agg(expr("percentile(l_extendedprice, 0.49)")).head().getDouble(0)
    val q4051 = l.agg(expr("percentile(l_extendedprice, 0.51)")).head().getDouble(0)
    assert(approx >= q4049 && approx <= q4051,
      s"approx=$approx outside [$q4049, $q4051] around exact=$exact")
  }
}
