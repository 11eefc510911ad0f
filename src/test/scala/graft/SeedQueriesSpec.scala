package graft

import org.apache.spark.sql.functions._

/** Sanity + invariant tests for the 14 seed queries on sf0.001.
  * Exact value equality vs DuckDB is covered by the oracle harness
  * (tools/oracle_check.py, run on sf0.01); these specs pin structure
  * and relational invariants that hold at any scale factor.
  */
class SeedQueriesSpec extends SparkSpec {

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every declared query has matching oracle SQL or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("semi + anti partition the left table (orders vs lineitem key)") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    val semi = o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi").count()
    val anti = o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti").count()
    assert(semi + anti === o.count())
  }

  test("window top-3 never exceeds 3 rows per customer") {
    val df = queries.Relational.qWindowTopk(spark, sf)
    val maxPerCust = df.groupBy("c_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxPerCust <= 3)
  }

  test("rollup has the grand-total row (both keys null)") {
    val df = queries.Relational.qAggRollup(spark, sf)
    assert(df.filter(col("l_returnflag").isNull && col("l_linestatus").isNull).count() === 1)
  }

  test("events ts converts ns→µs exactly (no events row lost, type is timestamp)") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType.typeName === "timestamp")
    assert(e.count() > 0)
    assert(e.filter(col("ts").isNull).count() === 0)
  }

  test("cosine self-similarity excluded and bounded") {
    val df = queries.LlmOps.qCosineTopk(spark, sf)
    assert(df.filter(col("vec_id") === col("neighbor")).count() === 0)
    // L2-normalized vectors: cosine in [-1, 1] (small rounding slack)
    val bad = df.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count()
    assert(bad === 0)
  }
}
