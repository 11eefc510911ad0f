package graft

import org.apache.spark.sql.functions._

/** Custom TopKPerGroup plan node: physical shape (partial → shuffle →
  * final) and equality with the window-idiom formulation. */
class TopKSpec extends SparkSpec {

  test("physical plan runs partial top-k before the shuffle and final after") {
    val df = queries.VectorOps.qTopkCustom(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    // the exchange must sit between final (above) and partial (below)
    val idxPartial = plan.indexOf("TopKPartial")
    val idxFinal = plan.indexOf("TopKFinal")
    assert(idxFinal < idxPartial, plan)
    val between = plan.substring(idxFinal, idxPartial)
    assert(between.contains("Exchange"), s"expected Exchange between final and partial:\n$plan")
  }

  test("custom top-k == window row_number idiom, row for row") {
    val custom = queries.VectorOps.qTopkCustom(spark, sf)
    val window = queries.Relational.qWindowTopk(spark, sf)
    assert(custom.exceptAll(window).isEmpty && window.exceptAll(custom).isEmpty)
    assert(custom.count() === window.count())
  }

  test("partial stage bounds shuffle payload: k rows per group per partition") {
    // 1 group, k=2, 4 input partitions of 100 rows each → partial emits
    // ≤ 2×4 rows; final emits exactly 2
    import spark.implicits._
    val data = spark.range(0, 400).repartition(4)
      .select(lit("g").as("grp"), col("id"))
    val top = graft.plans.TopKPerGroup(data, Seq("grp"),
      Seq(graft.plans.TopKPerGroup.Ord("id", desc = true)), 2)
    val rows = top.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(398L, 399L))
  }
}
