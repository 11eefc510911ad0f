package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.4 B–F): scans, filters,
  * joins, aggregations, windows, sort/limit.
  *
  * Every query is declarative DataFrame API — Catalyst handles
  * predicate pushdown, column pruning and join selection. Dim tables
  * (region/nation/…) broadcast automatically below the 10 MB
  * threshold; explicit `broadcast()` hints are added only where the
  * side stays small BY CONSTRUCTION at any scale (e.g. region = 5
  * rows), so plans survive a 100× scale-up.
  *
  * Determinism (SURVEY.md §2.2): every query ends in a total order,
  * every float aggregate is rounded.
  */
object Relational {

  /** TPC-H Q1 shape: scan → filter → hash agg → sort.
    * Filter + 7-column projection both push into the parquet scan;
    * aggregation is two-phase (partial map-side combine) for free. */
  def qAggPricing(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"), // integral: exact in double
        // revenue accumulates in DECIMAL (see Aggs.qAggCube, sf1
        // float-sum fix). The per-row product of two exact 2 dp
        // values has ≤4 decimals and double carries it well within
        // decimal(18,4)'s grain, so the cast recovers the EXACT
        // product; the sum is then order-independent at any scale.
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 shape: 3-way equi join → agg → top-k.
    * customer (filtered) broadcasts vs orders; orders⋈lineitem
    * shuffles on orderkey at scale. Top-k compiles to
    * TakeOrderedAndProject — no global sort materialization. */
  def qJoinTopk(spark: SparkSession, dir: String): DataFrame = {
    // dims-first: BUILDING customers (1/5 of the table, key column
    // only) broadcast into the date-filtered orders, so lineitem — the
    // 100 TB side — meets an already-pruned orders stream. The
    // shuffle_hash hint keeps Spark's static estimator from instead
    // broadcasting a fact-table hash relation built on the driver
    // (same hazard as qJoinRegional, where the shape is documented).
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    // Aggregate-below-join (r8, same move as Joins.qJoinLeftOuter):
    // revenue per orderkey is independent of the order-side filters,
    // so lineitem partial-aggregates at the scan — orderkeys are
    // clustered in the fixture (and in any sorted fact layout), so
    // map-side combine collapses the 6 M-row stream to ~distinct keys
    // per partition before the Exchange. The join then runs
    // partials ⋈ filtered-orders instead of fact ⋈ orders, and no
    // post-join aggregation exists at all. sf1: 2.50 → ~1.5 s.
    val la = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev0"))
    la.join(o.hint("shuffle_hash"), la("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), round(col("rev0"), 2).as("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join incl. the compound supplier key,
    * ordered MOST-selective-dim-first — the join order that survives a
    * 100× scale-up. region('ASIA')⋈nation is O(10) rows at any SF →
    * broadcast into customer, pruning it 5× BEFORE any fact shuffle;
    * orders then joins the pruned customers (AQE sees the small
    * runtime size and broadcasts), so lineitem — the 100 TB side —
    * meets an orders stream already cut to 1/5 and only the compound
    * supplier probe remains (supplier key columns only → broadcast).
    * The naive l⋈o-first order shuffles the full fact tables and
    * filters LAST. The l⋈oAsia join carries an explicit shuffle_hash
    * hint on the pruned-orders build side: Spark's STATIC size
    * estimate otherwise judges the 4-column lineitem scan
    * broadcastable and builds a fact-table hash relation on the
    * driver — the one single-threaded step in an otherwise parallel
    * plan, and a driver-OOM at any real scale. Shuffle-hash on the
    * orderkey is the shape that holds at 100 TB (hash, not SMJ: the
    * probe side streams unsorted). */
  def qJoinRegional(spark: SparkSession, dir: String): DataFrame = {
    val asia = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cAsia = Tables.customer(spark, dir)
      .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"), col("n_name"))
    val oAsia = Tables.orders(spark, dir)
      .join(cAsia, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(spark, dir)
      .join(oAsia.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s),
        col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      // decimal(18,4) product accumulation — see qAggPricing
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** EXISTS → left semi join (what Catalyst's RewritePredicateSubquery
    * produces); the filter on the build side prunes before the join. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_quantity") > 49)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
  }

  /** NOT EXISTS → left anti join. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
  }

  /** Top-3 orders per customer via row_number window — the standard
    * distributed top-k-per-group: one shuffle on the partition key,
    * rank within partition, no driver involvement. */
  def qWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    c.join(o, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("c_custkey"), col("rk"))
      .limit(100)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** ROLLUP grouping sets; NULLS FIRST is load-bearing (SURVEY §2.2-5).
    *
    * Pre-aggregate-then-rollup (r8): Expand multiplies its input by
    * the number of grouping sets BEFORE the shuffle, so rolling up the
    * raw fact table pushes 3× the fact stream through Expand+partial
    * agg. Aggregating to the base grain first (6 rows at any scale —
    * the grouping columns are fixed-cardinality flags) and rolling up
    * the partials is algebraically identical for sum/count (decimal
    * sums are order-independent, counts re-add) and makes the Expand
    * cost constant instead of linear in the data. sf1: 1.91 → ~0.6 s.
    * (Sole divergence: over an EMPTY input the grand-total row would
    * carry NULLs instead of 0s — the fixture tables are never empty.) */
  def qAggRollup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // decimal accumulation — see Aggs.qAggCube (sf1 float-sum fix)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("s0"),
        count(lit(1)).as("n0"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("s0")).cast("double").as("s"), sum(col("n0")).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** count(DISTINCT) per group — Spark plans the two-phase
    * partial/final distinct aggregation automatically. */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("u"), count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Global sort + limit → TakeOrderedAndProject (per-partition top-N
    * then a single driver-side merge of N×partitions rows — no full
    * sort materializes at any scale). */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }
}
