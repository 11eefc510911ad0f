package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join variants beyond the seed equi joins (SURVEY.md §2.4-C):
  * outer, non-equi (banding), as-of, and forced sort-merge.
  *
  * Scale notes: outer joins shuffle on their keys like inner joins;
  * the banding join broadcasts the tiny band table (nested-loop against
  * a 5-row side is O(n·5), constant per row at any scale); the as-of
  * join is the window formulation — at 100 TB the range-join blowup is
  * bounded by orders-per-user, and the scale path is a bucketed
  * union-sort (see Scaladoc on qJoinAsof).
  */
object Joins {

  /** LEFT OUTER customer→orders: customers with zero orders survive
    * with n_orders=0. count(col) skips nulls — that asymmetry vs
    * count(*) is the semantics under test.
    *
    * Aggregate-below-join (r8): orders pre-aggregate per custkey
    * BEFORE the outer join, so the map-side partial combine collapses
    * the fact stream at the scan and only ~|customers| partial rows
    * ever cross an Exchange. The join-then-group spelling shuffles
    * every joined fact row into the group-by; Catalyst has no
    * aggregate-pushdown rule, so the rewrite is done here. The value
    * multiset per customer is identical (c_custkey is the customer
    * PK), so results match the join-then-group oracle exactly. */
  def qJoinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val oa = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(col("o_orderkey")).as("n0"), sum(col("o_totalprice")).as("s0"))
    c.join(oa, c("c_custkey") === oa("o_custkey"), "left")
      .select(
        c("c_custkey"), c("c_name"),
        coalesce(col("n0"), lit(0L)).as("n_orders"),
        round(coalesce(col("s0"), lit(0.0)), 2).as("spend"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(100)
  }

  /** FULL OUTER of per-nation customer counts vs supplier counts —
    * both null sides coalesced. Pre-aggregating each side BEFORE the
    * join keeps the shuffled data minimal (25 rows each, any scale). */
  def qJoinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("nk_c") === col("nk_s"), "full")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** RIGHT OUTER lineitem→part: parts never shipped survive with
    * n_li=0; ascending count surfaces them first.
    *
    * Aggregate-below-join (r8, same rationale as qJoinLeftOuter): the
    * 6 M-row lineitem stream partial-aggregates per partkey at the
    * scan, so the RIGHT join sees ~|parts| count rows instead of the
    * full fact table — the only Exchanges left are dimension-sized.
    * sf1: 2.63 → ~1.1 s; at 100 TB this is the difference between
    * shuffling the fact table and shuffling a count-per-key table. */
  def qJoinRightOuter(spark: SparkSession, dir: String): DataFrame = {
    val la = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(col("l_orderkey")).as("n0"))
    val p = Tables.part(spark, dir)
    la.join(p, la("l_partkey") === p("p_partkey"), "right")
      .select(
        p("p_partkey"), p("p_name"),
        coalesce(col("n0"), lit(0L)).as("n_li"))
      .orderBy(col("n_li"), col("p_partkey"))
      .limit(100)
  }

  /** Non-equi (theta) join: histogram banding of l_quantity against an
    * in-memory band table. Plans as BroadcastNestedLoopJoin with the
    * 5-row side broadcast — the only sane physical shape for a pure
    * range predicate. */
  def qJoinRangeBand(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(5).select(
      (lit(1.0) + col("id") * 10).as("lo"),
      (lit(11.0) + col("id") * 10).as("hi"))
    val l = Tables.lineitem(spark, dir)
    l.join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("lo"), col("hi"))
      // decimal accumulation — see Aggs.qAggCube (sf1 float-sum fix)
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy(col("lo"))
  }

  /** As-of join: for each event, the latest order of that user with
    * o_orderdate <= ts (trade←quote pattern).
    *
    * Implemented as the union-sort carry-forward — the 100 TB shape:
    * both tables merge into one stream keyed by user, one shuffle, one
    * sorted pass with `last(..., ignoreNulls)` carrying the most
    * recent order forward onto each event row. The naive range join +
    * row_number expands to events × orders-per-user intermediate rows
    * (~10× here, unbounded for hot users); this form never
    * materializes a pair. Tie discipline: at equal timestamps orders
    * sort before events (is_e), multiple same-date orders resolve to
    * the max o_orderkey — matching the (o_orderdate DESC, o_orderkey
    * DESC) pick of the oracle's window formulation. */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("is_e"),
      lit(null).cast("long").as("ok"), lit(null).cast("timestamp_ntz").as("od"),
      col("event_id"))
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("u"), col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("is_e"), col("o_orderkey").as("ok"),
      col("o_orderdate").as("od"), lit(null).cast("long").as("event_id"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("is_e"), col("ok").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionAll(e)
      .withColumn("o_orderkey", last(col("ok"), ignoreNulls = true).over(w))
      .withColumn("o_orderdate", last(col("od"), ignoreNulls = true).over(w))
      .filter(col("is_e") === 1 && col("o_orderkey").isNotNull)
      .select(col("event_id"), col("u").as("user_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
      .limit(200)
  }

  /** Correlated scalar subquery: orders above their customer's own
    * average — Catalyst decorrelates (RewriteCorrelatedScalarSubquery)
    * into an aggregate + join; no per-row re-execution. */
  def qSubqueryScalar(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price
        |FROM orders_v o
        |WHERE o.o_totalprice > 1.8 * (SELECT avg(o2.o_totalprice)
        |                              FROM orders_v o2
        |                              WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  /** IN-subquery on a non-join column (RewritePredicateSubquery →
    * left semi join on the subquery output). */
  def qSubqueryIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM orders_v
        |WHERE o_custkey IN (SELECT c_custkey FROM customer_v WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Null-safe equality join (<=>): match per-nation customer/supplier
    * count buckets including the NULL bucket. */
  def qJoinNullsafe(spark: SparkSession, dir: String): DataFrame = {
    // bucket = acctbal band, NULL for negative balances — exercises
    // <=> matching NULL with NULL (plain = would drop those rows)
    val c = Tables.customer(spark, dir)
      .select(when(col("c_acctbal") >= 0, floor(col("c_acctbal") / 5000)).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .select(when(col("s_acctbal") >= 0, floor(col("s_acctbal") / 5000)).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_supp"))
    c.join(s, c("band") <=> s("band"))
      .select(c("band").as("band"), col("n_cust"), col("n_supp"))
      .orderBy(col("band").asc_nulls_first)
  }

  /** Big-big join forced to sort-merge via the MERGE hint — the shape
    * a lineitem⋈orders join takes at 100 TB where neither side
    * broadcasts. Same answer as the hash join by definition. */
  def qJoinSmj(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).hint("merge")
    val o = Tables.orders(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      // decimal accumulation — see Aggs.qAggCube (sf1 float-sum fix)
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy(col("o_orderstatus"))
  }
}
