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
    * count(*) is the semantics under test. */
  def qJoinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(
        count(o("o_orderkey")).as("n_orders"),
        round(coalesce(sum(o("o_totalprice")), lit(0.0)), 2).as("spend"))
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
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))
      .orderBy(col("lo"))
  }

  /** As-of join: for each event, the latest order of that user with
    * o_orderdate <= ts (trade←quote pattern). Formulated as range join
    * + row_number pick-first; blowup bounded by orders-per-user.
    * At 100 TB scale the shuffle-free path is a union of both tables
    * sorted by (user, time) with last_value carry-forward — same
    * semantics, one shuffle; kept as the window form here because the
    * oracle must express it identically. */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("event_id"))
      .limit(200)
  }

  /** Big-big join forced to sort-merge via the MERGE hint — the shape
    * a lineitem⋈orders join takes at 100 TB where neither side
    * broadcasts. Same answer as the hash join by definition. */
  def qJoinSmj(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).hint("merge")
    val o = Tables.orders(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))
      .orderBy(col("o_orderstatus"))
  }
}
