package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations + deterministic exact dedup (SURVEY.md §2.4-F).
  *
  * UNION/INTERSECT/EXCEPT (distinct forms) plan as aggregate /
  * left-semi / left-anti under Catalyst; the ALL forms keep
  * multiplicities via a counted expansion. All shuffle once on the
  * full row — at scale, project to the minimal column set first
  * (done here) so the shuffle payload stays narrow.
  */
object SetOps {

  /** UNION ALL of two differently-sourced relations mapped to a common
    * schema (customer ∪ supplier account balances). */
  def qSetUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir).select(
      col("s_name").as("name"), col("s_acctbal").as("acctbal"),
      lit("supplier").as("kind"))
    c.unionAll(s)
      .orderBy(col("acctbal").desc, col("kind"), col("name"))
      .limit(100)
  }

  /** UNION (distinct): nation keys present in either customer or
    * supplier. */
  def qSetUnion(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy(col("nationkey"))
  }

  /** INTERSECT: nations that have BOTH a negative-balance customer and
    * a negative-balance supplier. */
  def qSetIntersect(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).filter(col("c_acctbal") < 3000)
      .select(col("c_nationkey").as("nationkey"))
      .intersect(
        Tables.supplier(spark, dir).filter(col("s_acctbal") < 3000)
          .select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  /** EXCEPT: nations with a negative-balance customer but NO
    * negative-balance supplier. */
  def qSetExcept(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).filter(col("c_acctbal") < 3000)
      .select(col("c_nationkey").as("nationkey"))
      .except(
        Tables.supplier(spark, dir).filter(col("s_acctbal") < 3000)
          .select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  /** EXCEPT ALL: multiset difference — each customer's order count
    * minus their 'F'-status order count, kept as multiplicities and
    * re-aggregated for a deterministic output. */
  def qSetExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))
  }

  /** INTERSECT ALL: multiset intersection of order custkeys vs
    * open-order custkeys (min of the two multiplicities). */
  def qSetIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))
  }

  /** CDC-style upsert (MERGE): apply an updates relation onto a base
    * by key — updated rows replace, new rows insert, untouched rows
    * carry through. Parquet has no MERGE INTO; the engine expresses it
    * as a full outer join + coalesce, which is exactly the shuffle
    * MERGE plans to. Here: 'P'-status orders act as the update feed
    * (10% price bump) against the non-P base. */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val base = o.filter(col("o_orderstatus") =!= "P")
      .select(col("o_orderkey").as("b_key"), col("o_custkey").as("b_cust"),
        col("o_totalprice").as("b_price"))
    val updates = o.filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey").as("u_key"), col("o_custkey").as("u_cust"),
        round(col("o_totalprice") * 1.1, 3).as("u_price"))
    base.join(updates, col("b_key") === col("u_key"), "full")
      .select(
        coalesce(col("u_key"), col("b_key")).as("o_orderkey"),
        coalesce(col("u_cust"), col("b_cust")).as("o_custkey"),
        coalesce(col("u_price"), col("b_price")).as("price"),
        col("u_key").isNotNull.as("updated"))
      .orderBy(col("o_orderkey"))
      .limit(500)
  }

  /** Deterministic exact dedup: keep exactly one row per key with a
    * pinned tiebreak (row_number = 1), the reproducible formulation of
    * dropDuplicates (whose tie choice is plan-dependent). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    // keep-min-tiebreak dedup as a hash aggregation: min(struct) picks
    // the lexicographically least (orderkey, linenumber) per key. The
    // window formulation sorts inside 6 fat partitions (3 flags × 2
    // statuses — pure skew at scale); this runs partial+final agg with
    // no per-group sort and no skew sensitivity.
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(min(struct(col("l_orderkey"), col("l_linenumber"))).as("keep"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("keep.l_orderkey").as("l_orderkey"),
        col("keep.l_linenumber").as("l_linenumber"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
