package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation coverage beyond the seeds (SURVEY.md §2.4-D): global
  * agg, CUBE, GROUPING SETS, statistical aggregates, exact
  * percentiles, and ordered collect_list.
  *
  * Scale notes: all group-bys here run partial (map-side) + final
  * aggregation automatically; CUBE/GROUPING SETS expand rows by the
  * number of grouping sets BEFORE the shuffle — so the multi-set keys
  * here aggregate to the base grain FIRST and expand only the
  * partials (see qAggCube / Relational.qAggRollup), making the
  * expansion cost constant in the grouping-key cardinality instead of
  * linear in the data.
  */
object Aggs {

  /** Global (no GROUP BY) aggregation over lineitem. */
  def qAggGlobal(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n"),
      round(sum(col("l_quantity")), 2).as("sum_qty"),
      round(avg(col("l_extendedprice")), 2).as("avg_price"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))
  }

  /** CUBE over (returnflag, linestatus) with a NULL-derived level
    * indicator (the flag columns are never null in the data, so
    * IS NULL unambiguously marks the super-aggregate rows).
    *
    * Money sums accumulate in DECIMAL (r8, found at sf1): the grand
    * total is ~3.2e11 at 6 M rows, where double summation's
    * order-dependent error (~1e-1 random walk) exceeds the 2 dp
    * rounding grain — round(sum(double),2) stopped matching DuckDB.
    * The fixture's money columns are exact 2 dp values, so
    * cast→decimal(18,2) is lossless, the sum is order-independent at
    * ANY scale, and the final cast back to double keeps the schema.
    * Same pattern applied to every fixed-cardinality money-sum key. */
  def qAggCube(spark: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate to the base grain, then CUBE the partials — see
    // Relational.qAggRollup (r8): Expand's 4× multiplier applies to 6
    // rows instead of the fact stream. sum/count re-aggregate exactly.
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("s0"))
    base.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).as("n"), sum(col("s0")).cast("double").as("s"))
      .withColumn("lvl",
        when(col("l_returnflag").isNull, lit(1)).otherwise(lit(0)) +
        when(col("l_linestatus").isNull, lit(1)).otherwise(lit(0)))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** GROUPING SETS ((returnflag), (linestatus), ()) — the explicit-set
    * form, distinct from rollup/cube. */
  def qAggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    // Pre-aggregate then expand — see Relational.qAggRollup (r8).
    // l_quantity is integer-valued, so the double partial sums re-add
    // exactly (integers ≤ 2^53) regardless of grouping order.
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"), sum(col("l_quantity")).as("q0"))
    base.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).as("n"), round(sum(col("q0")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Statistical aggregates per returnflag: stddev/variance (samp+pop),
    * correlation and covariance of quantity vs extendedprice. Rounded
    * to 4 dp — both engines use the same two-pass-free streaming
    * formulas over identical inputs. */
  def qAggStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles (p25/median/p75) of quantity per
    * returnflag — Spark `percentile` ≡ DuckDB `quantile_cont`. */
  def qAggPercentile(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("median(l_extendedprice)"), 4).as("med_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Conditional / boolean / positional aggregates: count_if,
    * bool_or/bool_and, bit_and/or/xor, max_by/min_by (ordered by the
    * UNIQUE orderkey — ordering by a tied column like price would be
    * nondeterministic across engines). */
  def qAggCondBool(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("count_if(o_totalprice > 200000)").as("n_big"),
        expr("bool_or(o_orderstatus = 'P')").as("any_p"),
        expr("bool_and(o_totalprice > 0)").as("all_pos"),
        expr("bit_and(o_orderkey % 256)").as("band"),
        expr("bit_or(o_orderkey % 256)").as("bor"),
        expr("bit_xor(o_orderkey % 256)").as("bxor"),
        expr("max_by(o_custkey, o_orderkey)").as("last_cust"),
        expr("min_by(o_custkey, o_orderkey)").as("first_cust"))
      .orderBy(col("o_orderpriority"))
  }

  /** Linear-regression aggregates over (quantity → extendedprice). */
  def qAggRegr(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** PIVOT: linestatus breakout columns per returnflag. Explicit value
    * list — at scale an implicit pivot forces a distinct-values
    * collect on the driver before planning. */
  def qAggPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy(col("l_returnflag"))
  }

  /** UNPIVOT (melt): wide per-flag metrics back to long form. */
  def qAggUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), // integral: exact in double
           // decimal accumulation — see qAggCube (sf1 float-sum fix)
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .unpivot(Array(col("l_returnflag")),
               Array(col("sum_qty"), col("revenue")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** Ordered collect_list, emitted as a joined string so the result is
    * a comparable scalar (array columns stringify differently across
    * parquet readers): line numbers per order. */
  def qAggCollect(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 400)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
        array_join(sort_array(collect_set(col("l_linenumber"))), ",").as("uniq"),
        count(lit(1)).as("n"))
      .orderBy(col("l_orderkey"))
  }

  /** DECLARED skew-mitigation key: two-stage SALTED aggregation on the
    * maximally skewed l_returnflag (3 values over the whole fact
    * table). Stage 1 aggregates (key, salt) — each hot key spread over
    * 8 reducers — stage 2 merges the partials per key; the oracle is
    * the PLAIN one-stage GROUP BY, so the green row is a standing
    * proof that salting is a pure execution-strategy change. The salt
    * is a deterministic integer derived from the row's natural key
    * (engine-neutral, no rand()); sum/count/min/max all re-aggregate
    * losslessly — this is the manual form of what AQE skew-join does
    * for joins, needed when a groupBy itself is the skew point. */
  def qSkewSalted(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("salt",
        pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn"),
        min(col("l_extendedprice")).as("pmin"), max(col("l_extendedprice")).as("pmax"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("ps")), 2).as("q"), sum(col("pn")).as("n"),
        round(min(col("pmin")), 2).as("min_price"), round(max(col("pmax")), 2).as("max_price"))
      .orderBy(col("l_returnflag"))

  /** Fixed-width value histogram of order totals (25k-wide buckets):
    * the distribution profile every warehouse exposes. The bucket id
    * is `floor(v / 25000)` — one IEEE divide + floor on identical
    * doubles, bit-deterministic in both engines (no width_bucket /
    * data-dependent bounds). One map-side-combinable pass; bucket
    * count is value-range/width regardless of row count. */
  def qAggHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))
  }
}
