package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage beyond the seeded row_number/lag
  * (SURVEY.md §2.4-E): the rank family, running/moving frames, RANGE
  * frames, first/last/nth_value, and lag/lead gaps.
  *
  * Determinism: every window ORDER BY includes a unique tiebreaker so
  * position-sensitive functions (ntile, row_number, ROWS frames) are
  * reproducible across engines (§2.2-1).
  *
  * Scale notes: a window over PARTITION BY k shuffles once on k; all
  * functions then evaluate in a single sorted pass per partition. The
  * hazard at 100 TB is a giant single partition (skew) — every key
  * here partitions by a high-cardinality or well-distributed column.
  */
object Windows {

  /** rank / dense_rank / percent_rank / ntile in one pass over orders
    * partitioned by priority. */
  def qWindowRankFamily(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rk") <= 20)
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Running cumulative sum + 3-row moving average per customer
    * (ROWS BETWEEN frames). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = ord.rowsBetween(-2, 0)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(cum), 2).as("cum_spend"),
        // 4 dp, not 2: a 3-row avg divides 2-decimal sums by 2 or 3 —
        // /2 lands EXACTLY on the .xx5 half-up boundary whenever the
        // cents are odd, and the two engines disagree on rounding a
        // double 1 ulp off the boundary (observed at sf0.1). At 4 dp
        // the quotient (k/200·10^4 integer, k/300·10^4 never half-way)
        // has no boundary case at all. §2.2-2 refinement.
        round(avg(col("o_totalprice")).over(mov), 4).as("mov_avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
      .limit(300)
  }

  /** RANGE frame: for each lineitem, total extendedprice of all rows of
    * the same returnflag whose quantity lies within [q-5, q]. Value-based
    * frames are tie-insensitive, hence deterministic without a tiebreak
    * in the frame spec itself. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    l.select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        round(sum(col("l_extendedprice")).over(w), 2).as("range_sum"))
      .orderBy(col("l_returnflag"), col("l_quantity"),
               col("l_orderkey"), col("l_linenumber"))
      .limit(200)
  }

  /** first_value / last_value / nth_value over the full partition
    * (explicit UNBOUNDED..UNBOUNDED frame — default frames stop at
    * CURRENT ROW when ORDER BY is present, in both engines). */
  def qWindowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(
        col("o_custkey"),
        first(col("o_orderkey")).over(full).as("first_ok"),
        last(col("o_orderkey")).over(full).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_ok"),
        row_number().over(ord).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("o_custkey"))
      .limit(200)
  }

  /** Distinct count over a window — the aggregate Spark's
    * COUNT(DISTINCT) cannot express OVER a frame; the idiom is
    * `size(collect_set(...))` with an explicit ROWS frame. The frame
    * order (ts, event_id) is total, so both engines see identical row
    * prefixes and the distinct count is order-insensitive from there —
    * DuckDB runs a native count(DISTINCT) OVER the same frame.
    * Scale: per-user frames evaluate in one sorted partition-local
    * pass; the set state is bounded by the 5-value type domain. */
  def qWindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id") < 30)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("user_id"), col("event_id"),
        size(collect_set(col("event_type")).over(w)).as("types_seen"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(400)
  }

  /** lag/lead: seconds since previous and until next event per user. */
  def qWindowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(
        col("user_id"), col("event_id"),
        ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))) / 1000000L).as("gap_prev_s"),
        ((unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))) / 1000000L).as("gap_next_s"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(300)
  }
}
