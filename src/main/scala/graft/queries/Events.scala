package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream-shaped queries over `events` (batch forms; the true
  * Structured Streaming versions live in graft.streaming and are
  * verified by unit tests against these batch equivalents —
  * SURVEY.md §2.4-I).
  */
object Events {

  /** Tumbling 1-hour window aggregation, batch form (date_trunc).
    * Streaming equivalent: groupBy(window($"ts","1 hour")). */
  def qEventsTumbling(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .orderBy(col("h"), col("event_type"))
      .limit(200)
  }

  /** Sessionization with a 30-minute inactivity gap: lag + cumulative
    * break-count. One shuffle on user_id; elapsed time via epoch-µs
    * subtraction (never boundary-crossing date_diff — SURVEY §2.2-4). */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
             (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) / lit(60000000.0) > 30, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("brk")).as("sessions"))
      .orderBy(col("sessions").desc, col("user_id"))
      .limit(50)
  }

  /** Sliding 1-hour windows every 15 minutes, batch form of
    * `window(ts, '1 hour', '15 minutes')` — each event lands in 4
    * overlapping windows (epoch-aligned starts, like the streaming
    * operator). Row expansion ×4 happens before the shuffle; the
    * window start is the shuffle key. */
  def qEventsSliding(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv"))
      .orderBy(col("ws"), col("event_type"))
      .limit(300)
  }

  /** Native session_window in batch mode: per-user sessions with a
    * 30-minute gap; window end = last event + gap. The oracle derives
    * identical bounds via lag + cumulative-break + max(ts)+interval
    * (break at diff >= gap, matching session_window's half-open
    * [start, last+gap) semantics). */
  def qEventsSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n"))
      .orderBy(col("user_id"), col("ss"))
      .limit(300)
  }

  /** Row-level session assignment: every event tagged with its
    * session ordinal (cumulative break count) — the per-row form of
    * qEventsSessionize's per-user counts. */
  def qEventsSessionIds(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
             (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) / lit(60000000.0) > 30, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("sid"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(300)
  }

  /** Retention cohort curve: distinct active (user, day) pairs joined
    * to each user's first-seen day; day_n = days since first seen.
    * Two shuffles (per-user min, then per-day_n count). */
  def qEventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val first = e.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
    e.distinct()
      .join(first, "user_id")
      .select(datediff(col("d"), col("first_d")).as("day_n"))
      .groupBy(col("day_n")).agg(count(lit(1)).as("active"))
      .orderBy(col("day_n"))
      .limit(31)
  }

  /** Funnel stages from first-occurrence ordering of view → click →
    * purchase per user (conditional min + CASE chain). */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_v"),
        min(when(col("event_type") === "click", col("ts"))).as("t_c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_p"))
      .withColumn("stage",
        when(col("t_v").isNotNull && col("t_c") > col("t_v") && col("t_p") > col("t_c"), "full_funnel")
          .when(col("t_v").isNotNull && col("t_c") > col("t_v"), "view_click")
          .when(col("t_v").isNotNull, "view_only")
          .otherwise("no_view"))
      .groupBy(col("stage")).agg(count(lit(1)).as("users"))
      .orderBy(col("stage"))
  }

  /** JSON scalar extraction (`props` is a JSON string column) + agg. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(avg(get_json_object(col("props"), "$.k").cast("double")), 3).as("avg_k"))
      .orderBy(col("event_type"))
  }
}
