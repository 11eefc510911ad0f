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

  /** JSON scalar extraction (`props` is a JSON string column) + agg. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(avg(get_json_object(col("props"), "$.k").cast("double")), 3).as("avg_k"))
      .orderBy(col("event_type"))
  }
}
