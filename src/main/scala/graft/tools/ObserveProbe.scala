package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Feasibility probe (r20): does a `Dataset.observe` metric fire when
  * the frame is materialized by `localCheckpoint(true)` (an RDD-level
  * action) rather than a Dataset action? If yes, the CC loop's
  * per-round convergence `count()` job can fold into the round's
  * checkpoint job — one job per round instead of two. */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-observe-probe")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("probe")
    val df = spark.range(1000).toDF("id")
      .withColumn("flag", col("id") % 7 === 0)
      .observe(obs, sum(when(col("flag"), 1L).otherwise(0L)).as("n"))
      .localCheckpoint(true)
    // obs.get BLOCKS until the metric fires — bound it with a future
    // so a never-firing listener prints a verdict instead of hanging
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def tryGet(label: String): Unit = {
      val r = scala.util.Try(Await.result(Future(obs.get), 5.seconds))
      println(s"[probe] observation $label: $r")
    }
    tryGet("after localCheckpoint(true)")
    println(s"[probe] frame count = ${df.count()}")
    tryGet("after count (expected n=143)")

    // Second question: does the observe node preserve the child's
    // outputPartitioning through the checkpoint? The CC loop's edge
    // frame relies on the checkpointed LogicalRDD carrying its hash
    // partitioning so each round only exchanges the label frame.
    def exchanges(df2: org.apache.spark.sql.DataFrame): Int = {
      df2.count()
      df2.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    }
    val plainCk = spark.range(1000).toDF("id")
      .repartition(col("id")).localCheckpoint(true)
    val obs2 = Observation("probe2")
    val obsCk = spark.range(1000).toDF("id")
      .repartition(col("id"))
      .observe(obs2, count(lit(1)).as("n")).localCheckpoint(true)
    val nPlain = exchanges(plainCk.groupBy(col("id")).count())
    val nObs = exchanges(obsCk.groupBy(col("id")).count())
    println(s"[probe] exchanges above checkpoint: plain=$nPlain observed=$nObs " +
      s"(equal => CollectMetrics preserves partitioning)")
    spark.stop()
  }
}
