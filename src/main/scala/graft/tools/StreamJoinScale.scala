package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State decomposition of q_stream_join's 7.6×/decade (VERDICT r12
  * #3): is the scaling an operator property or a replay artifact?
  *
  * The DECLARED key replays the whole events fixture through ONE
  * micro-batch (single-file source, Trigger.AvailableNow) — the
  * watermark never advances mid-batch, so BOTH interval-join state
  * sides hold the entire corpus and per-run cost is O(N). A
  * long-lived production query sees the same stream as MANY
  * micro-batches with the watermark advancing between them, evicting
  * join state older than watermark + interval — steady-state rows
  * are bounded by event RATE × (watermark + 1 h interval), not by
  * corpus size.
  *
  * This instrument measures both shapes on the same fixture, through
  * the production-shaped parquet sink (memory sinks OOM and distort
  * at scale — the StreamNeardupScale lesson):
  *  - `replay`: the declared single-batch shape;
  *  - `steady`: the events split into `nFiles` time-contiguous files
  *    (ts is monotone in event_id, so event_id ranges ARE time
  *    ranges, written one by one so file order = time order),
  *    streamed with maxFilesPerTrigger = 1 — per-batch
  *    StreamingQueryProgress state metrics (rows total / removed,
  *    store bytes, watermark) show eviction working;
  *  - `steady_wm1m`: the same with the watermark tightened
  *    10 min → 1 min — the state floor a latency-tolerant deployment
  *    buys.
  * Every run's emitted row count is checked against the batch
  * interval join (time-contiguous files ⇒ nothing is ever late, so
  * streamed ≡ batch exactly; a dropped-late row would surface here).
  *
  * Usage: `runMain graft.tools.StreamJoinScale <sfDir> [label]
  * [nFiles]`. One JSON line per run + one per-batch line each.
  */
object StreamJoinScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val label = args.lift(1).getOrElse(new java.io.File(sfDir).getName)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-join-scale")
      .config("spark.sql.shuffle.partitions", "2") // declared key's store count
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("sjs").toString
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
      .localCheckpoint(true)
    val nEv = ev.count()
    val maxId = ev.agg(max("event_id")).head().getLong(0)

    // batch ground truth: the same interval join, no watermarks
    val batchRows = graft.streaming.StreamOps.clickToPurchase(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase")).count()

    // stage time-contiguous source files, one write per file so
    // file-source discovery order (mod time) = event-time order
    val srcDir = s"$work/src"
    val step = maxId / nFiles + 1
    (0 until nFiles).foreach { i =>
      ev.filter(col("event_id") >= i * step && col("event_id") < (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // FileStreamSource orders by mod time (1s granularity)
    }
    val schema = ev.schema

    def run(name: String, multiBatch: Boolean, watermark: String): Unit = {
      val src =
        if (multiBatch)
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir)
        else spark.readStream.schema(schema).parquet(srcDir)
      val joined = graft.streaming.StreamOps.clickToPurchase(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"), watermark)
      val out = s"$work/out_$name"
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", s"$work/ckpt_$name")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.toSeq.map { p =>
        val so = p.stateOperators.headOption
        val wm = Option(p.eventTime.get("watermark")).getOrElse("-")
        s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
          s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
          s""""state_removed":${so.map(_.numRowsRemoved).getOrElse(-1L)},""" +
          s""""state_bytes":${so.map(_.memoryUsedBytes).getOrElse(-1L)},""" +
          s""""watermark":"$wm"}"""
      }
      val outRows = spark.read.parquet(out).count()
      println(s"""{"metric":"stream_join_scale","label":"$label","run":"$name",""" +
        s""""events":$nEv,"watermark":"$watermark","batches":${batches.size},""" +
        s""""out_rows":$outRows,"batch_rows":$batchRows,""" +
        s""""exact":${outRows == batchRows},"wall_sec":${math.round(wall * 100) / 100.0},""" +
        s""""per_batch":[${batches.mkString(",")}]}""")
    }

    run("replay", multiBatch = false, "10 minutes")
    run("steady", multiBatch = true, "10 minutes")
    run("steady_wm1m", multiBatch = true, "1 minute")
    spark.stop()
  }
}
