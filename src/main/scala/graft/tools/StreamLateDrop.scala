package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Late-data ACCOUNTING under the ordered feed (VERDICT r14 missing
  * #3): StreamJoinScale proved state EVICTION; this instrument proves
  * the other half of watermark semantics — rows arriving after the
  * watermark passed their event time are DROPPED, visibly and
  * exactly.
  *
  * Protocol: the events fixture is split into `nFiles` time-contiguous
  * slices (event_id ranges = time ranges), staged with explicit mod
  * times so FileStreamSource discovery order = event-time order —
  * EXCEPT one slice from the middle (`lateIdx`), which is staged with
  * the NEWEST mod time: by the micro-batch it arrives in, the
  * watermark (tight, 1 minute) sits near the fixture's max event
  * time, hours past the late rows — every one of them must drop.
  *
  * The accounting that must balance (and is asserted, not just
  * printed):
  *  - `out_rows == batch_minus_late_rows`: the streamed interval join
  *    equals the BATCH join computed over the fixture WITHOUT the
  *    late slice — on-time pairs are untouched, late-involving pairs
  *    vanish, nothing else changes;
  *  - `dropped == late_input_rows`: the per-batch
  *    numRowsDroppedByWatermark metrics sum to exactly the late
  *    slice's (click ∪ purchase) row count.
  *
  * Usage: `runMain graft.tools.StreamLateDrop <sfDir> [nFiles]`.
  * One JSON line (committed under docs/ as the round's artifact).
  */
object StreamLateDrop {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val label = new java.io.File(sfDir).getName
    val nFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val lateIdx = nFiles / 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-late-drop")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("sld").toString
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
      .localCheckpoint(true)
    val maxId = ev.agg(max("event_id")).head().getLong(0)
    val step = maxId / nFiles + 1
    def slice(i: Int) =
      ev.filter(col("event_id") >= i * step && col("event_id") < (i + 1) * step)
    val lateRows = slice(lateIdx).count()

    // ground truths: full batch join, and the join WITHOUT the late slice
    def batchJoin(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.clickToPurchase(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "purchase")).count()
    val fullBatch = batchJoin(ev)
    val onTime = ev.filter(
      col("event_id") < lateIdx * step || col("event_id") >= (lateIdx + 1) * step)
    val batchMinusLate = batchJoin(onTime)

    // stage: on-time slices in event-time order, the late slice NEWEST
    val srcDir = new java.io.File(work, "src")
    java.nio.file.Files.createDirectories(srcDir.toPath)
    val base = System.currentTimeMillis() - (nFiles + 2) * 2000L
    def stage(i: Int, order: Int): Unit = {
      val tmp = new java.io.File(work, s"__slice_$i")
      slice(i).coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"batch_$order%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      java.nio.file.Files.setLastModifiedTime(dst.toPath,
        java.nio.file.attribute.FileTime.fromMillis(base + order * 2000L))
    }
    val onTimeOrder = (0 until nFiles).filter(_ != lateIdx)
    onTimeOrder.zipWithIndex.foreach { case (i, o) => stage(i, o) }
    stage(lateIdx, nFiles - 1) // newest mod time → last micro-batch

    val src = spark.readStream.schema(ev.schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getPath)
    val joined = graft.streaming.StreamOps.clickToPurchase(
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "purchase"), "1 minute")
    val out = s"$work/out"
    val q = joined.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val perBatch = q.recentProgress.toSeq.map { p =>
      val so = p.stateOperators.headOption
      val wm = Option(p.eventTime.get("watermark")).getOrElse("-")
      (p.batchId, p.numInputRows,
        so.map(_.numRowsDroppedByWatermark).getOrElse(-1L), wm)
    }
    val dropped = perBatch.map(_._3).filter(_ >= 0).sum
    val outRows = spark.read.parquet(out).count()
    val pb = perBatch.map { case (b, in, d, wm) =>
      s"""{"batch":$b,"input_rows":$in,"dropped":$d,"watermark":"$wm"}"""
    }.mkString(",")
    println(s"""{"metric":"stream_late_drop","label":"$label","n_files":$nFiles,""" +
      s""""late_slice":$lateIdx,"late_input_rows":$lateRows,""" +
      s""""out_rows":$outRows,"batch_minus_late_rows":$batchMinusLate,""" +
      s""""full_batch_rows":$fullBatch,"dropped":$dropped,""" +
      s""""ontime_exact":${outRows == batchMinusLate},""" +
      s""""drop_exact":${dropped == lateRows},"per_batch":[$pb]}""")
    assert(outRows == batchMinusLate,
      s"on-time result $outRows != batch-minus-late $batchMinusLate")
    assert(dropped == lateRows,
      s"watermark dropped $dropped != late input rows $lateRows")
    spark.stop()
  }
}
