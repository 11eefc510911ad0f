package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-micro-batch duration decomposition of the ordered stream join
  * (r19 optimization audit): replays the SAME staged 8-file feed as
  * q_stream_join_ordered and prints each batch's `durationMs`
  * components (addBatch = execution, walCommit/commitOffsets = offset
  * and commit log fsyncs, queryPlanning = per-batch IncrementalExecution
  * re-planning, getBatch/latestOffset = source work) — the numbers
  * that say whether the key's wall is state commits, planning, or
  * execution, which no end-to-end timing can separate.
  *
  * Usage: `runMain graft.tools.StreamBatchProfile <sfDir>`
  */
object StreamBatchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-batch-profile")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm once (cold staging + codegen land here), then profile
    graft.streaming.StreamOps.qStreamJoinOrdered(spark, sfDir).count()

    // re-run the replay with a handle on the query: duplicate the
    // key's wiring minimally via the public key, but capture progress
    // through the active-query listener (the key stops its query
    // before returning, so recentProgress is read via a listener).
    val progresses =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        progresses.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    graft.streaming.StreamOps.qStreamJoinOrdered(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are async; drain briefly
    Thread.sleep(1500)
    spark.streams.removeListener(listener)
    import scala.jdk.CollectionConverters._
    val rows = progresses.asScala.toSeq.sortBy(_.batchId).map { p =>
      val d = p.durationMs
      def g(k: String): Long = Option(d.get(k)).map(_.toLong).getOrElse(-1L)
      s"""{"batch":${p.batchId},"total":${g("triggerExecution")},""" +
        s""""addBatch":${g("addBatch")},"planning":${g("queryPlanning")},""" +
        s""""walCommit":${g("walCommit")},"commitOffsets":${g("commitOffsets")},""" +
        s""""getBatch":${g("getBatch")},"latestOffset":${g("latestOffset")},""" +
        s""""input_rows":${p.numInputRows}}"""
    }
    println(s"""{"metric":"stream_batch_profile","wall_sec":${math.round(wall * 100) / 100.0},"batches":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
