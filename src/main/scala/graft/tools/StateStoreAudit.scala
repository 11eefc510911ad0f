package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** State-store provider audit (VERDICT r16 missing #2): the stateful
  * streaming keys run on Spark's default in-heap
  * HDFSBackedStateStoreProvider; at 100 TB the standard answer is the
  * RocksDB provider (off-heap, SST-backed, bounded JVM heap per state
  * partition). This instrument runs the stateful keys under BOTH
  * providers in one JVM and reports, per (provider, key): wall, the
  * order-insensitive result hash (bit_xor of xxhash64(struct(*)) —
  * the SpillAudit consumer), and the state-operator metrics from the
  * streaming progress events (total state rows, state memory bytes) —
  * so "identical results, off-heap state" is a one-line diff.
  *
  * Provider is a per-query conf captured at stream start, so a scoped
  * session-conf set around each key is sufficient; the keys' own
  * shuffle-partition scoping composes (StreamOps.withConfs restores
  * cleanly). Progress events arrive on the async listener bus —
  * metrics are settle-polled per key like SpillAudit's counters.
  *
  * Usage: `runMain graft.tools.StateStoreAudit <sfDir> [key ...]`
  * (default: the four stateful declared keys). One JSON line per
  * provider×key, then one `state_store_compare` line per key saying
  * whether the two providers' hashes agree.
  */
object StateStoreAudit {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val DefaultKeys = Seq(
    "q_stream_join_ordered", "q_stream_dedup",
    "q_stream_sessionize", "q_stream_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.tail.toSeq else DefaultKeys
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-state-store-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    // per-key accumulation of state-operator metrics across every
    // progress event of the key's (uniquely named) streaming queries
    val stateRows = new java.util.concurrent.atomic.AtomicLong()
    val stateMem = new java.util.concurrent.atomic.AtomicLong()
    val events = new java.util.concurrent.atomic.AtomicLong()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          val rows = ops.map(_.numRowsTotal).sum
          val mem = ops.map(_.memoryUsedBytes).sum
          stateRows.updateAndGet(p => math.max(p, rows))
          stateMem.updateAndGet(p => math.max(p, mem))
        }
        events.incrementAndGet()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val hashes = scala.collection.mutable.Map[(String, String), String]()
    Seq("hdfs_backed" -> None, "rocksdb" -> Some(RocksDb)).foreach {
      case (label, providerOpt) =>
        keys.foreach { key =>
          stateRows.set(0); stateMem.set(0); events.set(0)
          val confs = providerOpt
            .map(p => Seq("spark.sql.streaming.stateStore.providerClass" -> p))
            .getOrElse(Seq.empty)
          val t0 = System.nanoTime()
          val outcome = scala.util.Try {
            val df =
              if (confs.isEmpty) graft.SparkEntry.queries(key)(spark, sfDir)
              else graft.streaming.StreamOps.withConfs(spark, confs: _*) {
                graft.SparkEntry.queries(key)(spark, sfDir)
              }
            df.selectExpr("xxhash64(struct(*)) AS h")
              .selectExpr("bit_xor(h) AS hx").head().getLong(0)
          }
          val wall = (System.nanoTime() - t0) / 1e9
          // settle-poll the async listener bus (the SpillAudit rule;
          // r18/ADVICE r17 #4: four consecutive stable 250 ms reads —
          // a full quiet second — so a bus draining in bursts spaced
          // >250 ms apart can't read settled between bursts)
          var prev = (stateRows.get, stateMem.get, events.get)
          var stable = 0
          val deadline = System.nanoTime() + 15L * 1000000000L
          while (stable < 4 && System.nanoTime() < deadline) {
            Thread.sleep(250)
            val cur = (stateRows.get, stateMem.get, events.get)
            stable = if (cur == prev) stable + 1 else 0
            prev = cur
          }
          val hash = outcome.map(_.toString).getOrElse("err")
          hashes((label, key)) = hash
          val err = outcome.failed.toOption
            .map(t => s""""${t.getClass.getSimpleName}: ${
              Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(160)
                .replace("\\", "\\\\").replace("\"", "'")}"""")
            .getOrElse("null")
          println(s"""{"metric":"state_store_audit","provider":"$label",""" +
            s""""key":"$key","wall_sec":${math.round(wall * 100) / 100.0},""" +
            s""""state_rows":${stateRows.get},""" +
            s""""state_mem_mb":${
              math.round(stateMem.get / (1024.0 * 1024.0) * 10) / 10.0},""" +
            s""""hash":"$hash","err":$err}""")
        }
    }
    keys.foreach { key =>
      val h1 = hashes.getOrElse(("hdfs_backed", key), "?")
      val h2 = hashes.getOrElse(("rocksdb", key), "?")
      println(s"""{"metric":"state_store_compare","key":"$key",""" +
        s""""hashes_match":${h1 == h2 && h1 != "err"}}""")
    }
    spark.stop()
  }
}
