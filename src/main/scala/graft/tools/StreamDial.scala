package graft.tools

import org.apache.spark.sql.SparkSession

/** Conf-dial A/B harness for the streaming replay keys (r20, VERDICT
  * r19 next #3): sets session confs from `k=v` args, then times a
  * declared stream key for N warm reps — the same warm+min discipline
  * as BenchOne, with the run-level calibration stamp. Session confs
  * set here are visible inside the replay runners (their withConfs
  * scope only overrides shuffle partitions + noDataMicroBatches), so
  * state-store dials (minDeltasForSnapshot, maintenance interval,
  * provider knobs) can be measured without touching engine code.
  *
  * Usage: `runMain graft.tools.StreamDial <key> <sfDir> <reps> [k=v ...]`
  */
object StreamDial {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: StreamDial <key> <sfDir> <reps> [k=v ...]")
    val key = args(0); val sfDir = args(1); val reps = args(2).toInt
    val confs = args.drop(3).map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-dial")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val fn = graft.SparkEntry.queries(key)
    val cal0 = graft.Bench.calibrationProbe(spark)
    fn(spark, sfDir).count() // warmup (cold staging/codegen)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cal1 = graft.Bench.calibrationProbe(spark)
    println(f"[dial] $key confs=${confs.map(c => c._1 + "=" + c._2).mkString(",")} " +
      f"min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f " +
      f"reps=${times.map(t => f"$t%.3f").mkString(",")} cal=[$cal0%.3f,$cal1%.3f]")
    spark.stop()
  }
}
