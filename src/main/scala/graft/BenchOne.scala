package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-benchmark: time ONE declared key (or several,
  * comma-separated) for N warm reps — the per-key iteration tool the
  * full Bench is too coarse for. Not part of the driver protocol.
  *
  * Usage: runMain graft.BenchOne <keyPrefixes> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("q_agg_pricing").split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (k, _) => prefixes.exists(k.startsWith) }
      .foreach { case (name, fn) =>
        fn(spark, sfDir).count() // cold warmup
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[benchone] $name%-24s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    spark.stop()
  }
}
