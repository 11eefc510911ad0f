package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-key timing harness for plan iteration — the per-key
  * companion of [[graft.Bench]] (same session conf, same
  * warmup + median-of-3 discipline), for measuring ONE operator
  * rewrite without paying the 127-key full-bench cycle.
  *
  * Usage: `runMain graft.tools.KeyBench <sfDir> <key> [key ...]`
  */
object KeyBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: KeyBench <sfDir> <key> [key ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-keybench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val timings = args.tail.toSeq.map { key =>
      val fn = graft.SparkEntry.queries(key)
      fn(spark, sfDir).count() // warmup
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      key -> (reps(1), reps.last - reps.head)
    }
    val body = timings.map { case (k, (med, spr)) =>
      s""""$k":{"median":${math.round(med * 10000) / 10000.0},"spread":${math.round(spr * 10000) / 10000.0}}"""
    }.mkString(",")
    println(s"""{"metric":"key_bench","sf_dir":"$sfDir","queries":{$body}}""")
    spark.stop()
  }
}
