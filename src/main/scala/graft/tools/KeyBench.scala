package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-key timing harness for plan iteration — the per-key
  * companion of [[graft.Bench]] (same session conf, same
  * warmup + median-of-3 discipline), for measuring ONE operator
  * rewrite without paying the full-inventory bench cycle.
  *
  * Carries the same load stamp as Bench (r9): calibration probe at
  * start/end vs the committed quiet-box floor + loadavg, so numbers
  * quoted into SCALE.md/BASELINE.md are self-policing too.
  *
  * Measurement hygiene (found measuring the r9 100× campaign): a
  * MULTI-key invocation shares one JVM, so a heavy key's reading can
  * be inflated ~2× by earlier keys' localCheckpoint blocks competing
  * for block-manager memory — q_dedup_containment measured 9.9 s in a
  * 14-key run vs 3.5 s alone at sf1. Time heavy keys in their OWN
  * invocation before quoting a number.
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
      // single-file fixtures cap scan parallelism at size/128 MB tasks
      // under the default maxPartitionBytes — sf1's 75 MB lineitem
      // scans as ONE task on a 32-core box, flooring every scan-bound
      // reading (r10, found comparing sf1 vs sf10 agg walls: 10× rows
      // in LESS wall). 16 MB sizes splits to the core count at the
      // fixture scales; production many-file datasets parallelize by
      // file count and don't need the knob.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    // Default consumer = count(), the Bench/driver contract. But a
    // count-shaped plan lets Catalyst prune payload expressions and
    // even ELIMINATE unique-key outer joins (q_scrub_substring's count
    // plan is scan→agg — the whole span pipeline drops out). Set
    // GRAFT_BENCH_CONSUME=hash to force every output column through
    // xxhash64 when quoting an operator's real materialization cost.
    val consume: org.apache.spark.sql.DataFrame => Unit =
      if (sys.env.get("GRAFT_BENCH_CONSUME").contains("hash"))
        df => { df.selectExpr("xxhash64(struct(*)) AS h")
          .selectExpr("bit_xor(h)").collect(); () }
      else df => { df.count(); () }
    val cal0 = graft.Bench.calibrationProbe(spark)
    val timings = args.tail.toSeq.map { key =>
      val fn = graft.SparkEntry.queries(key)
      consume(fn(spark, sfDir)) // warmup
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        consume(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      key -> (reps(1), reps.last - reps.head)
    }
    val cal1 = graft.Bench.calibrationProbe(spark)
    // shared verdict (absolute bar + r10 start/end disagreement rule)
    val contaminated = graft.Bench.loadVerdict(cal0, cal1)
    val body = timings.map { case (k, (med, spr)) =>
      s""""$k":{"median":${math.round(med * 10000) / 10000.0},"spread":${math.round(spr * 10000) / 10000.0}}"""
    }.mkString(",")
    println(s"""{"metric":"key_bench","sf_dir":"$sfDir","calibration_sec":[${math.round(cal0 * 10000) / 10000.0},${math.round(cal1 * 10000) / 10000.0}],"load_contaminated":$contaminated,"queries":{$body}}""")
    spark.stop()
  }
}
