package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of a declared key — the
  * `.explain("formatted")` loop the build brief prescribes per
  * operator, against the real fixture tables.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <key> [count|exec]`
  * With `count`, explains `df.groupBy().count()`'s plan instead —
  * what KeyBench actually executes (column pruning differs: a
  * count-shaped consumer lets Catalyst drop payload expressions,
  * which is why a key can bench faster than its full materialization).
  * With `exec`, EXECUTES the frame (count) and prints the
  * post-execution `queryExecution.executedPlan` — the AQE FINAL plan,
  * where runtime artifacts invisible to a pre-execution explain
  * (`isFinalPlan=false`) show up: ReusedExchange stage dedup,
  * AQEShuffleRead coalescing, runtime join rewrites. This is how the
  * tfidf/bm25 "five canonically-identical subtrees dedup at runtime"
  * claim is confirmed without enabling the UI the bench disables.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <key> [count]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    if (args.length > 2 && args(2) == "exec") {
      // collect() executes df's OWN QueryExecution — a count() would
      // plan a separate pruned execution and leave this one
      // isFinalPlan=false. Fine for the declared keys' bounded
      // outputs; don't point exec-mode at an unbounded frame.
      df.collect()
      // executedPlan AFTER the action = the AQE final plan
      // (ReusedExchange / AQEShuffleRead nodes live only here)
      println(df.queryExecution.executedPlan.toString)
    } else {
      val target = if (args.length > 2 && args(2) == "count")
        df.groupBy().count() else df
      target.explain("formatted")
    }
    spark.stop()
  }
}
