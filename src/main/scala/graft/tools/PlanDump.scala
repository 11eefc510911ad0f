package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of a declared key — the
  * `.explain("formatted")` loop the build brief prescribes per
  * operator, against the real fixture tables.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <key> [count]`
  * With `count`, explains `df.groupBy().count()`'s plan instead —
  * what KeyBench actually executes (column pruning differs: a
  * count-shaped consumer lets Catalyst drop payload expressions,
  * which is why a key can bench faster than its full materialization).
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
    val target = if (args.length > 2 && args(2) == "count")
      df.groupBy().count() else df
    target.explain("formatted")
    spark.stop()
  }
}
