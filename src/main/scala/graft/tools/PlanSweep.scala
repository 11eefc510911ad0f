package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of EVERY declared key into one
  * directory — the whole-inventory companion of [[PlanDump]] for the
  * r19 optimization audit: one JVM, one file per key, so a structural
  * sweep (Exchange counts, join strategies, PushedFilters, codegen
  * coverage) greps the full inventory instead of paying 160 sbt
  * launches. Keys whose construction executes work (streaming
  * replays, staged-artifact builds) run that work here exactly as
  * Verify would.
  *
  * Usage: `runMain graft.tools.PlanSweep <sfDir> <outDir>`
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSweep <sfDir> <outDir>")
    val (sfDir, outDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plansweep")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          plan.getBytes("UTF-8"))
      } catch {
        case t: Throwable =>
          System.err.println(s"[plansweep] $name failed: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
