package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** sf10 replay harness for the ingestion near-dup stream
  * ([[graft.streaming.StreamOps.streamNeardupPairs]]) through a
  * PRODUCTION-shaped sink: append-mode parquet + checkpoint, the
  * configuration a real ingestion deployment runs. Exists because the
  * declared key's memory sink — the t2 harness shape — materializes
  * every emitted pair on the driver heap and OOMs at the sf10 decade
  * (millions of surviving pairs), which is a sink property, not an
  * operator one: the pair stream itself is stateless and
  * executor-resident end to end. Reports wall + emitted pair count.
  *
  * Usage: `runMain graft.tools.StreamNeardupScale [sfDir]`
  */
object StreamNeardupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-neardup-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files
      .createTempDirectory("graft_neardup_scale").toString
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamOps.streamNeardupPairs(spark, sfDir)
      .writeStream.format("parquet")
      .option("path", s"$out/pairs")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(s"$out/pairs").count()
    println(s"""{"metric":"stream_neardup_scale","sf_dir":"$sfDir",""" +
      s""""sec":${math.round(sec * 100) / 100.0},"pairs":$n,"sink":"parquet"}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.stop()
  }
}
