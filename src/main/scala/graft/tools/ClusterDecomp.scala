package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q_dedup_clusters (r20): where do its ~2 s
  * go — the store read, the capped band joins, the CC loop, or the
  * final sort? Times each piece with explicit materialization, twice
  * (cold then warm), so the optimization target is measured rather
  * than guessed (guide §1). Also prints the CC loop's per-round wall,
  * the number this round's convergence-batch experiment rests on.
  *
  * Usage: `runMain graft.tools.ClusterDecomp <sfDir>`
  */
object ClusterDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cluster-decomp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ${if (pass == 1) "(cold)" else "(warm)"}")
      val mh = timed("store read + checkpoint") {
        graft.queries.DedupOps.minhashIndex(spark, sfDir).localCheckpoint(true)
      }
      val pairs = graft.queries.DedupOps
        .minhashPairsBetween(mh, mh, mh,
          graft.queries.DedupOps.MaxBandBucket, selfJoin = true)
      // mirror connectedComponentsAdaptive's own dispatch steps
      val e = timed("pairs: checkpoint (band joins)") {
        pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      }
      val n = timed("pairs: count")(e.count())
      val roundWalls = scala.collection.mutable.ArrayBuffer[Double]()
      var last = System.nanoTime()
      val comp = timed("cc loop (all rounds)") {
        val c = graft.api.GraftOps.connectedComponentsAdaptive(
          e, "doc_a", "doc_b", { _ =>
            val now = System.nanoTime()
            roundWalls += (now - last) / 1e9; last = now
          })
        c.count(); c
      }
      println(s"[decomp] per-round walls: ${roundWalls.map(w => f"$w%.3f").mkString(", ")} (n_edges=$n)")
      timed("final orderBy + count") {
        comp.select(col("id").as("doc_id"), col("component").as("cluster"))
          .orderBy(col("cluster"), col("doc_id")).count()
      }
    }
    spark.stop()
  }
}
