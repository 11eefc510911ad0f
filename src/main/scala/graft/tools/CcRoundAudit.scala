package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the connected-components convergence curve on
  * q_dedup_clusters' EXACT edge set (capped MinHash candidate pairs)
  * at a given fixture — the number the loop's O(diameter) cost claim
  * rests on (VERDICT r9 #5: "CC round count at sf10 recorded").
  *
  * Uses the 4-arg [[graft.api.GraftOps.connectedComponents]] overload:
  * the per-round changed counts come from the loop's OWN convergence
  * scalars, so the instrument adds zero Spark actions to what the
  * declared key already runs. Prints one JSON line:
  * edges, rounds, changed-per-round, clusters, wall seconds.
  *
  * Usage: `runMain graft.tools.CcRoundAudit <sfDir> [label] [algo]`
  * where algo ∈ {prop (default), stars}. For `stars` the per-round
  * scalars are the edge counts after each LS+SS iteration (the stars
  * loop's own convergence scalar), not changed-label counts.
  */
object CcRoundAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val label = args.lift(1).getOrElse(new java.io.File(sfDir).getName)
    val algo = args.lift(2).getOrElse("prop")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cc-round-audit")
      .config("spark.sql.shuffle.partitions", "32")
      // same scan protocol as Bench/KeyBench (r10 review): without it
      // the single-file fixture scans at size/128 MB tasks and the
      // corpus pass feeding the edge list runs parallelism-floored,
      // making wall_sec incomparable to the other instruments'
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val pairs = graft.queries.DedupOps
      .minhashPairs(spark, sfDir, graft.queries.DedupOps.MaxBandBucket)
    val nEdges = pairs.count()
    val rounds = scala.collection.mutable.ArrayBuffer[Long]()
    val t0 = System.nanoTime()
    val comp =
      if (algo == "stars")
        graft.api.GraftOps.connectedComponentsStars(pairs, "doc_a", "doc_b", rounds += _)
      else
        graft.api.GraftOps.connectedComponents(pairs, "doc_a", "doc_b", rounds += _)
    val nClusters = comp.select(col("component")).distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"cc_rounds","label":"$label-$algo","edges":$nEdges,""" +
      s""""rounds":${rounds.size},"changed_per_round":[${rounds.mkString(",")}],""" +
      s""""clusters":$nClusters,"wall_sec":${math.round(wall * 100) / 100.0}}""")
    spark.stop()
  }
}
