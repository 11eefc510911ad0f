package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The recall dial of the closed unsupervised ANN loop
  * (q_knn_ivf_kmeans), measured — VERDICT r10 #2. Sweeps the three
  * dials of [[graft.queries.VectorOps.qKnnIvfKmeansGeo]] — k (cell
  * count), Lloyd iters, nprobe — the way EmbScaleBench swept
  * (bits, bands), and reports for each point: top-3 recall of the 10
  * fixture probes against the brute-force ground truth, the scan
  * fraction nprobe/k (the cost model's x-axis), and the measured
  * wall SPLIT into `build_sec` (the eager Lloyd rounds —
  * kmeansModel localCheckpoints each centroid update, so training
  * completes inside the construction call; a SERVING deployment
  * pays this once) and `search_sec` (executing the returned plan:
  * corpus assignment map stage + probe join + top-k — the per-query
  * serving cost in this measurement shape). `wall_sec` stays as
  * their sum for continuity with the r11 rows (ADVICE r11: the old
  * single wall silently attributed build cost to serving).
  *
  * Usage: `runMain graft.tools.AnnDialBench [sfDir] [kList] [itList]
  * [npList]` (comma-separated lists; defaults k=8,16,32 it=2,4
  * np=1,2,4,8). One JSON line per point plus a summary line.
  */
object AnnDialBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    def list(i: Int, dflt: Seq[Int]): Seq[Int] =
      args.lift(i).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(dflt)
    val ks = list(1, Seq(8, 16, 32))
    val its = list(2, Seq(2, 4))
    val nps = list(3, Seq(1, 2, 4, 8))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ann-dial")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val emb = graft.Tables.embeddings(spark, sfDir).persist()
    val n = emb.count()

    // brute-force ground truth, once (same construction as
    // AnnRecallSpec.gtTop3)
    val p = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = emb.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    val gt = p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("neighbor"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

    for (k <- ks; it <- its; np <- nps if np <= k) {
      // build = the eager Lloyd rounds inside the construction call
      // (each update localCheckpoints); search = executing the plan
      val tb0 = System.nanoTime()
      val q = graft.queries.VectorOps.qKnnIvfKmeansGeo(spark, sfDir, k, it, np)
      val tBuild = (System.nanoTime() - tb0) / 1e9
      val ts0 = System.nanoTime()
      val found = q.select(col("vec_id"), col("neighbor"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val tSearch = (System.nanoTime() - ts0) / 1e9
      val recall = (found & gt).size.toDouble / gt.size
      println(s"""{"metric":"ann_dial","sf_dir":"$sfDir","n":$n,""" +
        s""""k":$k,"iters":$it,"nprobe":$np,""" +
        s""""scan_frac":${fmt(np.toDouble / k)},""" +
        s""""recall":${fmt(recall)},"build_sec":${fmt(tBuild)},""" +
        s""""search_sec":${fmt(tSearch)},"wall_sec":${fmt(tBuild + tSearch)}}""")
    }
    spark.stop()
  }
}
