package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build/encode/search wall split for the PQ keys (VERDICT r14 #2
  * follow-through): q_knn_pq's sf10 wall was attributed to the
  * full-corpus codebook build, but the sampled-build key recovered
  * only ~12% of it — this instrument times the three phases
  * separately so SCALE.md carries the measured split, not the guess.
  * The Lloyd chains are eager (localCheckpoint per round), so phase
  * (a) is simply the construction wall of the codebook frames.
  *
  * Usage: `runMain graft.tools.PqDecomp <sfDir> [sampled]`.
  */
object PqDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val sampled = args.lift(1).contains("sampled")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-pq-decomp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    import graft.api.GraftOps
    import graft.queries.VectorOps._

    if (args.lift(1).contains("key")) {
      // construct (eager Lloyd chains) vs consume split of the
      // DECLARED key, to reconcile with the phase split below
      val t0 = System.nanoTime()
      val df = graft.queries.VectorOps.qKnnPq(spark, dir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      val n2 = df.count()
      val t3 = System.nanoTime()
      println(f"PQDECOMP key_construct ${(t1 - t0) / 1e9}%.2f s")
      println(f"PQDECOMP key_consume1  ${(t2 - t1) / 1e9}%.2f s (n=$n)")
      println(f"PQDECOMP key_consume2  ${(t3 - t2) / 1e9}%.2f s (n=$n2)")
      spark.stop(); return
    }
    val emb = graft.Tables.embeddings(spark, dir)
    val train =
      if (sampled) GraftOps.sampleByHash(emb, "cast(vec_id as string)", PqSamplePct)
      else emb
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PQDECOMP $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val slices = (0 until PqM).map(s => s"slice(embedding, ${s * PqSub + 1}, $PqSub)")
    var cents: Seq[org.apache.spark.sql.DataFrame] = null
    t("build") {
      cents = slices.map(sl => GraftOps.kmeansModel(train, "vec_id", sl, PqK, PqIters)._1)
      cents.foreach(_.count()) // chains are eager; this only confirms
    }
    var coded = emb.select(col("vec_id").as("neighbor"), col("embedding"))
    t("encode") {
      cents.zip(slices).zipWithIndex.foreach { case ((cent, sl), s) =>
        coded = coded.crossJoin(broadcast(GraftOps.centroidArray(cent)))
          .withColumn(s"pq$s", GraftOps.cellColumn(sl)).drop("__cs")
      }
      coded = coded.drop("embedding").localCheckpoint(true)
    }
    t("search") {
      val luts = cents.zip(slices).zipWithIndex.map { case ((cent, sl), s) =>
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as(s"p$s"),
            expr(s"transform($sl, x -> cast(x as double))").as("__q"))
          .crossJoin(broadcast(cent))
          .select(col(s"p$s"), col("__cell").as(s"c$s"),
            round(expr("graft_num_dot(__q, __c)"), 6).as(s"d$s"))
      }
      val scored = luts.zipWithIndex.foldLeft(coded) { case (acc, (lut, s)) =>
        val cond =
          if (s == 0) col("pq0") === col("c0")
          else col(s"pq$s") === col(s"c$s") && col(s"p$s") === col("p0")
        acc.join(broadcast(lut), cond)
      }
        .filter(col("neighbor") =!= col("p0"))
        .withColumn("adc", round(col("d0") + col("d1") + col("d2") + col("d3"), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p0")).orderBy(col("adc").desc, col("neighbor"))
      val n = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).count()
      println(s"PQDECOMP search_rows $n")
    }
    spark.stop()
  }
}
