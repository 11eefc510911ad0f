package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the wide-band embedding-dedup scale path
  * (BASELINE.md §sf1; the sf1 companion of EmbLshScaleSpec's
  * unit-scale proof).
  *
  * Runs `GraftOps.embeddingNearDups` at the production geometry
  * (bits = 12, bands = 24, τ = 0.85) over `<sfDir>/embeddings.parquet`
  * and reports wall time, pair count, and recall on the fixture's
  * planted twin layer (vec_id ≡ 1 mod 250, cos ≈ 0.88–0.91 — see
  * tools.GenData). Contrast with the declared narrow geometry's
  * q_dedup_embedding time in the same round's sf1 bench: same
  * construction, parameterized for the near-dup threshold instead of
  * the adversarial loose-τ regime.
  *
  * Usage: `runMain graft.tools.EmbScaleBench [sfDir] [bits] [bands]`
  * — bits/bands override the production geometry so the documented
  * scale dial (bits ≈ log2(N/occupancy), bands from target recall) is
  * measurable at any N: e.g. at sf10's 200 k vectors, (14, 28) holds
  * per-bucket occupancy where (12, 24) was tuned for 20 k.
  */
object EmbScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val bits = args.lift(1).map(_.toInt).getOrElse(12)
    val bands = args.lift(2).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-emb-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.embeddings(spark, sfDir)
    // warmup: scan + key computation once so the timed run measures
    // the operator, not first-touch parquet footer reads
    emb.count()

    val t0 = System.nanoTime()
    val pairs = graft.api.GraftOps
      .embeddingNearDups(emb, "vec_id", "embedding", 0.85, bits = bits, bands = bands)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // planted twin layer: (base, base+1) for vec_id ≡ 1 (mod 250)
    val planted = emb.select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(250)) === 1)
      .select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"))
    val nPlanted = planted.count()
    val hit = pairs.join(planted, Seq("id_a", "id_b"), "left_semi").count()

    println(s"""{"metric":"emb_scale_path","sf_dir":"$sfDir","bits":$bits,"bands":$bands,"tau":0.85,""" +
      s""""sec":${math.round(sec * 10000) / 10000.0},"pairs":$nPairs,""" +
      s""""planted":$nPlanted,"planted_hit":$hit}""")
    spark.stop()
  }
}
