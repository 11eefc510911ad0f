package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the SemDeDup k-dial (the semantic sibling
  * of [[EmbScaleBench]]'s bits/bands dial): within-cell candidate
  * volume is Σ n_c·(n_c−1)/2 ≈ N²/(2k), so holding k fixed while N
  * grows a decade is the same mistake as holding LSH bits fixed —
  * per-cell population and pair volume go quadratic. The paper's
  * sizing is k ≈ N/target_cell_size.
  *
  * Reports, for a given (dir, k): the cell-population audit (cells,
  * max cell, exact within-cell pair count — measured from populations
  * WITHOUT executing the join, the DedupScaleAudit discipline), the
  * executed wall time of the full pair generation at τ = 0.85, and
  * recall on the generated fixtures' planted twin layer (vec_id ≡ 1
  * mod 250, cos ≈ 0.88–0.91 — tools.GenData).
  *
  * Usage: `runMain graft.tools.SemScaleBench [sfDir] [k] [audit|p2|p3…]`
  * — a third arg of `audit` skips the executed join and reports the
  * population-derived volume only (for geometries whose pair volume
  * the audit itself shows should not be executed — the
  * DedupScaleAudit loose-τ precedent); `pN` runs the executed join
  * with multi-probe blocking (probes = N, the recall dial — the
  * population audit still describes the single-assignment partition,
  * so the executed `pairs` count vs it shows the volume multiple).
  */
object SemScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val auditOnly = args.lift(2).contains("audit")
    val probes = args.lift(2).collect { case s if s.matches("p\\d+") => s.tail.toInt }
      .getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sem-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count() // warmup scan + the corpus size

    // cell-population audit: pair volume from populations only
    val (_, assigned) = graft.api.GraftOps
      .kmeansModel(emb, "vec_id", "embedding", k, 2)
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("bsz")).localCheckpoint(true)
    val r = sizes.agg(
      count(lit(1)).as("cells"),
      coalesce(max(col("bsz")), lit(0L)).as("max_cell"),
      coalesce(sum(expr("bsz * (bsz - 1) div 2")), lit(0L)).as("pairs"))
      .collect()(0)
    val (cells, maxCell, pairVol) = (r.getLong(0), r.getLong(1), r.getLong(2))

    if (auditOnly) {
      println(s"""{"metric":"sem_scale","sf_dir":"$sfDir","k":$k,"n":$n,"tau":0.85,""" +
        s""""cells":$cells,"max_cell":$maxCell,"pair_volume":$pairVol,""" +
        s""""executed":false}""")
      spark.stop(); return
    }

    // executed: full pair generation + dot products at τ = 0.85
    val t0 = System.nanoTime()
    val pairs = graft.api.GraftOps
      .semanticNearDups(emb, "vec_id", "embedding", 0.85, k, 2, probes)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val planted = emb.select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(250)) === 1)
      .select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"))
    val nPlanted = planted.count()
    val hit = pairs.join(planted, Seq("id_a", "id_b"), "left_semi").count()

    println(s"""{"metric":"sem_scale","sf_dir":"$sfDir","k":$k,"probes":$probes,""" +
      s""""n":$n,"tau":0.85,""" +
      s""""cells":$cells,"max_cell":$maxCell,"pair_volume":$pairVol,""" +
      s""""sec":${math.round(sec * 10000) / 10000.0},"pairs":$nPairs,""" +
      s""""planted":$nPlanted,"planted_hit":$hit}""")
    spark.stop()
  }
}
