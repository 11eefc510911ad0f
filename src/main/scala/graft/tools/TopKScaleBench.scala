package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-isolated top-k-per-group scale measurement: window
  * row_number idiom vs the custom partial/final [[graft.plans
  * .TopKPerGroup]] node, on the SAME cached input — the decomposition
  * VERDICT r10 #4 asked for. The declared keys (q_window_topk /
  * q_topk_custom) wrap the operator in a customer⋈orders join that
  * DOMINATES their sf10 walls (15.4 vs 15.7 s — the "6.4×/decade
  * window class" of SCALE.md §100×-full is mostly the join's decade),
  * so the pair cannot separate the idioms; this harness caches the
  * joined projection first and times only the top-k stage.
  *
  * Two group geometries, because they are the two 100 TB regimes:
  *  - `custkey`: high cardinality (~N/10 groups of ~10 rows). The
  *    window idiom's per-partition sort is many tiny runs; the custom
  *    node's map-side partial cannot reduce (each mapper sees ~1 row
  *    per group) and is pure overhead. Expected: parity-ish.
  *  - `priority`: 5 hot groups. The window idiom plans Exchange(5
  *    partitions) — at most 5 tasks sort the WHOLE table regardless
  *    of cluster width (the straggler shape that motivated the
  *    custom node); the partial ships ≤ k rows per group per mapper
  *    (5·k·32 rows total) and the final is trivial. Expected: the
  *    custom node wins by the core count, growing with data size.
  *
  * Usage: `runMain graft.tools.TopKScaleBench [sfDir]`. One JSON line:
  * `{"metric":"topk_scale","sf_dir":..,"rows":N,
  *   "custkey":{"window_sec":..,"custom_sec":..},
  *   "priority":{"window_sec":..,"custom_sec":..}}`
  */
object TopKScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-topk-scale")
      .config("spark.sql.shuffle.partitions", "32")
      // single-file fixtures scan as size/128MB tasks without this
      // (KeyBench carries the same knob + rationale)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice"))
      .persist()
    val rows = o.count() // materialize the cache outside every timing

    def median3(f: () => Long): Double = {
      f() // warmup
      Seq.fill(3) {
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }

    def windowTopk(g: String): DataFrame = {
      val w = Window.partitionBy(col(g))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    }
    def customTopk(g: String): DataFrame =
      graft.plans.TopKPerGroup(o, Seq(g),
        Seq(graft.plans.TopKPerGroup.Ord("o_totalprice", desc = true),
            graft.plans.TopKPerGroup.Ord("o_orderkey")), 3)

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

    val out = Seq("o_custkey" -> "custkey", "o_orderpriority" -> "priority")
      .map { case (g, label) =>
        val wSec = median3(() => windowTopk(g).count())
        val cSec = median3(() => customTopk(g).count())
        // both idioms must keep the same rows
        require(windowTopk(g).count() == customTopk(g).count(),
          s"row-count mismatch on $label")
        s""""$label":{"window_sec":${fmt(wSec)},"custom_sec":${fmt(cSec)}}"""
      }.mkString(",")

    println(s"""{"metric":"topk_scale","sf_dir":"$sfDir","rows":$rows,$out}""")
    spark.stop()
  }
}
