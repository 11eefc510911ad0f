package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BPE merge-rounds dial (VERDICT r14 next-round #3):
  * wall-clock of [[graft.queries.TextOps.bpeLearn]] vs merge-round
  * count at a fixture. The declared keys run 4 rounds to stay
  * oracle-unrollable; production vocabularies are ~30 k merges, and
  * the loop is an O(rounds) driver-chained job sequence (one
  * vocabulary-sized pair agg + 1-row TakeOrdered + broadcast rewrite
  * + localCheckpoint per round) — this instrument finds where that
  * chain's fixed per-round cost dominates, i.e. the rounds ceiling of
  * the current greedy spelling (SCALE.md §BPE dial).
  *
  * One JSON line per rounds value: requested and actual rounds (the
  * loop stops early when the vocabulary is fully merged), final
  * vocabulary rows, total surviving symbol tokens (forces the final
  * frame), wall seconds, and per-round marginal seconds for the
  * segment beyond the previous measurement.
  *
  * Usage: `runMain graft.tools.BpeScaleBench <sfDir> [roundsCsv]`
  * (default rounds 4,16,64,256). Own-JVM discipline: run one fixture
  * per invocation; the 16m scan knob keeps the corpus wordcount pass
  * parallel on single-file fixtures.
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val roundsList = args.lift(1).getOrElse("4,16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val label = new java.io.File(sfDir).getName
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bpe-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    var prev: Option[(Int, Double)] = None
    roundsList.foreach { r =>
      val t0 = System.nanoTime()
      val (merges, v) = graft.queries.TextOps.bpeLearn(spark, sfDir, r)
      // consume: vocabulary rows + total surviving symbol tokens
      val row = v.select(count(lit(1)).as("n"),
        sum(size(split(trim(col("s")), "  "))).as("toks")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      val marginal = prev match {
        case Some((pr, pw)) if r > pr => (wall - pw) / (r - pr)
        case _ => wall / math.max(1, r)
      }
      prev = Some((r, wall))
      println(s"""{"metric":"bpe_dial","label":"$label","rounds":$r,""" +
        s""""actual_rounds":${merges.size},"vocab":${row.getLong(0)},""" +
        s""""sym_tokens":${row.getLong(1)},""" +
        s""""wall_sec":${math.round(wall * 100) / 100.0},""" +
        s""""marginal_sec_per_round":${math.round(marginal * 1000) / 1000.0}}""")
    }
    // the batched variant at equal merge budget: rounds × batch merges
    // in rounds driver steps — the lifted ceiling (qBpeMergesBatched).
    // r16: configs dial via arg 3 ("<rounds>x<batch>" csv; default the
    // r15 pair) so the production batch sizes (128/256) measure on the
    // wide-alphabet fixture, where the anti-chain can actually select
    // that many symbol-disjoint pairs per round. merges_per_round is
    // the selection density — the number the 31-word fixture capped.
    // ADVICE r16 #4: validate each segment instead of crashing with a
    // bare index/number exception on "8", "8x", or a trailing comma
    val batchedCfgs = args.lift(2).getOrElse("8x8,8x32")
      .split(",").map(_.trim).filter(_.nonEmpty).map { seg =>
        val p = seg.split("x")
        require(p.length == 2 && p.forall(s => s.nonEmpty && s.forall(_.isDigit)),
          s"malformed batched config '$seg' — expected '<rounds>x<batch>' csv, e.g. 8x8,8x256")
        (p(0).toInt, p(1).toInt)
      }.toSeq
    batchedCfgs.foreach { case (r, b) =>
      val t0 = System.nanoTime()
      val (merges, v) = graft.queries.TextOps.bpeLearnBatched(spark, sfDir, r, b)
      val nMerges =
        if (merges.isEmpty) 0L else merges.reduce(_.unionAll(_)).count()
      val row = v.select(count(lit(1)).as("n"),
        sum(size(split(trim(col("s")), "  "))).as("toks")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"bpe_dial_batched","label":"$label","rounds":$r,""" +
        s""""batch":$b,"merges":$nMerges,"vocab":${row.getLong(0)},""" +
        s""""sym_tokens":${row.getLong(1)},""" +
        s""""merges_per_round":${
          math.round(nMerges.toDouble / math.max(1, merges.size) * 10) / 10.0},""" +
        s""""wall_sec":${math.round(wall * 100) / 100.0},""" +
        s""""sec_per_merge":${
          math.round(wall / math.max(1L, nMerges) * 1000) / 1000.0}}""")
    }
    spark.stop()
  }
}
