package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Encode UNSEEN text with the STORED merge table (r17) — the half of
  * the tokenizer story the stored-vocabulary join cannot cover: the
  * vocab maps only training-corpus words, but production ingest
  * tokenizes text the learner never saw. [[graft.queries.TextOps
  * .bpeEncode]] is the per-word min-rank merge loop (O(len²·rounds-
  * present), vocabulary-size-INDEPENDENT — the property that makes a
  * 37 k-merge table viable per row); this instrument
  *
  *  1. loads the persisted merge table (tools.BpeVocabBuild's
  *     artifact) and broadcasts the (pair → global rank) map — a
  *     Zipf-bounded model, the same broadcast class as the DSIR /
  *     decontam models;
  *  2. SELF-CONSISTENCY: encodes a hash-sample of the stored VOCAB
  *     words and counts divergences from their stored spellings
  *     (must be 0 — the distributed twin of BpeSpec's exhaustive
  *     in-session pin);
  *  3. THROUGHPUT: encodes deterministic UNSEEN words (pairwise
  *     concatenations of corpus words — novel strings whose trained
  *     subunits must still merge) and reports words/sec and the
  *     compression (symbols emitted per input char).
  *
  * Usage: `runMain graft.tools.BpeEncodeNew [corpusDir] [rounds]
  * [batch] [sample]` — defaults testdata/bpewide, 600, 256, 20000.
  * Requires the artifact to exist (build once via BpeVocabBuild).
  */
object BpeEncodeNew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/bpewide")
    val rounds = args.lift(1).map(_.toInt).getOrElse(600)
    val batch = args.lift(2).map(_.toInt).getOrElse(256)
    val sample = args.lift(3).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bpe-encode-new")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    import graft.api.StagedArtifact
    val canonical = new java.io.File(dir).getCanonicalPath
    val key = StagedArtifact.pathKey(canonical)
    val root =
      s"${graft.queries.Layout.layoutRoot}/${new java.io.File(dir).getName}"
    val family = new java.io.File(s"$root/bpe_vocab_${key}_r${rounds}b$batch")
    // r18: publishes are versioned; the pointer names the live version
    val idxDir = StagedArtifact.currentVersionDir(family).getOrElse(
      sys.error(s"no stored vocabulary under $family — run BpeVocabBuild first"))

    // (pair → global rank), round-major rk-minor; Zipf-bounded model
    val ranks = spark.read.parquet(new java.io.File(idxDir, "merges").getPath)
      .filter(col("cnt") > 0)
      .select(col("round"), col("rk"), col("a"), col("b"))
      .collect()
      .map(r => (r.getString(2), r.getString(3)) ->
        (r.getInt(0) * 1000000 + r.getInt(1)))
      .toMap
    val bRanks = spark.sparkContext.broadcast(ranks)

    // 2: self-consistency over a deterministic vocab sample. The hash
    // filter alone bounds the sample (~10% of the vocabulary) — the
    // r17 cut added `.limit(sample)`, which without an ordering is
    // non-deterministic ACROSS JOBS, and the count ran as a second
    // job: the reported vocab_words could describe a different row
    // set than the one encoded (ADVICE r17 #3). One job now computes
    // (rows, divergences) over the self-same row set; `sample` only
    // dials the hash filter's modulus.
    val vocab = spark.read.parquet(new java.io.File(idxDir, "vocab").getPath)
    val vMod = math.max(1L, vocab.count() / math.max(1, sample))
    val vSample = vocab
      .filter(expr(s"pmod(xxhash64(s), ${vMod}L) = 0"))
      .select(col("s")).as[String]
    val t1 = System.nanoTime()
    // fold with an identity, not Dataset.reduce (ADVICE r18 #3): a
    // small vocabulary or large `sample` can make the pmod filter
    // match ZERO rows, and reduce on an empty Dataset throws
    // UnsupportedOperationException — the tool should report
    // vocab_words=0, not crash
    val (nV, diverged) = vSample.mapPartitions { it =>
      val rk = bRanks.value
      it.map { s =>
        val spelled = s.trim.split("  ").toVector
        val enc = graft.queries.TextOps.bpeEncode(s.replace(" ", ""), rk)
        (1L, if (enc == spelled) 0L else 1L)
      }
    }.rdd.fold((0L, 0L))((x, y) => (x._1 + y._1, x._2 + y._2))
    println(s"""{"metric":"bpe_encode_consistency","vocab_words":$nV,""" +
      s""""diverged":$diverged,"merges":${ranks.size},""" +
      s""""wall_sec":${math.round((System.nanoTime() - t1) / 1e7) / 100.0}}""")

    // 3: throughput on UNSEEN words — concatenations of adjacent
    // corpus words (novel strings; trained subunits must still merge)
    val words = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .limit(2 * sample).as[String].collect()
    val unseen = words.grouped(2).collect { case Array(a, b) => a + b }.toSeq
    val ds = spark.createDataset(unseen).repartition(32)
    ds.count() // materialize + warm
    val t2 = System.nanoTime()
    val (nWords, nSyms, nChars) = ds.mapPartitions { it =>
      val rk = bRanks.value
      it.map { w => (1L, graft.queries.TextOps.bpeEncode(w, rk).size.toLong,
        w.length.toLong) }
    }.rdd.fold((0L, 0L, 0L))((x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3))
    val sec = (System.nanoTime() - t2) / 1e9
    println(s"""{"metric":"bpe_encode_unseen","words":$nWords,""" +
      s""""symbols":$nSyms,"chars":$nChars,""" +
      s""""chars_per_symbol":${math.round(nChars * 100.0 / math.max(1L, nSyms)) / 100.0},""" +
      s""""wall_sec":${math.round(sec * 100) / 100.0},""" +
      s""""words_per_sec":${math.round(nWords / sec)}}""")
    spark.stop()
  }
}
