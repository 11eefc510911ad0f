package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-volume / cap-engagement audit for the dedup blocking
  * structures (VERDICT r8 #4: the numbers that distinguish "bucketed"
  * from "quadratic with a small constant" at 100× are (a) how many
  * blocks/buckets exceed their caps and (b) how the candidate-pair
  * volume grows with N — both computable from bucket POPULATIONS
  * alone, i.e. one groupBy per structure, without executing any of
  * the quadratic candidate joins they feed).
  *
  * Audited structures (cap = the operator's committed guard):
  *  - 60-char prefix blocks (q_dedup_levenshtein / q_dedup_ngram —
  *    MaxBlockBucket)
  *  - both MinHash LSH band keys (q_dedup_minhash / q_dedup_clusters —
  *    MaxBandBucket)
  *  - rare-gram blocks (q_dedup_containment — inherently capped at
  *    df ≤ RareGramDf, so pairs/gram ≤ df·(df−1)/2 ≤ 10)
  *  - embedding LSH buckets, declared loose-τ geometry (6 bits ×
  *    21 bands) AND production wide-band geometry (12 × 24) — no cap
  *    by design; the volume growth IS the documented quadratic-vs-
  *    linear separation (EmbLsh scaladoc)
  *
  * `pairs_uncapped` = Σ_buckets b·(b−1)/2 — the exact number of
  * candidate pairs the equi join would emit with the guard off;
  * `pairs_capped` drops over-cap buckets, mirroring the broadcast
  * anti-join guards. An optional mega-cluster overlay (arg 3) unions
  * `megaN` identical boilerplate docs — the AdvFixture construction —
  * so cap ENGAGEMENT is demonstrable at any scale: uncapped volume
  * jumps by megaN·(megaN−1)/2 while capped volume is unchanged.
  *
  * Usage: `runMain graft.tools.DedupScaleAudit <sfDir> [label] [megaN]`
  * Output: one JSON line per structure (consumed into SCALE.md §100×).
  */
object DedupScaleAudit {

  /** Boilerplate text for the optional mega-cluster overlay — same
    * construction as test fixture AdvFixture (identical text ⇒ one
    * prefix block and one band bucket of size megaN). */
  val MegaText =
    "boilerplate terms of service header repeated verbatim across every document in this synthetic corpus"

  /** (n_buckets, max_bucket, buckets_over_cap, pairs_uncapped,
    * pairs_capped) from a (k → bsz) bucket-population frame.
    * DedupScaleAuditSpec proves pairs_uncapped ≡ the row count of the
    * real uncapped candidate join on the same blocking key, and that
    * capping subtracts exactly Σ_overcap b·(b−1)/2 — the instrument
    * itself is verified, not just the numbers it prints. */
  private[graft] def bucketStats(sizes: DataFrame, cap: Long): (Long, Long, Long, Long, Long) = {
    // every max/sum is coalesced: on an EMPTY sizes frame (a corpus
    // where no gram clears the df floor, say) those aggregates return
    // NULL and the getLong below would NPE the whole audit (ADVICE r9)
    // — an empty structure is a legitimate "all zeros" reading.
    val r = sizes.agg(
      count(lit(1)).as("n_buckets"),
      coalesce(max(col("bsz")), lit(0L)).as("max_bucket"),
      coalesce(sum(when(col("bsz") > cap, 1L).otherwise(0L)), lit(0L)).as("over_cap"),
      // `div`, not `/`: Spark's Divide returns double (and the product
      // of two consecutive ints is even, so div 2 is exact)
      coalesce(sum(expr("bsz * (bsz - 1) div 2")), lit(0L)).as("pairs_uncapped"),
      coalesce(sum(when(col("bsz") <= cap, expr("bsz * (bsz - 1) div 2"))
        .otherwise(0L)), lit(0L)).as("pairs_capped")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def bucketJson(name: String, sizes: DataFrame, cap: Long): String = {
    val (nb, mx, oc, pu, pc) = bucketStats(sizes, cap)
    s"""{"structure":"$name","cap":$cap,"n_buckets":$nb,""" +
      s""""max_bucket":$mx,"buckets_over_cap":$oc,""" +
      s""""pairs_uncapped":$pu,"pairs_capped":$pc}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val label = args.lift(1).getOrElse(new java.io.File(sfDir).getName)
    val megaN = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-dedup-scale-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    val base = graft.Tables.documents(spark, sfDir)
    val docs = if (megaN <= 0) base else {
      val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
      base.unionAll(spark.range(megaN).select(
        (col("id") + lit(maxId + 1)).as("doc_id"),
        lit(MegaText).as("text"), lit("en").as("lang"),
        lit("boilerplate").as("source"),
        lit(MegaText.length.toLong).as("n_chars")))
    }
    val nDocs = docs.count()
    def emit(line: String): Unit =
      println(s"""{"metric":"dedup_scale_audit","label":"$label","mega_n":$megaN,"docs":$nDocs,${line.drop(1)}""")

    // 1. prefix blocks (cap MaxBlockBucket)
    val prefixSizes = docs
      .select(lower(substring(col("text"), 1, 60)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("bsz"))
    emit(bucketJson("prefix_block", prefixSizes,
      graft.queries.DedupOps.MaxBlockBucket))

    // 2. MinHash band buckets (cap MaxBandBucket) — one corpus
    // signature pass feeds both band keys (localCheckpointed).
    val mh = graft.queries.DedupOps.minhashSignatures(docs)
    Seq(("minhash_band1", Seq("mh1", "mh2")), ("minhash_band2", Seq("mh3", "mh4")))
      .foreach { case (name, ks) =>
        val sizes = mh.groupBy(ks.map(col): _*).agg(count(lit(1)).as("bsz"))
        emit(bucketJson(name, sizes, graft.queries.DedupOps.MaxBandBucket))
      }

    // 3. rare-gram blocks (df ≤ RareGramDf is itself the cap; report
    // it as `cap` so pairs_capped ≡ pairs_uncapped by construction)
    val grams = graft.api.GraftOps.wordShingles(docs, "doc_id", "text")
    val rareSizes = grams.groupBy(col("gram")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= graft.queries.DedupOps.RareGramDf)
    emit(bucketJson("rare_gram_block", rareSizes,
      graft.queries.DedupOps.RareGramDf))

    // 4. embedding LSH buckets, both geometries (no mega overlay —
    // embeddings have no text). Bucket key embeds the band index, so
    // one groupBy covers all bands of a geometry.
    val embPath = s"$sfDir/embeddings.parquet"
    if (new java.io.File(embPath).exists()) {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val nEmb = emb.count()
      Seq(("emb_lsh_declared_6x21", graft.queries.EmbLsh.Bits, graft.queries.EmbLsh.Bands),
          ("emb_lsh_wide_12x24", 12, 24),
          // the re-dialed sf10 geometry (bits ≈ log2(N/occupancy))
          ("emb_lsh_wide_14x28", 14, 28)).foreach { case (name, bits, bands) =>
        val sizes = emb
          .select(explode(expr(s"graft_emb_lsh_keys(embedding, $bits, $bands)")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("bsz"))
        emit(bucketJson(s"$name(vecs=$nEmb)", sizes, Long.MaxValue))
      }
    }
    spark.stop()
  }
}
