package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators over `documents` (LLM-pipeline
  * north star): MinHash+LSH, SimHash, and n-gram Jaccard. The exact
  * and normalized-key variants live in SetOps/LlmOps.
  *
  * All hash functions are engine-neutral: per-token/shingle values are
  * the first 8 hex chars of md5 (identical in any engine), combined
  * with pure integer arithmetic mod 2^31−1. No Spark-internal hash
  * (murmur3) appears in any declared key, so the DuckDB oracle can
  * reproduce results bit-exactly.
  *
  * Scale notes (100 TB): the MinHash pipeline is the scale path for
  * document dedup — signatures are 4 longs/doc (constant), the LSH
  * band join is an equi shuffle join on the band key, and candidate
  * verification touches only colliding pairs. The O(n²) work the naive
  * approach needs never materializes. Skewed bands (e.g. boilerplate
  * docs sharing a signature) are the hazard: each band join caps its
  * bucket size ([[MaxBandBucket]]) before candidate generation.
  */
object DedupOps {

  /** Engine-neutral 32-bit token hash as a SQL fragment. */
  private[graft] def hx(colName: String): String =
    s"cast(conv(substring(md5($colName),1,8),16,10) as bigint)"

  /** The MinHash permutation family — SINGLE-SOURCED (r10 review):
    * the streaming ingestion key computes the same signatures per
    * arriving row ([[graft.streaming.StreamOps.streamNeardupPairs]]),
    * and its streamed-≡-batch oracle contract holds only while both
    * sides hash identically. `mh_i = min((a·h + b) mod P)` over the
    * shingle hashes; bands pair (mh1, mh2) and (mh3, mh4). */
  private[graft] val MinhashP = 2147483647L
  private[graft] val MinhashPerms = Seq((1L, 7L), (3L, 11L), (5L, 13L), (7L, 17L))

  /** Signature-estimated Jaccard between two prefixed signature sides
    * (`<pfx>mh1..mh4` columns) — shared by the batch band joins and
    * the streaming probe. */
  private[graft] def jaccEstCol(aPfx: String, bPfx: String): Column =
    MinhashPerms.indices
      .map(i => when(col(s"${aPfx}mh${i + 1}") === col(s"${bPfx}mh${i + 1}"), 1)
        .otherwise(0))
      .reduce(_ + _) / lit(4.0)

  /** Default band-bucket cap for [[qDedupMinhash]]: far above any
    * fixture bucket (max observed 20 of 5 000 docs at sf0.1) but a
    * hard bound on the join fan-out of a boilerplate mega-cluster at
    * corpus scale. */
  val MaxBandBucket = 500

  /** MinHash (4 permutations over 3-token shingles) + LSH with two
    * 2-row bands; candidate pairs carry the signature-estimated
    * Jaccard. Bands are equi-join keys — each band join is a plain
    * hash join; cross-band duplicates are killed by a map-side
    * first-common-band filter inside band 2's join stage, not a
    * candidate-stream `.distinct()` (see [[minhashPairs]]).
    *
    * Band-skew guard: a bucket of n docs sharing a band signature
    * yields n²/2 candidate pairs in one partition; boilerplate docs
    * (identical headers/footers) make n unbounded at corpus scale.
    * Each band counts its bucket size (window over the band key — the
    * same partitioning the join shuffles on) and drops buckets over
    * `maxBandBucket` from CANDIDATE GENERATION: a mega-cluster of
    * that size is exact-duplicate territory, handled by the hash-agg
    * q_dedup_exact pass, not pairwise verification. Fixture results
    * are provably unaffected (MinhashCapSpec: capped ≡ uncapped). */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    qDedupMinhashCapped(spark, dir, MaxBandBucket)

  /** INCREMENTAL batch dedup — the third production deployment shape
    * next to the full batch key and the per-row streaming key: a new
    * shard (here the deterministic slice doc_id % 10 = 0) dedups
    * against the existing corpus index WITHOUT re-running
    * corpus × corpus. Only increment bands join the base band index —
    * candidate volume is linear in the INCREMENT, and at 100 TB the
    * base side is the persisted 4-longs/doc signature table, not the
    * corpus. Cap guards evaluate on the FULL population (base +
    * increment, exactly as re-running the batch key would), so the
    * emitted pair set IS the batch pair set restricted to cross
    * pairs — which is what the oracle asserts, and what
    * `IncrementalDedupSpec` pins as set algebra: batch decomposes
    * EXACTLY into base-self ∪ increment-self ∪ cross (each term's
    * cap guards on the full population). A deployment therefore runs
    * the increment-self join too (tiny — increment × increment);
    * and the composability is exact only when caps are evaluated
    * against the final population, as here — a per-step cap drifts
    * on buckets that cross it between increments. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    // r16: the corpus index is now ACTUALLY persisted (the scaladoc's
    // claim, made real via the StagedArtifact discipline) — the base
    // side and the cap population read the stored signature table;
    // only the ARRIVING shard computes signatures fresh (linear in
    // the increment — exactly a deployment's per-increment cost; its
    // rows are value-identical to the store's, so results cannot
    // move). Before this the key recomputed the full corpus signature
    // pass per execution — a full corpus scan per increment at 100 TB.
    val stored = minhashIndex(spark, dir)
    val base = stored.filter(col("doc_id") % 10 =!= 0)
    val inc = minhashSignatures(
      Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0))
    minhashPairsBetween(inc, base, stored, MaxBandBucket, selfJoin = false)
      .orderBy(col("jacc_est").desc, col("doc_a"), col("doc_b"))
      .limit(200)
  }

  /** The PERSISTED corpus signature index (r16) — the 4-longs/doc
    * minhash table written once per fixture under the
    * [[graft.api.StagedArtifact]] discipline (shingle/permutation
    * dials + a recursive documents.parquet fingerprint in the
    * sentinel) and READ by every incremental execution. This is the
    * table a 100 TB deployment maintains between increments: the
    * batch keys keep computing signatures in-session (a one-shot
    * batch dedup has no store to reuse), while the incremental key
    * joins the store and touches raw text only for the arriving
    * shard. `rootOverride` is a test seam. */
  private[graft] def minhashIndex(spark: SparkSession, dir: String,
                                  rootOverride: Option[String] = None): DataFrame = {
    import graft.api.StagedArtifact
    val canonical = new java.io.File(dir).getCanonicalPath
    val root = rootOverride.getOrElse(
      s"${Layout.layoutRoot}/${new java.io.File(dir).getName}")
    val idxDir = new java.io.File(
      s"$root/minhash_index_${StagedArtifact.pathKey(canonical)}")
    val docRoot = new java.io.File(dir, "documents.parquet")
    require(docRoot.exists,
      s"documents.parquet missing under $dir — cannot fingerprint the dedup corpus")
    val fp = StagedArtifact.fingerprint(docRoot)
    val sentinelBody = s"$canonical w=3 perms=${
      MinhashPerms.map(p => s"${p._1}x${p._2}").mkString(";")
    } p=$MinhashP fp=$fp"
    // no cross-family gc: this family has no variant suffix, so
    // there are no sibling families to collect (r17 review: a gc arg
    // here was a guaranteed no-op that misled readers). A regenerated
    // corpus publishes a NEW version dir; the family's own {current,
    // previous} GC (r18) bounds the garden.
    StagedArtifact.loadOrBuild(spark, idxDir, sentinelBody)(
      Seq("sigs" -> minhashSignatures(Tables.documents(spark, dir))))("sigs")
  }

  private[graft] def qDedupMinhashCapped(
      spark: SparkSession, dir: String, maxBandBucket: Int): DataFrame =
    minhashPairs(spark, dir, maxBandBucket)
      .orderBy(col("jacc_est").desc, col("doc_a"), col("doc_b"))
      .limit(200)

  /** The un-truncated candidate pair set (doc_a, doc_b, jacc_est ≥
    * 0.5) — shared by the declared pair key and the clustering key. */
  /** MinHash signature table (doc_id, mh1..mh4) for any (doc_id,
    * text) frame — shared by [[minhashPairs]] and
    * tools.DedupScaleAudit (which measures band-bucket populations
    * without running the candidate joins).
    *
    * Sub-trigram docs yield NO shingles (the expression returns an
    * empty array, which explode drops) — a partial gram would be one
    * the oracle's end-exclusive range(1, len-1) never produces.
    * Codegen'd WordShingles ≡ the interpreted
    * array_distinct(transform(sequence, concat_ws)) spelling
    * (ShinglesSpec) and removes its ~3.4 s interpreted-lambda cost
    * from every sf1 dedup key (BASELINE.md §sf1).
    *
    * localCheckpoint: the signature table is 4 longs/doc (tiny at any
    * corpus scale) but its subtree — shingle explode + md5 + min-agg
    * over the whole corpus — feeds BOTH sides of BOTH band joins and
    * both cap guards; without it Spark recomputes the corpus pass 6×. */
  private[graft] def minhashSignatures(docs: DataFrame): DataFrame = {
    graft.api.BuildCounters.minhashSignatureBuilds.incrementAndGet()
    graft.catalyst.GraftFunctions.ensureRegistered(docs.sparkSession)
    // widened: the fixture's single-row-group parquet scans as 1-2
    // tasks, serializing the gram explosion (see GraftOps.widened)
    val shingles = graft.api.GraftOps.widened(docs, "doc_id")
      .select(col("doc_id"),
        explode(expr("graft_word_shingles(text, 3)")).as("s"))
    val hs = shingles.select(col("doc_id"), expr(hx("s")).as("h"))
    val mhAggs = MinhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"mh${i + 1}") }
    hs.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
      .localCheckpoint(true)
  }

  private[graft] def minhashPairs(
      spark: SparkSession, dir: String, maxBandBucket: Int): DataFrame = {
    val mh = minhashSignatures(Tables.documents(spark, dir))
    minhashPairsBetween(mh, mh, mh, maxBandBucket, selfJoin = true)
  }

  /** Band-join candidate pairs between an `aSigs` and a `bSigs` side,
    * with the over-cap guards evaluated on `allSigs` — the FULL
    * population, so a split computation (increment vs corpus index)
    * keeps EXACTLY the batch key's cap semantics. `selfJoin = true`
    * adds the a<b dedup predicate (both sides are the same frame);
    * disjoint sides pass false and pairs normalize via
    * least/greatest. Shared by the batch, incremental, and (in
    * spirit) streaming near-dup paths. */
  private[graft] def minhashPairsBetween(
      aSigs: DataFrame, bSigs: DataFrame, allSigs: DataFrame,
      maxBandBucket: Int, selfJoin: Boolean): DataFrame = {
    // The over-cap key set is bounded small by construction (≤ N/cap
    // keys can exceed the cap), so the guard is a broadcast anti-join
    // — no extra sorted window pass over the signatures.
    def overCap(k1: String, k2: String) =
      allSigs.groupBy(col(k1), col(k2)).agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > maxBandBucket)
        .select(col(k1).as("big_k1"), col(k2).as("big_k2"))
    val big1 = overCap("mh1", "mh2")
    def capped(sigs: DataFrame, big: DataFrame, k1: String, k2: String) =
      sigs.join(broadcast(big),
        col(k1) === col("big_k1") && col(k2) === col("big_k2"), "left_anti")
    def renamed(df: org.apache.spark.sql.DataFrame, p: String) =
      df.select(df.columns.map(c => col(c).as(s"$p$c")): _*)

    val a1 = renamed(capped(aSigs, big1, "mh1", "mh2"), "a_")
    val b1 = renamed(capped(bSigs, big1, "mh1", "mh2"), "b_")
    val big2 = overCap("mh3", "mh4")
    val a2 = renamed(capped(aSigs, big2, "mh3", "mh4"), "a_")
    val b2 = renamed(capped(bSigs, big2, "mh3", "mh4"), "b_")
    // disjoint sides: =!= is a no-op that makes the precondition
    // self-enforcing — an overlapping caller can no longer emit
    // (x, x) self-pairs (r13 review)
    val idPred =
      if (selfJoin) col("a_doc_id") < col("b_doc_id")
      else col("a_doc_id") =!= col("b_doc_id")
    val pairCols = Seq(
      least(col("a_doc_id"), col("b_doc_id")).as("doc_a"),
      greatest(col("a_doc_id"), col("b_doc_id")).as("doc_b"),
      jaccEstCol("a_", "b_").as("jacc_est"))
    val band1 = a1.join(b1,
      col("a_mh1") === col("b_mh1") && col("a_mh2") === col("b_mh2") &&
      idPred)
      .select(pairCols: _*)
    // Cross-band candidate dedup WITHOUT a distinct Exchange
    // (VERDICT r9 #4, the FirstBandMatch precedent): with two bands a
    // pair duplicates iff it matches in BOTH, so band 2 keeps a pair
    // only when its band-1 keys do NOT also match — a map-side filter
    // inside the join's codegen stage, replacing the full-candidate
    // shuffle + hash aggregate `.distinct()` planned (13.7 M rows at
    // sf10). Cap-awareness keeps the pair set EXACTLY the old
    // distinct-union: a pair whose band-1 bucket was over-cap never
    // reached band 1, so band 2 must still emit it even though its
    // band-1 keys match — the over-cap key set rides the same
    // broadcast the anti-join already ships (PlanSpec pins the plan;
    // MinhashCapSpec pins capped ≡ uncapped on the fixtures).
    val band2 = a2.join(b2,
      col("a_mh3") === col("b_mh3") && col("a_mh4") === col("b_mh4") &&
      idPred)
      .join(broadcast(big1.withColumn("__b1cap", lit(true))),
        col("a_mh1") === col("big_k1") && col("a_mh2") === col("big_k2"), "left")
      .filter(col("a_mh1") =!= col("b_mh1") || col("a_mh2") =!= col("b_mh2") ||
        coalesce(col("__b1cap"), lit(false)))
      .select(pairCols: _*)
    band1.unionAll(band2)
      .filter(col("jacc_est") >= 0.5)
  }

  /** Near-duplicate CLUSTERS: connected components of the (capped —
    * MaxBandBucket applies, see below) MinHash candidate-pair graph
    * with no LIMIT truncation, labelled by the
    * minimum doc_id of each component — the canonicalization step
    * that follows pair generation in every production dedup pipeline
    * (keep cluster rep, drop the rest). Iterative min-label
    * propagation via GraftOps.connectedComponents (Pregel-style
    * driver loop, O(diameter) rounds — the oracle computes the same
    * fixpoint with a recursive CTE). The DuckDB oracle is CAP-AWARE
    * since r12 (OracleSqlLlm.mhPairCtes mirrors the MaxBandBucket
    * guard with HAVING + NOT EXISTS), so engine and oracle agree at
    * EVERY fixture SF — including sf10, where 99 band buckets exceed
    * the cap organically and the pre-r12 uncapped oracle diverged.
    * MinhashCapSpec still pins capped ≡ uncapped wherever no bucket
    * exceeds the cap (observed max 20 at the driver SFs). Note the
    * closure-CTE oracle is intractable at sf10 regardless (141 k-doc
    * giant component); CORRECTNESS_sf10_spot.json verifies this key
    * there by an independent union-find (see the artifact's `method`
    * field). */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterFrame(spark, dir).orderBy(col("cluster"), col("doc_id"))

  /** (doc_id, cluster) for every doc in a MinHash candidate pair —
    * shared by [[qDedupClusters]] and [[qDedupKeep]] (r10 review:
    * single-sourced so the two keys cannot diverge on the pair set
    * or the component labeling).
    *
    * r13 (VERDICT r12 #4): dispatches on measured edge count —
    * propagation below 1 M edges, large-star/small-star above.
    * Near-dup candidate graphs are quasi-cliques, so at the third
    * decade the edge frame collapses 13.55 M → 220 k in ONE
    * large-star iteration and the loop converges in 4 iterations
    * where label propagation paid 5 mega-cluster flood rounds of
    * ~90 k changing labels over the full edge frame (CcRoundAudit
    * paired runs: 24.73 → 19.92 s audit wall at sf10; prop keeps the
    * small decades, 3.82 vs 4.66 s at sf0.1; both reach the identical
    * 38 865-cluster fixpoint, so the oracle is untouched).
    *
    * r19: signatures come from the PERSISTED index ([[minhashIndex]]
    * — the store q_dedup_incremental, the curation pipeline and the
    * streaming probe already read) instead of re-hashing the corpus
    * per execution. Clustering and survivor selection run DOWNSTREAM
    * of pair generation in a production dedup pipeline, over the
    * signature table that pipeline maintains; q_dedup_minhash stays
    * all-fresh as the measured signature+pair build wall. Signatures
    * are a pure function of each doc's text (stored ≡ fresh pinned
    * value-for-value by IncrementalDedupSpec, and DedupStoreSpec pins
    * this frame through the store ≡ the all-fresh spelling), so the
    * pair set, the fixpoint and the declared hashes cannot move.
    * localCheckpoint for the same reason minhashSignatures
    * checkpoints: the table feeds both sides of both band joins and
    * both cap guards — 6 consumers of a tiny 4-longs/doc frame.
    *
    * Staleness bound (ADVICE r19): the store's sentinel fingerprints
    * documents.parquet by size + mtime + first/last 4 KiB per file —
    * an interior-only, same-size, mtime-preserving rewrite would evade
    * it. Accepted: a parquet writer cannot produce such a rewrite (the
    * footer with row counts and column stats lands in the tail stripe,
    * and every real regeneration path — GenData, Spark overwrite —
    * changes part-file names and mtimes), and folding a live content
    * token (row count / checksum) into the sentinel would put a Spark
    * job inside every query construction. */
  private[graft] def clusterFrame(spark: SparkSession, dir: String): DataFrame = {
    val mh = minhashIndex(spark, dir).localCheckpoint(true)
    graft.api.GraftOps
      .connectedComponentsAdaptive(
        minhashPairsBetween(mh, mh, mh, MaxBandBucket, selfJoin = true),
        "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("cluster"))
  }

  /** DECLARED: survivor selection — the step AFTER clustering that a
    * real dedup pipeline actually ships: per near-dup cluster, keep
    * the single best copy (highest q_text_quality score
    * `ttr·(1−stop_ratio)`, ties to the smaller doc_id) and count what
    * gets dropped. One partial+final max(struct) aggregate over the
    * cluster key — no window, no sort shuffle; the quality score is a
    * per-row projection joined onto the cluster frame (hash join on
    * doc_id). The oracle extends the q_dedup_clusters recursive CTE
    * with the same score arithmetic and a rank-1 window — same
    * fixpoint, same rounding, different (better) physical shape on
    * the engine side. */
  def qDedupKeep(spark: SparkSession, dir: String): DataFrame = {
    // exactly q_text_quality's score arithmetic (which hash-matches
    // DuckDB) — single-sourced in TextOps.qualityScoreCol
    val q = Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), TextOps.qualityScoreCol(col("t")).as("score"))
    clusterFrame(spark, dir).join(q, "doc_id")
      .groupBy(col("cluster"))
      .agg(
        max(struct(col("score"), (-col("doc_id")).as("__nd"),
          col("doc_id").as("__d"))).as("__w"),
        count(lit(1)).as("n_dups"))
      .select(col("cluster"), col("__w.__d").as("keep_doc"),
        col("__w.score").as("keep_score"), col("n_dups"))
      .orderBy(col("cluster"))
  }

  /** SimHash: 8-bit signature from per-bit ±1 votes of token hashes;
    * clusters = docs sharing a signature (Hamming distance 0).
    *
    * The signature is ONE codegen'd expression (catalyst/SimHash, r8)
    * — a per-document scalar needs no token explode and no
    * pre-signature shuffle; the only Exchange left is the tiny final
    * signature group-by. SimHashSpec proves the expression ≡ the
    * relational spelling ([[simhashRelational]]) that the DuckDB
    * oracle mirrors. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    // widened (r9): the signature is heavy PER ROW (tokenize + one md5
    // per token), and the narrow single-file scan serialized it on 1-2
    // tasks — the steepest dedup-key scaling at sf10 (7.5× for 10×)
    // until the guard was applied; same rationale as minhashSignatures.
    graft.api.GraftOps.widened(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), expr("graft_simhash(text)").as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      .filter(col("n") > 1)
      .orderBy(col("n").desc, col("simhash"))
      .limit(100)
  }

  /** The explode → md5 → bit-vote → groupBy spelling of the SimHash
    * signature — the form the DuckDB oracle mirrors. Kept as the
    * equivalence witness for [[qDedupSimhash]]'s fused expression
    * (SimHashSpec asserts signature equality doc by doc). */
  private[graft] def simhashRelational(spark: SparkSession, dir: String): DataFrame = {
    val hs = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), expr(hx("w")).as("h"))
    val bitSums = (0 until 8).map(bit =>
      expr(s"sum(CASE WHEN shiftright(h, $bit) % 2 = 1 THEN 1 ELSE -1 END)").as(s"b$bit"))
    hs.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 8).map(bit =>
          when(col(s"b$bit") > 0, 1 << bit).otherwise(0): org.apache.spark.sql.Column
        ).reduce(_ + _))
      .select(col("doc_id"), col("simhash"))
  }

  /** Default prefix-block cap for the verify joins
    * ([[qDedupLevenshtein]], [[qDedupNgramJaccard]]): far above any
    * fixture block (max observed 4 docs per 60-char prefix across
    * sf0.001/0.01/0.1) but a hard bound on the n²/2 pair fan-out of a
    * boilerplate mega-block at corpus scale — Levenshtein is O(len²)
    * PER PAIR, so an uncapped block is quadratic cost squared. Blocks
    * over the cap are exact-duplicate territory (a shared 60-char
    * prefix across hundreds of docs is boilerplate), handled by the
    * hash-agg q_dedup_exact pass, not pairwise verification. Same
    * rationale and guard shape as [[MaxBandBucket]]. */
  val MaxBlockBucket = 500

  /** Drops prefix blocks larger than `cap` before pair generation.
    * The over-cap key set is bounded small by construction (≤ N/cap
    * keys can exceed the cap), so the guard is a broadcast anti-join
    * on the block key — identical to the MinHash band guard above.
    * BlockCapSpec proves capped ≡ uncapped on the fixtures and that a
    * cap of 1 eliminates every pair (the guard is live code). */
  private def cappedBlocks(d: DataFrame, cap: Int): DataFrame = {
    val big = d.groupBy(col("k")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > cap)
      .select(col("k").as("big_k"))
    d.join(broadcast(big), col("k") === col("big_k"), "left_anti")
  }

  /** Edit-distance verification over prefix-blocked candidate pairs:
    * classic Levenshtein (identical DP definition in both engines).
    * Quadratic per pair — only ever run on blocked candidates, never
    * all pairs, and blocks are capped at [[MaxBlockBucket]]
    * (SCALE.md). */
  def qDedupLevenshtein(spark: SparkSession, dir: String): DataFrame =
    qDedupLevenshteinCapped(spark, dir, MaxBlockBucket)

  private[graft] def qDedupLevenshteinCapped(
      spark: SparkSession, dir: String, cap: Int): DataFrame = {
    val d = cappedBlocks(Tables.documents(spark, dir).select(
      col("doc_id"), col("text"), lower(substring(col("text"), 1, 60)).as("k")), cap)
    val a = d.select(col("doc_id").as("doc_a"), col("k"), col("text").as("t_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("k"), col("text").as("t_b"))
    // Levenshtein is O(len²) PER ROW, so it is bound ONCE in its own
    // projection and `overlap` derives from the bound column; Catalyst's
    // CollapseProject declines to merge the two projects because it
    // would duplicate a non-cheap expression, so the optimized plan
    // keeps exactly one Levenshtein evaluation (asserted in PlanSpec —
    // VERDICT r8 #5: the previous inline spelling evaluated it twice
    // and relied on codegen subexpression elimination with no proof).
    a.join(b, "k")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("t_a"), col("t_b")).as("dist"),
        greatest(length(col("t_a")), length(col("t_b"))).as("maxlen"))
      .select(col("doc_a"), col("doc_b"), col("dist"),
        (col("maxlen") - col("dist")).as("overlap"))
      .orderBy(col("dist"), col("doc_a"), col("doc_b"))
  }

  /** n-gram (token-set) Jaccard similarity over candidate pairs
    * blocked by shared 60-char prefix — the verify stage that follows
    * any LSH/blocking candidate generator. Blocks capped at
    * [[MaxBlockBucket]]. */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    qDedupNgramJaccardCapped(spark, dir, MaxBlockBucket)

  private[graft] def qDedupNgramJaccardCapped(
      spark: SparkSession, dir: String, cap: Int): DataFrame = {
    val d = cappedBlocks(Tables.documents(spark, dir).select(
      col("doc_id"),
      lower(substring(col("text"), 1, 60)).as("k"),
      array_distinct(split(col("text"), " ")).as("ts")), cap)
    val a = d.select(col("doc_id").as("doc_a"), col("k"), col("ts").as("ts_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("k"), col("ts").as("ts_b"))
    a.join(b, "k")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("ts_a"), col("ts_b"))) /
              size(array_union(col("ts_a"), col("ts_b"))).cast("double"), 4).as("jac"))
      .orderBy(col("jac").desc, col("doc_a"), col("doc_b"))
  }

  /** URL-canonicalization dedup — the crawl-identity rule: the same
    * page fetched under different tracking params and fragments is
    * ONE page. The fixture has no URL column, so fetch URLs are
    * synthesized per document (tracking `ref` param and fragment vary
    * per doc, host/path/semantic `lang` param collide by
    * construction); canonicalization strips the fragment and the
    * tracking param with engine-neutral regexes (no parse_url — the
    * oracle must run the identical rule), then dedups: fetch count
    * and first-fetch doc per canonical URL. Per-row regex + one
    * partial-agg shuffle on the canonical key — the URL-frontier
    * dedup shape at any crawl scale. */
  def qDedupUrl(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.org/page/"),
        pmod(col("doc_id"), lit(50)), lit("?lang="), col("lang"),
        lit("&ref=track"), pmod(col("doc_id"), lit(7)), lit("#s"), col("doc_id")))
      .withColumn("canonical",
        regexp_replace(regexp_replace(col("url"), "#.*$", ""), "&ref=[^&#]*", ""))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_fetches"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("n_fetches").desc, col("canonical"))
      .limit(300)

  /** Blocking grams must be this rare (document frequency) to
    * generate candidate pairs — boilerplate shingles that appear
    * everywhere are by definition not rare, so rare-gram blocking is
    * INHERENTLY skew-capped (≤ df²/2 pairs per gram) where prefix
    * blocks need the explicit [[MaxBlockBucket]] guard. */
  val RareGramDf = 5

  /** Asymmetric shingle CONTAINMENT |A∩B| / min(|A|, |B|) ≥ 0.8 —
    * the embedded-duplicate detector: a short doc pasted inside a
    * longer one scores ~1 here while symmetric Jaccard dilutes it by
    * the big doc's gram count, and it shares no 60-char prefix with
    * its host, so neither existing verify key can see it. Candidates
    * come from shared RARE shingles ([[RareGramDf]]); exact shared
    * counts are then computed for the candidate pairs only (two
    * equi joins against the gram table — never corpus×corpus). The
    * keep rule is the exact integer cross-product shared·10 ≥
    * min·8; only the reported ratio divides (one IEEE op, §2.2). */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.documents(spark, dir))

  /** Unaligned repeated-span detection over the documents corpus —
    * [[graft.api.GraftOps.sharedSpans]] at width 20 / minDocs 2: the
    * ExactSubstr flavour of dedup (Lee et al. 2021). On the planted
    * fixture the exact-dup pairs report one full-doc span and the
    * embedded-dup victims' copied tails are found at their UNALIGNED
    * offsets (invisible to the aligned q_scrub_boilerplate chunks by
    * construction); the 60-char shared prefixes (~12 tokens) sit
    * under the 20-token width — the deliberate negative control. */
  def qDedupSubstring(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.sharedSpans(
        Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"), col("span_start"))

  /** The containment core over any (doc_id, text) frame —
    * ContainmentSpec drives it with the planted embedded-duplicate
    * geometry the fixture lacks.
    *
    * r11 rewrite (VERDICT r10 #3 — the last candidate-stream
    * `.distinct()` in the dedup family): a pair colliding on several
    * rare grams is now kept only where the join gram equals the
    * SMALLEST shared rare gram — the same map-side exactly-once
    * discipline as minhash's first-common-band
    * ([[graft.api.GraftOps]]) and SemDeDup's smallest-shared-cell
    * predicates, evaluated as a column comparison inside the block
    * join's own stage. Two structural refinements make the predicate
    * affordable:
    *  - the predicate array `rgs` holds only SHARED-CAPABLE grams,
    *    df ∈ [2, [[RareGramDf]]] — a df = 1 gram can never produce a
    *    pair, so dropping it changes no candidate and keeps `rgs`
    *    proportional to the doc's NEAR-DUP overlap mass, not its
    *    length (a clean doc carries rgs ≈ ∅ and exits at the explode);
    *  - `rgs` rides the SAME per-doc aggregate that already builds
    *    the full gram set, and the exploded side then carries
    *    (grams, n) straight into the block join — so the old shape's
    *    pair-distinct Exchange AND its two join-back-by-doc Exchanges
    *    all collapse into the one self-join. Exchanges: grams by df
    *    key, corpus by doc_id, sides by gram — down from six.
    * Exactly-once proof shape: rgs_a ∩ rgs_b IS the pair's shared
    * rare-capable gram set (rare-ness is a global per-gram property),
    * the join emits the pair once per element of it, and
    * `gram = array_min(...)` holds for exactly one element.
    *
    * wordShingles dedups grams per doc, so size(array_intersect) is
    * exactly the shared-distinct-gram count and n = size(grams). */
  /** The raw shingle explosion of [[containmentPairs]] — NOT yet
    * materialized; the key localCheckpoints it, and
    * tools.ContainmentDecomp times that materialization separately
    * (r12 review: the instrument had re-spelled these frames, so a
    * pipeline change would have silently decoupled what it times
    * from what the key executes).
    *
    * r13 (VERDICT r12 #2): grams are folded as their distinct md5-32
    * HASHES, not strings — the decomposition measured the O(total
    * grams) corpus passes (26.5 M gram rows at sf10, ~25-byte gram
    * strings through a checkpoint, a df group-by and the per-doc
    * collect) as the owner of the key's third decade, with the
    * candidate machinery at thousandths of the mass. Containment's
    * downstream is pure set algebra over grams — df counts, set
    * sizes, intersections — so the 8-byte engine-neutral hash
    * (minhash's md5-int64 seam) carries the full semantics; the
    * oracle hashes the same way and a 32-bit within-doc collision
    * collapses identically on both engines (WordShingleHashes). */
  private[graft] def containmentGrams(docs: DataFrame): DataFrame =
    graft.api.GraftOps.wordShingleHashes(docs, "doc_id", "text")

  /** The two aggregate stages of [[containmentPairs]] over the
    * (checkpointed) gram table: the shared-capable df table
    * (gram, df ∈ [2, RareGramDf]) and the one-corpus-shuffle
    * per-doc fold of (grams, n, rgs). Single-sourced with the
    * declared key; the instrument consumes the same frames. */
  private[graft] def containmentStages(g: DataFrame): (DataFrame, DataFrame) = {
    val dfs = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, RareGramDf))
    // One corpus shuffle folds each doc's (distinct) gram set AND its
    // shared-capable blocking subset into a single row.
    val sets = g.join(dfs.select(col("gram"), lit(1).as("__r")), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("gram")).as("grams"), count(lit(1)).as("n"),
        collect_list(when(col("__r") === 1, col("gram"))).as("rgs"))
    (dfs, sets)
  }

  private[graft] def containmentPairs(docs: DataFrame): DataFrame = {
    // checkpointed: consumed by the df-count AND the flag join
    val g = containmentGrams(docs).localCheckpoint(true)
    val (_, sets) = containmentStages(g)
    def side(s: String): DataFrame = sets.select(
      col("doc_id").as(s"doc_$s"), col("grams").as(s"__g$s"),
      col("n").as(s"n_$s"), col("rgs").as(s"rgs_$s"),
      explode(col("rgs")).as("gram"))
    side("a").join(side("b"), "gram")
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("gram") === array_min(array_intersect(col("rgs_a"), col("rgs_b"))))
      .withColumn("shared", size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .filter(col("shared") * 10 >= least(col("n_a"), col("n_b")) * 8)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared") / least(col("n_a"), col("n_b")).cast("double"), 4)
          .as("containment"))
      .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
  }
}
