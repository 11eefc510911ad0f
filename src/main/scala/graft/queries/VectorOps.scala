package graft.queries

import graft.Tables
import graft.catalyst.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `embeddings`, plus the custom
  * UDF/UDAF/Expression surface (SURVEY.md §2.4-J).
  *
  * Three formulations of the same cosine top-k semantics are declared
  * (higher-order fns in LlmOps.qCosineTopk, native codegen'd
  * Expression here, ScalaUDF-rewritten-by-rule here) — identical
  * results, one oracle, measurably different plans. Embeddings are
  * L2-normalized (FIXTURES.md) so cosine ≡ dot product.
  *
  * Scale notes: brute-force knn is a cross join — O(probes × corpus),
  * acceptable only because probes are a broadcast-able handful; the
  * corpus side streams through codegen without materializing pairs.
  * The bucketed key is the 100 TB path: an equi shuffle join on a
  * hash-bucket key prunes the candidate space by the bucket fan-out
  * (here 4 sign-buckets; real IVF = k-means cells, same join shape).
  */
object VectorOps {

  private val P = "p_emb"
  private val T = "t_emb"

  /** Cosine top-k via the native codegen'd DotProduct expression. */
  def qCosineExpr(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P))
    val targets = e.select(col("vec_id").as("neighbor"), col("embedding").as(T))
    val pairs = probes.crossJoin(targets)
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** Same semantics through a ScalaUDF that the injected optimizer
    * rule (RewriteDotUdf) replaces with the native expression. */
  def qCosineUdf(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P))
    val targets = e.select(col("vec_id").as("neighbor"), col("embedding").as(T))
    val pairs = probes.crossJoin(targets)
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(call_udf(GraftFunctions.DotUdfName, col(P), col(T)), 4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** Fixed random-projection contrasts (half-sum differences) used as
    * 1-bit LSH hyperplanes. Deterministic, engine-neutral. */
  private def proj1 =
    expr("aggregate(slice(embedding,1,32), cast(0.0 as double), (acc,x) -> acc + cast(x as double))") -
    expr("aggregate(slice(embedding,33,32), cast(0.0 as double), (acc,x) -> acc + cast(x as double))")
  private def proj2 =
    expr("aggregate(slice(embedding,17,32), cast(0.0 as double), (acc,x) -> acc + cast(x as double))") -
    (expr("aggregate(slice(embedding,1,16), cast(0.0 as double), (acc,x) -> acc + cast(x as double))") +
     expr("aggregate(slice(embedding,49,16), cast(0.0 as double), (acc,x) -> acc + cast(x as double))"))

  /** Embedding-cosine near-duplicate pairs (cos ≥ 0.4 on the rounded
    * value — thresholding after rounding keeps the cut cross-engine
    * exact).
    *
    * Scale shape: multi-band sign-LSH blocking (EmbLsh: 21 bands × 6
    * sign bits, 64 buckets/band, deterministic ±1 hyperplanes shared
    * with the DuckDB oracle). Each vector explodes into 21 (band,
    * bucket) keys; ONE equi self-join on the key generates candidates
    * across all bands, the first-common-band filter keeps each pair
    * exactly once WITHOUT a distinct exchange (see
    * [[graft.api.GraftOps.embeddingNearDups]], the shared
    * implementation — at sf1 the old `.distinct()` was ~70 s of the
    * 70.5 s key), and the dot product runs once per candidate pair.
    * No corpus×corpus cross product exists in the plan (asserted in
    * PlanSpec) and the observed bucket fan-out and recall vs brute
    * force (0.74 at the fixture's adversarial cos≈0.45 geometry — see
    * EmbLsh scaladoc for why that's near the sign-LSH bound there)
    * are measured in AnnRecallSpec. */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps
      .embeddingNearDups(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))

  /** Production-geometry embedding near-dup (r13, VERDICT r12 #1): the
    * classic-LSH dial a 100 TB deployment would run — 12 bits × 24
    * bands, τ = 0.85 (per-band collision 0.823¹² ≈ 0.10 at the τ
    * boundary → recall 1−(1−0.10)²⁴ ≈ 0.91; random pairs collide on
    * 24/2¹² ≈ 0.6% of bands) — as an oracle-verified key.
    *
    * The driver fixtures are near-isotropic 64-dim unit vectors: NO
    * pair sits at cos ≥ 0.85 (measured: zero at every driver SF), so
    * the plain corpus would hash-match on an EMPTY answer and verify
    * nothing. The key therefore augments the corpus in-query with one
    * deterministic perturbed twin per vector — dimension 0 negated,
    * id offset +10 M — an exact float operation both engines spell
    * identically (no arithmetic, just sign flip). A twin pair's
    * cosine is 1 − 2·x₀² (unit vectors), i.e. cos ∈ [0.85, 1] exactly
    * when |x₀| ≤ √0.075 ≈ 0.274 — ~97% of an isotropic corpus — so
    * the answer is ≈N planted pairs whose DISCOVERY exercises the
    * full production path: 288-hyperplane signature, OR-of-bands
    * banding, FirstBandMatch exactly-once candidate emission, and
    * the τ = 0.85 verification. The hash-match then proves recall
    * parity pair-for-pair against DuckDB's exhaustive replay of the
    * same geometry (EmbLsh.duckKeysSql(12, 24) — same splitmix64
    * plane stream). Twins past the |x₀| boundary fall below τ in BOTH
    * engines by the same rounded-to-4 cosine, so the boundary itself
    * is part of what the hash pins. */
  def qDedupEmbeddingScaled(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val twins = e.select((col("vec_id") + lit(10000000L)).as("vec_id"),
      expr("concat(array(-element_at(embedding, 1)), slice(embedding, 2, 63))")
        .as("embedding"))
    graft.api.GraftOps
      .embeddingNearDups(e.unionAll(twins), "vec_id", "embedding", 0.85,
        bits = 12, bands = 24)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
  }

  /** Sign-bucket expression: 2-bit LSH code from the two projections.
    * Projections are rounded to 6 decimals before the sign test so a
    * value near 0 cannot round to opposite signs across engines
    * (mirrored in the DuckDB oracle). */
  private def bucketExpr =
    when(round(proj1, 6) > 0, 1).otherwise(0) +
    when(round(proj2, 6) > 0, 2).otherwise(0)

  /** LSH-bucketed approximate nearest neighbours: probes search only
    * their own sign-bucket (equi join on the bucket key → hash join,
    * no cross product), top-3 per probe. Deliberately the minimal
    * 2-bit/4-bucket variant — measured top-3 recall 0.43 at 1/4 scan
    * on the isotropic fixture (AnnRecallSpec); the production-shaped
    * variants are qKnnIvf (learned cells + multi-probe) and the
    * multi-band EmbLsh construction behind qDedupEmbedding. */
  def qKnnBucketed(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir).withColumn("bucket", bucketExpr)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("bucket"), col("embedding").as(P))
    val targets = e.select(col("vec_id").as("neighbor"), col("bucket"), col("embedding").as(T))
    val pairs = probes.join(targets, "bucket")
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** Per-label centroids, one row per (label, dimension): the coarse
    * quantizer build step of IVF. posexplode ↔ unnest(range) in the
    * oracle (Spark pos is 0-based; +1 aligns with DuckDB's 1-based
    * subscripts). */
  def qEmbCentroid(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + lit(1)).as("pos"))
      .agg(round(avg(col("v").cast("double")), 4).as("c"))
      .orderBy(col("label"), col("pos"))
  }

  /** IVF-style two-stage ANN with multi-probe: assign each probe to
    * its nprobe=2 nearest label-centroids (10 cells, broadcast), then
    * search only those cells' vectors — the learned-quantizer
    * counterpart of the sign-bucket key. nprobe is THE recall/cost
    * knob of IVF: on this isotropic random fixture nprobe 1→2 doubles
    * measured top-3 recall (0.13→0.30, AnnRecallSpec) at 2/10 of the
    * corpus scanned; clustered real embeddings concentrate neighbors
    * in the top cell and need fewer probes for the same recall.
    * Centroids are the ROUNDED per-dim means, so both engines compute
    * dot products from bit-identical inputs. Each target lives in
    * exactly one cell, so multi-probe joins stay duplicate-free.
    * AnnRecallSpec measures the whole nprobe curve (1/2/4) and asserts
    * recall is monotone in nprobe — the knob buys recall linearly in
    * scan fraction, never loses it. */
  def qKnnIvf(spark: SparkSession, dir: String): DataFrame =
    qKnnIvfProbed(spark, dir, 2)

  private[graft] def qKnnIvfProbed(
      spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val cent = qEmbCentroid(spark, dir)
      .groupBy(col("label").as("c_label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cvec"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P))
    val assigned = probes.crossJoin(broadcast(cent))
      .select(col("vec_id"), col(P),
        // codegen'd float×double dot (catalyst/NumDot) — bit-identical
        // to the interpreted cast-to-double zip_with fold it replaced
        expr(s"graft_num_dot($P, cvec)").as("cos_c"),
        col("c_label"))
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("c_label"))
    val probeCell = assigned.withColumn("rk", row_number().over(wA))
      .filter(col("rk") <= nprobe)
      .select(col("vec_id"), col(P), col("c_label").as("cell"))
    val targets = e.select(col("vec_id").as("neighbor"), col("label").as("cell"), col("embedding").as(T))
    val pairs = probeCell.join(targets, "cell")
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** DECLARED k-means quantizer build (r9): 2 Lloyd rounds, k = 8
    * deterministic hash-picked seeds, over the embeddings table —
    * `GraftOps.kmeans`, the unsupervised counterpart of
    * [[qEmbCentroid]]'s label-derived cells (real corpora are
    * unlabeled; this is the IVF index-build step from nothing).
    * Declared output is the final partition audit (cell, member
    * count, smallest member id); the DuckDB oracle unrolls both
    * Lloyd rounds as CTEs (the [[WarehouseOps.qGraphPagerank]]
    * fixed-iteration precedent) from the same seed rule, centroid
    * rounding (4 dp), and argmin discipline (6 dp, ties to the
    * smaller cell). */
  def qKmeansBuild(spark: SparkSession, dir: String): DataFrame = {
    graft.api.GraftOps
      .kmeans(Tables.embeddings(spark, dir), "vec_id", "embedding", 8, 2)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("rep"))
      .orderBy(col("cell"))
  }

  /** Unsupervised end-to-end IVF retrieval (r10 — closes the last
    * structural seam in the vector stack): [[qKnnIvf]] reads its cells
    * from the fixture's `label` column, a supervised stand-in real
    * corpora don't have; here the cells come from
    * [[graft.api.GraftOps.kmeansModel]] — the k=8, 2-round
    * deterministic Lloyd build of q_kmeans_build — so the whole path
    * is what a production pipeline actually runs: train quantizer →
    * assign corpus → multi-probe search.
    *
    * Probe-cell ranking uses the SAME argmin metric as the build
    * (round(‖c‖² − 2·v·c, 6) ascending, ties to the smaller cell), so
    * a probe's top-1 cell is by construction the cell its corpus copy
    * was assigned to — rank-1 retrieval can never miss the probe's own
    * cell, the property that makes IVF recall predictable (asserted
    * per-probe in AnnRecallSpec). nprobe=2 declared; measured top-3
    * recall 0.467 at 2/8 of the corpus scanned — BETTER than
    * [[qKnnIvf]]'s 0.300 from the 10 label cells, because Lloyd cells
    * follow the data's actual neighborhood structure while the
    * fixture's labels are assigned independently of geometry. The
    * 1/2/4 nprobe curve (0.300/0.467/0.700) is pinned monotone.
    *
    * Scale shape: the corpus assignment is a zero-shuffle map stage
    * (kmeansModel keeps all columns — no join-back), the k·d centroid
    * model broadcasts, and the search is one equi join on the cell
    * key — identical join geometry to qKnnIvf. The cell key has
    * cardinality k, so production sizes k accordingly. k ≈ √N cells is
    * the classical IVF convention and applies to THIS exact-scoring
    * path, where every candidate is ranked by its true dot product;
    * it does NOT transfer to the PQ-ADC path — the r18 gate-growth
    * measurement (SCALE.md §Round 18, docs/ann_gate_growth_r18.jsonl)
    * refuted √N growth there (recall stalls at ~0.57 because fine
    * cells concentrate candidates into the ADC near-tie band), and
    * the measured ADC recipe is k ∝ N with a full-candidate exact
    * rerank ([[qKnnIvfPqRerankScaled]]). At k=8 on the fixture the
    * join is effectively a broadcast of the probe side. */
  def qKnnIvfKmeans(spark: SparkSession, dir: String): DataFrame =
    qKnnIvfKmeansProbed(spark, dir, 2)

  /** The PERSISTED IVF index (r16): (centroids, cell-assigned corpus)
    * for one declared geometry, written once per fixture under the
    * [[graft.api.StagedArtifact]] discipline and READ by every
    * search — the Faiss index file re-expressed as tables (`cents` =
    * the k·d model, `cells` = the corpus stored WITH its cell key,
    * which is exactly how IVF lists store vectors). Each declared
    * dial point (k = 8 / 64 / 128) is its own artifact — a
    * deployment stores the index at ITS operating point; the dial
    * instruments (tools.AnnDialBench, AnnRecallSpec sweeps) keep
    * building in-session via `store = false`, both because they
    * measure the build and because a grid sweep must not litter
    * corpus-sized index copies. Rounded-double centroids and float
    * vectors round-trip parquet exactly, so a stored-index search is
    * bit-identical to a fresh-build one (IvfIndexSpec pins it). */
  private[graft] def ivfIndex(spark: SparkSession, dir: String,
                              k: Int, iters: Int,
                              rootOverride: Option[String] = None)
      : (DataFrame, DataFrame) = {
    import graft.api.StagedArtifact
    val canonical = new java.io.File(dir).getCanonicalPath
    val root = rootOverride.getOrElse(
      s"${Layout.layoutRoot}/${new java.io.File(dir).getName}")
    val key = StagedArtifact.pathKey(canonical)
    val idxDir = new java.io.File(s"$root/ivf_index_${key}_k${k}i$iters")
    val embRoot = new java.io.File(dir, "embeddings.parquet")
    require(embRoot.exists,
      s"embeddings.parquet missing under $dir — cannot fingerprint the IVF corpus")
    val fp = StagedArtifact.fingerprint(embRoot)
    val sentinelBody = s"$canonical k=$k iters=$iters fp=$fp"
    // GC: sibling ivf_index variants whose sentinel fingerprints a
    // superseded corpus are purged on publish; the three LIVE declared
    // geometries (k=8/64/128) all carry the current fp and survive
    val tables = StagedArtifact.loadOrBuild(spark, idxDir, sentinelBody,
      gc = Some((s"ivf_index_${key}_", s"fp=$fp"))) {
      val (cent, assigned) = graft.api.GraftOps
        .kmeansModel(Tables.embeddings(spark, dir), "vec_id", "embedding", k, iters)
      Seq("cents" -> cent,
        "cells" -> assigned.select(col("vec_id"), col("cell"), col("embedding")))
    }
    (tables("cents"), tables("cells"))
  }

  /** DECLARED: the fine-cell multi-probe point of the unsupervised
    * IVF dial — (k = 64, iters = 2, nprobe = 16). SAME quarter-corpus
    * scan fraction as the coarse (8, 2, 2) key, but recall climbs
    * with cell refinement at constant cost: measured against
    * brute-force top-3 (tools.AnnDialBench, SCALE.md §ANN dial)
    * 0.47 → 0.80 at sf0.01, 0.50 → 0.90 at sf1. This is the
    * production law the sweep established: hold nprobe/k (the cost),
    * grow BOTH (the resolution) — the multi-probe analogue of
    * SemDeDup's k-dial. Execution shape is unchanged from
    * [[qKnnIvfKmeans]]: broadcast model row, zero-shuffle assignment,
    * one equi join on the cell key; only the broadcast grows (k·d
    * doubles) and the probe side fans out 16 ways (still ≤ 160 rows
    * before the hint). */
  def qKnnIvfMp(spark: SparkSession, dir: String): DataFrame =
    qKnnIvfKmeansGeo(spark, dir, k = 64, iters = 2, nprobe = 16, store = true)

  /** DECLARED (r13, VERDICT r12 #5): the HIGH-RECALL point of the same
    * dial — (k = 128, iters = 2, nprobe = 64), i.e. nprobe/k = 1/2:
    * HALF the corpus scanned per probe, twice q_knn_ivf_mp's quarter
    * scan. This is the operating point users pick when dedup/retrieval
    * precision matters more than scan cost: the sf10 dial measured
    * recall 0.97 here (tools.AnnDialBench; SCALE.md §ANN dial) where
    * the quarter-scan diagonal plateaus at 0.77 — past the fine-cell
    * plateau, recall is bought with scan fraction, and this key pins
    * the half-scan rung of that ladder (AnnRecallSpec: ≥ 0.90 at sf1,
    * ≥ q_knn_ivf_mp on the same fixture). Same machinery end to end:
    * kmeansModel build, CellTopP probe ranking (p = 64 — the bound
    * raised for the r12 sf10 sweep), cell-member scan, top-3. */
  def qKnnIvfHr(spark: SparkSession, dir: String): DataFrame =
    qKnnIvfKmeansGeo(spark, dir, k = 128, iters = 2, nprobe = 64, store = true)

  private[graft] def qKnnIvfKmeansProbed(
      spark: SparkSession, dir: String, nprobe: Int): DataFrame =
    qKnnIvfKmeansGeo(spark, dir, k = 8, iters = 2, nprobe = nprobe, store = true)

  /** The fully-dialed unsupervised IVF: (k cells, Lloyd iters, probe
    * count) — tools.AnnDialBench sweeps this grid to put the measured
    * recall-vs-wall curve behind the declared geometry (VERDICT r10
    * #2); the declared key pins one point of it. `store = true` (the
    * declared keys) reads the [[ivfIndex]] artifact; instruments
    * sweeping the grid keep the in-session build. */
  private[graft] def qKnnIvfKmeansGeo(
      spark: SparkSession, dir: String,
      k: Int, iters: Int, nprobe: Int, store: Boolean = false): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val (cent, assigned) =
      if (store) ivfIndex(spark, dir, k, iters)
      else graft.api.GraftOps.kmeansModel(e, "vec_id", "embedding", k, iters)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P))
    // top-nprobe cells via the codegen'd CellTopP — the SAME 6-dp
    // argmin metric and (distance, cell) tie order as the build
    // (CellArgminSpec pins ≡ to the min-struct spelling, element 0 =
    // the build's own argmin). r10 review: this replaced a second
    // hand-spelling of the metric (crossJoin + window rank ≤ nprobe)
    // that had to be kept bit-identical by hand — and drops that
    // spelling's window shuffle over the probe side.
    val probeCell = probes
      .crossJoin(broadcast(graft.api.GraftOps.centroidArray(cent)))
      .select(col("vec_id"), col(P),
        explode(expr(s"graft_cell_topp($P, __cs, $nprobe)")).as("cell"))
    val targets = assigned
      .select(col("vec_id").as("neighbor"), col("cell"), col("embedding").as(T))
    // probe side is bounded (≤ 10·nprobe rows) but hides behind the
    // explode of the top-p cell array (a stats-destroying generator),
    // so Catalyst can't auto-broadcast it — hint it, keeping the
    // corpus side shuffle-free
    val pairs = broadcast(probeCell).join(targets, "cell")
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** SemDeDup-style SEMANTIC deduplication (r10): k-means cells as the
    * blocking structure for embedding near-dup pairs — the method of
    * Abbas et al. 2023 ("SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the corpus
    * embeddings, then compare pairs only WITHIN a cluster, since
    * semantic duplicates land in the same cell by construction. Same
    * τ = 0.4 and output shape as [[qDedupEmbedding]], so the two
    * blocking strategies (learned cells here, 21×6-bit sign-LSH
    * there) are directly comparable on recall — AnnRecallSpec
    * measures both against the same brute-force ground truth.
    *
    * Scale shape: the corpus assignment is the zero-shuffle kmeans map
    * stage; candidates come from ONE equi self-join on the cell key.
    * Candidate volume is Σ_cells n_c·(n_c−1)/2 ≈ N²/(2k) for balanced
    * cells — k is the dial, sized k ≈ N/target_cell_size in
    * production (SemDeDup used 50 k clusters for 5 B embeddings;
    * within-cell work can further compose with the int8 coarse pass
    * of [[qKnnRerank]]). The declared k = 8 keeps the key
    * oracle-checkable at every fixture SF; the declared geometry is
    * quadratic-within-cell by construction, exactly like the paper. */
  def qDedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    // r19: the blocking model comes from the PERSISTED (k=8, iters=2)
    // IVF index — the same artifact every declared serving key reads
    // (train once, dedup against the stored partition: the SemDeDup
    // production shape). Stored ≡ fresh is IvfIndexSpec's pin; pair
    // equality through this path is CellArgminSpec's.
    graft.api.GraftOps
      .semanticNearDups(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4,
        model = Some(ivfIndex(spark, dir, k = 8, iters = 2)))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
  }

  /** DECLARED: multi-probe SemDeDup — [[qDedupSemantic]] with each
    * vector blocking on its TOP-2 cells ([[graft.catalyst.CellTopP]],
    * probes = 2), recovering near-dup pairs that straddle a cell
    * boundary (the single-assignment recall ceiling: planted-twin
    * recall 0.50–0.66 across the whole k dial — SCALE.md §SemDeDup;
    * probes = 2 measured 0.87–0.96 there). The pair set is a strict
    * superset of q_dedup_semantic's (probe 1 IS the argmin cell);
    * exactly-once emission comes from the smallest-shared-cell
    * predicate, not a distinct Exchange — PlanSpec pins the absence
    * of a post-join aggregate. */
  def qDedupSemanticMp(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    // r19: stored centroids (see qDedupSemantic); the top-2 cell
    // assignment remains the in-session zero-shuffle map stage (the
    // store carries only the argmin cell).
    graft.api.GraftOps
      .semanticNearDups(Tables.embeddings(spark, dir), "vec_id", "embedding",
        0.4, probes = 2, model = Some(ivfIndex(spark, dir, k = 8, iters = 2)))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
  }

  /** Top-3 orders per customer through the custom TopKPerGroup plan
    * node (graft.plans: logical node → strategy → partial/final
    * physical top-k) — same rows as the window row_number idiom, same
    * oracle as q_window_topk, different (better) physical plan. */
  def qTopkCustom(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val joined = c.join(o, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup(joined, Seq("c_custkey"),
        Seq(graft.plans.TopKPerGroup.Ord("o_totalprice", desc = true),
            graft.plans.TopKPerGroup.Ord("o_orderkey")), 3)
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Int8 symmetric embedding quantization audit — the compression
    * step every 100 TB vector store applies before indexing (4× over
    * float32). code = clamp(⌊v·127 + 0.5⌋, ±127); the ⌊x+0.5⌋ spelling
    * (not round()) sidesteps engines' half-up-vs-banker seams: floor
    * of the SAME IEEE double is bit-deterministic everywhere. All
    * outputs are exact integers — per label the vector count, summed
    * code mass, summed squared-code "energy" (‖q‖² ≈ 127² for the
    * L2-normalized fixture), and global code extrema — computed by
    * per-row array folds (zero shuffle) + one 10-group aggregate.
    *
    * Null-element rule (same class as catalyst/EmbLshKeys, ADVICE r4):
    * a NULL vector element would make Spark's `aggregate` fold return
    * NULL while DuckDB's `list_sum` SKIPS nulls — a cross-engine
    * divergence. The fixture embeddings are verified null-free
    * (FIXTURES.md); a production caller must impute or drop null
    * elements before quantizing. */
  def qEmbQuantize(spark: SparkSession, dir: String): DataFrame = {
    val codes = expr(
      """transform(embedding,
        |  v -> least(greatest(floor(cast(v as double) * 127.0d + 0.5d), -127L), 127L))
        |""".stripMargin)
    Tables.embeddings(spark, dir)
      .select(col("label"), codes.as("q"))
      .select(col("label"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("code_sum"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").as("code_energy"),
        expr("array_min(q)").as("qmin"), expr("array_max(q)").as("qmax"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("code_sum")).as("code_sum"),
        sum(col("code_energy")).as("code_energy"),
        min(col("qmin")).as("code_min"), max(col("qmax")).as("code_max"))
      .orderBy(col("label"))
  }

  /** Two-stage quantized ANN: coarse scan over INT8 codes shortlists
    * 20 candidates per probe (integer dot products — 4× less memory
    * bandwidth, the resource that bounds a 100 TB vector scan), then
    * an exact float32 re-rank of the shortlist picks top-3. This is
    * the production retrieval architecture (quantized first pass +
    * exact re-rank); the brute-force q_cosine_* keys are its recall
    * baseline, and here recall is exact by construction whenever the
    * true top-3 survive the 20-deep shortlist (AnnRecallSpec-adjacent
    * property: int8 preserves order to ~1/127 resolution).
    * Determinism: stage-1 scores are exact BIGINTs (int8 products
    * ≤ 127²·64 sum exactly in doubles too, so DuckDB's
    * list_dot_product over the cast codes matches bit-for-bit);
    * shortlist and final ties break on neighbor id. */
  def qKnnRerank(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val codes = expr(
      """transform(embedding,
        |  v -> least(greatest(floor(cast(v as double) * 127.0d + 0.5d), -127L), 127L))
        |""".stripMargin)
    // widened (r9): the localCheckpoint inherits the scan's partition
    // count, and a single-file fixture scans 1-2 tasks — the whole
    // coarse pass (2 M codegen'd dots at sf10) then streamed on those
    // tasks: 5.5 s at sf10 until the guard restored full parallelism.
    val e = graft.api.GraftOps.widened(Tables.embeddings(spark, dir), "vec_id")
    val q = e.select(col("vec_id"), col("embedding"), codes.as("qc"))
      .localCheckpoint(true) // quantize once; probed and scanned sides share it
    val probes = q.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P), col("qc").as("qp"))
    val corpus = q.select(col("vec_id").as("neighbor"), col("embedding").as(T), col("qc").as("qt"))
    val coarse = probes.crossJoin(corpus)
      .filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"), col(P), col(T),
        // codegen'd long×long dot in exact double range (catalyst/NumDot);
        // cast back to bigint ≡ the 0L long fold it replaced
        expr("cast(graft_num_dot(qp, qt) as bigint)").as("dot_q"))
    val wCoarse = Window.partitionBy(col("vec_id")).orderBy(col("dot_q").desc, col("neighbor"))
    val shortlist = coarse.withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= 20)
    val wExact = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    shortlist
      .select(col("vec_id"), col("neighbor"), col("dot_q"),
        round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
      .withColumn("rk", row_number().over(wExact)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("neighbor"), col("dot_q"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }

  /** PQ geometry: 64-dim vectors → [[PqM]] subspaces × [[PqSub]] dims,
    * [[PqK]] centroids per subspace (8-bit-code-family sizing scaled
    * to the fixture; production uses m=8..64, k=256). Shared with the
    * oracle generator — the two sides must agree. */
  private[graft] val PqM = 4
  private[graft] val PqSub = 16
  private[graft] val PqK = 16
  private[graft] val PqIters = 2

  /** Production-build dials (r15): codebooks train on a deterministic
    * [[graft.api.GraftOps.sampleByHash]] slice of the corpus
    * ([[PqSamplePct]]%), and the IVF-PQ composition gates the ADC scan
    * behind the q_knn_ivf_mp coarse geometry (64 Lloyd cells,
    * nprobe = 16 — the measured quarter-scan point of the IVF dial). */
  private[graft] val PqSamplePct = 25
  private[graft] val IvfPqCells = 64
  private[graft] val IvfPqNprobe = 16

  /** ADC-shortlist depth for the full-ladder key ([[qKnnIvfPqRerank]]):
    * much deeper than q_knn_rerank's 20 because ADC error (avg ~0.10
    * per PqSpec) is an order louder than int8's ~1/127 AND the same
    * scale as the isotropic fixture's cosine signal — depth is the
    * dial that buys recall back, and the shortlist stays ≤ probes·depth
    * rows — broadcastable at ANY corpus size, exact-scored at ~zero
    * marginal cost next to the codes scan.
    *
    * r17: re-dialed 200 → 1000, the measured PRODUCTION OPERATING
    * POINT (tools.AnnLadderRecall depth×nprobe grid, SCALE.md §ANN
    * operating point): recall@3 at depth 200 was 0.57–0.77 across
    * geometries — a number a retrieval user would reject; at depth
    * 1000 (nprobe unchanged at 16 — the grid measured recall
    * NON-monotone in nprobe at fixed depth, because widening the gate
    * floods the fixed shortlist with ADC-noise candidates) the
    * clustered fixtures reach 0.97 (intra-cos 0.6) and 1.00 (0.75).
    * The isotropic fixture is the documented ADC floor (0.70 even
    * gate-off at depth 1000): when signal ≈ quantization noise, no
    * shortlist depth rescues codes-only ranking — that geometry's
    * answer is the exact-scan q_knn_ivf_hr rung (0.93). Real corpora
    * are clustered; the declared key now IS the ≥ 0.9 point.
    *
    * Sizing rule at other corpus scales (measured at 200 k vectors,
    * SCALE.md §depth law): recall tracks depth as a FRACTION of the
    * gated candidate count (nprobe/k · N), not as an absolute — hold
    * shortlist ≈ 20% of gated candidates (0.93–0.97 at both decades)
    * AT THIS GATE GEOMETRY. r18 measured the other dial (grow k with
    * the corpus — SCALE.md §Round 18): √N growth does NOT restore the
    * absolute depth (0.57), because fine cells concentrate candidates
    * into the ADC near-tie band; the working large-N recipe is k ∝ N
    * at fixed nprobe with the rerank consuming the FULL gated set
    * (gate recall measured 1.000 at k = 64·10 on 200 k clustered
    * vectors; recall 1.000 at the r17 operating point's wall).
    * Depth is nearly free: the codes scan dominates the wall.
    *
    * The declared key BAKES the law in: this constant is the FLOOR,
    * and the effective per-probe shortlist is
    * max(floor, gated-candidates/5) — a count window over the rank's
    * own partition (no extra Exchange), mirrored verbatim in the
    * DuckDB oracle. At the fixtures' gate (k = 64, nprobe = 16) the
    * fraction engages exactly where the absolute dial stops being
    * right (sf10: recall 0.50 → 0.93). */
  private[graft] val IvfPqRerankDepth = 1000

  /** DECLARED: product-quantization ADC retrieval (r14) — the
    * memory-bound half of the production ANN stack (Jégou et al.
    * 2011, public; the Faiss IVF-PQ shape minus the IVF gate, which
    * [[qKnnIvfKmeans]] already covers). Each vector's 64 floats
    * compress to [[PqM]] small codes — one per subspace, the argmin
    * cell of a per-subspace deterministic Lloyd codebook (the SAME
    * seed/rounding/argmin discipline as q_kmeans_build, run on vector
    * SLICES) — and search scans CODES, not vectors: a probe
    * precomputes its dot product with every centroid of every
    * subspace (an m·k lookup table, 64 doubles here) and a corpus
    * row's approximate inner product is m table lookups + a sum,
    * never touching the original embedding.
    *
    * Scale shape: codebook build is [[graft.api.GraftOps
    * .kmeansModel]] per subspace (corpus-sample-sized in production —
    * [[qKnnPqSampled]] is that declared twin, and [[qKnnIvfPq]] the
    * gated composition; this full-build key is their verification
    * baseline);
    * ENCODE is a chain of m zero-shuffle map stages (broadcast
    * codebook row + codegen'd CellArgmin per subspace) — the corpus
    * is never joined or shuffled; SEARCH is m broadcast lookup-table
    * joins on the code columns (each table is probes×k rows) feeding
    * one windowed top-3 — the only shuffle in the whole key. At 100 TB
    * the 64-float embedding column (256 B/row) becomes m bytes/row of
    * codes: the 60× compression is what makes exhaustive scan
    * feasible, and recall is bounded by quantization error (the int8
    * rerank key is the refinement step a production stack appends).
    *
    * Determinism: per-subspace dots round at 6 dp (the centroid-metric
    * convention), the 4-term ADC sum is a fixed left-associated chain
    * of identical doubles on both engines, re-rounded at 4 dp; ranking
    * ties break on neighbor id. */
  def qKnnPq(spark: SparkSession, dir: String): DataFrame =
    pqAdc(spark, dir, sampledTrain = false, ivfGate = false)

  /** DECLARED (r15): the PRODUCTION PQ build — identical ADC search
    * to [[qKnnPq]], but the per-subspace codebooks train on a
    * deterministic [[PqSamplePct]]% hash-sample of the corpus
    * ([[graft.api.GraftOps.sampleByHash]] keyed on vec_id), exactly
    * as a real deployment amortizes the quantizer: Lloyd's cost is
    * O(sample·k·iters·d) instead of O(corpus·…), and the corpus is
    * touched only by the zero-shuffle ENCODE pass. The full-corpus
    * build (q_knn_pq) is the verification baseline; PqSpec pins the
    * ADC-envelope parity between the two and SCALE.md records the
    * sf10 build-wall split. */
  def qKnnPqSampled(spark: SparkSession, dir: String): DataFrame =
    pqAdc(spark, dir, sampledTrain = true, ivfGate = false)

  /** DECLARED (r15): the full Faiss IVF-PQ retrieval shape — a coarse
    * IVF gate ([[IvfPqCells]] Lloyd cells over the full vectors,
    * [[IvfPqNprobe]]-probe — q_knn_ivf_mp's measured quarter-scan
    * geometry) in front of the PQ-ADC scan, with the codebooks from
    * the PRODUCTION sampled build. Each probe scores codes ONLY in
    * its probed cells: the ADC join volume drops by the scan
    * fraction (nprobe/k = 1/4 here) while staying codes-only —
    * at 100 TB this is the architecture that serves web-scale
    * retrieval (Jégou et al. 2011; Faiss IndexIVFPQ, public API
    * surface): gate prunes, codes compress, rerank (q_knn_rerank)
    * refines. Recall vs the exact baseline is measured on
    * AnnRecallSpec's floor protocol against q_knn_ivf_hr.
    *
    * Plan shape: coarse assignment and encode are the same
    * zero-shuffle map stages; the gate is ONE broadcast join of the
    * ≤ probes·nprobe (p_id, cell) rows onto the coded corpus; then m
    * broadcast LUT joins and the single top-k window Exchange —
    * vectors never shuffle, codes shuffle once. */
  def qKnnIvfPq(spark: SparkSession, dir: String): DataFrame =
    pqAdc(spark, dir, sampledTrain = true, ivfGate = true)

  /** DECLARED (r15): the COMPLETE production retrieval ladder —
    * IVF gate → PQ-ADC shortlist → EXACT rerank — in one key (the
    * Faiss `IndexIVFPQ` + refine stage). The gated ADC scan keeps its
    * top-[[IvfPqRerankDepth]] candidates per probe (the shortlist is
    * ≤ probes·depth rows — broadcastable at any corpus size), the
    * original float vectors are fetched back for ONLY those rows (two
    * broadcast joins against the embedding table; the corpus-wide
    * scan stays codes-only), and the exact cosine picks top-3. This
    * is the architecture answer to ADC's quantization noise: recall
    * is restored by exact scoring of a candidate set whose SIZE is
    * controlled by the gate and the codes, not by the corpus.
    * AnnRecallSpec measures the ladder's sf1 recall against the raw
    * gated-ADC key — the rerank must dominate it. */
  def qKnnIvfPqRerank(spark: SparkSession, dir: String): DataFrame =
    pqAdc(spark, dir, sampledTrain = true, ivfGate = true,
      rerank = true)

  /** The k ∝ N gate rule the r18 measurement established (SCALE.md
    * §Round 18, docs/ann_gate_growth_r18.jsonl): hold nprobe, grow the
    * cell count linearly with the corpus — k = 64·(N/20 000), the
    * declared [[IvfPqCells]] geometry anchored at the sf1 fixture's
    * 20 000 vectors — so the gated candidate count per probe stays
    * ≈ nprobe·20 000/64 = 5 000 CONSTANT at any corpus size, small
    * enough to exact-rerank in full. Integer arithmetic (floor), so
    * the DuckDB oracle's `greatest(8, (count(*) * 64) // 20000)`
    * computes the identical value; the floor of 8 keeps the tiniest
    * fixtures above a degenerate 1-cell quantizer. At the measured
    * 200 k-vector point this is k = 640 — gate recall 1.000. */
  private[graft] def scaledGateCells(n: Long): Int =
    math.max(8L, n * 64L / 20000L).toInt

  /** DECLARED (r19, VERDICT r18 missing #1): the measured LARGE-CORPUS
    * operating recipe promoted from SCALE.md prose into the inventory —
    * IVF-PQ retrieval whose gate k scales with the corpus
    * ([[scaledGateCells]]: k ∝ N at fixed nprobe = [[IvfPqNprobe]])
    * and whose EXACT rerank consumes the ENTIRE gated candidate set
    * (no ADC shortlist at all). This is the recipe the r18 gate-growth
    * measurement established after REFUTING √N growth: fine cells
    * keep the gate near-perfect (measured gate recall 1.000 at
    * k = 640 on 200 k clustered vectors) while the per-probe gated
    * set stays a CONSTANT ≈ nprobe/64·20 000 = 5 000 candidates —
    * bounded work per probe at ANY corpus size, so "rerank everything
    * the gate admits" is affordable by construction and ADC noise can
    * no longer cost recall (total recall 1.000 at the r17 operating
    * point's wall, with a 10× smaller codes scan). Measured bound on
    * the rule itself (r19, docs/ann_gate_growth_r19.jsonl): at 400 k
    * vectors (k = 1280) recall reads 0.933 — at FIXED nprobe the
    * gate's coverage np/k halves each corpus doubling, and nprobe is
    * the search-time repair (recall 1.000 at np = 24, no rebuild);
    * SCALE.md §Round 19 carries the refined coverage law. The ADC scores
    * still gate nothing away here — the codes scan's role collapses
    * to candidate ENUMERATION, which is exactly the Faiss
    * coarse-quantizer-only regime this recipe measured fastest.
    *
    * Plan shape vs [[qKnnIvfPqRerank]]: identical until the
    * shortlist — then NO rank/count windows at all (the one window
    * Exchange of the ADC stage disappears; the only remaining shuffle
    * is the final top-3 window over ≤ probes·5 000 exact-scored
    * rows). The stored index is the same versioned PqIndex family at
    * the scaled cell count. AnnRecallSpec pins recall ≥ 0.95 at the
    * 200 k measured point; the DuckDB oracle replays the scaled k via
    * a dynamic seed-count CTE, so CORRECTNESS pins the rule per-SF. */
  def qKnnIvfPqRerankScaled(spark: SparkSession, dir: String): DataFrame = {
    val cells = scaledGateCells(Tables.embeddings(spark, dir).count())
    pqAdc(spark, dir, sampledTrain = true, ivfGate = true,
      rerank = true, rerankAll = true, cells = cells)
  }

  /** The BUILD half of the PQ engine: train codebooks (full or
    * hash-sampled train set), optionally train the coarse IVF gate,
    * and encode the corpus — returning the codes frame (embedding
    * column already dropped), the m subspace centroid frames, and the
    * gate centroids. This is what [[PqIndex]] persists; declared keys
    * never call it directly on a warm index. */
  private[graft] def pqBuild(spark: SparkSession, dir: String,
                             sampledTrain: Boolean, ivfGate: Boolean,
                             cells: Int = IvfPqCells)
      : (DataFrame, Seq[DataFrame], Option[DataFrame]) = {
    import graft.api.GraftOps
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
    // deterministic hash-sample train set (engine-neutral md5 rule —
    // the q_sample_hash operator's selection, keyed on vec_id)
    val train =
      if (sampledTrain)
        GraftOps.sampleByHash(emb, "cast(vec_id as string)", PqSamplePct)
      else emb
    val slices = (0 until PqM).map(s => s"slice(embedding, ${s * PqSub + 1}, $PqSub)")
    // per-subspace codebooks (centroids only; Lloyd checkpoints inside)
    val cents = slices.map(sl => GraftOps.kmeansModel(train, "vec_id", sl, PqK, PqIters)._1)
    // optional coarse IVF model: cells over FULL vectors. r15: the
    // gate TRAINS on the same hash-sample as the codebooks (the full
    // production amortization story) but ASSIGNS the full corpus —
    // assignment is the same broadcast-centroids + codegen'd argmin
    // map stage as the encode below, so the corpus never joins or
    // shuffles for its cell either
    val gate =
      if (ivfGate)
        Some(GraftOps.kmeansModel(train, "vec_id", "embedding", cells, PqIters)._1)
      else None
    // encode: m chained zero-shuffle map stages (gate cell rides along)
    var coded = gate match {
      case Some(cent) =>
        emb.select(col("vec_id").as("neighbor"), col("embedding"))
          .crossJoin(broadcast(GraftOps.centroidArray(cent)))
          .withColumn("cell", GraftOps.cellColumn("embedding"))
          .drop("__cs")
      case None => emb.select(col("vec_id").as("neighbor"), col("embedding"))
    }
    cents.zip(slices).zipWithIndex.foreach { case ((cent, sl), s) =>
      coded = coded.crossJoin(broadcast(GraftOps.centroidArray(cent)))
        .withColumn(s"pq$s", GraftOps.cellColumn(sl))
        .drop("__cs")
    }
    (coded.drop("embedding"), cents, gate)
  }

  /** The one PQ-ADC engine behind [[qKnnPq]] / [[qKnnPqSampled]] /
    * [[qKnnIvfPq]]: stored-index load (build-and-publish on first
    * touch — [[PqIndex]]), broadcast-LUT ADC scoring, top-3 window.
    *
    * r16: the codes table and codebooks are READ FROM THE PERSISTED
    * INDEX — every execution (including the one that built it) scans
    * the published parquet, so the measured key wall is the
    * stored-index search wall a deployment pays per query, and no
    * localCheckpoint pins executor storage memory for the session
    * (the r15 stand-in, retired per its own documented concern).
    * Ints and rounded doubles round-trip parquet exactly; PqIndexSpec
    * pins value-for-value equality between a stored-index search and
    * a fresh in-session build. */
  private[graft] def pqAdc(spark: SparkSession, dir: String,
                           sampledTrain: Boolean, ivfGate: Boolean,
                           rerank: Boolean = false,
                           rerankDepth: Int = IvfPqRerankDepth,
                           nprobe: Int = IvfPqNprobe,
                           adaptive: Boolean = true,
                           cells: Int = IvfPqCells,
                           rerankAll: Boolean = false): DataFrame = {
    require(!rerankAll || (rerank && ivfGate),
      "rerankAll enumerates the gated set — it needs the IVF gate and the rerank stage")
    import graft.api.GraftOps
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
    val (coded, cents, gate) =
      PqIndex.loadOrBuild(spark, dir, sampledTrain, ivfGate, cells = cells)(
        pqBuild(spark, dir, sampledTrain, ivfGate, cells))
    val slices = (0 until PqM).map(s => s"slice(embedding, ${s * PqSub + 1}, $PqSub)")
    // ADC lookup tables: probe-slice × centroid dots, 6 dp (m·k rows)
    val luts = cents.zip(slices).zipWithIndex.map { case ((cent, sl), s) =>
      emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as(s"p$s"),
          expr(s"transform($sl, x -> cast(x as double))").as("__q"))
        .crossJoin(broadcast(cent))
        .select(col(s"p$s"), col("__cell").as(s"c$s"),
          round(expr("graft_num_dot(__q, __c)"), 6).as(s"d$s"))
    }
    // coarse gate: restrict the scan to each probe's top-nprobe cells
    // (broadcast of ≤ probes·nprobe rows; same CellTopP metric as the
    // build, so rank-1 always contains the probe's own cell)
    val base = gate match {
      case Some(cent) =>
        val probeCell = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("p_id"), col("embedding").as(P))
          .crossJoin(broadcast(GraftOps.centroidArray(cent)))
          .select(col("p_id"),
            // nprobe is a SEARCH-TIME dial: it widens the gate over
            // the same stored index (no rebuild) — the knob the
            // recall-vs-wall curve sweeps (tools.AnnLadderRecall)
            explode(expr(s"graft_cell_topp($P, __cs, $nprobe)")).as("cell"))
        broadcast(probeCell).join(coded, "cell")
      case None => coded
    }
    // exact-rerank tail shared by the shortlist and rerank-all paths:
    // float vectors come back for ONLY the shortlisted rows via two
    // broadcast joins — the corpus-wide scan stays codes-only
    def exactRerank(shortlist: DataFrame): DataFrame = {
      val t = emb.select(col("vec_id").as("neighbor"), col("embedding").as(T))
      val p = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("p0"), col("embedding").as(P))
      val exact = t.join(broadcast(shortlist), "neighbor")
        .join(broadcast(p), "p0")
        .select(col("p0"), col("neighbor"),
          round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
      val w2 = Window.partitionBy(col("p0")).orderBy(col("cos").desc, col("neighbor"))
      exact.withColumn("rk", row_number().over(w2)).filter(col("rk") <= 3)
        .select(col("p0").as("vec_id"), col("neighbor"), col("cos"))
        .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
    }
    // rerank-all (r19, the measured k ∝ N recipe — [[qKnnIvfPqRerank
    // Scaled]]): the gate bounds the candidate set to a CONSTANT
    // ≈ nprobe/64·20 000 rows per probe, so the exact rerank consumes
    // it whole and ADC scoring would order a list nothing truncates —
    // the LUT joins and BOTH window passes of the shortlist path
    // vanish; the codes table is scanned purely as the inverted list
    // (cell → neighbor), its 100 TB role
    if (rerankAll)
      return exactRerank(base.filter(col("neighbor") =!= col("p_id"))
        .select(col("p_id").as("p0"), col("neighbor")))
    val scored = luts.zipWithIndex.foldLeft(base) { case (acc, (lut, s)) =>
      val cond =
        if (s == 0 && ivfGate) col("pq0") === col("c0") && col("p0") === col("p_id")
        else if (s == 0) col("pq0") === col("c0")
        else col(s"pq$s") === col(s"c$s") && col(s"p$s") === col("p0")
      acc.join(broadcast(lut), cond)
    }
      .filter(col("neighbor") =!= col("p0"))
      .withColumn("adc",
        round(col("d0") + col("d1") + col("d2") + col("d3"), 4))
    val w = Window.partitionBy(col("p0")).orderBy(col("adc").desc, col("neighbor"))
    if (!rerank)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("p0").as("vec_id"), col("neighbor"), col("adc"))
        .orderBy(col("vec_id"), col("adc").desc, col("neighbor"))
    else {
      // exact-rerank stage: ADC keeps a bounded shortlist per probe;
      // float vectors come back for ONLY those rows via two broadcast
      // joins — the corpus-wide scan above stayed codes-only.
      // r17 DEPTH LAW (measured, SCALE.md §depth law): recall tracks
      // the shortlist as a FRACTION of the probe's gated candidates,
      // not as an absolute — depth 1000 read 0.97 at 20 k vectors but
      // 0.50 at 200 k, and 20% of candidates reads 0.93–0.97 at BOTH.
      // The declared key therefore sizes its shortlist per probe as
      // max(rerankDepth, candidates/5): the count windows over the
      // SAME partition as the rank (no new Exchange), and the floor
      // keeps small-corpus behavior identical. Dial instruments pass
      // adaptive = false to sweep the absolute axis. The fraction is
      // safe because the GATE bounds candidates (nprobe/k of the
      // corpus); a deployment that instead grows k with the corpus
      // (k ∝ N, measured r18 — SCALE.md §Round 18) shrinks candidates
      // to shortlist size and reranks ALL of them, which this same
      // expression expresses as fraction → 1.
      val shortlist = scored
        .withColumn("crk", row_number().over(w))
        .withColumn("__nc", count(lit(1)).over(Window.partitionBy(col("p0"))))
        .filter(col("crk") <=
          (if (adaptive) greatest(lit(rerankDepth), col("__nc") / lit(5))
           else lit(rerankDepth).cast("double")))
        .select(col("p0"), col("neighbor"))
      exactRerank(shortlist)
    }
  }

  /** Typed-Aggregator UDAF: weighted average price by quantity per
    * returnflag; oracle is the algebraic sum(v*w)/sum(w). */
  def qAggUdafWavg(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(graft.agg.WeightedAvg)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }
}
