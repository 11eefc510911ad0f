package graft

import org.apache.spark.sql.functions._
import graft.catalyst.GraftFunctions
import graft.queries.{EmbLsh, VectorOps}

/** Measured recall of every approximate vector operator against the
  * brute-force ground truth, on the sf0.001 fixture (SURVEY.md §4 /
  * round-3 verdict item 3). These are the numbers the oracle CANNOT
  * check — each approximate key's DuckDB oracle reproduces the same
  * blocking, so a recall collapse would stay oracle-green; this spec
  * is the guard.
  *
  * All inputs are deterministic (fixed hyperplanes, fixed fixture), so
  * the measured recalls are exact reproducible values; the asserted
  * floors sit just below them and exist to catch structural
  * regressions, not noise. Context for the absolute numbers: the
  * fixture is isotropic random data — near-dup pairs at cos ∈
  * [0.4,0.5] and true top-3 neighbours at cos ∈ [0.29,0.39], the
  * regime where the LSH exponent ρ = ln p₁/ln p₂ ≈ 0.6 makes high
  * recall and strong pruning mutually exclusive (see EmbLsh scaladoc
  * and SCALE.md §ANN). Clustered real embeddings do strictly better.
  */
class AnnRecallSpec extends SparkSpec {

  private def pairsOf(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val emb = {
    GraftFunctions.ensureRegistered(spark)
    Tables.embeddings(spark, sf)
  }

  /** Brute-force near-dup ground truth: all pairs with rounded cos ≥ 0.4. */
  private lazy val gtNearDup: Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("e_b"))
    pairsOf(
      a.crossJoin(b).filter(col("va") < col("vb"))
        .filter(round(expr("graft_dot_product(e_a, e_b)"), 4) >= 0.4), "va", "vb")
  }

  /** Brute-force top-3 neighbours of the 10 probe vectors. */
  private lazy val gtTop3: Set[(Long, Long)] = {
    val p = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = emb.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val scored = p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
      .select(col("vec_id"), col("neighbor"),
        round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairsOf(scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3),
      "vec_id", "neighbor")
  }

  test("q_dedup_embedding: sound (no false positives) and recall ≥ 0.70 vs brute force") {
    val found = pairsOf(VectorOps.qDedupEmbedding(spark, sf), "vec_a", "vec_b")
    assert(found.subsetOf(gtNearDup),
      s"reported pairs must all be true near-dups; extras: ${found -- gtNearDup}")
    val recall = found.size.toDouble / gtNearDup.size
    info(f"dedup_embedding recall = ${found.size}/${gtNearDup.size} = $recall%.3f")
    assert(recall >= 0.70, f"recall $recall%.3f below 0.70 floor (measured 0.742)")
  }

  test("EmbLsh band keys have real fan-out — hundreds of buckets, bounded skew") {
    val keyed = emb.select(explode(expr(EmbLsh.sparkKeysExpr)).as("k"))
    val sizes = keyed.groupBy("k").count()
    val (buckets, maxBucket) = {
      val r = sizes.agg(count(lit(1)).as("b"), max("count").as("m")).head()
      (r.getLong(0), r.getLong(1))
    }
    info(s"distinct band-bucket keys = $buckets, max bucket = $maxBucket of 500")
    assert(buckets > 1000, s"fan-out collapsed: only $buckets buckets")
    assert(maxBucket <= 40, s"skewed bucket of $maxBucket vectors (measured max 27)")
  }

  test("q_knn_bucketed: measured top-3 recall ≥ 0.40 at 1/4 corpus scanned") {
    val found = pairsOf(VectorOps.qKnnBucketed(spark, sf), "vec_id", "neighbor")
    val recall = (found & gtTop3).size.toDouble / gtTop3.size
    info(f"knn_bucketed recall = ${(found & gtTop3).size}/${gtTop3.size} = $recall%.3f")
    assert(recall >= 0.40, f"recall $recall%.3f below 0.40 floor (measured 0.433)")
  }

  test("EmbLsh keys of a null-element embedding = band offsets (oracle's ELSE-0 rule), both eval paths") {
    // DuckDB: list_dot_product propagates NULL, CASE WHEN NULL>0 takes
    // ELSE 0 — so every sign bit is unset. Codegen path:
    import spark.implicits._
    val df = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 3.0f))).toDF("embedding")
    val viaSql = df.select(expr(EmbLsh.sparkKeysExpr).as("k")).head().getSeq[Int](0)
    assert(viaSql == graft.catalyst.EmbLshKeys.nullElementKeys.toSeq, viaSql)
    // Interpreted path (direct eval, bypasses codegen):
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Any](1.0f, null, 3.0f))
    val viaEval = graft.catalyst.EmbLshKeys(
      org.apache.spark.sql.catalyst.expressions.Literal(
        arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray.toSeq
    assert(viaEval == graft.catalyst.EmbLshKeys.nullElementKeys.toSeq, viaEval)
  }

  test("q_knn_ivf (nprobe=2): measured top-3 recall ≥ 0.25 at 2/10 corpus scanned") {
    val found = pairsOf(VectorOps.qKnnIvf(spark, sf), "vec_id", "neighbor")
    val recall = (found & gtTop3).size.toDouble / gtTop3.size
    info(f"knn_ivf recall = ${(found & gtTop3).size}/${gtTop3.size} = $recall%.3f")
    assert(recall >= 0.25, f"recall $recall%.3f below 0.25 floor (measured 0.30)")
  }

  test("q_knn_ivf nprobe curve (1/2/4): recall is monotone in scan fraction") {
    // nprobe is THE IVF recall/cost knob: each probe cell adds 1/10 of
    // the corpus to the scan. The curve must never bend down — more
    // cells can only add candidates, and top-3 selection over a
    // superset can only improve against ground truth.
    val recalls = Seq(1, 2, 4).map { np =>
      val found = pairsOf(VectorOps.qKnnIvfProbed(spark, sf, np), "vec_id", "neighbor")
      np -> (found & gtTop3).size.toDouble / gtTop3.size
    }
    info(recalls.map { case (np, r) => f"nprobe=$np: $r%.3f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, f"recall fell from $r1%.3f (nprobe=$np1) to $r2%.3f (nprobe=$np2)")
    }
    // pins the measured curve shape: 4 cells must beat the declared 2
    val byNp = recalls.toMap
    assert(byNp(4) > byNp(2), "nprobe=4 should strictly improve over nprobe=2 on this fixture")
  }

  test("q_dedup_semantic: sound (no false positives), recall measured vs LSH blocking") {
    // SemDeDup blocking (8 learned cells) vs the 21×6-bit sign-LSH of
    // q_dedup_embedding, same τ and same brute-force ground truth. A
    // within-cell pair is always a true candidate (the dot product is
    // exact), so soundness is structural; recall measures how many
    // τ-pairs land in the SAME cell. On this isotropic fixture most
    // τ = 0.4 pairs are noise-tail pairs with no semantic structure,
    // so cell-recall sits well below the LSH's 0.742 — the knob the
    // paper turns (more clusters → finer cells) trades the other way
    // on real clustered embeddings. The floor pins the planted twin
    // layer's behavior: cos ≈ 0.90 twins are co-assigned reliably.
    val found = pairsOf(VectorOps.qDedupSemantic(spark, sf), "vec_a", "vec_b")
    assert(found.subsetOf(gtNearDup),
      s"within-cell pairs must be true near-dups; extras: ${found -- gtNearDup}")
    val recall = found.size.toDouble / gtNearDup.size
    info(f"dedup_semantic recall = ${found.size}/${gtNearDup.size} = $recall%.3f (LSH: 0.742)")
    // measured 0.364 on this fixture (8 cells ⇒ a random noise-tail
    // pair co-assigns w.p. ~1/8; the measured value above that floor
    // is the twins + what cluster structure the weak label tilt
    // gives). Deterministic inputs ⇒ exact reproducible value; the
    // floor guards structural collapse (e.g. all-one-cell or
    // cells-ignore-geometry regressions in the kmeans build).
    assert(recall >= 0.30, f"recall $recall%.3f below 0.30 floor (measured 0.364)")
  }

  test("q_knn_ivf_kmeans (unsupervised cells, nprobe=2): measured top-3 recall ≥ 0.25") {
    // the end-to-end unsupervised path: kmeans(k=8, 2 rounds) trains
    // the cells q_knn_ivf reads from the fixture's label column. On
    // this isotropic fixture the learned 8-cell partition behaves like
    // the 10 label cells (slightly coarser: 2/8 of the corpus scanned
    // at nprobe=2 vs 2/10) — the floor pins that training cells from
    // nothing does not collapse retrieval.
    val found = pairsOf(VectorOps.qKnnIvfKmeans(spark, sf), "vec_id", "neighbor")
    val recall = (found & gtTop3).size.toDouble / gtTop3.size
    info(f"knn_ivf_kmeans recall = ${(found & gtTop3).size}/${gtTop3.size} = $recall%.3f")
    assert(recall >= 0.25, f"recall $recall%.3f below 0.25 floor (measured 0.467)")
  }

  test("q_knn_ivf_mp (fine cells, 64/2/16): recall ≥ 0.70, beating the coarse key at the SAME scan fraction") {
    // r11 (VERDICT r10 #2): the dial sweep (tools.AnnDialBench,
    // SCALE.md §ANN dial) established the production law — hold
    // nprobe/k (the scan cost) and grow both (the resolution):
    // quarter-corpus scan recall measures 0.47 (8/2/2) → 0.77 here,
    // 0.80 at sf0.01, 0.90 at sf1. The fixture's isotropic geometry
    // (true neighbours at cos 0.29–0.39, barely above noise) is what
    // caps the quarter-scan ceiling: recall beyond it costs scan
    // fraction (nprobe=8/k=8 scans all and hits 1.0); clustered real
    // embeddings concentrate neighbours in fewer cells and do
    // strictly better at every point of the curve.
    val coarse = pairsOf(VectorOps.qKnnIvfKmeans(spark, sf), "vec_id", "neighbor")
    val fine = pairsOf(VectorOps.qKnnIvfMp(spark, sf), "vec_id", "neighbor")
    val rc = (coarse & gtTop3).size.toDouble / gtTop3.size
    val rf = (fine & gtTop3).size.toDouble / gtTop3.size
    info(f"coarse (8/2/2) recall = $rc%.3f, fine (64/2/16) recall = $rf%.3f, scan frac 0.25 both")
    assert(rf >= 0.70, f"fine-cell recall $rf%.3f below 0.70 floor (measured 0.767)")
    assert(rf > rc, f"fine cells must beat coarse at equal scan fraction ($rf%.3f vs $rc%.3f)")
  }

  test("q_knn_ivf_mp holds its recall at the 20k-vector fixture (sf1): ≥ 0.80 at quarter scan") {
    // r12 (VERDICT r11 #4): the dial table's strongest claim is that
    // fine cells keep paying as the corpus grows — sf1 measured 0.90
    // for (64/2/16) vs 0.50 coarse at the same quarter-corpus scan.
    // Floor it at the committed 20k-vector fixture so a kmeans or
    // CellTopP regression that only bites at real cell populations
    // (312 vectors/cell here vs ~8 at sf0.001) cannot hide behind the
    // tiny-fixture tests. Deterministic inputs ⇒ exact reproducible
    // value; floor sits under the measured point, above coarse.
    val sf1 = "testdata/sf1"
    assume(new java.io.File(s"$sf1/embeddings.parquet").exists(), s"fixture $sf1 absent")
    GraftFunctions.ensureRegistered(spark)
    val e1 = Tables.embeddings(spark, sf1)
    val p = e1.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = e1.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    val gt = pairsOf(
      p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
        .select(col("vec_id"), col("neighbor"),
          round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3),
      "vec_id", "neighbor")
    val found = pairsOf(VectorOps.qKnnIvfMp(spark, sf1), "vec_id", "neighbor")
    val recall = (found & gt).size.toDouble / gt.size
    info(f"knn_ivf_mp sf1 recall = ${(found & gt).size}/${gt.size} = $recall%.3f")
    assert(recall >= 0.80, f"sf1 recall $recall%.3f below 0.80 floor (measured 0.900)")
  }

  test("q_knn_ivf_hr (high-recall half scan, 128/2/64): sf1 recall ≥ 0.90") {
    // r13 (VERDICT r12 #5): the declared high-recall rung — past the
    // quarter-scan fine-cell plateau, recall is bought with scan
    // fraction, and this key doubles it (nprobe/k = 1/2). The sf10
    // dial measured 0.97 here vs 0.77 for the declared quarter-scan
    // point; floor the committed 20k fixture at 0.90 (156 vectors/
    // cell — real cell populations, same rationale as the mp test).
    val sf1 = "testdata/sf1"
    assume(new java.io.File(s"$sf1/embeddings.parquet").exists(), s"fixture $sf1 absent")
    GraftFunctions.ensureRegistered(spark)
    val e1 = Tables.embeddings(spark, sf1)
    val p = e1.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = e1.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    val gt = pairsOf(
      p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
        .select(col("vec_id"), col("neighbor"),
          round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3),
      "vec_id", "neighbor")
    val found = pairsOf(VectorOps.qKnnIvfHr(spark, sf1), "vec_id", "neighbor")
    val recall = (found & gt).size.toDouble / gt.size
    info(f"knn_ivf_hr sf1 recall = ${(found & gt).size}/${gt.size} = $recall%.3f")
    assert(recall >= 0.90, f"sf1 recall $recall%.3f below 0.90 floor")
  }

  test("q_knn_ivf_pq (r15): sf1 recall measured against the exact baseline and q_knn_ivf_hr") {
    // The Faiss IVF-PQ shape trades BOTH scan fraction (16/64 probed
    // cells) and score fidelity (4×4-bit ADC estimates) for
    // memory/throughput — on the isotropic fixture (true neighbours
    // at cos 0.29–0.39, quantization-error avg ~0.10 per PqSpec) the
    // ADC noise is the same scale as the signal, so this is the
    // documented recall FLOOR of the operator family, not its typical
    // value; clustered real embeddings do strictly better on both
    // axes. The pin: retrieval must stay far above random (random
    // top-3 of 20k ≈ 0.00015 expected overlap), and the exact-scoring
    // half-scan key (q_knn_ivf_hr) must dominate it — the ordering
    // that makes the production ladder (gate → codes → rerank)
    // coherent.
    val sf1 = "testdata/sf1"
    assume(new java.io.File(s"$sf1/embeddings.parquet").exists(), s"fixture $sf1 absent")
    GraftFunctions.ensureRegistered(spark)
    val e1 = Tables.embeddings(spark, sf1)
    val p = e1.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = e1.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    val gt = pairsOf(
      p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
        .select(col("vec_id"), col("neighbor"),
          round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3),
      "vec_id", "neighbor")
    val foundPq = pairsOf(VectorOps.qKnnIvfPq(spark, sf1), "vec_id", "neighbor")
    val foundHr = pairsOf(VectorOps.qKnnIvfHr(spark, sf1), "vec_id", "neighbor")
    val rPq = (foundPq & gt).size.toDouble / gt.size
    val rHr = (foundHr & gt).size.toDouble / gt.size
    info(f"ivf_pq sf1 recall = ${(foundPq & gt).size}/${gt.size} = $rPq%.3f (hr = $rHr%.3f)")
    assert(rPq > 0.0, "IVF-PQ retrieval degenerated to zero overlap with exact top-3")
    assert(rHr >= rPq, f"exact-scoring hr ($rHr%.3f) must dominate ADC scoring ($rPq%.3f)")
    // the complete ladder (r15): exact rerank of the bounded ADC
    // shortlist restores the recall the quantized scoring loses —
    // strictly better than raw gated ADC, approaching the gate's own
    // ceiling (exact scoring of everything in the probed cells)
    val foundRr = pairsOf(VectorOps.qKnnIvfPqRerank(spark, sf1), "vec_id", "neighbor")
    val rRr = (foundRr & gt).size.toDouble / gt.size
    info(f"ivf_pq_rerank sf1 recall = ${(foundRr & gt).size}/${gt.size} = $rRr%.3f")
    assert(rRr > rPq, f"rerank ($rRr%.3f) must beat raw gated ADC ($rPq%.3f)")
    assert(rRr >= 0.30, f"ladder recall $rRr%.3f below the 0.30 floor")
  }

  test("q_knn_ivf_kmeans nprobe curve (1/2/4): recall is monotone in scan fraction") {
    val recalls = Seq(1, 2, 4).map { np =>
      val found = pairsOf(VectorOps.qKnnIvfKmeansProbed(spark, sf, np), "vec_id", "neighbor")
      np -> (found & gtTop3).size.toDouble / gtTop3.size
    }
    info(recalls.map { case (np, r) => f"nprobe=$np: $r%.3f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, f"recall fell from $r1%.3f (nprobe=$np1) to $r2%.3f (nprobe=$np2)")
    }
  }

  test("q_knn_ivf_kmeans: a corpus probe's top-ranked cell is its own kmeans cell") {
    // the property the scaladoc claims BY CONSTRUCTION: probe-cell
    // ranking uses the build's own argmin metric, so rank-1 = the cell
    // the corpus copy was assigned to, for every probe
    val (cent, assigned) = graft.api.GraftOps
      .kmeansModel(emb, "vec_id", "embedding", 8, 2)
    val own = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val centN = cent.withColumn("__cn", round(expr("graft_num_dot(__c, __c)"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d_c"), col("cell"))
    val top1 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
      .crossJoin(broadcast(centN))
      .select(col("vec_id"),
        round(col("__cn") - lit(2.0) * expr("graft_num_dot(e_p, __c)"), 6).as("d_c"),
        col("__cell").as("cell"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(top1 == own, s"probe top-1 cells $top1 != corpus assignment $own")
  }

  test("q_knn_rerank (int8 coarse → exact re-rank): top-3 recall ≥ 0.9") {
    // unlike the LSH/IVF keys this is NOT a pruning trade-off: the
    // coarse pass scans everything at 1/127 resolution, so the only
    // recall loss is a true neighbour dropping below shortlist depth
    // 20 by quantization reordering (measured: 30/30 = 1.00 against
    // this spec's ground truth; 0.9 floor leaves room for one
    // boundary pair)
    val found = pairsOf(VectorOps.qKnnRerank(spark, sf), "vec_id", "neighbor")
    val recall = (found & gtTop3).size.toDouble / gtTop3.size
    info(f"knn_rerank recall = ${(found & gtTop3).size}/${gtTop3.size} = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9 floor (measured 0.97)")
  }

  test("scaledGateCells: the k ∝ N rule is the integer rule the oracle replays") {
    // k = 64·(N/20000) floored, min 8 — must equal DuckDB's
    // greatest(8, (count(*) * 64) // 20000) at every fixture size
    assert(VectorOps.scaledGateCells(500) === 8)     // sf0.001 / sf0.01
    assert(VectorOps.scaledGateCells(2000) === 8)    // sf0.1 (6 → floor)
    assert(VectorOps.scaledGateCells(20000) === 64)  // sf1: the anchor
    assert(VectorOps.scaledGateCells(200000) === 640) // sf10 / mog10
    assert(VectorOps.scaledGateCells(2000000) === 6400)
  }

  test("q_knn_ivf_pq_rerank_scaled: recall ≥ 0.95 at the 200k measured point (mog10)") {
    // r19 (VERDICT r18 missing #1): the declared key must EMBODY the
    // measured recipe, so the pin runs at the measurement's own scale
    // — 200k clustered vectors (mog:64:120, the geometry real text
    // embeddings exhibit), gate k = scaledGateCells(200000) = 640 at
    // nprobe 16, exact rerank of the whole gated set.
    // docs/ann_gate_growth_r18.jsonl measured gate recall 1.000 and
    // total recall 1.000 here; the 0.95 floor leaves room for one
    // boundary pair without admitting a structural regression. First
    // run pays the mog10 generation + 640-cell index build once — the
    // versioned stored index makes every later run a codes-table read.
    val dir = "testdata/mog10"
    graft.tools.GenData.ensure(spark, dir)
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as("e_p"))
    val t = e.select(col("vec_id").as("neighbor"), col("embedding").as("e_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    val gt = pairsOf(
      p.crossJoin(t).filter(col("neighbor") =!= col("vec_id"))
        .select(col("vec_id"), col("neighbor"),
          round(expr("graft_dot_product(e_p, e_t)"), 4).as("cos"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3),
      "vec_id", "neighbor")
    val found = pairsOf(VectorOps.qKnnIvfPqRerankScaled(spark, dir),
      "vec_id", "neighbor")
    val recall = (found & gt).size.toDouble / gt.size
    info(f"ivf_pq_rerank_scaled 200k recall = ${(found & gt).size}/${gt.size} = $recall%.3f")
    assert(recall >= 0.95,
      f"200k recall $recall%.3f below 0.95 floor (measured 1.000 in r18)")
  }
}
