package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** The reusable library surface: each GraftOps function must agree
  * with the corresponding declared (oracle-verified) query shape when
  * bound to the same fixtures. */
class GraftOpsSpec extends SparkSpec {

  test("minhashSignatures + lshCandidates reproduce the declared minhash key's pairs") {
    val docs = Tables.documents(spark, sf)
    val sigs = GraftOps.minhashSignatures(docs, "doc_id", "text")
    val cand = GraftOps.lshCandidates(sigs, "doc_id")
      .filter(col("jacc_est") >= 0.5)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jacc_est"))
      .orderBy(col("jacc_est").desc, col("doc_a"), col("doc_b"))
      .limit(200)
    val declared = queries.DedupOps.qDedupMinhash(spark, sf)
    assert(cand.exceptAll(declared).isEmpty && declared.exceptAll(cand).isEmpty)
  }

  test("cosineTopK reproduces the declared cosine key's neighbours") {
    val e = Tables.embeddings(spark, sf)
    val api = GraftOps.cosineTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("probe_id").as("vec_id"), col("neighbor"), round(col("cos"), 4).as("cos"))
    val declared = queries.LlmOps.qCosineTopk(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("dedupExact keeps exactly the min-tiebreak row per key") {
    val l = Tables.lineitem(spark, sf)
    val api = GraftOps.dedupExact(l,
      Seq("l_returnflag", "l_linestatus"), Seq("l_orderkey", "l_linenumber"))
    val declared = queries.SetOps.qDedupExact(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("chunk and sampleByHash produce the declared shapes") {
    val docs = Tables.documents(spark, sf)
    val chunks = GraftOps.chunk(docs.filter(col("doc_id") < 100), "text", 20, 10)
    assert(chunks.count() ===
      queries.TextOps.qTextChunk(spark, sf).count())
    val sampled = GraftOps.sampleByHash(docs, "text", 10)
    val total = docs.count().toDouble
    assert(sampled.count() > 0 && sampled.count() < total * 0.35)
    // reproducible: same selection every run
    assert(sampled.agg(sum("doc_id")).head().getLong(0) ===
      GraftOps.sampleByHash(docs, "text", 10).agg(sum("doc_id")).head().getLong(0))
  }

  test("embeddingNearDups reproduces the declared embedding-dedup key's pairs") {
    val e = Tables.embeddings(spark, sf)
    val api = GraftOps.embeddingNearDups(e, "vec_id", "embedding", 0.4)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
    val declared = queries.VectorOps.qDedupEmbedding(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("first-common-band candidate dedup ≡ the distinct() it replaced") {
    // The r8 rewrite keeps each colliding pair only in its first
    // common band (graft_first_band_match) instead of running
    // .distinct() over the per-band candidate stream — the sets must
    // be identical: one surviving emission per colliding pair, none
    // invented, none lost.
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val keyed = Tables.embeddings(spark, sf).select(col("vec_id"),
      expr(graft.queries.EmbLsh.sparkKeysExpr).as("sig"))
    val a = keyed.select(col("vec_id").as("id_a"), col("sig").as("sa"),
      explode(col("sig")).as("k"))
    val b = keyed.select(col("vec_id").as("id_b"), col("sig").as("sb"),
      explode(col("sig")).as("k"))
    val joined = a.join(b, "k").filter(col("id_a") < col("id_b"))
    val firstBand = joined
      .filter(expr("graft_first_band_match(sa, sb)") === col("k"))
      .select(col("id_a"), col("id_b"))
    val viaDistinct = joined.select(col("id_a"), col("id_b")).distinct()
    assert(firstBand.count() === viaDistinct.count(),
      "first-band emission count != distinct pair count (duplicates survived)")
    assert(firstBand.exceptAll(viaDistinct).isEmpty &&
      viaDistinct.exceptAll(firstBand).isEmpty)
  }

  test("approxDistinct agrees with the HLL Aggregator surface") {
    val o = Tables.orders(spark, sf)
    val viaApi = o.agg(GraftOps.approxDistinct(o, "o_custkey")).head().getLong(0)
    val hll = udaf(new graft.agg.HllDistinct())
    val viaAggregator = o.agg(hll(col("o_custkey"))).head().getLong(0)
    assert(viaApi === viaAggregator)
  }

  test("connectedComponents labels every node with its component minimum") {
    import spark.implicits._
    // two chains and an isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("s", "d")
    val got = GraftOps.connectedComponents(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponentsStars ≡ propagation on chains, cliques, stars, and a random graph") {
    import spark.implicits._
    // the structured shapes that stress each algorithm differently:
    // long chains (diameter — propagation's worst case), a dense
    // clique (star rewriting's one-round collapse), pre-made stars,
    // self-loops, plus a seeded random graph
    val chain = (1L until 30L).map(i => (i, i + 1))
    val clique = (for (i <- 100L to 115L; j <- (i + 1) to 115L) yield (i, j)).toSeq
    val star = (201L to 210L).map(i => (200L, i))
    val selfloop = Seq((300L, 300L))
    val rnd = new scala.util.Random(20260814L)
    val random = (0 until 200).map(_ => (400L + rnd.nextInt(80), 400L + rnd.nextInt(80)))
    val edges = (chain ++ clique ++ star ++ selfloop ++ random).toDF("s", "d")
    val prop = GraftOps.connectedComponents(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stars = GraftOps.connectedComponentsStars(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars === prop)
    // spot the invariants the equivalence rests on
    assert(stars(30L) === 1L && stars(115L) === 100L && stars(300L) === 300L)

    // r14: drive BOTH cores exactly as connectedComponentsAdaptive
    // dispatches them — canon/base as cheap projections over the
    // checkpointed raw frame, count taken once upstream — so the
    // stars-via-adaptive plumbing is exercised below the 1 M-edge
    // dispatch threshold too (the fixture sweep only reaches it at
    // sf10)
    import org.apache.spark.sql.functions.{col, greatest, least}
    val e = edges.select(col("s"), col("d")).localCheckpoint(true)
    val n = e.count()
    val viaStars = GraftOps.ccStars(e.select(
        greatest(col("s"), col("d")).as("__a"),
        least(col("s"), col("d")).as("__b")), n, _ => ())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = GraftOps.ccPropagation(e.select(
        col("s").as("__src"), col("d").as("__dst")), n, _ => ())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars === prop && viaProp === prop)
  }

  test("topKPerGroup API bounds rows per group") {
    val o = Tables.orders(spark, sf)
    val top = GraftOps.topKPerGroup(o, Seq("o_custkey"), "o_totalprice", desc = true, 2)
    val maxPer = top.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 2)
  }

  test("repetitionSignals reproduces the declared repetition key") {
    val api = GraftOps.repetitionSignals(Tables.documents(spark, sf), "doc_id", "text")
      .orderBy(col("doc_id")).limit(300)
    val declared = queries.TextOps.qTextRepetition(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("stratifiedSample's kept counts equal the declared sampling summary") {
    val api = GraftOps.stratifiedSample(Tables.documents(spark, sf), "lang", "text", 20)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    val declared = queries.TextOps.qSampleStratified(spark, sf)
      .select(col("lang"), col("n_kept"))
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("piiScrub reproduces the declared scrub columns on customer") {
    val api = GraftOps.piiScrub(Tables.customer(spark, sf), "c_name")
      .select(col("c_custkey").as("key"), col("c_name_masked").as("name_masked"),
        col("c_name_id").as("id_num"), col("c_name_token").as("id_token"))
    val declared = queries.ScrubOps.qPiiScrub(spark, sf)
      .filter(col("entity") === "customer")
      .select(col("key"), col("name_masked"), col("id_num"), col("id_token"))
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("normalizeText matches the declared normalization chain") {
    val base = Tables.part(spark, sf).withColumn("raw",
      concat(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")),
        lit(" é")))
    val api = GraftOps.normalizeText(base, "raw")
      .select(col("p_partkey"), col("norm"))
    val declared = queries.ScrubOps.qTextNormalize(spark, sf)
      .select(col("p_partkey"), col("norm"))
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("packShards assigns contiguous budget-bounded shards (declared key is its rollup)") {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val api = GraftOps.packShards(d, "doc_id", "n_tok", queries.PipelineOps.ShardBudget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    val declared = queries.PipelineOps.qPackShards(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
  }

  test("scd2 on a hand-built change stream compacts to the expected versions") {
    import spark.implicits._
    // key 1: A,A,B,A → 3 versions; key 2: C → 1 version
    val changes = Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), (1L, "B", 30L, 102L),
      (1L, "A", 40L, 103L), (2L, "C", 15L, 104L)
    ).toDF("k", "attr", "ts", "id")
    // the compacted attribute keeps its own name (ADVICE r6)
    val got = GraftOps.scd2(changes, "k", "attr", "ts", "id")
      .select($"k", $"attr", $"valid_from", $"valid_to", $"version", $"is_current")
      .orderBy($"k", $"version").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, "A", 10L, Some(30L), 1, false),
      (1L, "B", 30L, Some(40L), 2, false),
      (1L, "A", 40L, None, 3, true),
      (2L, "C", 15L, None, 1, true)))
  }

  test("intervalPeaks matches the declared overlap key and zorderKey the declared layout") {
    val o = Tables.orders(spark, sf)
    val spans = o.join(broadcast(Tables.customer(spark, sf)),
        o("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"), col("o_orderdate").as("t0"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("t1"))
    val api = GraftOps.intervalPeaks(spans, "n_name", "t0", "t1", "o_orderkey")
      .select(col("n_name"), col("peak_concurrent"), col("n_intervals").as("n_orders"))
    val declared = queries.WarehouseOps.qIntervalOverlap(spark, sf)
    assert(api.exceptAll(declared).isEmpty && declared.exceptAll(api).isEmpty)
    // zorderKey: x=5 sets z bits 0 and 4 (2i), y=3 sets z bits 1 and 3
    // (2i+1) → 0b11011 = 27
    import spark.implicits._
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(GraftOps.zorderKey("x", "y").as("z")).head.getLong(0)
    assert(z == 27L, s"expected 0b11011, got ${z.toBinaryString}")
  }

  test("pageRank matches the hand-unrolled iterations on a path graph") {
    // undirected path 1–2–3: deg = (1, 2, 1); three damping-0.85
    // rounds with 6 dp re-rounding give (by hand):
    //   iter1: (0.575, 1.85, 0.575)
    //   iter2: (0.93625, 1.1275, 0.93625)
    //   iter3: (0.629188, 1.741625, 0.629188)
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val pr = GraftOps.pageRank(edges, "s", "t", iters = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pr === Seq((1L, 1L, 0.629188), (2L, 2L, 1.741625), (3L, 1L, 0.629188)))
    // endpoints are symmetric and the center dominates at every depth
    val pr1 = GraftOps.pageRank(edges, "s", "t", iters = 1)
      .orderBy("node").collect().map(_.getDouble(2)).toSeq
    assert(pr1 === Seq(0.575, 1.85, 0.575))
  }

  test("pageRank fixpoint on regular graphs; disconnected components never interact") {
    // two disjoint triangles: every node has degree 2, so inflow is
    // always 2·(pr/2) = pr and the uniform rank 1.0 is an EXACT
    // fixpoint — any cross-component leakage or degree slip would
    // perturb it
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("s", "t")
    val pr = GraftOps.pageRank(edges, "s", "t", iters = 4).collect()
    assert(pr.length === 6)
    assert(pr.forall(_.getLong(1) == 2L), "all degrees must be 2")
    assert(pr.forall(_.getDouble(2) == 1.0), s"uniform fixpoint expected: ${pr.mkString(",")}")
  }

  test("kmeans separates planted clusters, assigns every point once, and is deterministic") {
    // Two tight planted clusters on the 2-sphere: x-ish points and
    // y-ish points. ANY 2-means from any seed pair must converge (2
    // Lloyd rounds suffice at this separation) to the planted split —
    // cluster ids are seed-order-dependent, membership is not.
    import spark.implicits._
    val pts = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.95f, 0.05f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.1f, 0.9f)), (6L, Seq(0.05f, 0.95f))
    ).toDF("id", "vec")
    val a = GraftOps.kmeans(pts, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L), "every point assigned exactly once")
    assert(a(1L) === a(2L) && a(2L) === a(3L), s"x-cluster split: $a")
    assert(a(4L) === a(5L) && a(5L) === a(6L), s"y-cluster split: $a")
    assert(a(1L) !== a(4L), s"clusters collapsed: $a")
    val b = GraftOps.kmeans(pts, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b, "deterministic across runs")
  }

  test("kmeans declared key: cells partition the corpus and reps are members") {
    val cells = graft.queries.VectorOps.qKmeansBuild(spark, sf).collect()
    assert(cells.map(_.getLong(1)).sum ===
      graft.Tables.embeddings(spark, sf).count(), "cells partition all vectors")
    assert(cells.length > 1 && cells.length <= 8, s"degenerate cell count ${cells.length}")
  }

  test("pageRank directed=true: no symmetrization, sinks kept with deg 0 (ADVICE r7)") {
    // directed path 1→2→3. deg = (1, 1, 0) — node 3 is a sink that
    // must still appear (it only occurs as a destination). By hand,
    // contributions always read the PREVIOUS iteration's state:
    //   iter1: in(1)=0, in(2)=1.0, in(3)=1.0 → pr=(0.15, 1.0, 1.0)
    //   iter2: in(2)=0.15, in(3)=1.0        → pr=(0.15, 0.2775, 1.0)
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val pr = GraftOps.pageRank(edges, "s", "t", iters = 2, directed = true)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pr === Seq((1L, 1L, 0.15), (2L, 1L, 0.2775), (3L, 0L, 1.0)))
  }
}
