package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits (SURVEY.md §4): the properties that make these
  * plans survive a 100× scale-up — filter pushdown into the parquet
  * scan, column pruning, broadcast of dimension tables, and no
  * cartesian products where an equi join exists.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_agg_pricing pushes the shipdate filter into the parquet scan and prunes columns") {
    val p = planOf(queries.Relational.qAggPricing(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the 6 referenced columns are read, not all 11
    assert(p.contains("ReadSchema") && !p.contains("l_partkey") && !p.contains("l_tax"), p)
  }

  test("q_join_regional broadcasts every dimension side") {
    val p = planOf(queries.Relational.qJoinRegional(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("seed star joins never broadcast the lineitem fact side (r6 hazard pin)") {
    // Spark's STATIC size estimate judged the narrow 4-column lineitem
    // scan broadcastable and built the fact hash relation on the
    // driver; the shuffle_hash hint on the pruned-orders side pins the
    // scale-safe shape — assert it survives refactors
    Seq(
      "q_join_regional" -> queries.Relational.qJoinRegional(spark, sf),
      "q_join_topk"     -> queries.Relational.qJoinTopk(spark, sf)
    ).foreach { case (name, df) =>
      val p = planOf(df)
      assert(p.contains("ShuffledHashJoin"),
        s"$name lost the shuffle_hash fact join:\n$p")
    }
  }

  test("aggregate-below-join keys plan no aggregation above their join (r8 rewrite pins)") {
    // The outer-join and Q3 keys pre-aggregate the fact side, so the
    // join output must flow straight to projection/top-k — an
    // aggregate ABOVE the join means the rewrite regressed to
    // shuffling joined fact rows into a group-by.
    Seq(
      "q_join_left_outer"  -> queries.Joins.qJoinLeftOuter(spark, sf),
      "q_join_right_outer" -> queries.Joins.qJoinRightOuter(spark, sf),
      "q_join_topk"        -> queries.Relational.qJoinTopk(spark, sf)
    ).foreach { case (name, df) =>
      // assert on the optimized LOGICAL plan: under AQE the physical
      // tree hides behind AdaptiveSparkPlanExec (childless), so a
      // SparkPlan.collect sees nothing to walk
      val plan = df.queryExecution.optimizedPlan
      val joinAboveAgg = plan.collect {
        case j if j.nodeName.contains("Join") =>
          // no aggregate node may sit on the path from root to this join
          var above = false
          def walk(n: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                   seenAgg: Boolean): Unit = {
            if (n.eq(j) && seenAgg) above = true
            n.children.foreach(c => walk(c, seenAgg || n.nodeName.contains("Aggregate")))
          }
          walk(plan, seenAgg = false)
          above
      }
      assert(joinAboveAgg.nonEmpty, s"$name plans no join at all:\n$plan")
      assert(!joinAboveAgg.exists(identity),
        s"$name plans an aggregate above its join (fact rows shuffled post-join):\n$plan")
    }
  }

  test("ROLLUP/CUBE/GROUPING SETS expand the pre-aggregated base grain, not the fact stream (r8)") {
    // Expand's input must be an Aggregate (the 6-row base grain), so
    // the grouping-set multiplier applies to a constant-size stream.
    Seq(
      "q_agg_rollup"        -> queries.Relational.qAggRollup(spark, sf),
      "q_agg_cube"          -> queries.Aggs.qAggCube(spark, sf),
      "q_agg_grouping_sets" -> queries.Aggs.qAggGroupingSets(spark, sf)
    ).foreach { case (name, df) =>
      // optimized logical plan for the same AQE reason as above
      val plan = df.queryExecution.optimizedPlan
      val expands = plan.collect { case e if e.nodeName.contains("Expand") => e }
      assert(expands.nonEmpty, s"$name lost its Expand node:\n$plan")
      expands.foreach { e =>
        val hasAggBelow = e.children.exists(_.collectFirst {
          case n if n.nodeName.contains("Aggregate") => n
        }.nonEmpty)
        assert(hasAggBelow,
          s"$name's Expand sits directly on the scan (fact stream multiplied):\n$plan")
      }
    }
  }

  test("q_join_smj honors the merge hint (big-big shape)") {
    val p = planOf(queries.Joins.qJoinSmj(spark, sf))
    assert(p.contains("SortMergeJoin"), p)
  }

  test("minhash LSH candidate generation is hash joins, not a cross product") {
    val p = planOf(queries.DedupOps.qDedupMinhash(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("minhash cross-band dedup is a map-side filter — no distinct aggregate over the candidate stream") {
    // r10 (VERDICT r9 #4): the old band1 ∪ band2 `.distinct()` planned
    // an Exchange + HashAggregate keyed on the doc-id pair over the
    // full capped candidate volume (13.7 M rows at sf10); the 2-band
    // first-common-band predicate does the same dedup as a column
    // comparison inside band 2's join stage. Aggregates keyed on the
    // band signatures legitimately remain (the over-cap bucket
    // counts), so pin specifically: no aggregate whose grouping keys
    // include a doc-id column.
    val p = planOf(queries.DedupOps.qDedupMinhash(spark, sf))
    val distinctAggs = "(?:Hash|Sort|ObjectHash)Aggregate\\(keys=\\[[^\\]]*doc_"
      .r.findAllIn(p).size
    assert(distinctAggs == 0,
      s"a distinct-style aggregate over doc-id pairs reappeared:\n$p")
  }

  test("q_dedup_levenshtein evaluates the O(len²) edit distance exactly once per pair") {
    // VERDICT r8 #5: the inline spelling computed levenshtein twice in
    // one projection (dist + overlap) and leaned on codegen subexpr
    // elimination without proof. The rewrite binds it once in its own
    // project; CollapseProject must NOT re-inline it (it declines to
    // duplicate non-cheap expressions). Count evaluations in the
    // OPTIMIZED plan — the one codegen consumes.
    val opt = queries.DedupOps.qDedupLevenshtein(spark, sf)
      .queryExecution.optimizedPlan.toString
    val evals = "levenshtein\\(".r.findAllIn(opt).size
    assert(evals == 1, s"expected exactly 1 levenshtein eval, found $evals:\n$opt")
  }

  test("bucketed knn joins on the bucket key — no cartesian product") {
    val p = planOf(queries.VectorOps.qKnnBucketed(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("embedding dedup LSH candidates come from an equi join on the band key — no cartesian/BNLJ") {
    val p = planOf(queries.VectorOps.qDedupEmbedding(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("embedding dedup candidate dedup is a map-side filter — no distinct aggregate in the plan") {
    // r8: the per-band duplicate emissions are killed by the codegen'd
    // first_band_match filter INSIDE the band join's stage; the old
    // .distinct() spelling planned an Exchange + HashAggregate over
    // the full candidate stream (~70 s of the 70.5 s sf1 key,
    // BASELINE.md §sf1). Pin both: the filter is present, and no
    // aggregate of any kind survives in the physical plan.
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val p = planOf(queries.VectorOps.qDedupEmbedding(spark, sf))
    assert(p.contains("first_band_match"),
      s"in-join candidate dedup filter missing:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate") &&
      !p.contains("ObjectHashAggregate"),
      s"a distinct-style aggregate reappeared in the candidate path:\n$p")
  }

  test("multi-probe SemDeDup exactly-once is a map-side predicate — no pair-keyed aggregate") {
    // r10: probes=2 candidates are deduped by the smallest-shared-cell
    // filter inside the cell join's stage, never by a distinct
    // Exchange. The kmeans build legitimately aggregates (centroid
    // updates are keyed on __cell/__p), so pin specifically: no
    // aggregate whose grouping keys include a vec-id column, and the
    // predicate exists — spelled with array_contains since r12 (the
    // array_intersect spelling allocated an OpenHashSet per candidate
    // pair; least(when(array_contains(...))) is the same min over the
    // shared set with zero allocation).
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val p = planOf(queries.VectorOps.qDedupSemanticMp(spark, sf))
    assert(p.contains("array_contains"),
      s"smallest-shared-cell predicate missing:\n$p")
    val pairAggs = "(?:Hash|Sort|ObjectHash)Aggregate\\(keys=\\[[^\\]]*(?:vec_id|id_a|id_b)"
      .r.findAllIn(p).size
    assert(pairAggs == 0,
      s"a distinct-style aggregate over vec-id pairs reappeared:\n$p")
  }

  test("tfidf resolves the Zipf head df by broadcast — only tail words reach the shuffle join") {
    // r11 (VERDICT r10 #5): the head vocabulary (top-1024 by df) rides
    // a BroadcastHashJoin LEFT OUTER on top of tf's aggregate output;
    // the tail join legitimately shuffles. Pin the left-outer
    // broadcast probe — the shape that keeps the Zipf-hot words out
    // of the word-keyed Exchange at corpus scale.
    val p = planOf(queries.TextOps.qTextTfidf(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"head-df broadcast probe missing:\n$p")
  }

  test("containment candidate dedup is a map-side predicate — no pair-keyed aggregate") {
    // r11 (VERDICT r10 #3): the last candidate-stream `.distinct()` in
    // the dedup family is gone — a pair colliding on several rare
    // grams is kept only where the join gram equals the smallest
    // shared rare-capable gram (array_min over the intersect of the
    // two carried rgs arrays), inside the block join's stage. The
    // per-doc gram-set fold and the df count legitimately aggregate
    // (keyed on doc_id ALONE / gram), so pin specifically: no
    // aggregate keyed on a doc-id PAIR, and the predicate exists.
    val p = planOf(queries.DedupOps.qDedupContainment(spark, sf))
    assert(p.contains("array_min(array_intersect"),
      s"smallest-shared-gram predicate missing:\n$p")
    val pairAggs = "(?:Hash|Sort|ObjectHash)Aggregate\\(keys=\\[[^\\]]*doc_a[^\\]]*doc_b"
      .r.findAllIn(p).size
    assert(pairAggs == 0,
      s"a distinct-style aggregate over doc-id pairs reappeared:\n$p")
  }

  test("corpus-cleaning keys are pure projections — no Exchange before the presentation sort") {
    // repetition/pii/normalize must stream through the scan; the only
    // shuffle allowed is the final orderBy's range exchange
    Seq(
      "q_text_repetition" -> queries.TextOps.qTextRepetition(spark, sf),
      "q_pii_scrub"       -> queries.ScrubOps.qPiiScrub(spark, sf),
      "q_text_normalize"  -> queries.ScrubOps.qTextNormalize(spark, sf)
    ).foreach { case (name, df) =>
      val p = planOf(df)
      val exchanges = "(?i)exchange".r.findAllIn(p).size
      // ideal: sorted limit fuses into TakeOrderedAndProject (per-
      // partition top-N + driver merge, zero exchanges); a bounded
      // number of exchanges for an explicit sort is also acceptable
      assert(exchanges <= 2 && (exchanges == 0 || p.contains("TakeOrderedAndProject")
          || p.toLowerCase.contains("rangepartitioning")),
        s"$name should shuffle only for the final sort ($exchanges exchanges):\n$p")
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("q_sort_limit fuses into TakeOrderedAndProject — per-partition top-k, zero exchanges") {
    // the global-sort-then-limit trap would range-shuffle the whole
    // fact table; the fused operator keeps a 100-row heap per
    // partition and merges on the driver — the only acceptable shape
    // at any scale (BASELINE.md §sf1 leans on this for the seed's
    // partition-overhead explanation)
    val p = planOf(queries.Relational.qSortLimit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!"(?i)exchange".r.findFirstIn(p).isDefined,
      s"sorted limit must not shuffle:\n$p")
  }

  test("q_text_bm25 never shuffles the corpus: one single-row stats exchange + broadcast back") {
    // the BM25 scale claim (TextOps scaladoc): tf/dl are per-row array
    // ops (no token explode), corpus stats are ONE partial+final agg
    // whose exchange moves one combiner row per partition, and the
    // stats row rides a broadcast join back over the corpus. Top-20 is
    // the fused per-partition heap. Any (doc,term) shuffle or global
    // sort would print additional exchanges.
    val p = planOf(queries.TextOps.qTextBm25(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"stats row must broadcast:\n$p")
    val singlePartition = "Exchange SinglePartition".r.findAllIn(p).length
    // every shuffle exchange in the plan must be the stats agg's
    // single-partition gather; a corpus-keyed exchange is a regression
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"corpus-keyed shuffle appeared in BM25:\n$p")
    assert(singlePartition <= 1, s"more than one gather:\n$p")
  }

  test("q_pack_shards' corpus window is per-partition, not a single global partition") {
    val p = planOf(queries.PipelineOps.qPackShards(spark, sf))
    // the running sum over the corpus must be partitioned by the
    // deterministic value-range block; only the tiny per-block offsets
    // frame gets a global window
    assert(p.contains("windowspecdefinition(__blk"),
      s"two-pass prefix sum lost its partitioned window:\n$p")
  }

  test("q_knn_pq search is broadcast joins over codes — one exchange total (the top-k window)") {
    // the PQ scale claim (VectorOps scaladoc): encode is chained
    // broadcast codebook rows + codegen'd argmin (no shuffle), search
    // is m broadcast lookup-table joins on the code columns; the ONLY
    // shuffle in the whole returned plan is the per-probe top-k
    // window's exchange. A SortMergeJoin or a second hash exchange
    // means codes or vectors started shuffling — the regression that
    // would kill the codes-only-scan economics at 100 TB.
    val p = planOf(queries.VectorOps.qKnnPq(spark, sf))
    assert(!p.contains("SortMergeJoin"), s"PQ search must broadcast:\n$p")
    // count exchanges in the EXECUTED plan section only: the r16
    // stored index makes the key's plan deterministic, so when a
    // sibling suite has .cache()d the same frame (PqSpec), this plan
    // substitutes an InMemoryRelation whose dump prints the cached
    // AQE plan twice (final + initial sections) — same one exchange,
    // two string matches (found by the full-suite run; standalone the
    // cache is cold and the raw count was 1)
    val executedOnly = p.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(executedOnly).length <= 1,
      s"only the top-k window may shuffle:\n$p")
  }

  test("BPE keys touch the corpus only at construction — the returned plan is vocabulary-only") {
    // the BPE scale claim (TextOps scaladoc): ONE corpus pass (the
    // wordcount shuffle, executed during the learn loop's
    // checkpoints); every merge round and the final output run over
    // the vocabulary. If the returned plan ever re-scans the
    // documents parquet, a merge round regressed to corpus grain.
    // r18: q_bpe_tokenize reads the STORED vocabulary — its plan's
    // only FileScan must be the staged artifact under the layout
    // root, never the corpus table.
    for (df <- Seq(queries.TextOps.qBpeMerges(spark, sf),
                   queries.TextOps.qBpeTokenize(spark, sf))) {
      val p = planOf(df)
      assert(!p.contains("documents"),
        s"BPE output plan must not re-scan the corpus:\n$p")
      // EVERY FileScan must sit under the layout root (ADVICE r18 #5:
      // a single global contains() passed as long as ANY scan was a
      // staged artifact — a plan scanning both the stored vocab and
      // some other foreign table would have slipped through). Each
      // FileScan renders as one plan line carrying its Location path,
      // so the per-line check pins each scan individually.
      val foreign = p.linesIterator
        .filter(_.contains("FileScan"))
        .filterNot(_.contains("graft_layout")).toSeq
      assert(foreign.isEmpty,
        s"FileScan(s) outside the staged-artifact layout root:\n" +
          s"${foreign.mkString("\n")}\nfull plan:\n$p")
    }
  }

  test("q_sample_stratified joins the broadcast counts — corpus is never range/hash shuffled") {
    val p = planOf(queries.TextOps.qSampleStratified(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"counts join must broadcast:\n$p")
  }

  test("q_dpp_join injects a runtime partition-pruning subquery into the fact scan") {
    val df = queries.WarehouseOps.qDppJoin(spark, sf)
    val p = planOf(df)
    // dynamic partition pruning: the month-partitioned fact scan's
    // PartitionFilters must carry a dynamicpruningexpression fed by
    // the broadcast quarter dim — the 1/Nth-scan lever at 100 TB
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"fact scan lost its DPP subquery:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("runtime bloom filter injects on a selective dim⋈fact join (row-level DPP sibling)") {
    // DPP prunes whole PARTITIONS; Spark's InjectRuntimeFilter prunes
    // ROWS: a bloom built from the filtered dim side is pushed into
    // the fact scan. The application-side threshold defaults to 10 GB
    // (fixture scans never qualify), so the thresholds are lowered
    // HERE ONLY to prove the engine's join shapes are injection-
    // eligible — at real scale the defaults fire on their own.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // injection targets SHUFFLE joins (for a broadcast join the hash
      // table already prunes; nothing to save) — force the shape both
      // sides have at 100 TB, where neither fits a broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf).select("l_partkey", "l_extendedprice")
      val dim = Tables.part(spark, sf)
        .filter(col("p_brand") === "Brand#11").select("p_partkey")
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_extendedprice")).as("s"))
      val opt = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("might_contain"),
        s"no bloom runtime filter injected:\n$opt")
      // and the filtered result is still exactly the unfiltered join's
      val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_extendedprice")).as("s"))
      assert(joined.collect().toSeq === plain.collect().toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_interval_overlap sweep is partitioned by nation — no global single-partition window") {
    val p = planOf(queries.WarehouseOps.qIntervalOverlap(spark, sf))
    assert(p.contains("windowspecdefinition(n_name"),
      s"sweep window must partition by nation:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("no declared key plans an accidental cartesian product (global audit)") {
    // eager keys (streaming runs, layout writes) are skipped: building
    // their DataFrame executes side effects; their plans are audited
    // by their dedicated tests above / in BucketingSpec
    val eager = Set("q_stream_", "q_part_pruned", "q_bucket_join",
      "q_csv_roundtrip", "q_json_roundtrip", "q_orc_roundtrip", "q_dpp_join")
    // brute-force vector keys deliberately cross join a broadcast
    // probe side (the verification baselines — see VectorOps scaladoc)
    val intentionalCross = Set("q_cosine_topk", "q_cosine_expr",
      "q_cosine_udf", "q_knn_ivf", "q_knn_rerank", "q_join_range_band")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!eager.exists(name.startsWith) && !intentionalCross(name)) {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n${p.take(3000)}")
      }
    }
  }

  test("no declared key plans an Exchange-backed distinct on a candidate-pair stream (global audit)") {
    // r12 (VERDICT r11 #6): the smallest-shared-X exactly-once pattern
    // (minhash first-common-band, SemDeDup smallest-shared-cell,
    // containment smallest-shared-rare-gram) is the uniform discipline
    // for every pair-generating join — a physical aggregate grouping
    // on BOTH halves of a pair is the distinct() shape that shuffles
    // the full candidate volume (13.7 M rows at sf10 before the
    // minhash rewrite; ~70 s of embedding dedup's 70.5 s sf1 wall).
    // The repo's pair outputs all follow one of three naming
    // conventions, so the audit is a plan-string scan over every
    // declared key: no Aggregate(keys=[...]) may contain a_/b_ halves
    // of the same pair. Per-doc folds (keyed doc_id alone), df counts
    // (keyed gram), and cluster aggregates (keyed cluster/component)
    // all pass. The block-join verifiers (levenshtein, ngram_jaccard)
    // need no dedup at all: one prefix key per doc means a pair
    // appears in at most one block by construction.
    val eager = Set("q_stream_", "q_part_pruned", "q_bucket_join",
      "q_csv_roundtrip", "q_json_roundtrip", "q_orc_roundtrip", "q_dpp_join")
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val aggKeys = "(?:Hash|Sort|ObjectHash)Aggregate\\(keys=\\[([^\\]]*)\\]".r
    val pairs = Seq("doc_a" -> "doc_b", "id_a" -> "id_b", "vec_a" -> "vec_b")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (eager.exists(name.startsWith)) None
      else {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val hit = aggKeys.findAllMatchIn(p).map(_.group(1)).exists(keys =>
          pairs.exists { case (a, b) => keys.contains(a) && keys.contains(b) })
        if (hit) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"pair-keyed distinct-style aggregates found in: ${offenders.mkString(", ")}")
  }

  test("filter + projection reach the scan for events (ns-timestamp path)") {
    val df = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("event_id"))
    val p = planOf(df)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"), p)
  }
}
