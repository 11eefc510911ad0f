package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-grade pipeline operators (round 6): declarative
  * data-quality auditing, slowly-changing-dimension building, dynamic
  * partition pruning, sweep-line interval analytics, and Z-order
  * clustering. Each is a standard large-scale-warehouse technique
  * re-expressed Spark-first and DuckDB-oracle-verified.
  */
object WarehouseOps {

  /** Deequ-style declarative data-quality audit: one row per check
    * with its violation count and pass flag.
    *
    * Checks: column completeness (NULL count), value-range containment,
    * domain/set membership, key uniqueness, and referential integrity
    * (FK orphans). The three lineitem column checks share ONE
    * map-side-combinable aggregation pass (conditional sums), orders'
    * two checks share another; only the FK check needs a join — a
    * left-anti whose build side at 100 TB is the orders key column
    * only (pruned scan), shuffled on the join key like any big-big
    * join. Every metric is an exact BIGINT — no float seams. */
  def qDqAudit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))

    val liChecks = l.agg(
      cnt(col("l_quantity").isNull).as("lineitem_complete_qty"),
      cnt(!col("l_discount").between(0.0, 0.10)).as("lineitem_range_discount"),
      cnt(!col("l_returnflag").isin("A", "N", "R")).as("lineitem_set_returnflag"))
    val oChecks = o.agg(
      cnt(col("o_orderdate").isNull).as("orders_complete_date"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orders_unique_key"))
    val orphans = l.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_fk_orders"))

    def unpivot(df: DataFrame): DataFrame = {
      val cols = df.columns
      val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
      df.selectExpr(s"stack(${cols.length}, $stackArgs) AS (check_name, violations)")
    }
    unpivot(liChecks).union(unpivot(oChecks)).union(unpivot(orphans))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** Slowly-changing-dimension type-2 build: compress each customer's
    * order history into validity intervals of `o_orderstatus`, keeping
    * one row per status CHANGE with `[valid_from, valid_to)` bounds, a
    * version number, and an is_current flag.
    *
    * Pure window algebra — change detection via `lag`, interval close
    * via `lead` — so the whole build is ONE shuffle on the dimension
    * key and scales to any history length: each customer's rows meet
    * in one sorted partition-local pass, which is exactly how a 100 TB
    * CDC-to-SCD2 compaction runs (no self-join, no collect). Ordering
    * ties are broken by o_orderkey so the version chain is total. */
  def qScd2(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.scd2(Tables.orders(spark, dir),
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      // the declared key's published schema: the tracked attribute is
      // presented as "status" (scd2 itself keeps attrCol's own name)
      .withColumnRenamed("o_orderstatus", "status")
      .filter(col("o_custkey") < 300)
      .orderBy(col("o_custkey"), col("version"))

  /** Dynamic partition pruning: a month-partitioned copy of orders
    * joined to a tiny quarter dimension (read from parquet, so the
    * dim filter is NOT compile-time foldable) on the partition column.
    * Catalyst broadcasts the filtered dim and injects a runtime
    * `dynamicpruning` subquery into the fact scan, so only the 3
    * matching month directories are read — the mechanism that makes
    * dim-filtered fact scans at 100 TB read 1/Nth of the table
    * (PlanSpec asserts the pruning subquery on this exact plan). The
    * partitioned copy + dim are written once per JVM
    * ([[Layout.writeOnce]]) — Verify's fresh JVM covers the cold
    * layout round-trip; bench warm runs measure the DPP-pruned join. */
  def qDppJoin(spark: SparkSession, dir: String): DataFrame = {
    val sf = new java.io.File(dir).getName
    val factDir = s"${Layout.layoutRoot}/$sf/orders_dpp"
    val dimDir = s"${Layout.layoutRoot}/$sf/month_dim"
    Layout.writeOnce(factDir, dir) {
      Tables.orders(spark, dir)
        .withColumn("o_month", month(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_month").parquet(factDir)
      spark.range(1, 13)
        .select(col("id").cast("int").as("m_month"),
          (((col("id") - 1) / 3) + 1).cast("int").as("m_quarter"))
        .write.mode("overwrite").parquet(dimDir)
    }
    dppRead(spark, factDir, dimDir)
  }

  /** Join side alone (reused by PlanSpec's dynamicpruning assertion). */
  private[graft] def dppRead(spark: SparkSession, factDir: String, dimDir: String): DataFrame = {
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("m_quarter") === 2)
    fact.join(dim, fact("o_month") === dim("m_month"))
      .groupBy(col("o_orderpriority"))
      // decimal accumulation — see Aggs.qAggCube (sf1 float-sum fix)
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy(col("o_orderpriority"))
  }

  /** Sweep-line interval analytics: treating each order as an open
    * interval `[o_orderdate, o_orderdate + 30 days)`, compute per
    * nation the peak number of concurrently open orders.
    *
    * The classic +1/−1 event sweep: explode each interval into a
    * start(+1) and end(−1) point, sort, running-sum. Partitioned by
    * nation the sweep is embarrassingly parallel (one sorted window
    * per nation — at 100 TB you'd sub-partition by coarse time range
    * and stitch boundary offsets exactly like GraftOps.prefixSum).
    * Ends sort BEFORE starts at the same instant (delta ascending), so
    * the intervals are genuinely half-open; o_orderkey completes the
    * total order, making the running sum — and its max — fully
    * deterministic. */
  def qIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val spans = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"), col("o_orderdate").as("t0"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("t1"))
    graft.api.GraftOps.intervalPeaks(spans, "n_name", "t0", "t1", "o_orderkey")
      .select(col("n_name"), col("peak_concurrent"),
        col("n_intervals").as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** The `spark.sql(...)` front door: the engine's tables registered
    * as temp views and a multi-feature ANSI query (CTE + join +
    * conditional agg + HAVING + window) executed as SQL TEXT —
    * proving a user can drive this engine with plain SQL, not just
    * the DataFrame API. Catalyst compiles both doors to the same
    * plans, so every scale property (pushdown, partial aggs,
    * broadcast) carries over verbatim. */
  def qSqlInterface(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """WITH rev AS (
        |  SELECT c.c_nationkey, o.o_orderpriority,
        |         sum(o.o_totalprice) AS pri_rev, count(*) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey, o.o_orderpriority
        |  HAVING count(*) > 10
        |)
        |SELECT n.n_name, r.o_orderpriority, round(r.pri_rev, 2) AS rev, r.n,
        |       rank() OVER (PARTITION BY n.n_name
        |                    ORDER BY round(r.pri_rev, 2) DESC) AS rk
        |FROM rev r JOIN nation n ON n.n_nationkey = r.c_nationkey
        |ORDER BY n.n_name, rk, o_orderpriority""".stripMargin)
  }

  /** Mergeable-sketch approximate quantiles: p50/p90/p99 of order
    * totals estimated from the fixed-width histogram (25k buckets) —
    * the answer is the bucket containing the target rank, located by
    * a cumulative sum over the ~20-row AGGREGATED histogram (the
    * window never touches the fact table). This is the deterministic
    * cousin of t-digest/GK sketches: one map-side-combinable pass,
    * counters merge by +, answer within one bucket width — and unlike
    * those sketches it is bit-reproducible, hence oracle-verifiable.
    * target = ceil(N·p/100) in exact integer arithmetic. */
  def qQuantileHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val cum = h
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev", col("cum") - col("n"))
      .crossJoin(broadcast(h.agg(sum(col("n")).as("total"))))
    val ps = spark.range(1).selectExpr("explode(array(50L, 90L, 99L)) AS p")
    cum.join(broadcast(ps),
        col("cum") >= expr("(total * p + 99) div 100") &&
        col("prev") < expr("(total * p + 99) div 100"))
      .select(col("p"), expr("(total * p + 99) div 100").as("target_rank"),
        col("bucket"),
        round(col("bucket") * 25000.0, 2).as("lo"),
        round((col("bucket") + 1) * 25000.0, 2).as("hi"))
      .orderBy(col("p"))
  }

  /** Graph analytics over the near-duplicate candidate graph (docs
    * sharing a 60-char lowercase prefix, canonical a<b edges): node /
    * edge / wedge / triangle counts via [[graft.api.GraftOps
    * .triangleStats]] — two equi joins close wedges into triangles,
    * never an all-pairs product; counts are exact integers. Triangle
    * density is the standard connectivity fingerprint of a dedup
    * graph (near-cliques ⇒ transitive duplicate groups, the
    * justification for cluster-reps in q_dedup_clusters). */
  def qGraphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(
      col("doc_id"), lower(substring(col("text"), 1, 60)).as("k"))
    val edges = d.select(col("doc_id").as("a"), col("k"))
      .join(d.select(col("doc_id").as("b"), col("k")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    graft.api.GraftOps.triangleStats(edges, "a", "b")
  }

  /** PageRank (3 iterations, damping 0.85) over the same prefix-block
    * document graph as [[qGraphTriangles]] — the centrality signal a
    * curation pipeline uses to weight boilerplate clusters. The API
    * ([[graft.api.GraftOps.pageRank]]) runs O(iters) join+agg rounds
    * with per-iteration 6 dp rounding so the unrolled SQL oracle
    * agrees; presentation rounds to 4 dp. */
  def qGraphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(
      col("doc_id"), lower(substring(col("text"), 1, 60)).as("k"))
    val edges = d.select(col("doc_id").as("a"), col("k"))
      .join(d.select(col("doc_id").as("b"), col("k")), "k")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    graft.api.GraftOps.pageRank(edges, "a", "b")
      .select(col("node"), col("deg"), round(col("pr"), 4).as("pr"))
      .orderBy(col("pr").desc, col("node"))
      .limit(100)
  }

  /** Z-order (Morton) clustering audit: interleave the low 8 bits of
    * two independent dimensions — customer bucket and day-number —
    * into a 16-bit Z value, group into 256 Z-buckets, and report each
    * bucket's row count and per-dimension bounding box.
    *
    * Z-ordering is THE multi-dimension data-layout lever at 100 TB:
    * sorting the fact table by z puts rows close in BOTH dimensions
    * into the same files, so min/max file statistics prune scans for
    * predicates on either dimension (the bounding boxes this query
    * reports are exactly those file-skipping stats). The interleave is
    * pure integer bit algebra — built by an 8-step fold, zero shuffle
    * before the final 256-group aggregate, exact in both engines. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_custkey") % 256
    // pmod, not %: datediff is negative for any date before the anchor,
    // and %'s truncate-toward-zero sign would feed two's-complement
    // bits into the interleave, destroying the locality the layout
    // exists for (ADVICE r6 — zorderKey requires non-negative inputs)
    val y = pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")), lit(256))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), x.cast("long").as("xb"), y.cast("long").as("yb"))
      .withColumn("z", graft.api.GraftOps.zorderKey("xb", "yb"))
      .withColumn("zbucket", expr("z div 256"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
        min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
      .orderBy(col("zbucket"))
  }
}
