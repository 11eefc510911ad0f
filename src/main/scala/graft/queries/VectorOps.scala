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
    * Scale shape: LSH band blocking, NOT all-pairs. Each vector gets two
    * 1-bit band keys (sign of a fixed projection); a candidate pair must
    * collide on band 1 OR band 2 (the classic OR-of-bands construction —
    * each band is an equi hash self-join, the union is deduped). At 100 TB
    * each band join shuffles on a key whose fan-out bounds the candidate
    * set; no corpus×corpus cross product exists in the plan (asserted in
    * PlanSpec). Recall vs the brute-force ground truth is property-tested
    * in AnnRecallSpec. */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
      .withColumn("b1", when(proj1 > 0, 1).otherwise(0))
      .withColumn("b2", when(proj2 > 0, 1).otherwise(0))
    def bandPairs(band: String): DataFrame = {
      val a = e.select(col("vec_id").as("vec_a"), col(band).as("k"), col("embedding").as(P))
      val b = e.select(col("vec_id").as("vec_b"), col(band).as("k"), col("embedding").as(T))
      a.join(b, "k").filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(expr(s"graft_dot_product($P, $T)"), 4).as("cos"))
        .filter(col("cos") >= 0.4)
    }
    bandPairs("b1").union(bandPairs("b2")).distinct()
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
  }

  /** Sign-bucket expression: 2-bit LSH code from the two projections. */
  private def bucketExpr =
    when(proj1 > 0, 1).otherwise(0) + when(proj2 > 0, 2).otherwise(0)

  /** LSH-bucketed approximate nearest neighbours: probes search only
    * their own sign-bucket (equi join on the bucket key → hash join,
    * no cross product), top-3 per probe. */
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

  /** IVF-style two-stage ANN: assign each probe to its nearest
    * label-centroid (10 cells, broadcast), then search only that
    * cell's vectors — the learned-quantizer counterpart of the
    * sign-bucket key. Centroids are the ROUNDED per-dim means, so both
    * engines compute dot products from bit-identical inputs. */
  def qKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
    val cent = qEmbCentroid(spark, dir)
      .groupBy(col("label").as("c_label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cvec"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").as(P))
    val assigned = probes.crossJoin(broadcast(cent))
      .select(col("vec_id"), col(P),
        expr(s"aggregate(zip_with(cast($P as array<double>), cvec, (a,b) -> a*b), cast(0.0 as double), (acc,x) -> acc + x)").as("cos_c"),
        col("c_label"))
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("c_label"))
    val probeCell = assigned.withColumn("rk", row_number().over(wA))
      .filter(col("rk") === 1)
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
