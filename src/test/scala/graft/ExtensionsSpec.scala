package graft

import graft.catalyst.{DotProduct, GraftFunctions}
import org.apache.spark.sql.functions._

/** Custom Catalyst surface: native DotProduct expression, the
  * UDF→expression rewrite rule, and the typed UDAF. */
class ExtensionsSpec extends SparkSpec {

  test("DotProduct expression equals the interpreted higher-order formulation") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val both = e.select(
      expr("graft_dot_product(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (a,b) -> cast(a as double)*cast(b as double)), cast(0.0 as double), (acc,x) -> acc + x)").as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() === 0)
    // L2-normalized vectors: self-dot ≈ 1
    val offUnit = both.filter(abs(col("native") - 1.0) > 1e-3).count()
    assert(offUnit === 0)
  }

  test("RewriteDotUdf replaces the ScalaUDF with the native expression in the optimized plan") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(5)
    val df = e.select(call_udf(GraftFunctions.DotUdfName, col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    // expressions is per-node; walk every node of the plan tree
    val hasNative = optimized.collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(hasNative, s"expected DotProduct in optimized plan:\n$optimized")
    // and it still computes the right thing
    assert(df.filter(abs(col("d") - 1.0) > 1e-3).count() === 0)
  }

  test("DotProduct participates in whole-stage codegen (no fallback)") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(5)
    val df = e.select(expr("graft_dot_product(embedding, embedding)").as("d"))
    // codegen stages render as "*(n) Op" in the physical plan string
    val codegenPlan = df.queryExecution.executedPlan.toString
    assert(codegenPlan.contains("*(1) Project"), codegenPlan)
  }

  test("WeightedAvg UDAF equals the algebraic sum(v*w)/sum(w)") {
    val wavg = udaf(graft.agg.WeightedAvg)
    val l = Tables.lineitem(spark, sf)
    val a = l.groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("u"))
    val b = l.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 4).as("s"))
    val joined = a.join(b, "l_returnflag")
    assert(joined.filter(col("u") =!= col("s")).count() === 0)
  }

  test("NumDot equals the interpreted zip_with fold for long×long and float×double, both eval paths") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    // long×long: the int8-code coarse-dot shape of q_knn_rerank —
    // cast back to bigint must equal the exact 0L long fold
    val codes = expr(
      "transform(embedding, v -> least(greatest(floor(cast(v as double) * 127.0d + 0.5d), -127L), 127L))")
    val longs = e.select(codes.as("q")).select(
      expr("cast(graft_num_dot(q, q) as bigint)").as("native"),
      expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("interp"))
    assert(longs.filter(col("native") =!= col("interp")).count() === 0)
    // float×double: the IVF centroid-assign shape of q_knn_ivf
    val mixed = e.select(col("embedding"), expr("cast(embedding as array<double>)").as("d")).select(
      expr("graft_num_dot(embedding, d)").as("native"),
      expr("aggregate(zip_with(cast(embedding as array<double>), d, (a,b) -> a*b), cast(0.0 as double), (acc,x) -> acc + x)").as("interp"))
    assert(mixed.filter(col("native") =!= col("interp")).count() === 0)
    // interpreted path agrees with codegen (collect forces eval through
    // the same expression; exercise nullSafeEval directly too)
    val nd = graft.catalyst.NumDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1L, -2L, 3L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4L, 5L, 6L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(nd.eval(null) === (1 * 4 - 2 * 5 + 3 * 6).toDouble)
  }

  test("knn bucketed result is a subset of brute-force candidates (same bucket ⊆ all pairs)") {
    val knn = queries.VectorOps.qKnnBucketed(spark, sf)
    assert(knn.count() > 0)
    val maxPerProbe = knn.groupBy("vec_id").count().agg(max("count")).head().getLong(0)
    assert(maxPerProbe <= 3)
  }
}
