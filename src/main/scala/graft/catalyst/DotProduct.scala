package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for float-vector dot product with
  * whole-stage codegen (SURVEY.md §2.4-J / §4).
  *
  * Why it exists: Spark's higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` is
  * interpreted (HigherOrderFunction has no doGenCode), allocates an
  * intermediate array per row, and re-evaluates lambdas through an
  * interpreter loop. For a 64-dim embedding across an N×M candidate
  * cross/band join that's the hot inner loop of every similarity
  * operator. This expression compiles to a tight primitive `for` loop
  * inside the surrounding WholeStageCodegen stage — no allocation, no
  * lambda dispatch.
  *
  * Summation is left-to-right over index order, the same fold order as
  * the `aggregate()` formulation, so results are bit-identical to the
  * interpreted form (and to DuckDB's list_dot_product at the rounding
  * applied by every declared key).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two dot_product calls in one whole-stage-codegen scope
      // must not collide on local variable names.
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Mixed-numeric sibling of [[DotProduct]] for long / float / double
  * element arrays (any combination), accumulating in double.
  *
  * Why it exists (r8): the int8-quantized coarse pass of the re-rank
  * ANN and the IVF centroid assignment both folded
  * `aggregate(zip_with(...))` over non-float arrays — interpreted,
  * allocating an intermediate array per candidate pair. This compiles
  * to the same tight loop as [[DotProduct]] with the accessor chosen
  * from the child's element type at plan time.
  *
  * Exactness: for int8 codes the products (≤127²) and their ≤4096-dim
  * sums stay far under 2^53, so the double accumulation is EXACT and
  * `cast(num_dot(..) as bigint)` is bit-identical to a 0L long fold;
  * for float×double inputs, float→double widening is exact, so values
  * match the `cast(.. as array<double>)` zip_with spelling bit for
  * bit. Left-to-right index-order summation, as DotProduct. */
case class NumDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType | LongType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"num_dot expects arrays of long/float/double, got (${left.dataType}, ${right.dataType})")
    }

  private val lt = elemType(left.dataType).getOrElse(DoubleType)
  private val rt = elemType(right.dataType).getOrElse(DoubleType)

  private def get(x: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => x.getFloat(i).toDouble
    case LongType   => x.getLong(i).toDouble
    case _          => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    s
  }

  private def accessor(arr: String, et: DataType, i: String): String = et match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case LongType   => s"(double) $arr.getLong($i)"
    case _          => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${accessor(a, lt, i)} * ${accessor(b, rt, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NumDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "num_dot"
}

/** Optimizer rule: rewrite the registered `graft_dot_udf` ScalaUDF
  * (black box to Catalyst, breaks codegen) into the native
  * [[DotProduct]] expression. Demonstrates the UDF-escape-hatch →
  * native-expression upgrade path without callers changing code. */
object RewriteDotUdf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF if u.udfName.contains(GraftFunctions.DotUdfName) && u.children.size == 2 =>
      DotProduct(u.children.head, u.children(1))
  }
}

/** Session-level registration for the custom surface. Idempotent —
  * safe to call from every query function (they receive an already-
  * built session from the driver, so SparkSessionExtensions is not an
  * option; runtime registry + experimental optimizations are). */
object GraftFunctions {

  val DotUdfName = "graft_dot_udf"

  /** Sessions already registered — ensureRegistered is called from
    * every query constructor (r19: 13 registry puts + a WARN-logging
    * udf.register per call, inside every timed construction), so the
    * idempotence is now a per-session no-op re-entry instead of a
    * re-registration. Weak keys: a retired session must not be pinned
    * by this guard. */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureRegistered(spark: SparkSession): Unit = {
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_product",
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)),
      "scala_udf")

    // 1-arg form = the declared oracle-mirrored geometry; 3-arg form
    // (embedding, bits, bands) takes foldable int literals for the
    // scale-path geometries (see EmbLshKeys scaladoc)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_emb_lsh_keys",
      {
        case Seq(e) => EmbLshKeys(e)
        case Seq(e, b, l) if b.foldable && l.foldable =>
          EmbLshKeys(e,
            b.eval().asInstanceOf[Number].intValue(),
            l.eval().asInstanceOf[Number].intValue())
        case exprs => throw new IllegalArgumentException(
          s"graft_emb_lsh_keys expects (vec) or (vec, bits, bands) literals, got ${exprs.size} args")
      },
      "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_num_dot",
      (exprs: Seq[Expression]) => NumDot(exprs.head, exprs(1)),
      "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head),
      "scala_udf")

    // TypedImperativeAggregate surface of the HLL sketch — the analyzer
    // wraps the returned AggregateFunction in an AggregateExpression
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_distinct",
      (exprs: Seq[Expression]) => graft.agg.HllSketchAgg(exprs.head),
      "scala_udf")

    // 1-arg form = trigrams; 2-arg form takes a foldable int width
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_shingles",
      {
        case Seq(e) => WordShingles(e)
        case Seq(e, w) if w.foldable =>
          WordShingles(e, w.eval().asInstanceOf[Number].intValue())
        case exprs => throw new IllegalArgumentException(
          s"graft_word_shingles expects (text) or (text, n literal), got ${exprs.size} args")
      },
      "scala_udf")

    // hashed-gram variant: distinct md5-32 longs (containment's fold)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_shingle_hashes",
      {
        case Seq(e) => WordShingleHashes(e)
        case Seq(e, w) if w.foldable =>
          WordShingleHashes(e, w.eval().asInstanceOf[Number].intValue())
        case exprs => throw new IllegalArgumentException(
          s"graft_word_shingle_hashes expects (text) or (text, n literal), got ${exprs.size} args")
      },
      "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      (exprs: Seq[Expression]) => SimHash(exprs.head),
      "scala_udf")

    // one-pass per-doc repetition statistics (quality gate hot path)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rep_stats",
      (exprs: Seq[Expression]) => RepStats(exprs.head),
      "scala_udf")

    // per-doc hashed-linear accumulator: 1-arg form = dim 1024
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hashed_swi",
      {
        case Seq(e) => HashedLinearSwi(e)
        case Seq(e, d) if d.foldable =>
          HashedLinearSwi(e, d.eval().asInstanceOf[Number].intValue())
        case exprs => throw new IllegalArgumentException(
          s"graft_hashed_swi expects (text) or (text, dim literal), got ${exprs.size} args")
      },
      "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cell_argmin",
      (exprs: Seq[Expression]) => CellArgmin(exprs(0), exprs(1)),
      "scala_udf")

    // (vec, cells, p literal) → the p nearest cell ids, multi-probe
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cell_topp",
      {
        case Seq(v, cs, p) if p.foldable =>
          CellTopP(v, cs, p.eval().asInstanceOf[Number].intValue())
        case Seq(_, _, p) => throw new IllegalArgumentException(
          s"graft_cell_topp expects a foldable p literal, got ${p.sql}")
        case exprs => throw new IllegalArgumentException(
          s"graft_cell_topp expects (vec, cells, p literal), got ${exprs.size} args")
      },
      "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_first_band_match",
      (exprs: Seq[Expression]) => FirstBandMatch(exprs(0), exprs(1)),
      "scala_udf")

    val udf = org.apache.spark.sql.functions.udf(
      (a: Seq[Float], b: Seq[Float]) => {
        val n = math.min(a.length, b.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }).withName(DotUdfName)
    spark.udf.register(DotUdfName, udf)

    if (!spark.experimental.extraOptimizations.contains(RewriteDotUdf)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotUdf
    }
  }
}
