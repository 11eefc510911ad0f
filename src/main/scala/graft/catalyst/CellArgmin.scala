package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid argmin for the k-means / IVF family:
  * `cell_argmin(vec, cells)` over the one-row broadcast model frame
  * ([[graft.api.GraftOps.centroidArray]]'s `__cs`:
  * `array<struct<__cell:int, __c:array<double>, __cn:double>>`,
  * sorted by cell) returns the cell minimizing
  * `round(‖c‖² − 2·v·c, 6)`, ties to the SMALLER cell id — exactly
  * the `array_min(transform(__cs, c -> struct(round(c.__cn − 2·v·c,
  * 6), c.__cell))).__cell` spelling, whose min-struct ordering
  * compares the rounded distance first, then the cell id.
  *
  * Why it exists (r10, found by `tools.SemScaleBench` at k = 800):
  * `transform` is a HigherOrderFunction — no doGenCode — so the old
  * spelling evaluated k `round()`s per ROW through the interpreter,
  * and Spark's interpreted `RoundBase` allocates a `scala.math
  * .BigDecimal` per call (thread-dump hot frame: `BigDecimal$.decimal`
  * under `ArrayTransform.eval`). At k·N = 800 × 200 k × ~8 scoring
  * passes that is ~1.3 G interpreted BigDecimal constructions — the
  * assignment went from shuffle-bound to single-straggler
  * interpreter-bound. This expression runs the whole k-loop (dot,
  * round, argmin) inside whole-stage codegen; the one BigDecimal per
  * candidate survives because it IS the rounding semantics
  * (`java.math.BigDecimal.valueOf(d).setScale(6, HALF_UP)` — the
  * exact interpreted-`round()` path, so results are bit-identical;
  * CellArgminSpec pins ≡ against the transform spelling plus the
  * tie and empty-model edges), but the lambda interpreter, the
  * per-candidate struct row, and the k-element array allocation per
  * row are gone. Non-finite distances (a NaN/Inf element in a dirty
  * embedding) take [[Round6]]'s RoundBase-style pass-through and sort
  * LAST, exactly as the old spelling's `round()` + min-struct order
  * did — they never win the argmin and never crash the scan.
  *
  * The probe vector may be any numeric array —
  * `array<float|double|int|long>` (widening to double is exact for
  * float/int and for longs below 2^53, so probing with the raw
  * column equals the old `transform(…, cast)` spelling while
  * skipping an interpreted per-row cast-transform; the long/int
  * acceptance keeps [[graft.api.GraftOps.kmeans]]'s public contract,
  * which always cast whatever numeric array it was given — the
  * element accessor is chosen at plan time, [[NumDot]]-style);
  * dimensions fold
  * left-to-right over `min(|v|, |c|)`, the [[NumDot]] convention.
  * Empty or all-null `cells` → null, as `array_min` of an empty
  * array. */
case class CellArgmin(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private val CellsType = ArrayType(StructType(Seq(
    StructField("__cell", IntegerType), StructField("__c", ArrayType(DoubleType)),
    StructField("__cn", DoubleType))))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType | IntegerType | LongType, _),
          ArrayType(StructType(Array(
      StructField(_, IntegerType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _),
      StructField(_, DoubleType, _, _))), _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cell_argmin expects (array<float|double|int|long>, ${CellsType.simpleString}), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private val vecElem: DataType =
    left.dataType match { case ArrayType(et, _) => et; case _ => DoubleType }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    var bestD = 0.0
    var bestCell = 0
    var found = false
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      if (!cells.isNullAt(i)) {
        val c = cells.getStruct(i, 3)
        val cell = c.getInt(0)
        val cv = c.getArray(1)
        val cn = c.getDouble(2)
        val m = math.min(vec.numElements(), cv.numElements())
        var s = 0.0
        var j = 0
        while (j < m) {
          s += VecAccess.get(vec, vecElem, j) * cv.getDouble(j)
          j += 1
        }
        val d = Round6.round6(cn - 2.0 * s)
        if (!found || Round6.beats(d, cell, bestD, bestCell)) {
          found = true; bestD = d; bestCell = cell
        }
      }
      i += 1
    }
    if (found) bestCell else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vGet = VecAccess.gen(a, vecElem)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val cell = ctx.freshName("cell")
      val cv = ctx.freshName("cv")
      val bestD = ctx.freshName("bestD"); val bestCell = ctx.freshName("bestCell")
      val found = ctx.freshName("found")
      s"""
         |int $n = $b.numElements();
         |double $bestD = 0.0; int $bestCell = 0; boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($b.isNullAt($i)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $c = $b.getStruct($i, 3);
         |  int $cell = $c.getInt(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |  int $m = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $s += $vGet($j) * $cv.getDouble($j);
         |  }
         |  double $d = graft.catalyst.Round6.round6($c.getDouble(2) - 2.0d * $s);
         |  if (!$found || graft.catalyst.Round6.beats($d, $cell, $bestD, $bestCell)) {
         |    $found = true; $bestD = $d; $bestCell = $cell;
         |  }
         |}
         |if ($found) { ${ev.value} = $bestCell; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellArgmin =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cell_argmin"
}

/** Multi-probe sibling of [[CellArgmin]]: `cell_topp(vec, cells, p)`
  * returns the `p` nearest cell ids ordered by the same
  * (rounded distance, cell id) struct order — element 0 is exactly
  * `cell_argmin(vec, cells)` (CellArgminSpec pins this), so top-p
  * blocking strictly extends single-assignment blocking.
  *
  * Why it exists (r10): SemDeDup's single-assignment candidate
  * blocking splits near-duplicate pairs that straddle a cell
  * boundary — planted-twin recall measured 0.50–0.66 across the
  * whole k dial (SCALE.md §SemDeDup). Probing each vector's top-2
  * cells and joining on ANY shared cell recovers boundary pairs at a
  * bounded volume multiple (≤ p² per pair slot, in practice ~2–3×);
  * the pair-dedup predicate (keep a pair only at its SMALLEST shared
  * cell) keeps the join's emission exactly-once without a distinct
  * Exchange — the FirstBandMatch discipline on unordered cell sets.
  *
  * `p` is a foldable literal, tiny (2–4); insertion into a length-p
  * sorted window inside the k-loop keeps the pass O(k·(d+p)) per row,
  * still one whole-stage-codegen stage. Fewer than `p` live cells →
  * a shorter array (empty model → empty array, NOT null — callers
  * explode it). */
case class CellTopP(left: Expression, right: Expression, p: Int)
    extends BinaryExpression {

  // Upper bound raised 16 → 64 (r12): the sf10 ANN dial sweeps the
  // fixed-fraction diagonal (k, np) = (128, 32) and (256, 64) — the
  // "hold nprobe/k, grow both" law needs np beyond 16 at the third
  // decade. The insertion window stays O(k·(d+p)) per row; at d = 64
  // and p = 64 that is a bounded 2× over the dot-product pass itself.
  require(p >= 1 && p <= 64, s"cell_topp p must be in [1,64], got $p")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellArgmin(left, right).checkInputDataTypes()

  private val vecElem: DataType =
    left.dataType match { case ArrayType(et, _) => et; case _ => DoubleType }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    val topD = new Array[Double](p)
    val topC = new Array[Int](p)
    var filled = 0
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      if (!cells.isNullAt(i)) {
        val c = cells.getStruct(i, 3)
        val cell = c.getInt(0)
        val cv = c.getArray(1)
        val m = math.min(vec.numElements(), cv.numElements())
        var s = 0.0
        var j = 0
        while (j < m) {
          s += VecAccess.get(vec, vecElem, j) * cv.getDouble(j)
          j += 1
        }
        val d = Round6.round6(c.getDouble(2) - 2.0 * s)
        // insertion: find slot, shift the tail down ([[Round6.beats]]
        // supplies the NaN-total min-struct order)
        var pos = filled
        while (pos > 0 && Round6.beats(d, cell, topD(pos - 1), topC(pos - 1))) pos -= 1
        if (pos < p) {
          var t = math.min(filled, p - 1)
          while (t > pos) { topD(t) = topD(t - 1); topC(t) = topC(t - 1); t -= 1 }
          topD(pos) = d; topC(pos) = cell
          if (filled < p) filled += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(topC, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vGet = VecAccess.gen(a, vecElem)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val cell = ctx.freshName("cell")
      val cv = ctx.freshName("cv"); val filled = ctx.freshName("filled")
      val topD = ctx.freshName("topD"); val topC = ctx.freshName("topC")
      val pos = ctx.freshName("pos"); val t = ctx.freshName("t")
      s"""
         |int $n = $b.numElements();
         |double[] $topD = new double[$p];
         |int[] $topC = new int[$p];
         |int $filled = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($b.isNullAt($i)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $c = $b.getStruct($i, 3);
         |  int $cell = $c.getInt(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |  int $m = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $s += $vGet($j) * $cv.getDouble($j);
         |  }
         |  double $d = graft.catalyst.Round6.round6($c.getDouble(2) - 2.0d * $s);
         |  int $pos = $filled;
         |  while ($pos > 0 && graft.catalyst.Round6.beats(
         |      $d, $cell, $topD[$pos - 1], $topC[$pos - 1])) $pos--;
         |  if ($pos < $p) {
         |    for (int $t = java.lang.Math.min($filled, $p - 1); $t > $pos; $t--) {
         |      $topD[$t] = $topD[$t - 1]; $topC[$t] = $topC[$t - 1];
         |    }
         |    $topD[$pos] = $d; $topC[$pos] = $cell;
         |    if ($filled < $p) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  java.util.Arrays.copyOf($topC, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellTopP =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cell_topp"
}

/** The rounding step shared by [[CellArgmin]]/[[CellTopP]], with the
  * guard Spark's own `RoundBase` has (r11, ADVICE): NaN and ±Infinity
  * pass through unchanged — `java.math.BigDecimal.valueOf` throws
  * `NumberFormatException` on them, and the pre-r10
  * `array_min(transform(round(...)))` spelling propagated them
  * (interpreted `round()` returns non-finite input as-is). Finite
  * values take the exact interpreted-`round()` path, so results stay
  * bit-identical to the transform spelling. Called from generated
  * code via the object's static forwarder. */
private[catalyst] object Round6 {
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Does candidate (d, cell) sort before (bestD, bestCell) under the
    * min-struct order the old `array_min(transform(...))` spelling
    * used? Spark's struct ordering is TOTAL: NaN is larger than every
    * double and EQUAL to itself (so two NaN distances fall through to
    * the cell-id tiebreak) — plain Java `<`/`==` get both wrong,
    * which is why this lives here once instead of four hand-spelled
    * comparison chains. Monomorphic static call; JIT inlines it in
    * the generated k-loop. */
  def beats(d: Double, cell: Int, bestD: Double, bestCell: Int): Boolean = {
    val dn = java.lang.Double.isNaN(d)
    val bn = java.lang.Double.isNaN(bestD)
    if (dn != bn) bn
    else if (dn) cell < bestCell
    else d < bestD || (d == bestD && cell < bestCell)
  }
}

/** Plan-time-typed element access for the probe-vector side of
  * [[CellArgmin]]/[[CellTopP]] — the [[NumDot]] accessor pattern. */
private[catalyst] object VecAccess {
  def get(vec: ArrayData, et: DataType, j: Int): Double = et match {
    case FloatType   => vec.getFloat(j).toDouble
    case IntegerType => vec.getInt(j).toDouble
    case LongType    => vec.getLong(j).toDouble
    case _           => vec.getDouble(j)
  }
  def gen(arr: String, et: DataType): String = et match {
    case FloatType   => s"(double) $arr.getFloat"
    case IntegerType => s"(double) $arr.getInt"
    case LongType    => s"(double) $arr.getLong"
    case _           => s"$arr.getDouble"
  }
}
