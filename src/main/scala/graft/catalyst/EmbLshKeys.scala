package graft.catalyst

import graft.queries.EmbLsh
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `EmbLsh.Bands` band keys of an embedding in ONE codegen'd
  * expression (SURVEY.md §2.4-J; the blocking key of
  * q_dedup_embedding).
  *
  * Why it exists: the same keys spelled as SQL — 126 unrolled
  * `round(graft_dot_product(embedding, array(±1 × 64)), 6)` terms —
  * build a ~20 000-node expression tree that defeats whole-stage
  * codegen (huge-method fallback) and then evaluates interpreted at
  * ~10 µs per projection: key computation alone cost 0.6 s on 500
  * rows. Here the ±1 hyperplane matrix is a referenced `float[][]`
  * and the generated code is three nested runtime loops (band, bit,
  * dim) — the whole key array costs one tight 8 064-multiply pass per
  * row, inside the surrounding codegen stage.
  *
  * Semantics are bit-identical to the SQL spelling (and to the DuckDB
  * oracle, `EmbLsh.duckKeysSql`): per-plane dot product accumulated
  * left-to-right in double, rounded HALF_UP to 6 decimals before the
  * sign test — see [[EmbLshKeys.positiveAfterRound6]], which matches
  * Spark SQL `round(_, 6) > 0` exactly.
  *
  * Null elements: a NULL anywhere in the array makes every dot
  * product NULL in the oracle (`list_dot_product` propagates NULL),
  * and `CASE WHEN round(NULL,6) > 0` takes the ELSE branch — so every
  * sign bit is unset and band i's key is exactly its offset
  * `i << Bits`. Both eval paths below detect a null element up front
  * and return those offset-only keys, rather than reading garbage
  * through `getFloat` on a null slot (fixtures have no null elements;
  * this pins the cross-engine rule for data that does).
  */
case class EmbLshKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"emb_lsh_keys expects array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData]
    val planes = EmbLshKeys.planes
    val keys = new Array[Int](EmbLsh.Bands)
    val dims = math.min(EmbLsh.Dims, emb.numElements())
    // scan the WHOLE array, not just the first Dims slots: the
    // oracle's list_dot_product sees every element, so a null past
    // Dims still NULLs every projection there
    var i = 0
    while (i < emb.numElements()) {
      if (emb.isNullAt(i)) return UnsafeArrayData.fromPrimitiveArray(EmbLshKeys.nullElementKeys)
      i += 1
    }
    var band = 0
    while (band < EmbLsh.Bands) {
      var k = band << EmbLsh.Bits
      var j = 0
      while (j < EmbLsh.Bits) {
        val w = planes(band * EmbLsh.Bits + j)
        var s = 0.0
        var d = 0
        while (d < dims) { s += w(d).toDouble * emb.getFloat(d).toDouble; d += 1 }
        if (EmbLshKeys.positiveAfterRound6(s)) k |= 1 << j
        j += 1
      }
      keys(band) = k
      band += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("embLshPlanes", EmbLshKeys.planes, "float[][]")
      val keys = ctx.freshName("keys")
      val dims = ctx.freshName("dims")
      val band = ctx.freshName("band")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val hasNull = ctx.freshName("hasNull")
      val ni = ctx.freshName("ni")
      s"""
         |int[] $keys = new int[${EmbLsh.Bands}];
         |int $dims = java.lang.Math.min(${EmbLsh.Dims}, $a.numElements());
         |boolean $hasNull = false;
         |for (int $ni = 0; $ni < $a.numElements(); $ni++) {
         |  if ($a.isNullAt($ni)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  $keys = graft.catalyst.EmbLshKeys.nullElementKeys();
         |}
         |else for (int $band = 0; $band < ${EmbLsh.Bands}; $band++) {
         |  int $k = $band << ${EmbLsh.Bits};
         |  for (int $j = 0; $j < ${EmbLsh.Bits}; $j++) {
         |    float[] $w = $planes[$band * ${EmbLsh.Bits} + $j];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $s += (double) $w[$d] * (double) $a.getFloat($d);
         |    }
         |    if (graft.catalyst.EmbLshKeys.positiveAfterRound6($s)) $k |= 1 << $j;
         |  }
         |  $keys[$band] = $k;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EmbLshKeys =
    copy(child = newChild)

  override def prettyName: String = "emb_lsh_keys"
}

object EmbLshKeys {

  /** The ±1 hyperplane matrix, materialized once per JVM from the
    * shared deterministic source (EmbLsh.weight — also the source of
    * the DuckDB oracle literals). */
  lazy val planes: Array[Array[Float]] =
    Array.tabulate(EmbLsh.Bands * EmbLsh.Bits, EmbLsh.Dims)((p, d) => EmbLsh.weight(p, d).toFloat)

  /** Keys of an embedding with a null element: every sign test takes
    * the oracle's ELSE-0 branch, leaving only each band's offset. */
  def nullElementKeys: Array[Int] =
    Array.tabulate(EmbLsh.Bands)(band => band << EmbLsh.Bits)

  /** Exactly Spark SQL `round(s, 6) > 0`: Spark's RoundBase goes
    * through scala.math.BigDecimal(double) = java BigDecimal.valueOf,
    * setScale(6, HALF_UP). Called from both eval paths so interpreted
    * and codegen'd results cannot diverge. */
  def positiveAfterRound6(s: Double): Boolean =
    java.math.BigDecimal.valueOf(s)
      .setScale(6, java.math.RoundingMode.HALF_UP).signum() > 0
}
