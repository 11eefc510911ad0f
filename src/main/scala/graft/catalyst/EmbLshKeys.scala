package graft.catalyst

import graft.queries.EmbLsh
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `bands` band keys of an embedding in ONE codegen'd expression
  * (SURVEY.md §2.4-J; the blocking key of q_dedup_embedding).
  *
  * Why it exists: the same keys spelled as SQL — 126 unrolled
  * `round(graft_dot_product(embedding, array(±1 × 64)), 6)` terms —
  * build a ~20 000-node expression tree that defeats whole-stage
  * codegen (huge-method fallback) and then evaluates interpreted at
  * ~10 µs per projection: key computation alone cost 0.6 s on 500
  * rows. Here the ±1 hyperplane matrix is a referenced `float[][]`
  * and the generated code is three nested runtime loops (band, bit,
  * dim) — the whole key array costs one tight multiply pass per row,
  * inside the surrounding codegen stage.
  *
  * Geometry is a CONSTRUCTOR PARAMETER (r8): the default
  * (EmbLsh.Bits = 6, EmbLsh.Bands = 21) is the declared
  * q_dedup_embedding construction, mirrored bit-for-bit by the DuckDB
  * oracle (`EmbLsh.duckKeysSql`); the classic LSH scale rule is
  * bits ≈ log2(N / target bucket occupancy), so larger corpora and
  * tighter thresholds use WIDER bands (e.g. 16 bits × 8 bands for the
  * cos ≥ 0.85 near-dup regime — see GraftOps.embeddingNearDups and
  * EmbLshScaleSpec). All geometries draw hyperplane weights from the
  * same deterministic splitmix64 stream (`EmbLsh.weight(plane, dim)`,
  * plane = band·bits + bit), so any (bits, bands) pair is
  * reproducible across engines and JVMs.
  *
  * Semantics are bit-identical to the SQL spelling (and, for the
  * default geometry, to the DuckDB oracle): per-plane dot product
  * accumulated left-to-right in double, rounded HALF_UP to 6 decimals
  * before the sign test — see [[EmbLshKeys.positiveAfterRound6]],
  * which matches Spark SQL `round(_, 6) > 0` exactly.
  *
  * Null elements: a NULL anywhere in the array makes every dot
  * product NULL in the oracle (`list_dot_product` propagates NULL),
  * and `CASE WHEN round(NULL,6) > 0` takes the ELSE branch — so every
  * sign bit is unset and band i's key is exactly its offset
  * `i << bits`. Both eval paths below detect a null element up front
  * and return those offset-only keys, rather than reading garbage
  * through `getFloat` on a null slot (fixtures have no null elements;
  * this pins the cross-engine rule for data that does).
  */
case class EmbLshKeys(child: Expression,
                      bits: Int = EmbLsh.Bits,
                      bands: Int = EmbLsh.Bands) extends UnaryExpression {

  require(bits > 0 && bands > 0 && bits < 30 &&
    bands.toLong << bits <= Int.MaxValue,
    s"emb_lsh_keys geometry out of range: bits=$bits bands=$bands")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"emb_lsh_keys expects array<float>, got $t")
  }

  @transient private lazy val planes: Array[Array[Float]] =
    EmbLshKeys.planesFor(bits, bands)

  override def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData]
    val ps = planes
    val keys = new Array[Int](bands)
    val dims = math.min(EmbLsh.Dims, emb.numElements())
    // scan the WHOLE array, not just the first Dims slots: the
    // oracle's list_dot_product sees every element, so a null past
    // Dims still NULLs every projection there
    var i = 0
    while (i < emb.numElements()) {
      if (emb.isNullAt(i)) return UnsafeArrayData.fromPrimitiveArray(
        EmbLshKeys.nullElementKeysFor(bits, bands))
      i += 1
    }
    var band = 0
    while (band < bands) {
      var k = band << bits
      var j = 0
      while (j < bits) {
        val w = ps(band * bits + j)
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
      val planesRef = ctx.addReferenceObj("embLshPlanes", planes, "float[][]")
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
         |int[] $keys = new int[$bands];
         |int $dims = java.lang.Math.min(${EmbLsh.Dims}, $a.numElements());
         |boolean $hasNull = false;
         |for (int $ni = 0; $ni < $a.numElements(); $ni++) {
         |  if ($a.isNullAt($ni)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  $keys = graft.catalyst.EmbLshKeys.nullElementKeysFor($bits, $bands);
         |}
         |else for (int $band = 0; $band < $bands; $band++) {
         |  int $k = $band << $bits;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    float[] $w = $planesRef[$band * $bits + $j];
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

  /** Hyperplane matrices, materialized once per JVM per geometry from
    * the shared deterministic source (EmbLsh.weight — also the source
    * of the DuckDB oracle literals for the default geometry). */
  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Float]]]()

  def planesFor(bits: Int, bands: Int): Array[Array[Float]] =
    planesCache.computeIfAbsent((bits, bands), { case (b, l) =>
      Array.tabulate(l * b, EmbLsh.Dims)((p, d) => EmbLsh.weight(p, d).toFloat)
    })

  /** The default declared geometry's matrix (21 bands × 6 bits). */
  lazy val planes: Array[Array[Float]] = planesFor(EmbLsh.Bits, EmbLsh.Bands)

  /** Keys of an embedding with a null element: every sign test takes
    * the oracle's ELSE-0 branch, leaving only each band's offset. */
  def nullElementKeysFor(bits: Int, bands: Int): Array[Int] =
    Array.tabulate(bands)(band => band << bits)

  def nullElementKeys: Array[Int] = nullElementKeysFor(EmbLsh.Bits, EmbLsh.Bands)

  /** Exactly Spark SQL `round(s, 6) > 0`: Spark's RoundBase goes
    * through scala.math.BigDecimal(double) = java BigDecimal.valueOf,
    * setScale(6, HALF_UP). Called from both eval paths so interpreted
    * and codegen'd results cannot diverge. */
  def positiveAfterRound6(s: Double): Boolean =
    java.math.BigDecimal.valueOf(s)
      .setScale(6, java.math.RoundingMode.HALF_UP).signum() > 0
}
