package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** First position-aligned equal element of two int arrays — the LSH
  * candidate-dedup primitive (SURVEY.md §2.4-J).
  *
  * Why it exists: a multi-band LSH self-join emits every colliding
  * pair once PER colliding band, and the naive dedup is
  * `.distinct()` over the full candidate stream — at sf1 that is a
  * ~66 M-row exchange plus a ~60 M-group hash aggregate, the
  * dominant cost of q_dedup_embedding (BASELINE.md §sf1). The
  * standard fix keeps a pair only in its FIRST common band: both
  * sides carry their full signature array (position-aligned, one key
  * per band; keys embed the band index in the high bits so cross-band
  * keys never collide), and a map-side filter
  * `graft_first_band_match(sig_a, sig_b) = k` accepts exactly one of
  * the duplicate emissions. The distinct exchange disappears from the
  * plan; dedup happens inside the same codegen stage as the join.
  *
  * Returns the first equal value (not its index) so the filter can
  * compare directly against the exploded key column; -1 when the
  * arrays share no aligned value (never the case for two rows that
  * met on an equi key, but the expression must total). Scans
  * min(len_a, len_b) positions.
  */
case class FirstBandMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"first_band_match expects (array<int>, array<int>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstBandMatch.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.catalyst.FirstBandMatch.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstBandMatch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "first_band_match"
}

object FirstBandMatch {

  /** Shared by the interpreted and generated paths. Null elements
    * (possible only for ArrayType(containsNull=true) inputs) compare
    * as not-equal, mirroring SQL `a[i] = b[i]` three-valued logic
    * falling through a filter. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val v = a.getInt(i)
        if (v == b.getInt(i)) return v
      }
      i += 1
    }
    -1
  }
}
