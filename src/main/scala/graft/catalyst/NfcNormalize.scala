package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression
  * (SURVEY.md §2.4-J; the canonicalization leg of q_text_normalize).
  *
  * Spark SQL has no unicode-normalization builtin, so the alternative
  * would be a Scala UDF — opaque to the optimizer and off the codegen
  * path. This stays inside whole-stage codegen; the heavy lifting is
  * `java.text.Normalizer` (ICU-equivalent for NFC on the JDK), reached
  * through one static helper shared by the interpreted and generated
  * paths so they cannot diverge. The DuckDB oracle twin is its native
  * `nfc_normalize(text)`; both implement Unicode canonical composition,
  * so results agree on any input (asserted on composed/decomposed
  * pairs in NormalizeSpec — the ASCII fixture alone cannot tell).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for ~all real corpus text (ASCII is always NFC) — the common
  * case costs one scan, only actually-decomposed strings pay for
  * recomposition.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {

  /** Shared by interpreted eval and generated code. Returns the input
    * object unchanged (no copy) when already normalized. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
