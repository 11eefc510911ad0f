package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 8-bit SimHash signature of a document in ONE codegen'd expression
  * (SURVEY.md §2.4-F/J; the fused form of q_dedup_simhash's pipeline).
  *
  * Why it exists: the relational spelling explodes every token
  * (`split` → explode → md5 → 8 CASE bit-votes → groupBy doc_id) —
  * at sf1 that is a 4.6 M-row explode and a pre-signature aggregation
  * for what is a per-document scalar. This computes the identical
  * signature in one pass over the row, so the ONLY shuffle left in
  * the dedup key is the final tiny signature group-by.
  *
  * Bit-compatibility with the relational spelling (and the DuckDB
  * oracle, which mirrors it):
  *  - tokens = `split(text, ' ')` semantics — single-space split
  *    KEEPING empty tokens (Java `split(" ", -1)`), so runs of spaces
  *    vote exactly as the exploded form does;
  *  - token hash = first 8 hex chars of md5 parsed base-16, i.e. the
  *    first 4 digest bytes big-endian unsigned — the engine-neutral
  *    `conv(substring(md5(w),1,8),16,10)` hash used by every gram
  *    operator in DedupOps;
  *  - vote rule: bit b of the hash set → +1, else −1 (the hash is
  *    non-negative, so `shiftright(h,b) % 2 = 1` ≡ `(h >> b) & 1`);
  *    signature bit set iff the vote sum is strictly positive.
  * Both eval paths call the same [[SimHash.compute]]; SimHashSpec
  * drives the expression against the relational spelling on the
  * fixture corpus plus adversarial inputs (multi-space runs, empty
  * string, single token).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash {

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Int = {
    // String.split(" ", -1) fast-paths single-char literals and keeps
    // trailing empties — the same token stream as Spark's split(text,' ')
    val toks = s.toString.split(" ", -1)
    val votes = new Array[Int](8)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 md5 hex chars = first 4 digest bytes, big-endian unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8)  |  (d(3) & 0xffL)
      var b = 0
      while (b < 8) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0
    var b = 0
    while (b < 8) {
      if (votes(b) > 0) sig |= 1 << b
      b += 1
    }
    sig
  }
}
