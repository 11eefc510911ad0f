package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token word shingles of a document in ONE codegen'd
  * expression — the blocking unit of every gram-based operator
  * (containment / MinHash / contamination / bloom decontamination;
  * SURVEY.md §2.4-H/J).
  *
  * Why it exists: the SQL spelling
  * `array_distinct(transform(sequence(0, size(t)-n), i ->
  * concat_ws(' ', t[i], …)))` runs the lambda through Catalyst's
  * interpreted higher-order-function path — per element it
  * materializes the sequence, evaluates an interpreted projection and
  * allocates through non-codegen concat — measured at sf1 as ~3.4 s
  * of the 5.2 s shingle pass over 50 k docs (2.6 M grams), the single
  * largest stage of every dedup key (BASELINE.md §sf1). Here the
  * whole construction is one tight JVM loop: split once, slide an
  * n-window emitting grams into an insertion-ordered set.
  *
  * Semantics are exactly the SQL spelling's:
  *  - `split(text, ' ')` keeps empty tokens (Java `split(regex, -1)`,
  *    the same call Spark's StringSplit makes), so runs of spaces
  *    yield the same gram strings both ways;
  *  - docs with fewer than n tokens return an EMPTY array (the
  *    callers' `size(t) >= n` guard + explode drop those rows either
  *    way — a negative sequence span must never emit partial grams,
  *    §2.2);
  *  - dedup preserves first-occurrence order like `array_distinct`.
  * Both eval paths call the same [[WordShingles.compute]], so
  * interpreted and codegen'd results cannot diverge; the
  * ShinglesSpec property drives this against the SQL spelling on
  * adversarial inputs (multi-space, short docs, dup-heavy docs).
  */
case class WordShingles(child: Expression, n: Int = 3) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"word_shingles width out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.catalyst.WordShingles.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Shared by the interpreted and generated paths. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val t = text.toString.split(" ", -1)
    val m = t.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
