package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** Distinct md5-32 HASHES of a document's n-token shingles, one
  * codegen'd pass (r13, VERDICT r12 #2). The containment fold is
  * O(total grams) through two corpus shuffles — measured as the owner
  * of its third decade (SCALE.md §containment: 9.9 s of 24.4 s at
  * sf10, 26.5 M gram rows of ~25-byte strings). Folding the 8-byte
  * engine-neutral hash instead (the md5-int64 seam every minhash key
  * already uses: first 8 hex chars of md5 = first 4 md5 bytes,
  * unsigned) takes string mass out of the checkpoint, the df
  * group-by, and the per-doc collect in one move.
  *
  * Exactness across engines: the DuckDB mirror is
  * `list_distinct(list_transform(<distinct shingles>, s ->
  * CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT)))` — hash the
  * per-doc DISTINCT gram strings, then dedup the hash VALUES, so a
  * within-doc 32-bit collision (birthday odds ≈ 0.16 expected docs at
  * sf10 — NOT ignorable at hash-match discipline) collapses
  * identically on both sides: per-doc arrays are distinct-by-value,
  * `n` = array length, df counts docs-containing-hash, and
  * array_intersect semantics equal the oracle's row-join counts.
  * First-occurrence order, like the parent expression (order is
  * irrelevant downstream — set semantics — but keeping it makes the
  * two expressions property-testable against each other). */
case class WordShingleHashes(child: Expression, n: Int = 3) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"word_shingle_hashes width out of range: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingles.computeHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.catalyst.WordShingles.computeHashes($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
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

  /** md5-32 of a UTF-8 string — EXACTLY DuckDB/Spark SQL
    * `cast(conv(substring(md5(s),1,8),16,10) as bigint)`: the first
    * 4 md5 bytes read big-endian, zero-extended to long. */
  def md5_32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** [[compute]]'s distinct gram set, hashed per element and deduped
    * BY HASH VALUE (see [[WordShingleHashes]] for the cross-engine
    * collision rule). Shared by both eval paths. */
  def computeHashes(text: UTF8String, n: Int): ArrayData = {
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
    val hashes = new java.util.LinkedHashSet[java.lang.Long](seen.size * 2)
    val it = seen.iterator()
    while (it.hasNext) hashes.add(md5_32(it.next()))
    val out = new Array[Any](hashes.size)
    val hit = hashes.iterator()
    var k = 0
    while (hit.hasNext) { out(k) = hit.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
