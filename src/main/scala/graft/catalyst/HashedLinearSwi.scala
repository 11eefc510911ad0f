package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-linear model's per-document integer accumulator in ONE
  * codegen'd expression (r13): swi = Σ over tokens of
  * `md5_32(bucket) % 2001 - 1000` with `bucket = md5_32(tok) % dim` —
  * exactly the bigint that hashedLinearScore's broadcast join
  * aggregates and the q_stream_quality SQL lambda folds.
  *
  * Why it exists: the per-row SQL spelling
  * `aggregate(transform(split(text,' '), t -> …md5(md5(t))…), 0L, +)`
  * runs BOTH md5s per token through Catalyst's interpreted
  * higher-order-function path — measured at sf10 as a 41 s streaming
  * replay against the batch join's 3.0 s (SCALE.md §stream quality).
  * Here the bucket→weight grid is precomputed once per JVM (dim
  * longs), so each token costs one md5 and one array read inside a
  * tight loop.
  *
  * Semantics are exactly the SQL spelling's: `split(text, ' ')` keeps
  * empty tokens (Java `split(regex, -1)`, the same call Spark's
  * StringSplit makes); both md5_32 values are non-negative (< 2^32),
  * so `%` agrees with SQL's sign rule. Both eval paths call the same
  * [[HashedLinearSwi.compute]]; QualityLinearSpec drives the
  * expression against the lambda spelling and the interpreted path
  * against the codegen'd one. */
case class HashedLinearSwi(child: Expression, dim: Int = 1024)
    extends UnaryExpression {

  require(dim >= 1 && dim <= (1 << 20),
    s"graft_hashed_swi dim out of range: $dim")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_swi expects string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    HashedLinearSwi.compute(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.catalyst.HashedLinearSwi.compute($s, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearSwi =
    copy(child = newChild)

  override def prettyName: String = "graft_hashed_swi"
}

object HashedLinearSwi {

  // bucket → integer weight grid, one per requested dim (in practice
  // one: 1024). Deterministic, so a per-JVM cache is safe.
  private val grids =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def grid(dim: Int): Array[Long] =
    grids.computeIfAbsent(Integer.valueOf(dim), d =>
      Array.tabulate(d.intValue())(b =>
        WordShingles.md5_32(String.valueOf(b)) % 2001 - 1000))

  /** Shared by the interpreted and generated paths. */
  def compute(text: UTF8String, dim: Int): Long = {
    val t = text.toString.split(" ", -1)
    val w = grid(dim)
    var s = 0L
    var i = 0
    while (i < t.length) {
      s += w((WordShingles.md5_32(t(i)) % dim).toInt)
      i += 1
    }
    s
  }
}
