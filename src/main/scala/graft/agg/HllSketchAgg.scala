package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType}

/** HyperLogLog distinct-count as a native
  * `TypedImperativeAggregate[Array[Byte]]` (SURVEY.md §2.4-J) —
  * the SQL-function surface of the sketch, registered as
  * `graft_hll_distinct` by GraftFunctions.
  *
  * Why this API and not only the typed `Aggregator` ([[HllDistinct]]):
  * a TypedImperativeAggregate participates in SQL directly (any
  * GROUP BY, no Dataset encoder), carries its buffer as a raw object
  * between update calls (zero per-row serialization — the Aggregator
  * round-trips its buffer through the encoder on every partial merge
  * boundary), and serializes only at shuffle edges: `serialize` /
  * `deserialize` are the identity on the register array. Spark plans
  * it partial → shuffle-by-group → final like any built-in, so the
  * map-side combine property of the sketch is preserved.
  *
  * Register logic lives in [[HllCore]], shared with the Aggregator —
  * the two surfaces are bit-identical (MediaHllSpec).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 11,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision p=$p out of range [4,16]")

  // AbstractDataType (and with it ImplicitCastInputTypes.inputTypes)
  // is private[sql], so the integral widening is done here instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_distinct expects an integral column, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
      }
      HllCore.add(buffer, long, p)
    }
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    HllCore.merge(a, b)
    a
  }

  override def eval(buffer: Array[Byte]): Any = HllCore.estimate(buffer)

  // the buffer IS a byte array — shuffle serialization is the identity
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hll_distinct"
}
