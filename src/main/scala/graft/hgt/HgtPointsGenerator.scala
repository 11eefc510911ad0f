package graft.hgt

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Catalyst `Generator` (UDTF — SURVEY.md §2.4-J): explode one HGT
  * tile payload into its (lat, lng, alt) grid rows inside the SQL
  * engine, so tile decoding composes with any downstream relational
  * plan (`SELECT hgt_points(content, 47, 6) FROM binary_tiles`).
  *
  * Functionally identical to the Dataset `flatMap` path in
  * [[HgtCodec.points]]; this variant exists for the SQL surface and
  * as the Generator extension-point exercise. Generators have no
  * codegen contract worth chasing here — the per-row work (decoding
  * a whole tile) dwarfs virtual-call overhead, so CodegenFallback is
  * the right trade.
  */
case class HgtPoints(bytesExpr: Expression, swLatExpr: Expression, swLngExpr: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(bytesExpr, swLatExpr, swLngExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (bytesExpr.dataType, swLatExpr.dataType, swLngExpr.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hgt_points expects (binary, int, int), got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lng", DoubleType, nullable = false),
    StructField("alt", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = bytesExpr.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) Iterator.empty
    else {
      val swLat = swLatExpr.eval(input).asInstanceOf[Int]
      val swLng = swLngExpr.eval(input).asInstanceOf[Int]
      HgtCodec.decode(bytes, swLat, swLng, keepVoid = false)
        .map(p => InternalRow(p.lat, p.lng, p.alt.toInt))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HgtPoints =
    copy(bytesExpr = newChildren(0), swLatExpr = newChildren(1), swLngExpr = newChildren(2))

  override def prettyName: String = "hgt_points"
}

object HgtPoints {
  /** Idempotent session registration of the `hgt_points` UDTF. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hgt_points",
      (exprs: Seq[Expression]) => HgtPoints(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
}
