package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd geohash cell encoder (lon, lat) → base32 string. */
case class GeohashExpr(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  // SQL literals parse as decimal under ANSI mode; coerce to the double
  // the kernel computes over (same rounding as the DataFrame path).
  override def inputTypes: Seq[GraftShim.AbsType] = Seq(DoubleType, DoubleType)
  override def nullSafeEval(lon: Any, lat: Any): Any =
    UTF8String.fromString(graft.index.GeoIndex.encode(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], precision))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.index.GeoIndex.encode($lon, $lat, $precision))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
