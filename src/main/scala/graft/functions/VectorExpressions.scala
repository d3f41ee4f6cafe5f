package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Codegen'd similarity kernels over `array<float|double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates an intermediate array per row and interprets a lambda per
  * element; these expressions generate a tight scalar loop instead (the
  * Spark analog of the reference's SIMD kernels,
  * `lib/segment/src/spaces/simple_{avx,neon,sse}.rs`).
  *
  * Numeric parity contract: accumulate in double, strictly sequential
  * left-to-right — bit-identical to both the HOF formulation and DuckDB's
  * list_dot_product/list_distance, so swapping implementations never moves
  * a rounded score.
  */
abstract class VecBinaryFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Java source for one step: acc += f(a, b) given double a, b. */
  protected def stepCode(acc: String, a: String, b: String): String
  protected def step(acc: Double, a: Double, b: Double): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val b = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      acc = step(acc, a, b)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val getL = if (elemIsFloat(left)) s"(double) $l.getFloat($i)" else s"$l.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $r.getFloat($i)" else s"$r.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = $getL;
         |  double $b = $getR;
         |  ${stepCode(acc, a, b)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ */
case class VecDot(left: Expression, right: Expression) extends VecBinaryFold {
  protected def stepCode(acc: String, a: String, b: String): String =
    s"$acc += $a * $b;"
  protected def step(acc: Double, a: Double, b: Double): Double = acc + a * b
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryFold {
  protected def stepCode(acc: String, a: String, b: String): String =
    s"$acc += ($a - $b) * ($a - $b);"
  protected def step(acc: Double, a: Double, b: Double): Double =
    acc + (a - b) * (a - b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ |aᵢ−bᵢ| */
case class VecL1(left: Expression, right: Expression) extends VecBinaryFold {
  protected def stepCode(acc: String, a: String, b: String): String =
    s"$acc += java.lang.Math.abs($a - $b);"
  protected def step(acc: Double, a: Double, b: Double): Double =
    acc + math.abs(a - b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VecKernels {
  private def expr(c: Column) = GraftShim.expression(c)
  def dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(expr(a), expr(b)))
  def l2sq(a: Column, b: Column): Column =
    GraftShim.column(VecL2Sq(expr(a), expr(b)))
  def l1(a: Column, b: Column): Column =
    GraftShim.column(VecL1(expr(a), expr(b)))
}
