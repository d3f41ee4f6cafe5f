package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Product-quantization kernels (codebooks/LUTs ride along as reference
  * objects in generated code — one static-shaped loop per row, no
  * per-element expression interpretation).
  */
object PqKernels {

  /** Nearest-centroid code per subspace; 1 byte per code. */
  def encode(vec: ArrayData, books: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val subDim = book(0).length
      val off = j * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = vec.getDouble(off + i) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** ADC: Σ_j lut(j)(code_j). */
  def adc(codes: Array[Byte], lut: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      s += lut(j)(codes(j) & 0xff)
      j += 1
    }
    s
  }
}

case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcScoreExpr(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    PqKernels.adc(input.asInstanceOf[Array[Byte]], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", lut, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.adc($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
