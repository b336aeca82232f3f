package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index-order dot product of two double arrays — native kernel.
  *
  * Numerically identical to `aggregate(zip_with(a, b, _*_), 0d, _+_)` (the
  * same left-to-right summation) but one static call instead of per-element
  * lambda dispatch: at 2M pairs × 64 dims the composed version measured
  * ~10 s, this ~1 s. Arrays of unequal length fold over the common prefix
  * (zip_with would null-pad; callers guarantee equal dims).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.VectorKernel.dot($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object VectorKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpr(a), toExpr(b)))
}
