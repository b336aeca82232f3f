package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BinaryExpression, CreateNamedStruct, EqualTo, Expression, If, IsNotNull, LessThan, Literal, Not, Or, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
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

  /** Order-preserving 64-bit image of a double under Spark SQL's total
    * order: −0.0 folded onto 0.0, every NaN canonicalized (greatest),
    * then the IEEE-754 sign-flip/bit-flip transform — so signed-long
    * comparison of the images IS `SQLOrderingUtil.compareDoubles`.
    */
  def sortableDouble(x: Double): Long = {
    // doubleToLongBits (not Raw) canonicalizes every NaN; == 0.0 folds −0.0
    val bits = java.lang.Double.doubleToLongBits(if (x == 0.0) 0.0 else x)
    if (bits >= 0) bits else bits ^ 0x7FFFFFFFFFFFFFFFL
  }
}

/** [[VectorKernel.sortableDouble]] as a codegen expression. */
case class SortableDoubleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any): Any =
    VectorKernel.sortableDouble(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expressions.VectorKernel.sortableDouble($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sortable_double"
}

/** Rank-1 argmin by `(score, id)` as a DeclarativeAggregate over a
  * PRIMITIVE buffer `[sortable(score): long, id: long, rawScore:
  * double, seen: boolean]` — HashAggregate-eligible AND whole-stage
  * codegen'd, with zero per-row allocation. Ordering is exactly
  * `min(struct(score, id))`: Spark's double total order (−0.0 ≡ 0.0,
  * every NaN equal and greatest — carried by [[SortableDoubleExpr]])
  * then ascending id, and the WINNING ROW's raw score value (its −0.0
  * sign, its NaN payload) is what evaluates out, bit-for-bit. Rows
  * with a null score or id are ignored; all-ignored groups evaluate
  * to null. Result: `struct(score, id)`.
  */
case class ArgMinScoreIdAgg(left: Expression, right: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def nullable: Boolean = true

  private lazy val bestS = AttributeReference("bestS", LongType, nullable = false)()
  private lazy val bestId = AttributeReference("bestId", LongType, nullable = false)()
  private lazy val bestV = AttributeReference("bestV", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestS, bestId, bestV, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Long.MaxValue), Literal(Long.MaxValue), Literal(0.0),
      Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val s = SortableDoubleExpr(left)
    val inputOk = And(IsNotNull(left), IsNotNull(right))
    val better = And(inputOk, Or(Not(seen),
      Or(LessThan(s, bestS), And(EqualTo(s, bestS), LessThan(right, bestId)))))
    Seq(
      If(better, s, bestS),
      If(better, right, bestId),
      If(better, left, bestV),
      Or(seen, inputOk))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = And(seen.right, Or(Not(seen.left),
      Or(LessThan(bestS.right, bestS.left),
        And(EqualTo(bestS.right, bestS.left),
          LessThan(bestId.right, bestId.left)))))
    Seq(
      If(better, bestS.right, bestS.left),
      If(better, bestId.right, bestId.left),
      If(better, bestV.right, bestV.left),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(Not(seen), Literal(null, dataType),
      CreateNamedStruct(Seq(Literal("score"), bestV, Literal("id"), bestId)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinScoreIdAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "argmin_score_id"
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpr(a), toExpr(b)))
  def argmin_score_id(score: Column, id: Column): Column =
    toColumn(ArgMinScoreIdAgg(toExpr(score), toExpr(id)).toAggregateExpression())
}
