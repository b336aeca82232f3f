package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe of a 64-bit hash, backed by a
  * BROADCAST variable rather than a plan literal.
  *
  * Spark's own `BloomFilterMightContain` wants the serialized filter as a
  * literal (or scalar subquery) child: embedding a corpus-snapshot filter
  * that way puts the whole bit array inside the logical plan — a
  * billion-doc snapshot at fpp=0.01 is ~1.1 GB copied through every plan
  * transform and shipped with every task binary. Holding a
  * `Broadcast[BloomFilter]` instead keeps the plan O(1): tasks carry the
  * broadcast handle, executors fetch the bit array once via the torrent
  * broadcast path, and the deserialized filter is shared by all tasks on
  * the executor. The expression stays codegen-compatible (the broadcast
  * is a codegen reference object), and — unlike a scalar subquery — works
  * unchanged inside a Structured Streaming query plan.
  */
case class BloomProbeExpr(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(h: Any): Any =
    bf.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bfRef.value()).mightContainLong($h);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_probe"
}

object BloomExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._

  /** `true` iff the broadcast filter might contain the long-typed hash. */
  def mightContainLong(bf: Broadcast[BloomFilter], hash: Column): Column =
    toColumn(BloomProbeExpr(toExpr(hash), bf))
}
