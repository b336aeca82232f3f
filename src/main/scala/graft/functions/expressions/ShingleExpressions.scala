package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a string, one pass, native.
  *
  * The composed-column version (`transform(sequence(...), i =>
  * concat_ws(slice(split(text)...)))`) re-evaluates the regex split per
  * lambda element — Catalyst does not CSE across lambda boundaries — which
  * measured ~1.4 ms/doc; this kernel tokenizes once (~20 µs/doc).
  */
case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shinglesArrayData(input.asInstanceOf[UTF8String].toString, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.ShingleKernel.shinglesArrayData(
         |  $c.toString(), $k);""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** ALL word k-shingles of a string in POSITIONAL order — element `i` is
  * the window starting at token `i` (duplicates kept). The positional
  * index is what span detection needs: `posexplode` turns it into
  * (token position, window) pairs, so consecutive matching windows
  * chain into maximal shared spans ([[graft.dedup.ExactSubstr]]).
  */
case class WordShinglesAllExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shinglesAllArrayData(input.asInstanceOf[UTF8String].toString, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.ShingleKernel.shinglesAllArrayData(
         |  $c.toString(), $k);""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles_all"
}

object ShingleKernel {
  /** Distinct k-shingles in first-occurrence order (matching the
    * array_distinct semantics of the composed version).
    */
  def shingles(text: String, k: Int): Array[AnyRef] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    out
  }

  def shinglesArrayData(text: String, k: Int): GenericArrayData =
    new GenericArrayData(shingles(text, k))

  /** All k-shingles in positional order (element i = window at token i). */
  def shinglesAll(text: String, k: Int): Array[AnyRef] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return Array.empty
    val out = new Array[AnyRef](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  def shinglesAllArrayData(text: String, k: Int): GenericArrayData =
    new GenericArrayData(shinglesAll(text, k))
}
