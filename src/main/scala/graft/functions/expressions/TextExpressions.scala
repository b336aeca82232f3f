package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/dedup kernels. Each generates a
  * single static-method call so whole-stage codegen stays intact (the same
  * pattern Spark's own hash expressions use) — no Scala-closure UDF
  * serialization, no codegen fallback in the hot path.
  */

/** Winnowing fingerprint of a string column → array<bigint>
  * (see [[graft.text.Winnow]]).
  */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      graft.text.Winnow.fingerprint(input.asInstanceOf[UTF8String].toString, k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.text.Winnow.fingerprint($c.toString(), $k, $w));""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint"
}

/** 64-bit SimHash of an array<string> token column → bigint
  * (see [[graft.dedup.SimHash]]).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val it = (0 until arr.numElements()).iterator
      .map(i => arr.getUTF8String(i).toString)
    graft.dedup.SimHash.simhash64(it)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprHelpers.simhashArray($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** FNV-1a feature-hash bucket of each token: array<string> →
  * array<int> of `((fnv1a64(tok) mod m) + m) mod m` — the hashing-trick
  * front end for linear text classifiers ([[graft.text.QualityClassifier]]).
  * Native expression rather than `functions` arithmetic because the FNV
  * multiply must wrap on 64-bit overflow, which ANSI-mode Spark SQL
  * arithmetic refuses to do.
  */
case class FnvBucketsExpr(child: Expression, m: Int) extends UnaryExpression {
  require(m > 0, s"bucket count must be positive (got $m)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprHelpers.fnvBuckets(input.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprHelpers.fnvBuckets($c, $m);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fnv_buckets"
}

/** Unicode NFC normalization (java.text.Normalizer — the JDK's
  * implementation of the Unicode standard's canonical composition).
  * Corpus text arrives in mixed composed/decomposed forms; every
  * hash-keyed operator (dedup, URL canon, vocab) silently treats them
  * as different documents unless normalized first. Codegen'd; the
  * DuckDB oracle replays it with `nfc_normalize` (both implement the
  * same Unicode algorithm, so outputs are byte-identical).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextExprHelpers.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprHelpers.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** All distinct strings reachable from `child` with at most `d`
  * character deletions (including the string itself) — the SymSpell
  * symmetric-delete key set: two strings within Levenshtein distance d
  * always share at least one such variant, so an equi-join on variants
  * is a COMPLETE candidate generator for edit-distance matching (no
  * per-pair distance scan of the corpus).
  */
case class DeletionVariantsExpr(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 0 && d <= 3, s"deletion depth out of range: $d")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprHelpers.deletionVariants(input.asInstanceOf[UTF8String], d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprHelpers" +
        s".deletionVariants($c, $d);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deletion_variants"
}

/** Static helpers the generated code calls. */
object TextExprHelpers {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def deletionVariants(s: UTF8String, d: Int): ArrayData = {
    val seen = new java.util.LinkedHashSet[String]()
    var frontier: List[String] = List(s.toString)
    seen.add(s.toString)
    var depth = 0
    while (depth < d && frontier.nonEmpty) {
      val next = List.newBuilder[String]
      frontier.foreach { w =>
        var i = 0
        while (i < w.length) {
          val v = w.substring(0, i) + w.substring(i + 1)
          if (seen.add(v)) next += v
          i += 1
        }
      }
      frontier = next.result()
      depth += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  def simhashArray(arr: ArrayData): Long = {
    val it = (0 until arr.numElements()).iterator
      .map(i => arr.getUTF8String(i).toString)
    graft.dedup.SimHash.simhash64(it)
  }

  def fnvBuckets(arr: ArrayData, m: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val mod = (graft.dedup.SimHash.fnv1a64(arr.getUTF8String(i).toString) % m).toInt
      out(i) = if (mod < 0) mod + m else mod
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._
  def winnow_fingerprint(c: Column, k: Int = graft.text.Winnow.KDefault,
                         w: Int = graft.text.Winnow.WDefault): Column =
    toColumn(WinnowFingerprintExpr(toExpr(c), k, w))

  def simhash64(tokens: Column): Column = toColumn(SimHash64Expr(toExpr(tokens)))

  def fnv_buckets(tokens: Column, m: Int): Column =
    toColumn(FnvBucketsExpr(toExpr(tokens), m))

  def nfc_normalize(c: Column): Column = toColumn(NfcNormalizeExpr(toExpr(c)))

  def deletion_variants(c: Column, d: Int): Column =
    toColumn(DeletionVariantsExpr(toExpr(c), d))
}
