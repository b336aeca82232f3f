package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions._

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get the same kernels as the Column API:
  *
  *   SELECT word_shingles(text, 3), simhash64(tokens),
  *          minhash_signature(shingles, 128), minhash_bands(shingles, 128, 32),
  *          winnow_fingerprint(text), dot_product(a, b) ...
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"expected integer literal, got $other")
      }

    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShinglesExpr(exprs.head, intLit(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignatureExpr(exprs.head, intLit(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      exprs => MinHashBandsExpr(exprs.head, intLit(exprs(1)), intLit(exprs(2))),
      "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      exprs => WinnowFingerprintExpr(exprs.head,
        if (exprs.length > 1) intLit(exprs(1)) else graft.text.Winnow.KDefault,
        if (exprs.length > 2) intLit(exprs(2)) else graft.text.Winnow.WDefault),
      "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("fnv_buckets",
      exprs => FnvBucketsExpr(exprs.head, intLit(exprs(1))), "scala_udf")
  }
}
