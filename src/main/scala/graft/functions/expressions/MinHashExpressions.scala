package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: one pass over the shingle array computing all
  * `numHashes` salted XXH64 hashes per shingle and keeping the minima.
  *
  * The composed-column alternative (numHashes × `transform`/`array_min`
  * expressions) re-traverses the array per hash function and at 128 hashes
  * overflows whole-stage codegen's method limits, falling back to
  * interpreted eval — measured 300+ s at sf0.1 vs ~2 s for this kernel.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.signature(input.asInstanceOf[ArrayData], numHashes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashKernel.signature($c, $numHashes));
         |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** LSH band bucket keys in one pass: MinHash signature then one 64-bit
  * chain-hash per band. Returned as array<long>, index = band. A composed
  * `bandKeys(signature)` column references the signature sub-expression
  * `bands` times and Catalyst inlines it per reference (no CSE), measured
  * 32× signature recompute; this expression computes it once.
  */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.bandBuckets(input.asInstanceOf[ArrayData], numHashes, bands))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashKernel.bandBuckets($c, $numHashes, $bands));
         |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

object MinHashKernel {
  def bandBuckets(shingles: ArrayData, numHashes: Int, bands: Int): Array[Long] = {
    val sig = signature(shingles, numHashes)
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Per-function 64-bit hashes derived from ONE XXH64 pass over the
    * UTF8 bytes: `h_i(s) = hashLong(hashUnsafeBytes(s, seed=0), i)`.
    *
    * Round-13 optimization (guide §1.2 "per-task work"): the previous
    * kernel re-hashed the full shingle BYTES once per hash function —
    * numHashes × hashUnsafeBytes over a ~20–40-byte string, the
    * dominant CPU of every MinHash pass (measured 408 cpu-s quiet on
    * the 1M-doc soak). Hashing the bytes once and deriving the family
    * with `XXH64.hashLong` (a handful of multiply/rotate ops on the
    * 64-bit base — the same primitive the band chain already uses)
    * does ~numHashes× less byte-hashing work per shingle. This is the
    * standard "one hash, k mixes" MinHash construction (datasketch,
    * MLlib MinHashLSH): each `hashLong(·, i)` is an avalanche-mixed
    * 64→64 map of an already-uniform base, so per-function minima stay
    * uniformly distributed and pairwise-independent enough for the LSH
    * recall bound (P[miss | s=0.8] ≈ 5·10⁻⁸ at 128/32 — re-verified
    * against the brute-force oracles after the change).
    *
    * CONTRACT: signature VALUES changed with this kernel (round 13).
    * Band keys baked into an at-rest corpus ([[graft.dedup
    * .MinHashStorage]]) by an older kernel cannot be probed by this
    * one — rewrite the corpus (the same rule as changing `numHashes`).
    */
  def signature(shingles: ArrayData, numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s: UTF8String = shingles.getUTF8String(i)
      val base = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0)
      var h = 0
      while (h < numHashes) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(base, h)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    mins
  }
}

object MinHashExpressions {
  import org.apache.spark.sql.graftbridge.Bridge._
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    toColumn(MinHashSignatureExpr(toExpr(shingles), numHashes))
  def minhash_bands(shingles: Column, numHashes: Int, bands: Int): Column =
    toColumn(MinHashBandsExpr(toExpr(shingles), numHashes, bands))
}
