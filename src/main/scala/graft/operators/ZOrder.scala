package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional locality for
  * data at rest.
  *
  * A 100 TB grid×time corpus is usually range-partitioned on ONE key;
  * queries filtering on the other dimension then touch every file. The
  * Morton curve interleaves the bits of two keys into a single sort key
  * whose ranges are (approximately) 2-D tiles: range-partitioning and
  * sorting files by `z` gives every file a small bounding box in BOTH
  * dimensions, so parquet min/max row-group stats prune on either
  * predicate — the same layout lever Delta/Iceberg expose as
  * `OPTIMIZE ... ZORDER BY`.
  *
  * Everything is plain bit arithmetic on integer columns
  * (shift/and/or — whole-stage-codegen'd, no UDF), and the classic
  * magic-number spread is an exact public algorithm, so the gate oracle
  * replays it bit-for-bit in SQL.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (the textbook mask cascade).
    */
  private def spread16(v: Column): Column = {
    val a = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton code of two coordinates in [0, 2^16): x owns the even
    * bits, y the odd bits — a 32-bit z-value as a long.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Lay `df` out along the Morton curve: range-partition into
    * `numFiles` z-ranges and sort each partition by z — every output
    * file then covers one curve segment, i.e. a bounded tile in (x, y).
    * Coordinates must already be non-negative ints below 2^16 (quantize
    * first: `floor((v - min) / cellSize)`).
    */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String,
                numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
