package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window helpers reproducing the reference's rolling/fill semantics
  * (SURVEY.md §2.5; ref: src/pm25ml/feature_generation/generate.py:71-100,
  * setup/pm25_filters.py:28-35).
  *
  * All frames are ROW-based, partitioned by a key and ordered by date —
  * correct because the scaffold guarantees one row per (key, date)
  * ([[graft.operators.Scaffold]]).
  */
object Rolling {

  /** NaN → null so aggregates skip it (polars fill_nan(None);
    * Spark aggs skip null but NOT NaN — semantically load-bearing,
    * ref: generate.py:74,85,92,99).
    */
  def nanToNull(c: Column): Column = nanvl(c, lit(null).cast("double"))

  /** Rolling mean over the last `n` rows with min_samples=1: Spark's
    * null-skipping avg over a row frame (ref: generate.py:71-79).
    *
    * Direct sliding form — Spark re-aggregates the whole frame per row
    * (O(n) per row), fine for small `n` (the 7-day predictor stats).
    * Long windows at soak scale should use the PREFIX decomposition
    * ([[cumSumCount]] + [[rollingMeanFromCums]] — O(1) per row,
    * round-13 measurement: the 365-row frame over 13.1 M rows dropped
    * 53 s → 31 s); the two differ only in double-summation order
    * (≤1 ulp-scale), which is why the decomposed form is not
    * substituted here under oracle-gated callers.
    */
  def rollingMean(c: Column, partition: Seq[Column], order: Seq[Column],
                  n: Int): Column =
    avg(nanToNull(c)).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(-(n - 1), 0))

  /** Cumulative (sum, count) of non-null, non-NaN values up to the
    * current row — the shared prefix state for
    * [[rollingMeanFromCums]]. Runs in one incremental frame
    * (UnboundedPreceding→current: O(1) per row).
    */
  def cumSumCount(c: Column, partition: Seq[Column],
                  order: Seq[Column]): (Column, Column) = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (sum(nanToNull(c)).over(w), count(nanToNull(c)).over(w))
  }

  /** Rolling mean over the last `n` rows (min_samples=1) from the
    * [[cumSumCount]] columns: `(cs − cs₋ₙ) / (cn − cn₋ₙ)`, null when
    * the frame holds no non-null sample — `lag` is an offset window
    * function (O(1) per row, same WindowExec as other expressions on
    * the same partition/order spec), so an n-row window costs the same
    * as a 7-row one. Differences vs the direct form are confined to
    * double-summation order (prefix difference vs frame re-sum); use
    * only where a ulp-scale divergence is acceptable (the float32
    * feature tables; NOT the bit-hashed oracle queries).
    */
  def rollingMeanFromCums(cs: Column, cn: Column, partition: Seq[Column],
                          order: Seq[Column], n: Int): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    val ds = cs - coalesce(lag(cs, n).over(w), lit(0.0))
    val dn = cn - coalesce(lag(cn, n).over(w), lit(0L))
    when(dn > 0, ds / dn.cast("double"))
  }

  /** Polars rolling_mean default (min_samples = window size): null until
    * the frame holds `n` NON-NULL samples — polars counts valid values,
    * not rows (ref: pm25_filters.py:28-35).
    */
  def rollingMeanFullWindowOnly(c: Column, partition: Seq[Column],
                                order: Seq[Column], n: Int): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), 0)
    when(count(nanToNull(c)).over(w) === n, avg(nanToNull(c)).over(w))
  }

  /** Mean over an unbounded group, broadcast back to rows
    * (polars mean().over(keys); ref: generate.py:91-99).
    */
  def groupMean(c: Column, partition: Seq[Column]): Column =
    avg(nanToNull(c)).over(Window.partitionBy(partition: _*))

  /** Forward fill: last non-null at or before the current row. */
  def forwardFill(c: Column, partition: Seq[Column], order: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Backward fill: first non-null at or after the current row.
    *
    * Implemented as a running `last(ignoreNulls)` over the REVERSED
    * order — value-identical to `first(...) OVER (ROWS CURRENT ROW TO
    * UNBOUNDED FOLLOWING)` (both select the same element; no
    * arithmetic), but O(1) per row: Spark executes an
    * UnboundedFollowing frame by re-aggregating from the current row
    * to the partition end for EVERY row (O(n²) per partition — the
    * round-13 fg_year measurement: 85 s for the fill pass over 13.1 M
    * rows vs 8.8 s for this form), while the reversed running frame
    * extends one row at a time. The extra cost is one descending sort
    * per WindowExec group, shared by every fill column in the select.
    */
  def backwardFill(c: Column, partition: Seq[Column], order: Seq[Column]): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partition: _*).orderBy(order.map(_.desc): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  // The reference's full rolled-then-filled treatment (rolling mean with
  // min_samples=1, then backward fill, then forward fill —
  // generate.py:71-79) lives in FeatureGenerator as two wide SELECTs:
  // window expressions cannot nest, and per-column withColumn chains pay
  // quadratic analysis cost at production table width.
}
