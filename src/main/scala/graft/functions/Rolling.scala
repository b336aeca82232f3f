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
    */
  def rollingMean(c: Column, partition: Seq[Column], order: Seq[Column],
                  n: Int): Column =
    avg(nanToNull(c)).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(-(n - 1), 0))

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

  /** Backward fill: first non-null at or after the current row. */
  def backwardFill(c: Column, partition: Seq[Column], order: Seq[Column]): Column =
    first(c, ignoreNulls = true).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))

  // The reference's full rolled-then-filled treatment (rolling mean with
  // min_samples=1, then backward fill, then forward fill —
  // generate.py:71-79) lives in FeatureGenerator as two wide SELECTs:
  // window expressions cannot nest, and per-column withColumn chains pay
  // quadratic analysis cost at production table width.
}
