package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided CUSUM changepoint detection (Page 1954) over keyed
  * integer series — the "did this feed's level shift" monitor a
  * 100 TB ingest pipeline runs per source/partition alongside the
  * distributional monitors ([[Drift.ksTable]], PSI): a sustained mean
  * shift of the per-day volume or value of one source trips the
  * cumulative-sum alarm long before it moves a whole-corpus histogram.
  *
  * The textbook recursion `S⁺_t = max(0, S⁺_{t-1} + (x_t − k))` looks
  * sequential, but it has a closed prefix form —
  * `S⁺_t = P_t − min(0, min_{j≤t} P_j)` with `P` the running sum of
  * `(x − k)` — so the whole detector is two window passes (running
  * sum, running min) over one partitioning, no recursion, no UDAF.
  * The negative side is the mirror with `(k' − x)`. All arithmetic is
  * exact BIGINT on the [[Quantized]] contract (fractional inputs abort
  * in-plan with quantize guidance), so the oracle replays every value
  * bit-for-bit with the same two ANSI window functions.
  *
  * 100 TB shape: one shuffle on the series keys; per-series state is a
  * sort of that series' rows — the same boundedness contract as every
  * keyed window here ([[Sessions]], rolling features). For an UNKEYED
  * global series, aggregate to a bounded grid first (per-day totals —
  * what the gate query does): the detector is a level monitor, its
  * input is a monitored summary, never the raw corpus.
  */
object Changepoint {

  /** Per-row CUSUM statistics: input columns plus `cusum_pos`,
    * `cusum_neg` (exact BIGINTs) and `alarm` (1 where either side
    * exceeds `threshold`, else 0). `valueCol` must be integral
    * ([[Quantized.checkedLong]]); `driftK` is the slack subtracted
    * per step (in the same units), `threshold` the alarm level `h`.
    * Ordering inside a series must be unique for determinism —
    * `orderCols` should end in a tie-breaking key.
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            valueCol: String, driftK: Long, threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = Quantized.checkedLong(col(valueCol), "Changepoint.cusum")
    // P⁺ = Σ (x − k); S⁺ = P⁺ − min(0, running-min P⁺). The LEAST
    // against 0 realizes the empty-prefix (j = 0, P_0 = 0) case
    // without a synthetic row.
    val pPos = sum(x - lit(driftK)).over(w)
    val pNeg = sum(lit(driftK) - x).over(w)
    df.withColumn("__pp", pPos)
      .withColumn("__pn", pNeg)
      .withColumn("cusum_pos", col("__pp") - least(lit(0L), min(col("__pp")).over(w)))
      .withColumn("cusum_neg", col("__pn") - least(lit(0L), min(col("__pn")).over(w)))
      .withColumn("alarm",
        when(col("cusum_pos") > threshold || col("cusum_neg") > threshold, 1)
          .otherwise(0).cast("int"))
      .drop("__pp", "__pn")
  }

  /** [[cusum]] plus alarm DEBOUNCING — the alert-hygiene layer: a
    * page fires only after `consecutive` breaching rows in a row
    * (`alarm_debounced`), so a single noisy sample cannot flap the
    * monitor. One more windowed sum over the SAME partitioning — the
    * plan gains no exchange; `alarm_streak` (breaches among the last
    * `consecutive` rows) rides along for dashboards.
    */
  def cusumDebounced(df: DataFrame, keyCols: Seq[String],
                     orderCols: Seq[String], valueCol: String, driftK: Long,
                     threshold: Long, consecutive: Int): DataFrame = {
    require(consecutive >= 1, s"consecutive must be >= 1: $consecutive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(consecutive - 1), Window.currentRow)
    cusum(df, keyCols, orderCols, valueCol, driftK, threshold)
      .withColumn("alarm_streak",
        sum(col("alarm")).over(w).cast("long"))
      .withColumn("alarm_debounced",
        when(col("alarm_streak") === consecutive, 1).otherwise(0)
          .cast("int"))
  }

  /** DuckDB replay of [[cusum]] over `inputSql` (which must yield the
    * key/order columns and an integral `valueCol`): the same two
    * window passes, same LEAST-against-zero empty-prefix handling.
    * Mirrors the operator's COLUMN CONTRACT exactly: every input
    * column rides through (`src.*`), so a query whose input carries
    * columns beyond key/order/value stays oracle-parity instead of
    * silently diverging on projection width. Intermediates use the
    * operator's collision-resistant `__`-prefixed names, so an input
    * that itself carries a `pp`/`pn` column replays too.
    */
  def oracleSql(inputSql: String, keyCols: Seq[String],
                orderCols: Seq[String], valueCol: String,
                driftK: Long, threshold: Long): String = {
    val part = if (keyCols.isEmpty) "" else
      s"PARTITION BY ${keyCols.mkString(", ")} "
    val ord = s"ORDER BY ${orderCols.mkString(", ")}"
    val frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"""WITH src AS ($inputSql),
       p AS (
         SELECT *,
           SUM($valueCol - $driftK) OVER ($part$ord $frame) AS __pp,
           SUM($driftK - $valueCol) OVER ($part$ord $frame) AS __pn
         FROM src),
       c AS (
         SELECT *,
           __pp - LEAST(0, MIN(__pp) OVER ($part$ord $frame)) AS __cusum_pos,
           __pn - LEAST(0, MIN(__pn) OVER ($part$ord $frame)) AS __cusum_neg
         FROM p)
       SELECT * EXCLUDE (__pp, __pn, __cusum_pos, __cusum_neg),
         CAST(__cusum_pos AS BIGINT) AS cusum_pos,
         CAST(__cusum_neg AS BIGINT) AS cusum_neg,
         CAST(CASE WHEN __cusum_pos > $threshold OR __cusum_neg > $threshold
              THEN 1 ELSE 0 END AS INTEGER) AS alarm
       FROM c"""
  }

  /** DuckDB replay of [[cusumDebounced]]: the [[oracleSql]] frame plus
    * the identical trailing-`consecutive` alarm sum.
    */
  def debouncedOracleSql(inputSql: String, keyCols: Seq[String],
                         orderCols: Seq[String], valueCol: String,
                         driftK: Long, threshold: Long,
                         consecutive: Int): String = {
    val part = if (keyCols.isEmpty) "" else
      s"PARTITION BY ${keyCols.mkString(", ")} "
    val ord = s"ORDER BY ${orderCols.mkString(", ")}"
    val base = oracleSql(inputSql, keyCols, orderCols, valueCol,
      driftK, threshold)
    s"""SELECT *,
         CAST(SUM(alarm) OVER ($part$ord
           ROWS BETWEEN ${consecutive - 1} PRECEDING AND CURRENT ROW)
           AS BIGINT) AS alarm_streak,
         CAST(CASE WHEN SUM(alarm) OVER ($part$ord
           ROWS BETWEEN ${consecutive - 1} PRECEDING AND CURRENT ROW)
           = $consecutive THEN 1 ELSE 0 END AS INTEGER) AS alarm_debounced
       FROM ($base)"""
  }
}
