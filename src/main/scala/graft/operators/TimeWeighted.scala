package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted averaging over irregular event series — the correct
  * "average level" when observations arrive unevenly (a sensor that
  * reports often while misbehaving would dominate a plain AVG; 90% of
  * ops-metric averaging bugs are exactly this). Step-function (left-
  * constant) semantics: each value holds from its own timestamp to
  * the next one, so
  * `TWA = Σ (t_{i+1} − t_i) · v_i / (t_n − t_0)`.
  *
  * Exact lane: timestamps are epoch MICROSECONDS (what the engine's
  * `timestamp` columns natively carry), values integral under the
  * [[Quantized]] contract; the weighted mass accumulates as
  * DECIMAL(38,0) (µs-gaps × values pass 64 bits at ~month-long gaps
  * of large-grid values), and the TWA is ONE pinned IEEE division —
  * the oracle replays it bit-for-bit, no rounding.
  *
  * Shape: one shuffle on the series keys, a lead window and one
  * aggregation over the same partitioning. Keys with a single
  * observation have no span and report NULL (not the bare value: a
  * zero-length window has no time-average).
  */
object TimeWeighted {

  /** Per-key step-function TWA: `(keys…, n, span_us, twa)`.
    * `orderCols` must make the series order unique (end with a
    * tie-breaking id); `tsCol` must be a TimestampType column.
    */
  def stepTwa(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
              tsCol: String, valueCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val v = Quantized.checkedLong(col(valueCol), "TimeWeighted.stepTwa")
    val rows = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__dt", lead(col("__t"), 1).over(w) - col("__t"))
      .withColumn("__v", v)
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (max(col("__t")) - min(col("__t"))).as("span_us"),
        sum((col("__dt").cast(d) * col("__v").cast(d))).as("__mass"))
      .select((keyCols.map(col) :+ col("n") :+ col("span_us") :+
        when(col("span_us") > 0,
          col("__mass").cast("double") / col("span_us").cast("double"))
          .as("twa")): _*)
  }

  /** DuckDB replay of [[stepTwa]] over `inputSql` yielding the key
    * and order columns, `ts` (TIMESTAMP) and an integral `v`.
    */
  def oracleSql(inputSql: String, keyCols: Seq[String],
                orderCols: Seq[String]): String = {
    val part = keyCols.mkString(", ")
    val ord = orderCols.mkString(", ")
    s"""WITH src AS ($inputSql),
       stepped AS (
         SELECT $part, EPOCH_US(ts) AS t, v,
           LEAD(EPOCH_US(ts), 1) OVER (
             PARTITION BY $part ORDER BY $ord) - EPOCH_US(ts) AS dt
         FROM src WHERE v IS NOT NULL),
       agg AS (
         SELECT $part, COUNT(*) AS n, MAX(t) - MIN(t) AS span_us,
           SUM(CAST(dt AS HUGEINT) * v) AS mass
         FROM stepped GROUP BY $part)
       SELECT $part, CAST(n AS BIGINT) AS n,
         CAST(span_us AS BIGINT) AS span_us,
         CASE WHEN span_us > 0
           THEN CAST(mass AS DOUBLE) / CAST(span_us AS DOUBLE) END AS twa
       FROM agg"""
  }
}
