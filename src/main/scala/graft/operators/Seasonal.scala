package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonality-aware outlier detection — "was Tuesday anomalous FOR A
  * TUESDAY": each observation is judged against the profile of its
  * own seasonal slot (day-of-week, hour-of-day — any categorical
  * season column), not the global level, so weekly rhythm stops
  * masquerading as anomaly and anomalies inside the rhythm stop
  * hiding. The seasonal member of the monitor family ([[Changepoint]]
  * steps, [[graft.ml.Trend]] ramps, [[Rates]] binary rates).
  *
  * The z-test runs ENTIRELY in exact arithmetic: with per-slot
  * `(cnt, sum, ssq)` masses, `z² > k²` is equivalent to
  *
  *   (v·cnt − sum)² > k² · (cnt·ssq − sum²)
  *
  * — an integer inequality (DECIMAL(38,0) lane), so the outlier flag
  * needs NO floats at all and replays bit-for-bit; the deviation and
  * a display z-score ride along (the z is one pinned sqrt/divide
  * tree — gates round it per convention). Population σ of the slot,
  * observation included — the simple control-chart convention; a
  * slot with < 2 rows or zero variance flags nothing.
  *
  * Shape: one aggregation to the slot profile (slot-bounded),
  * broadcast back over the series rows, flags map-side. The series
  * is at rest (per-day totals etc.) like every monitor here.
  */
object Seasonal {

  /** Per-row verdicts: input columns plus `(slot_cnt, dev_scaled,
    * outlier, z)` where `dev_scaled = v·cnt − sum` (the cnt-scaled
    * deviation from the slot mean, an exact BIGINT-lane value) and
    * `outlier` = 1 iff `dev_scaled² > k²·(cnt·ssq − sum²)`.
    * `valueCol` rides [[Quantized]]; `slotCols` name the seasonal
    * slot (e.g. series key + day-of-week).
    */
  def outliers(df: DataFrame, slotCols: Seq[String], valueCol: String,
               k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 100, s"k out of range: $k")
    val d = "decimal(38,0)"
    val v = Quantized.checkedLong(col(valueCol), "Seasonal.outliers")
    val rows = df.withColumn("__v", v)
    val profile = rows.groupBy(slotCols.map(col): _*).agg(
      count(lit(1)).as("slot_cnt"),
      sum(col("__v").cast(d)).as("__sum"),
      sum(col("__v").cast(d) * col("__v").cast(d)).as("__ssq"))
    val dev = (col("__v").cast(d) * col("slot_cnt").cast(d) - col("__sum"))
    val varTerm = (col("slot_cnt").cast(d) * col("__ssq") -
      col("__sum") * col("__sum"))
    rows.join(broadcast(profile), slotCols)
      .withColumn("dev_scaled", dev.cast("double"))
      .withColumn("outlier",
        when(col("slot_cnt") >= 2 &&
            dev * dev > lit(k.toLong * k) * varTerm, 1)
          .otherwise(0).cast("int"))
      // z = (v − μ)/σ = dev / √vt exactly: dev = cnt·(v − μ) and
      // √vt = cnt·σ, so the cnt factors cancel
      .withColumn("z",
        when(varTerm > 0, dev.cast("double") /
          sqrt(varTerm.cast("double"))))
      .drop("__v", "__sum", "__ssq")
  }

  /** DuckDB replay of [[outliers]] over `inputSql` yielding the slot
    * columns, any carry columns, and an integral `v`: same masses,
    * same integer inequality, same pinned z tail.
    */
  def oracleSql(inputSql: String, slotCols: Seq[String], k: Int): String = {
    val g = slotCols.mkString(", ")
    s"""WITH src AS ($inputSql),
       prof AS (
         SELECT $g, COUNT(*) AS slot_cnt,
           SUM(CAST(v AS HUGEINT)) AS s,
           SUM(CAST(v AS HUGEINT) * v) AS ssq
         FROM src GROUP BY $g),
       j AS (
         SELECT src.*, prof.slot_cnt, prof.s, prof.ssq,
           CAST(src.v AS HUGEINT) * prof.slot_cnt - prof.s AS dev,
           CAST(prof.slot_cnt AS HUGEINT) * prof.ssq - prof.s * prof.s
             AS vt
         FROM src JOIN prof USING ($g))
       SELECT * EXCLUDE (s, ssq, dev, vt),
         CAST(dev AS DOUBLE) AS dev_scaled,
         CAST(CASE WHEN slot_cnt >= 2 AND dev * dev > ${k.toLong * k} * vt
              THEN 1 ELSE 0 END AS INTEGER) AS outlier,
         CASE WHEN vt > 0
           THEN CAST(dev AS DOUBLE) / SQRT(CAST(vt AS DOUBLE))
         END AS z
       FROM j"""
  }
}
