package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier calibration — "when the quality model says 0.8, is it
  * right 80% of the time": the deployment gate between a scorer that
  * RANKS well ([[Auc]]) and one whose probabilities can gate a corpus
  * at a fixed threshold. Three artifacts from one pass:
  *
  *  - reliability table: equal-WIDTH probability bins (the standard
  *    reliability-diagram x-axis; equi-depth is [[
  *    graft.operators.Bucketize]]'s job) with per-bin count, mean
  *    confidence and empirical accuracy;
  *  - Brier score: mean (p − y)² — the proper scoring rule;
  *  - ECE: Σ_b (n_b/N)·|acc_b − conf_b|, folded as
  *    Σ_b |pos_b − Σp_b| / N so the only division is the final one.
  *
  * Bins are closed-form from the probability (`min(floor(p·B), B−1)`
  * — p = 1.0 joins the top bin), so assignment is map-side and
  * engine-exact; probabilities outside [0, 1] abort in-plan (they are
  * scores, not probabilities — calibrate after a sigmoid, not
  * before). Sums of doubles make conf/brier/ece AVG-class quantities:
  * rounded at 6 per the repo convention, counts stay exact.
  *
  * Scale shape: ONE map-side-combined aggregation to the B-row bin
  * table (B ≤ 1000 — bounded however large the corpus), then a B-row
  * rollup for the summary. The corpus shuffles once.
  */
object Calibration {

  private def checkedProb(probCol: String) = {
    val p = col(probCol).cast("double")
    when(p < 0.0 || p > 1.0,
        raise_error(concat(lit("Calibration expects probabilities in " +
          "[0, 1], got "), p.cast("string"))))
      .otherwise(p)
  }

  /** Reliability table: one row per non-empty bin —
    * `(bin, n, pos, conf, acc, gap)`, conf/acc/gap rounded at 6.
    */
  def reliabilityTable(df: DataFrame, probCol: String, labelCol: String,
                       bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2,1000]: $bins")
    binned(df, probCol, labelCol, bins)
      .select(col("bin"), col("n"), col("pos"),
        round(col("sum_p") / col("n"), 6).as("conf"),
        round(col("pos").cast("double") / col("n"), 6).as("acc"),
        round(abs(col("pos") - col("sum_p")) / col("n"), 6).as("gap"))
  }

  /** One row: `(n, pos, brier, ece)` (brier/ece rounded at 6). */
  def summary(df: DataFrame, probCol: String, labelCol: String,
              bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2,1000]: $bins")
    binned(df, probCol, labelCol, bins)
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"),
        sum(col("sum_sq")).as("__sq"),
        sum(abs(col("pos") - col("sum_p"))).as("__gap"))
      .select(col("n"), col("pos"),
        round(col("__sq") / col("n"), 6).as("brier"),
        round(col("__gap") / col("n"), 6).as("ece"))
  }

  /** Per-bin masses: `(bin, n, pos, sum_p, sum_sq)`. */
  private def binned(df: DataFrame, probCol: String, labelCol: String,
                     bins: Int): DataFrame = {
    val p = checkedProb(probCol)
    val y = col(labelCol).cast("boolean")
    df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(least(floor(p * bins), lit(bins - 1L)).cast("int").as("bin"),
        p.as("__p"), y.as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"),
        sum(col("__p")).as("sum_p"),
        sum((col("__p") - when(col("__y"), 1.0).otherwise(0.0)) *
          (col("__p") - when(col("__y"), 1.0).otherwise(0.0))).as("sum_sq"))
  }

  /** DuckDB replay of [[reliabilityTable]] for `rowsSql` yielding (p, y). */
  def tableOracleSql(rowsSql: String, bins: Int = 10): String =
    s"""WITH b AS (${binnedSql(rowsSql, bins)})
       SELECT bin, n, pos,
         ROUND(sum_p / n, 6) AS conf,
         ROUND(CAST(pos AS DOUBLE) / n, 6) AS acc,
         ROUND(ABS(pos - sum_p) / n, 6) AS gap
       FROM b"""

  /** DuckDB replay of [[summary]] for `rowsSql` yielding (p, y). */
  def summaryOracleSql(rowsSql: String, bins: Int = 10): String =
    s"""WITH b AS (${binnedSql(rowsSql, bins)})
       SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos,
         ROUND(SUM(sum_sq) / SUM(n), 6) AS brier,
         ROUND(SUM(ABS(pos - sum_p)) / SUM(n), 6) AS ece
       FROM b"""

  private def binnedSql(rowsSql: String, bins: Int): String =
    s"""SELECT CAST(LEAST(FLOOR(p * $bins), $bins - 1) AS INT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         SUM(p) AS sum_p,
         SUM((p - CASE WHEN y THEN 1.0 ELSE 0.0 END)
             * (p - CASE WHEN y THEN 1.0 ELSE 0.0 END)) AS sum_sq
       FROM (SELECT CAST(p AS DOUBLE) AS p, y FROM ($rowsSql)
             WHERE p IS NOT NULL AND y IS NOT NULL)
       GROUP BY 1"""
}
