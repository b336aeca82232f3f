package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
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
  * EXACT arithmetic throughout: probabilities are snapped to the
  * 1e-6 grid on entry (`round(p·1e6)` — a sub-microprobability
  * difference is not calibration signal, and summing raw doubles
  * makes `conf` depend on ADD ORDER exactly at a rounding boundary,
  * observed in spec), so confidence sums, squared Brier terms
  * (`(p₆ − y·10⁶)²`, accumulated in the DECIMAL(38,0) lane) and ECE
  * masses are all integers, and every published number is ONE pinned
  * IEEE division — bit-replayable in SQL with no rounding caveats.
  * Bin assignment is integer arithmetic on the snapped value
  * (`min(p₆·B div 10⁶, B−1)` — p = 1.0 joins the top bin);
  * probabilities outside [0, 1] abort in-plan (they are scores, not
  * probabilities — calibrate after a sigmoid, not before).
  *
  * Scale shape: ONE map-side-combined aggregation to the B-row bin
  * table (B ≤ 1000 — bounded however large the corpus), then a B-row
  * rollup for the summary. The corpus shuffles once.
  */
object Calibration {

  private val Grid = 1000000L

  /** `probCol` snapped to the 1e-6 grid as a long in [0, 1e6];
    * out-of-range aborts in-plan.
    */
  private def snappedProb(probCol: String): Column = {
    val p = col(probCol).cast("double")
    when(p < 0.0 || p > 1.0,
        raise_error(concat(lit("Calibration expects probabilities in " +
          "[0, 1], got "), p.cast("string"))))
      .otherwise(round(p * Grid).cast("long"))
  }

  /** Reliability table: one row per non-empty bin —
    * `(bin, n, pos, conf, acc, gap)`; every value exact (counts and
    * single divisions of integers).
    */
  def reliabilityTable(df: DataFrame, probCol: String, labelCol: String,
                       bins: Int = 10): DataFrame =
    reliability(df, Nil, probCol, labelCol, bins)

  /** Per-group reliability table — the per-domain calibration slice
    * ("is the scorer still calibrated INSIDE each source", mirroring
    * the grouped AUC/Spearman/KS twins): the same integer bins with
    * every step keyed by `groupCols`; the bin aggregation stays ONE
    * map-side-combined pass, now to a (groups × B)-row table.
    */
  def reliabilityTableByGroup(df: DataFrame, groupCols: Seq[String],
                              probCol: String, labelCol: String,
                              bins: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "use reliabilityTable for the ungrouped form")
    reliability(df, groupCols, probCol, labelCol, bins)
  }

  private def reliability(df: DataFrame, groupCols: Seq[String],
                          probCol: String, labelCol: String,
                          bins: Int): DataFrame = {
    val g = groupCols.map(col)
    binned(df, groupCols, probCol, labelCol, bins)
      .select((g :+ col("bin") :+ col("n") :+ col("pos") :+
        (col("sum_p6").cast("double") /
          (col("n").cast("double") * Grid)).as("conf") :+
        (col("pos").cast("double") / col("n").cast("double")).as("acc") :+
        (abs(col("pos") * Grid - col("sum_p6")).cast("double") /
          (col("n").cast("double") * Grid)).as("gap")): _*)
  }

  /** One row: `(n, pos, brier, ece)` — exact masses, two pinned
    * divisions.
    */
  def summary(df: DataFrame, probCol: String, labelCol: String,
              bins: Int = 10): DataFrame =
    binned(df, Nil, probCol, labelCol, bins)
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"),
        sum(col("sum_sq")).as("__sq"),
        sum(abs(col("pos") * Grid - col("sum_p6"))).as("__gap"))
      .select(col("n"), col("pos"),
        (col("__sq").cast("double") /
          (col("n").cast("double") * Grid.toDouble * Grid.toDouble))
          .as("brier"),
        (col("__gap").cast("double") /
          (col("n").cast("double") * Grid)).as("ece"))

  /** Per-bin exact masses: `(groupCols…, bin, n, pos, sum_p6,
    * sum_sq)` — `sum_p6` the snapped-probability sum (long), `sum_sq`
    * the Σ(p₆ − y·10⁶)² Brier mass in the DECIMAL(38,0) lane (each
    * term ≤ 10¹², past 64 bits near 9·10⁶ rows).
    */
  private def binned(df: DataFrame, groupCols: Seq[String], probCol: String,
                     labelCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of [2,1000]: $bins")
    val g = groupCols.map(col)
    val y = col(labelCol).cast("boolean")
    val err = col("__p6") - when(col("__y"), Grid).otherwise(0L)
    df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select((g :+ snappedProb(probCol).as("__p6") :+ y.as("__y")): _*)
      .withColumn("bin",
        least(expr(s"(__p6 * $bins) div $Grid"), lit(bins - 1L)).cast("int"))
      .groupBy((g :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"),
        sum(col("__p6")).as("sum_p6"),
        sum((err * err).cast("decimal(38,0)")).as("sum_sq"))
  }

  /** DuckDB replay of [[reliabilityTable]] for `rowsSql` yielding (p, y). */
  def tableOracleSql(rowsSql: String, bins: Int = 10): String =
    groupedTableOracleSql(rowsSql, Nil, bins)

  /** DuckDB replay of [[reliabilityTableByGroup]] for `rowsSql`
    * yielding `(groupCols…, p, y)`.
    */
  def groupedTableOracleSql(rowsSql: String, groupCols: Seq[String],
                            bins: Int = 10): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    s"""WITH b AS (${binnedSql(rowsSql, groupCols, bins)})
       SELECT $g bin, n, pos,
         CAST(sum_p6 AS DOUBLE) / (CAST(n AS DOUBLE) * $Grid) AS conf,
         CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
         CAST(ABS(pos * $Grid - sum_p6) AS DOUBLE)
           / (CAST(n AS DOUBLE) * $Grid) AS gap
       FROM b"""
  }

  /** DuckDB replay of [[summary]] for `rowsSql` yielding (p, y). */
  def summaryOracleSql(rowsSql: String, bins: Int = 10): String =
    s"""WITH b AS (${binnedSql(rowsSql, Nil, bins)})
       SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos,
         CAST(SUM(sum_sq) AS DOUBLE)
           / (CAST(SUM(n) AS DOUBLE) * ${Grid}.0 * ${Grid}.0) AS brier,
         CAST(SUM(ABS(pos * $Grid - sum_p6)) AS DOUBLE)
           / (CAST(SUM(n) AS DOUBLE) * $Grid) AS ece
       FROM b"""

  private def binnedSql(rowsSql: String, groupCols: Seq[String],
                        bins: Int): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val groupBy = (groupCols :+ "bin").mkString(", ")
    s"""SELECT $g
         CAST(LEAST((p6 * $bins) // $Grid, $bins - 1) AS INT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(p6) AS BIGINT) AS sum_p6,
         SUM(CAST(p6 - CASE WHEN y THEN $Grid ELSE 0 END AS HUGEINT)
             * (p6 - CASE WHEN y THEN $Grid ELSE 0 END)) AS sum_sq
       FROM (SELECT $g
               CAST(ROUND(CAST(p AS DOUBLE) * $Grid) AS BIGINT) AS p6, y
             FROM ($rowsSql)
             WHERE p IS NOT NULL AND y IS NOT NULL)
       GROUP BY $groupBy"""
  }
}
