package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group OLS trend — "is this source's volume/price/score
  * drifting, and how fast": the slope+fit monitor that complements
  * the level detectors ([[graft.operators.Changepoint]] flags a step,
  * this measures a ramp) across thousands of sources in one pass.
  *
  * Same exact-lane posture as [[Correlation]]: both inputs ride the
  * [[graft.operators.Quantized]] contract (integral x and y — epoch
  * days, cents, counts), the five sums accumulate as DECIMAL(38,0)
  * (exact to 10³⁸; DuckDB mirrors in HUGEINT range), the normal-
  * equation difference terms stay exact decimals, and only the final
  * slope division / R² tree drops to IEEE doubles — a pinned
  * expression shape both engines evaluate identically, so the oracle
  * matches bit-for-bit without rounding.
  *
  * Numerically the decimal lane IS the stability story: the
  * covariance form n·Σxy − Σx·Σy is catastrophic in floating point
  * for large x (epoch days), but in exact integer arithmetic there is
  * no cancellation error to amplify — no centering pass needed.
  *
  * 100 TB shape: ONE aggregation — five sums and a count per group,
  * map-side combined, |groups| output rows. Nothing sorts, nothing
  * sees the corpus twice. Overflow posture: |n·Σxy| ≤ n²·max|x|·max|y|
  * must stay under 10³⁸ — at n = 10¹⁰ rows per group that allows
  * x·y up to 10¹⁸ per row; choose grids accordingly (the quantize
  * contract is the caller's, as everywhere here).
  */
object Trend {

  /** Per-group OLS of y on x: `(groups…, n, slope, intercept, r2)`.
    * Null x/y rows are excluded. Zero-x-variance groups (a single
    * distinct x) report NULL slope/intercept/r2; zero-y-variance
    * groups report r2 = NULL (0/0 is undefined, not 1).
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val x = graft.operators.Quantized.checkedLong(col(xCol), "Trend.groupedOls x")
    val y = graft.operators.Quantized.checkedLong(col(yCol), "Trend.groupedOls y")
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((groupCols.map(col) :+ x.as("__x") :+ y.as("__y")): _*)
    val sums = rows.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(d)).as("sx"), sum(col("__y").cast(d)).as("sy"),
      sum((col("__x").cast(d) * col("__y").cast(d))).as("sxy"),
      sum((col("__x").cast(d) * col("__x").cast(d))).as("sxx"),
      sum((col("__y").cast(d) * col("__y").cast(d))).as("syy"))
    val num = (col("n").cast(d) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = (col("n").cast(d) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val syyTerm = (col("n").cast(d) * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val slope = num / den
    // intercept = (Σy − slope·Σx) / n, evaluated in the same IEEE
    // order on both engines (sums exact before the casts)
    val intercept =
      (col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double")
    sums.select((groupCols.map(col) :+ col("n") :+
      when(den > 0, slope).as("slope") :+
      when(den > 0, intercept).as("intercept") :+
      when(den > 0 && syyTerm > 0, num * num / (den * syyTerm)).as("r2")): _*)
  }

  /** DuckDB replay of [[groupedOls]]: same DECIMAL(38,0) sums, same
    * pinned IEEE tail. `inputSql` must yield the group columns plus
    * integral `x` and `y`.
    */
  def oracleSql(inputSql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH src AS ($inputSql),
       sums AS (
         SELECT $g, CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(y AS HUGEINT) * y) AS syy
         FROM src WHERE x IS NOT NULL AND y IS NOT NULL
         GROUP BY $g),
       terms AS (
         SELECT $g, n,
           CAST(n * sxy - sx * sy AS DOUBLE) AS num,
           CAST(n * sxx - sx * sx AS DOUBLE) AS den,
           CAST(n * syy - sy * sy AS DOUBLE) AS syt,
           CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy
         FROM sums)
       SELECT $g, CAST(n AS BIGINT) AS n,
         CASE WHEN den > 0 THEN num / den END AS slope,
         CASE WHEN den > 0
           THEN (dsy - (num / den) * dsx) / CAST(n AS DOUBLE) END AS intercept,
         CASE WHEN den > 0 AND syt > 0
           THEN num * num / (den * syt) END AS r2
       FROM terms"""
  }
}
