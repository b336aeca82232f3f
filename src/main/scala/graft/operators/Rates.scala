package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group rate monitoring with Wilson score intervals — the
  * honest form of "error rate by source": a raw proportion from 50
  * rows and one from 50 million look identical in a dashboard; the
  * Wilson interval (Wilson 1927 — the binomial interval that behaves
  * at small n and extreme p̂, unlike the Wald ±z√(p̂q̂/n)) carries the
  * evidence. The alerting companion to [[Changepoint]] (level steps)
  * and [[graft.ml.Trend]] (ramps) for BINARY outcomes.
  *
  * Exactness: n and k are exact BIGINTs from one aggregation; the
  * interval is a fixed IEEE tree over (n, k, z) — both engines parse
  * the same z literal to the same double and sqrt is correctly
  * rounded, so lo/hi replay bit-for-bit with no rounding row.
  *
  * Shape: ONE map-side-combined aggregation, |groups| output rows.
  */
object Rates {

  /** Wilson interval per group: `(groups…, n, k, rate, lo, hi)` where
    * `k` counts rows satisfying `success` (nulls count as false —
    * absence of success is a failure, not a missing trial; filter
    * first if trials themselves can be missing).
    */
  def wilson(df: DataFrame, groupCols: Seq[String], success: Column,
             z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    // clamp: at p̂ ∈ {0, 1} the IEEE tree can exceed the mathematical
    // [0, 1] range by an ulp; LEAST/GREATEST are deterministic on
    // both engines so the clamp preserves bit parity
    agg.select((groupCols.map(col) :+ col("n") :+ col("k") :+
      p.as("rate") :+ greatest(center - half, lit(0.0)).as("lo") :+
      least(center + half, lit(1.0)).as("hi")): _*)
  }

  /** DuckDB replay of [[wilson]] over `inputSql` yielding the group
    * columns and a BOOLEAN `success`: the identical expression tree.
    */
  def oracleSql(inputSql: String, groupCols: Seq[String],
                z: Double = 1.96): String = {
    val g = groupCols.mkString(", ")
    s"""WITH agg AS (
         SELECT $g, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE success) AS k
         FROM ($inputSql) GROUP BY $g),
       t AS (
         SELECT $g, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           CAST(n AS DOUBLE) AS nd
         FROM agg)
       SELECT $g, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
         p AS rate,
         GREATEST((p + ${z * z} / (2.0 * nd)) / (1.0 + ${z * z} / nd)
           - ($z * SQRT(p * (1.0 - p) / nd
                        + ${z * z} / (4.0 * nd * nd)))
             / (1.0 + ${z * z} / nd), 0.0) AS lo,
         LEAST((p + ${z * z} / (2.0 * nd)) / (1.0 + ${z * z} / nd)
           + ($z * SQRT(p * (1.0 - p) / nd
                        + ${z * z} / (4.0 * nd * nd)))
             / (1.0 + ${z * z} / nd), 1.0) AS hi
       FROM t"""
  }
}
