package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable moments summary — exact power sums `(n, Σv, Σv², Σv³,
  * Σv⁴)` per group, the distribution-shape member of the sketch family
  * ([[KmvSketch]] distincts, [[HllSketch]] cardinality, [[CmsSketch]]
  * frequencies, [[QuantileSketch]] ranks): mean / variance / skewness /
  * kurtosis for a 100-TB profile pass from five integers per group,
  * with per-shard summaries that roll up by plain addition — the
  * textbook mergeable statistic (Chan et al.'s parallel-variance
  * problem, solved here by keeping NONCENTRAL sums, which merge
  * associatively with no update formula at all).
  *
  * Values must be integers (the repo's quantized-grid convention —
  * token counts, n_chars, scores scaled to a grid): integer power sums
  * are EXACT and order-independent, so summaries, merges and the
  * derived statistics are identical under any partitioning and replay
  * bit-for-bit in the DuckDB oracle. Float inputs would reassociate
  * differently per partitioning — quantize first ([[Winsorize]] /
  * [[QuantileSketch]] house style). ANSI mode makes any Σv⁴ 64-bit
  * overflow loud, not wrapped; size the grid so n·max(v)⁴ < 2^63
  * (|v| ≤ 1000 → ~9 million rows per group; |v| ≤ 100 → ~90 billion;
  * |v| ≤ 30 → ~10 trillion — heavy-tailed domains want a coarse grid
  * or a winsorize pass first).
  *
  * Derived statistics are POPULATION moments computed from the sums in
  * one pinned expression tree (+ − × ÷ and `sqrt` only — every one
  * IEEE-correctly-rounded, hence bit-identical across engines; no
  * `pow`, whose libm implementations differ):
  *
  *   mean  = s1/n
  *   var   = s2/n − mean²
  *   skew  = (s3/n − 3·mean·(s2/n) + 2·mean³) / (var·sqrt(var))
  *   kurt  = (s4/n − 4·mean·(s3/n) + 6·mean²·(s2/n) − 3·mean⁴)/(var·var) − 3
  *
  * 100 TB shape: the build is ONE map-side-combining aggregation —
  * partials are five longs per group per partition; merge is a bounded
  * groups-sized add; derived() touches only the summary table.
  */
object Moments {

  /** Power sums plus the group key they were built under. `sums` holds
    * one row per group: `(groupCols…, n, s1, s2, s3, s4)`.
    */
  final case class Mom(sums: DataFrame, groupCols: Seq[String] = Nil) {

    private def requireSameShape(other: Mom): Unit =
      require(groupCols == other.groupCols,
        s"moments group mismatch: $groupCols vs ${other.groupCols} — " +
          "merging summaries keyed differently silently corrupts statistics")

    /** Shard rollup: plain addition of the five sums. */
    def merge(other: Mom): Mom = {
      requireSameShape(other)
      val merged = sums.unionByName(other.sums)
        .groupBy(groupCols.map(col): _*)
        .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
          sum("s3").as("s3"), sum("s4").as("s4"))
      Mom(merged, groupCols)
    }

    /** The summary plus mean/var_pop/skew/kurt, formula tree pinned to
      * [[Moments.derivedSql]]. NULL-guarded the same way on both
      * engines (ANSI Spark and DuckDB both abort on /0 and sqrt(<0)):
      * n = 0 nulls everything; var ≤ 0 (constant groups, or exact-zero
      * cancellation) nulls skew/kurt.
      */
    def derived(): DataFrame = {
      val n = col("n").cast("double")
      val mean = col("s1").cast("double") / n
      val ex2 = col("s2").cast("double") / n
      val ex3 = col("s3").cast("double") / n
      val ex4 = col("s4").cast("double") / n
      val vr = ex2 - mean * mean
      val m3 = ex3 - lit(3.0) * mean * ex2 + lit(2.0) * mean * mean * mean
      val m4 = ex4 - lit(4.0) * mean * ex3 + lit(6.0) * mean * mean * ex2 -
        lit(3.0) * mean * mean * mean * mean
      val nOk = col("n") > 0
      sums
        .withColumn("mean", when(nOk, mean))
        .withColumn("var_pop", when(nOk, vr))
        .withColumn("skew", when(nOk && vr > 0, m3 / (vr * sqrt(vr))))
        .withColumn("kurt", when(nOk && vr > 0, m4 / (vr * vr) - lit(3.0)))
    }
  }

  /** Build the per-group power sums of `valueCol`. Values must be
    * integral — fractional input aborts in-plan ([[Quantized]]);
    * quantize floats to a grid first. Nulls are excluded.
    */
  def summarize(df: DataFrame, valueCol: String,
                groupCols: Seq[String] = Nil): Mom = {
    val v = Quantized.checkedLong(col(valueCol), "Moments.summarize")
    val rows = df.filter(col(valueCol).isNotNull)
    val aggs = Seq(count(lit(1)).as("n"), sum(v).as("s1"),
      sum(v * v).as("s2"), sum(v * v * v).as("s3"),
      sum(v * v * v * v).as("s4"))
    val sums =
      if (groupCols.isEmpty) rows.agg(aggs.head, aggs.tail: _*)
      else rows.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    Mom(sums, groupCols)
  }

  /** DuckDB replay: the sums CTE body over `valuesSql` (must SELECT
    * the group columns and an integral `v`, non-null).
    */
  def sumsSql(valuesSql: String, groupCols: Seq[String]): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    val gb = if (groupCols.isEmpty) "" else
      "GROUP BY " + (1 to groupCols.size).mkString(", ")
    s"""SELECT $g COUNT(*) AS n,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2,
         CAST(SUM(v * v * v) AS BIGINT) AS s3,
         CAST(SUM(v * v * v * v) AS BIGINT) AS s4
       FROM (SELECT $g CAST(v AS BIGINT) AS v FROM ($valuesSql)) $gb"""
  }

  /** DuckDB replay of [[Mom.derived]] over a CTE named `sums` — the
    * SAME expression tree, so every float matches bit-for-bit.
    */
  def derivedSql(groupCols: Seq[String]): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    val mean = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val ex2 = "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    val ex3 = "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    val ex4 = "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))"
    val vr = s"($ex2 - $mean * $mean)"
    val m3 = s"($ex3 - 3.0 * $mean * $ex2 + 2.0 * $mean * $mean * $mean)"
    val m4 = s"($ex4 - 4.0 * $mean * $ex3 + 6.0 * $mean * $mean * $ex2" +
      s" - 3.0 * $mean * $mean * $mean * $mean)"
    s"""SELECT $g n, s1, s2, s3, s4,
         CASE WHEN n > 0 THEN $mean END AS mean,
         CASE WHEN n > 0 THEN $vr END AS var_pop,
         CASE WHEN n > 0 AND $vr > 0
              THEN $m3 / ($vr * SQRT($vr)) END AS skew,
         CASE WHEN n > 0 AND $vr > 0
              THEN $m4 / ($vr * $vr) - 3.0 END AS kurt
       FROM sums"""
  }
}
