package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC via the Mann–Whitney U statistic with midranks — the
  * model-eval gate for the quality classifiers this engine trains:
  * "does the score actually rank good docs above bad ones" as one
  * number, computed EXACTLY (no threshold sweep, no trapezoid
  * approximation — the rank form IS the area under the full ROC curve,
  * ties handled by the midrank convention).
  *
  * All-integer derivation: group rows by exact score value; per group
  * the DOUBLED midrank is `2·cum_before + cnt + 1` (an integer — no
  * half-rank floats), so
  *   num  = Σ_groups pos_g · (2·cum_before_g + cnt_g + 1)  (exact BIGINT)
  *   AUC  = (num − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
  * — one pinned IEEE division of exact integers, bit-replayable by the
  * SQL oracle. Degenerate inputs (no positives or no negatives) return
  * NULL AUC rather than 0/0.
  *
  * Scale shape: one map-side-combined aggregation to score groups,
  * then an ordered prefix sum over the DISTINCT-SCORE frame. That
  * frame is usually small (a quantized score has thousands of values)
  * but is NOT provably bounded — a raw continuous double score over a
  * 10¹⁰-doc corpus has a distinct frame the size of the corpus — so
  * the prefix sum runs through [[graft.operators.PrefixSum]]'s
  * range-partitioned decomposition rather than a single-task
  * `Window.orderBy`: bit-identical integers (asserted in EvalSpec
  * against the windowed form), safe at any score cardinality. The
  * corpus shuffles once; the rollup is 1 row.
  */
object Auc {

  /** One row: `(n_pos, n_neg, num2, auc)` where `num2` is the exact
    * doubled positive-midrank sum. `labelCol` must be boolean-valued
    * (true = positive); null scores and null labels are excluded.
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val rows = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("s"), col(labelCol).cast("boolean").as("y"))
    val groups = rows.groupBy("s").agg(
      count(lit(1)).as("cnt"),
      sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val cum = graft.operators.PrefixSum.exclusive(
      groups, Seq(col("s")), col("cnt"), "cum_before")
    val agg = cum.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("cnt") - col("pos")).as("n_neg"),
      sum(col("pos") * (col("cum_before") * 2 + col("cnt") + 1)).as("num2"))
    agg.select(col("n_pos"), col("n_neg"), col("num2"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        (col("num2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double"))
        .as("auc"))
  }

  /** Per-group ROC-AUC — the per-domain eval slice ("does the scorer
    * still rank well INSIDE each source"): the same midrank
    * construction with every step keyed by `groupCols`. The prefix sum
    * partitions by group, so no single-partition window appears even
    * when the global variant's distinct-score frame would be large.
    * Groups lacking a class report NULL AUC.
    */
  def rocAucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                    labelCol: String): DataFrame = {
    require(groupCols.nonEmpty, "use rocAuc for the ungrouped form")
    val g = groupCols.map(col)
    val rows = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select((g :+ col(scoreCol).as("s") :+
        col(labelCol).cast("boolean").as("y")): _*)
    val groups = rows.groupBy((g :+ col("s")): _*).agg(
      count(lit(1)).as("cnt"),
      sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val cum = groups.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(
        Window.partitionBy(groupCols.map(col): _*).orderBy("s")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    cum.groupBy(g: _*).agg(
        sum(col("pos")).as("n_pos"),
        sum(col("cnt") - col("pos")).as("n_neg"),
        sum(col("pos") * (col("cum_before") * 2 + col("cnt") + 1)).as("num2"))
      .select((g :+ col("n_pos") :+ col("n_neg") :+ col("num2") :+
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("num2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"))
          .as("auc")): _*)
  }

  /** DuckDB replay of [[rocAucByGroup]] for `rowsSql` yielding
    * `(groupCols…, s, y)`.
    */
  def groupedOracleSql(rowsSql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH rows_in AS (SELECT $g, s, y FROM ($rowsSql)
         WHERE s IS NOT NULL AND y IS NOT NULL),
       gr AS (SELECT $g, s, COUNT(*) AS cnt,
                SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
              FROM rows_in GROUP BY $g, s),
       c AS (SELECT $g, s, cnt, pos,
               COALESCE(SUM(cnt) OVER (PARTITION BY $g ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
             FROM gr),
       a AS (SELECT $g, CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (cum_before * 2 + cnt + 1)) AS BIGINT) AS num2
             FROM c GROUP BY $g)
       SELECT $g, n_pos, n_neg, num2,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN CAST(num2 - n_pos * (n_pos + 1) AS DOUBLE)
                   / CAST(n_pos * n_neg * 2 AS DOUBLE)
              END AS auc
       FROM a"""
  }

  /** DuckDB replay of [[rocAuc]] for `rowsSql` yielding (s, y). */
  def oracleSql(rowsSql: String): String =
    s"""WITH rows_in AS (SELECT s, y FROM ($rowsSql)
         WHERE s IS NOT NULL AND y IS NOT NULL),
       g AS (SELECT s, COUNT(*) AS cnt,
               SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
             FROM rows_in GROUP BY s),
       c AS (SELECT s, cnt, pos,
               COALESCE(SUM(cnt) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
             FROM g),
       a AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (cum_before * 2 + cnt + 1)) AS BIGINT) AS num2
             FROM c)
       SELECT n_pos, n_neg, num2,
         CASE WHEN n_pos > 0 AND n_neg > 0
              THEN CAST(num2 - n_pos * (n_pos + 1) AS DOUBLE)
                   / CAST(n_pos * n_neg * 2 AS DOUBLE)
              END AS auc
       FROM a"""
}
