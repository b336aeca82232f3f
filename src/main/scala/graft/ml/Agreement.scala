package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — Cohen's kappa over two categorical
  * label columns: the annotation-QA gate for labeling pipelines
  * (human raters, LLM judges, heuristic vs learned quality filters).
  * Raw percent agreement flatters imbalanced label sets; kappa
  * discounts the agreement two independent raters with the same
  * marginals would reach by chance.
  *
  * All-integer core: from the confusion counts n_ab,
  *   A = Σ_k n_kk        (observed agreements)
  *   B = Σ_k r_k · c_k   (chance-agreement mass; r/c = marginals)
  *   kappa = (N·A − B) / (N² − B)
  * — the standard (p_o − p_e)/(1 − p_e) multiplied through by N², so
  * every term is an exact BIGINT and kappa is ONE IEEE division,
  * bit-replayable by the SQL oracle. Degenerate inputs (N² = B: a
  * rater with a single label value — chance explains everything)
  * report NULL rather than 0/0.
  *
  * Scale shape: one map-side-combined groupBy to the confusion table
  * (label-cardinality², not corpus-sized), then label-sized rollups —
  * the corpus shuffles once. Null labels on either side are excluded
  * (an unlabeled row is no evidence of agreement or disagreement).
  */
object Agreement {

  /** One row: `(n, agree, chance_mass, kappa)`. Labels are compared as
    * strings (cast), so numeric and boolean raters compose.
    */
  def cohensKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val conf = df
      .filter(col(raterA).isNotNull && col(raterB).isNotNull)
      .groupBy(col(raterA).cast("string").as("a"),
        col(raterB).cast("string").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint()
    val ra = conf.groupBy("a").agg(sum(col("n_ab")).as("r"))
    val cb = conf.groupBy("b").agg(sum(col("n_ab")).as("c"))
    val chance = ra.join(cb, ra("a") === cb("b"))
      .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("chance_mass"))
    val totals = conf.agg(
      sum(col("n_ab")).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("n_ab"))), lit(0L))
        .as("agree"))
    totals.crossJoin(chance)
      .select(col("n"), col("agree"), col("chance_mass"),
        when(col("n") * col("n") =!= col("chance_mass"),
          (col("n") * col("agree") - col("chance_mass")).cast("double") /
            (col("n") * col("n") - col("chance_mass")).cast("double"))
          .as("kappa"))
  }

  /** DuckDB replay of [[cohensKappa]] for `rowsSql` yielding (a, b). */
  def oracleSql(rowsSql: String): String =
    s"""WITH rows_in AS (
         SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b
         FROM ($rowsSql) WHERE a IS NOT NULL AND b IS NOT NULL),
       conf AS (SELECT a, b, COUNT(*) AS n_ab FROM rows_in GROUP BY a, b),
       ra AS (SELECT a, SUM(n_ab) AS r FROM conf GROUP BY a),
       cb AS (SELECT b, SUM(n_ab) AS c FROM conf GROUP BY b),
       ch AS (SELECT CAST(COALESCE(SUM(ra.r * cb.c), 0) AS BIGINT)
                AS chance_mass
              FROM ra JOIN cb ON cb.b = ra.a),
       t AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n,
               CAST(COALESCE(SUM(CASE WHEN a = b THEN n_ab END), 0)
                 AS BIGINT) AS agree
             FROM conf)
       SELECT n, agree, chance_mass,
         CASE WHEN n * n <> chance_mass
              THEN CAST(n * agree - chance_mass AS DOUBLE)
                   / CAST(n * n - chance_mass AS DOUBLE)
              END AS kappa
       FROM t CROSS JOIN ch"""
}
