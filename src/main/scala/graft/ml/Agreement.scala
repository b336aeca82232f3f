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

  /** Fleiss' kappa — agreement among a PANEL of raters (n per item,
    * n ≥ 2): the multi-annotator generalization of [[cohensKappa]] for
    * labeling pipelines that vote (LLM-judge ensembles, triple-rated
    * quality labels). Input is LONG form: one row per (item, category)
    * rating; rater identity is irrelevant to the statistic.
    *
    * All-exact core (Fleiss 1971, multiplied through): with
    * M = N·n, Q = Σ_i Σ_c n_ic², T = Σ_c S_c² (S_c the category
    * totals),
    *   kappa = [ (Q − M)·M − T·(n − 1) ] / [ (M² − T)·(n − 1) ]
    * — every term exact in the DECIMAL(38,0) lane (M² passes 64 bits
    * at ~3e9 ratings — the Spearman precedent), kappa ONE pinned IEEE
    * division, bit-replayable in SQL. Degenerate inputs (every rating
    * one category: M² = T) report NULL.
    *
    * A ragged panel (items with different rating counts) ABORTS
    * in-plan: Fleiss' chance model assumes a constant n, and silently
    * averaging ragged items would publish a statistic whose null
    * hypothesis is undefined. Null items/categories are excluded
    * before the count.
    *
    * Scale shape: one map-side-combined groupBy to the (item,
    * category) count table, one item-sized and one category-sized
    * rollup — the ratings shuffle once.
    */
  def fleissKappa(df: DataFrame, itemCol: String,
                  categoryCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val counts = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("i"),
        col(categoryCol).cast("string").as("c"))
      .agg(count(lit(1)).as("n_ic"))
      .localCheckpoint()
    val perItem = counts.groupBy("i").agg(
      sum(col("n_ic")).as("n_i"),
      sum(col("n_ic") * col("n_ic")).as("q_i"))
    val itemAgg = perItem.agg(
      count(lit(1)).as("n_items"),
      min(col("n_i")).as("__nmin"), max(col("n_i")).as("__nmax"),
      sum(col("q_i").cast(d)).as("q"))
    val catAgg = counts.groupBy("c").agg(sum(col("n_ic")).as("s_c"))
      .agg(sum((col("s_c") * col("s_c")).cast(d)).as("t"))
    val checked = itemAgg.select(
      col("n_items"), col("q"),
      when(col("__nmin") =!= col("__nmax"),
        raise_error(concat(lit("fleissKappa: ragged panel — items rated by "),
          col("__nmin").cast("string"), lit(" to "),
          col("__nmax").cast("string"),
          lit(" raters; Fleiss' chance model needs a constant n"))))
        .otherwise(when(col("__nmax") < 2,
          raise_error(lit("fleissKappa: need at least 2 raters per item")))
          .otherwise(col("__nmax"))).as("n_raters"))
    val m = (col("n_items") * col("n_raters")).cast(d)
    val num = ((col("q") - m) * m -
      col("t") * (col("n_raters") - 1).cast(d)).cast("double")
    val den = ((m * m - col("t")) *
      (col("n_raters") - 1).cast(d)).cast("double")
    // q and t stay internal: the DECIMAL(38,0) lane is exact but does
    // not cross engine/pandas dtype boundaries (the Spearman precedent
    // — only the final statistic and the integer shape publish)
    checked.crossJoin(catAgg)
      .select(col("n_items"), col("n_raters"),
        when(den =!= 0.0, num / den).as("kappa"))
  }

  /** DuckDB replay of [[fleissKappa]] for `rowsSql` yielding (i, c). */
  def fleissOracleSql(rowsSql: String): String =
    s"""WITH rows_in AS (
         SELECT i, CAST(c AS VARCHAR) AS c FROM ($rowsSql)
         WHERE i IS NOT NULL AND c IS NOT NULL),
       counts AS (SELECT i, c, COUNT(*) AS n_ic FROM rows_in GROUP BY i, c),
       per_item AS (SELECT i, SUM(n_ic) AS n_i, SUM(n_ic * n_ic) AS q_i
                    FROM counts GROUP BY i),
       ia AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                CAST(MAX(n_i) AS BIGINT) AS n_raters,
                SUM(CAST(q_i AS HUGEINT)) AS q
              FROM per_item),
       ca AS (SELECT SUM(CAST(s_c AS HUGEINT) * s_c) AS t FROM (
                SELECT c, SUM(n_ic) AS s_c FROM counts GROUP BY c)),
       k AS (SELECT n_items, n_raters, q, t,
               CAST(n_items AS HUGEINT) * n_raters AS m
             FROM ia CROSS JOIN ca)
       SELECT n_items, n_raters,
         CASE WHEN (m * m - t) * (n_raters - 1) <> 0
              THEN CAST((q - m) * m - t * (n_raters - 1) AS DOUBLE)
                   / CAST((m * m - t) * (n_raters - 1) AS DOUBLE)
              END AS kappa
       FROM k"""

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
