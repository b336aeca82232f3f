package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NDCG@k — the ranking-eval gate for retrieval stacks (BM25/RRF/ANN
  * re-rankers all live in this engine): "does the scorer put the most
  * relevant documents at the TOP", position-discounted, normalized so
  * queries with different relevance budgets compare.
  *
  *   DCG@k  = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)   (score order)
  *   IDCG@k = the same sum in ideal (relevance) order
  *   NDCG   = DCG / IDCG                            (NULL when IDCG = 0)
  *
  * Determinism: relevance grades must be INTEGERS ([[
  * graft.operators.Quantized]] — 2^rel is then exact in doubles, capped
  * at 40), both orders break ties by ascending id, and each sum folds
  * in RANK ORDER over the top-k array (Spark `aggregate` left fold ≡
  * DuckDB ordered-LIST fold), so the only engine wobble is the log
  * itself — final values round at 6 per the transcendental convention.
  *
  * Scale shape: per-query top-k via the k-bounded heap aggregator
  * ([[graft.functions.expressions.TopKExpressions.topKStructs]], the
  * skew-safe sampler's kernel) — a hot query ships k rows per
  * partition, never its whole candidate list, and NO rank window sorts
  * whole groups; ONE map-side-combined aggregation carries both heaps
  * (score order and ideal order), so the corpus shuffles once and no
  * join reassembles the orders (plan-asserted in PlanHygieneSpec).
  */
object Ranking {

  /** One row per query: `(queryCols…, dcg, idcg, ndcg)` (dcg/idcg/ndcg
    * rounded at 6). Null scores/relevances are excluded; queries whose
    * kept rows are all relevance 0 report NULL ndcg.
    */
  def ndcgAtK(df: DataFrame, queryCols: Seq[String], idCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(queryCols.nonEmpty, "queryCols must be non-empty")
    require(k >= 1 && k <= 1000, s"k out of [1,1000]: $k")
    val g = queryCols.map(col)
    val rel0 = graft.operators.Quantized.checkedLong(col(relCol),
      "Ranking.ndcgAtK")
    // 2^rel must stay exact in an IEEE double; negatives are a grading
    // bug, not a signal
    val rel = when(rel0 < 0 || rel0 > 40,
        raise_error(concat(lit("Ranking.ndcgAtK expects relevance grades " +
          "in [0, 40], got "), rel0.cast("string"))))
      .otherwise(rel0)
    val rows = df
      .filter(col(scoreCol).isNotNull && col(relCol).isNotNull)
      .select((g :+ col(idCol).as("__id") :+
        col(scoreCol).cast("double").as("__s") :+ rel.as("__r")): _*)
    import graft.functions.expressions.TopKExpressions.topKStructs
    def topArr(key: Column) =
      topKStructs(struct(key.as("__k"), col("__r")), k)
    // ONE map-side-combined aggregation carries both k-bounded heaps —
    // the corpus shuffles once, and no join reassembles the two orders
    val tops = rows.groupBy(g: _*).agg(
      topArr(struct((col("__s") * -1.0).as("ns"), col("__id"))).as("__top"),
      topArr(struct((col("__r") * -1L).as("nr"), col("__id"))).as("__ideal"))
    // rank-order left fold: gain_i / log2(i+1), i = 1-based position
    def gainSum(arr: Column): Column = aggregate(
      zip_with(arr, sequence(lit(1), greatest(size(arr), lit(1))),
        (x, i) => when(i <= size(arr),
            (pow(lit(2.0), x.getField("__r")) - 1.0) /
              log(2.0, i.cast("double") + 1.0))
          .otherwise(0.0)),
      lit(0.0), (acc, t) => acc + t)
    tops
      .select((g :+ round(gainSum(col("__top")), 6).as("dcg") :+
        round(gainSum(col("__ideal")), 6).as("idcg")): _*)
      .withColumn("ndcg",
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 6)))
  }

  /** Precision@k / Recall@k / MRR@k per query — the set-based
    * retrieval metrics beside [[ndcgAtK]]'s graded one. Relevance is
    * binary here (`rel > 0`, the standard collapse of graded labels);
    * all three are SINGLE divisions of exact integers (hits, k, n_rel,
    * first rank), so outputs are bit-exact with no rounding, and the
    * per-query shape macro-averages trivially downstream.
    *
    * Output per query: `(queryCols…, n_rel, hits, p_at_k, r_at_k,
    * rr_at_k)` — `rr_at_k` is 1/rank of the FIRST relevant item within
    * the top-k (NULL when none lands there: reciprocal rank at cutoff,
    * the usual MRR@k convention); `r_at_k` is NULL for queries with no
    * relevant items at all (0/0 has no meaning — filter or count them
    * separately).
    *
    * Same scale shape as [[ndcgAtK]]: ONE map-side-combined
    * aggregation carries the k-bounded score-order heap AND the
    * relevant-count — no rank window, no join, the corpus shuffles
    * once.
    */
  def retrievalAtK(df: DataFrame, queryCols: Seq[String], idCol: String,
                   scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(queryCols.nonEmpty, "queryCols must be non-empty")
    require(k >= 1 && k <= 1000, s"k out of [1,1000]: $k")
    val g = queryCols.map(col)
    val rel = graft.operators.Quantized.checkedLong(col(relCol),
      "Ranking.retrievalAtK")
    val rows = df
      .filter(col(scoreCol).isNotNull && col(relCol).isNotNull)
      .select((g :+ col(idCol).as("__id") :+
        col(scoreCol).cast("double").as("__s") :+ rel.as("__r")): _*)
    import graft.functions.expressions.TopKExpressions.topKStructs
    val tops = rows.groupBy(g: _*).agg(
      topKStructs(struct(
        struct((col("__s") * -1.0).as("ns"), col("__id")).as("__k"),
        col("__r")), k).as("__top"),
      sum(when(col("__r") > 0, 1L).otherwise(0L)).as("n_rel"))
    val relFlags = transform(col("__top"), x => x.getField("__r") > 0)
    tops
      .withColumn("hits",
        size(filter(col("__top"), x => x.getField("__r") > 0)).cast("long"))
      .withColumn("__first", nullif(array_position(relFlags, true), lit(0L)))
      .select((g :+ col("n_rel") :+ col("hits") :+
        (col("hits").cast("double") / k).as("p_at_k") :+
        when(col("n_rel") > 0,
          col("hits").cast("double") / col("n_rel").cast("double"))
          .as("r_at_k") :+
        (lit(1.0) / col("__first").cast("double")).as("rr_at_k")): _*)
  }

  /** DuckDB replay of [[retrievalAtK]] for `rowsSql` yielding
    * `(queryCols…, id, s, rel)`.
    */
  def retrievalOracleSql(rowsSql: String, queryCols: Seq[String],
                         k: Int): String = {
    val g = queryCols.mkString(", ")
    s"""WITH rows_in AS (SELECT $g, id, s, rel FROM ($rowsSql)
         WHERE s IS NOT NULL AND rel IS NOT NULL),
       ranked AS (SELECT $g, rel,
           ROW_NUMBER() OVER (PARTITION BY $g ORDER BY s DESC, id) AS rk
         FROM rows_in),
       per_q AS (SELECT $g,
           CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
           CAST(SUM(CASE WHEN rel > 0 AND rk <= $k THEN 1 ELSE 0 END)
             AS BIGINT) AS hits,
           MIN(CASE WHEN rel > 0 AND rk <= $k THEN rk END) AS first_rk
         FROM ranked GROUP BY $g)
       SELECT $g, n_rel, hits,
         CAST(hits AS DOUBLE) / $k AS p_at_k,
         CASE WHEN n_rel > 0
              THEN CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE) END AS r_at_k,
         1.0 / CAST(first_rk AS DOUBLE) AS rr_at_k
       FROM per_q"""
  }

  /** DuckDB replay of [[ndcgAtK]] for `rowsSql` yielding
    * `(queryCols…, id, s, rel)`.
    */
  def oracleSql(rowsSql: String, queryCols: Seq[String], k: Int): String = {
    val g = queryCols.mkString(", ")
    s"""WITH rows_in AS (SELECT $g, id, s, rel FROM ($rowsSql)
         WHERE s IS NOT NULL AND rel IS NOT NULL),
       ranked AS (SELECT $g, rel,
           ROW_NUMBER() OVER (PARTITION BY $g ORDER BY s DESC, id) AS rk
         FROM rows_in),
       ideal AS (SELECT $g, rel,
           ROW_NUMBER() OVER (PARTITION BY $g ORDER BY rel DESC, id) AS rk
         FROM rows_in),
       dcg AS (SELECT $g, ROUND(COALESCE(LIST_SUM(
             LIST(( POWER(2.0, rel) - 1.0) / (LN(rk + 1) / LN(2))
                  ORDER BY rk)), 0.0), 6) AS dcg
         FROM ranked WHERE rk <= $k GROUP BY $g),
       idcg AS (SELECT $g, ROUND(COALESCE(LIST_SUM(
             LIST((POWER(2.0, rel) - 1.0) / (LN(rk + 1) / LN(2))
                  ORDER BY rk)), 0.0), 6) AS idcg
         FROM ideal WHERE rk <= $k GROUP BY $g)
       SELECT d.*, i.idcg,
         CASE WHEN i.idcg > 0 THEN ROUND(d.dcg / i.idcg, 6) END AS ndcg
       FROM dcg d JOIN idcg i USING ($g)"""
  }
}
