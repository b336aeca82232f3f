package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-way variance decomposition (the ANOVA identity) — "how much of
  * this signal does the grouping explain": total sum of squares splits
  * exactly into between-group and within-group parts, and
  * η² = SSB / SST is the explained-variance share. The feature-triage
  * companion to [[InfoTheory]] for a CONTINUOUS outcome against a
  * categorical factor (MI needs both sides bounded-categorical).
  *
  * Exact lane: y integral ([[Quantized]]); per-group n, Σy, Σy² in
  * DECIMAL(38,0). With S = global Σy, N = global n:
  *
  *   SST·N = N·Σy² − S²                  (scaled by N — exact decimal)
  *   SSB·N = N·Σ_g (T_g²/n_g) − S²       (T_g = group sum)
  *
  * The only non-exact step is T_g²/n_g — ONE division per GROUP (not
  * per row), folded in a deterministic order? No: summed as doubles,
  * which IS addition-order-dependent — so the operator publishes the
  * PER-GROUP table (n, sum, sumsq, group mean-square contribution)
  * plus exact global masses, and η² is computed from a deterministic
  * rational: η² = (N·Σ_g T_g²·Π?…) — intractable with unequal n_g.
  * Instead the BALANCED-exactness contract: per-group terms emit as
  * exact (T_g², n_g) pairs and the single summary row folds
  * Σ T_g²/n_g over the GROUP TABLE with a rank-ordered list fold
  * (Spark `aggregate` over `collect_list` sorted by group — the
  * NDCG/BM25 fold idiom), so both engines add the same doubles in the
  * same order and the result is bit-identical, needing no rounding.
  * Group count must be bounded (a categorical factor — the same
  * contract as every fold here).
  */
object VarianceDecomp {

  /** One summary row: `(n, k_groups, sst_n, ssb_n, eta_sq)` where
    * `sst_n` = N·SST exactly (DECIMAL cast to double at the end),
    * `ssb_n` = N·SSB via the ordered fold, and `eta_sq = ssb_n/sst_n`.
    * Zero-variance data reports NULL eta_sq.
    *
    * The bounded-factor contract is ENFORCED, not advisory: the group
    * list folds inside one row, so a high-cardinality "factor" (a
    * raw id column) would build a row-sized array — the operator
    * aborts in-plan past `maxGroups` (raise the cap deliberately for
    * genuinely wide factors; the guard is woven into the emitted
    * `ssb_n` so column pruning cannot elide it). The abort fires at
    * the END of the operator's single corpus pass — the guard reads
    * `k_groups` from the same aggregation that builds the array, so
    * the over-cap array HAS been built by the time it throws. Unlike
    * SourceOverlap/miTable there is no materialized intermediate to
    * pre-count cheaply (an eager check would be a second full corpus
    * pass); callers with unknown-cardinality factors should pre-check
    * `approx_count_distinct(groupCol)` themselves.
    */
  def etaSquared(df: DataFrame, groupCol: String, yCol: String,
                 maxGroups: Int = 100000): DataFrame = {
    require(maxGroups >= 2, s"maxGroups too small: $maxGroups")
    val d = "decimal(38,0)"
    val y = Quantized.checkedLong(col(yCol), "VarianceDecomp.etaSquared")
    val rows = df
      .filter(col(groupCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("g"), y.as("__y"))
    val perGroup = rows.groupBy("g").agg(
      count(lit(1)).as("ng"),
      sum(col("__y").cast(d)).as("tg"),
      sum((col("__y").cast(d) * col("__y").cast(d))).as("sq"))
    // one row: exact global masses + the group list ordered by group
    // key, so the Σ T²/n fold adds doubles in one pinned order
    val folded = perGroup.agg(
      sum(col("ng")).as("n"),
      count(lit(1)).as("k_groups"),
      sum(col("tg")).as("s"),
      sum(col("sq")).as("ssq"),
      sort_array(collect_list(struct(col("g"), col("tg"), col("ng"))))
        .as("__gs"))
    val nD = col("n").cast(d)
    val sstN = (nD * col("ssq") - col("s") * col("s")).cast("double")
    // Σ_g T_g²/n_g in group order — left fold, bit-replayable
    val sumTsqOverN = aggregate(col("__gs"), lit(0.0),
      (acc, e) => acc +
        e.getField("tg").cast("double") * e.getField("tg").cast("double") /
          e.getField("ng").cast("double"))
    val ssbNRaw = col("n").cast("double") * sumTsqOverN -
      (col("s") * col("s")).cast("double")
    val ssbN = when(col("k_groups") > maxGroups,
        raise_error(concat(lit("VarianceDecomp.etaSquared: "),
          col("k_groups").cast("string"),
          lit(s" groups exceed maxGroups=$maxGroups — a variance" +
            " decomposition needs a bounded categorical factor, not an" +
            " id column; raise the cap deliberately if the factor is" +
            " genuinely this wide"))).cast("double"))
      .otherwise(ssbNRaw)
    folded.select(
        col("n"), col("k_groups"), sstN.as("sst_n"), ssbN.as("ssb_n"))
      .withColumn("eta_sq",
        when(col("sst_n") > 0, col("ssb_n") / col("sst_n")))
  }

  /** DuckDB replay of [[etaSquared]] over `inputSql` yielding
    * (g, y integral): HUGEINT masses, the same group-ordered LIST
    * fold (left-to-right, bit-identical to Spark's `aggregate`).
    */
  def oracleSql(inputSql: String): String =
    s"""WITH src AS (SELECT g, y FROM ($inputSql)
         WHERE g IS NOT NULL AND y IS NOT NULL),
       pg AS (
         SELECT g, COUNT(*) AS ng,
           SUM(CAST(y AS HUGEINT)) AS tg,
           SUM(CAST(y AS HUGEINT) * y) AS sq
         FROM src GROUP BY g),
       folded AS (
         SELECT CAST(SUM(ng) AS HUGEINT) AS n,
           COUNT(*) AS k_groups,
           SUM(tg) AS s, SUM(sq) AS ssq,
           LIST_SUM(LIST_TRANSFORM(
             LIST_SORT(LIST(STRUCT_PACK(g := g, tg := tg, ng := ng))),
             e -> CAST(e.tg AS DOUBLE) * CAST(e.tg AS DOUBLE)
                  / CAST(e.ng AS DOUBLE))) AS tsq_over_n
         FROM pg)
       SELECT CAST(n AS BIGINT) AS n, CAST(k_groups AS BIGINT) AS k_groups,
         CAST(n * ssq - s * s AS DOUBLE) AS sst_n,
         CAST(n AS DOUBLE) * tsq_over_n - CAST(s * s AS DOUBLE) AS ssb_n,
         CASE WHEN CAST(n * ssq - s * s AS DOUBLE) > 0
           THEN (CAST(n AS DOUBLE) * tsq_over_n - CAST(s * s AS DOUBLE))
                / CAST(n * ssq - s * s AS DOUBLE) END AS eta_sq
       FROM folded"""
}
