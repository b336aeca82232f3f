package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-load skew profile — the shuffle-planning diagnostic this
  * engine's own scale notes keep citing: before keying a 100 TB
  * shuffle on a column, measure HOW skewed it is. Reports the exact
  * key count, row count, hottest-key load and share, and the GINI
  * COEFFICIENT of the per-key load distribution (0 = perfectly even,
  * → 1 = one key owns everything) — the single number that decides
  * between a plain hash shuffle, AQE skew handling, and the salted
  * join ([[SaltedJoin]]).
  *
  * Exact at any cardinality: per-key counts (one shuffle); then the
  * rank-sum form of Gini — `G = 2·S/(K·T) − (K+1)/K` with
  * `S = Σ rank_i·c_i` over counts sorted ascending — is computed on
  * the per-COUNT-VALUE histogram (value `c` held by `k` keys whose
  * ranks are a run of length k starting after `cum` smaller keys
  * contributes `c·(k·cum + k(k+1)/2)` — ties collapse, no per-key
  * rank window), with the exclusive cumulative key count from
  * [[PrefixSum.exclusive]] — no single-task sort at any distinct-key
  * cardinality. All masses are DECIMAL(38,0)-exact; the published
  * `gini_load` and `top_share` are pinned IEEE trees — bit-exact, no
  * rounding.
  */
object KeySkew {

  /** One row: `(n_keys, n_rows, max_cnt, top_share, gini_load)`.
    * Null keys are excluded (profile the real hash domain).
    */
  def loadProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "loadProfile needs key columns")
    val d = "decimal(38,0)"
    val counts = df
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
    // histogram of load values: count-value c held by k keys — at most
    // one row per DISTINCT load, the frame every mass below reads
    val byVal = counts.groupBy("c").agg(count(lit(1)).as("k"))
    val ranked = PrefixSum.exclusive(byVal, Seq(col("c")), col("k"), "cum")
    // DOUBLED rank mass 2·Σ rank·c = Σ c·(2·k·cum + k·(k+1)) — the ×2
    // keeps k(k+1)/2 out of decimal division (which is not integral)
    val rankMass2 = (col("c").cast(d) *
      (lit(2).cast(d) * col("k").cast(d) * col("cum").cast(d) +
        col("k").cast(d) * (col("k").cast(d) + 1))).as("__rm2")
    val aggd = ranked.select(col("c"), col("k"), rankMass2)
      .agg(sum(col("k")).as("n_keys"),
        sum(col("c").cast(d) * col("k").cast(d)).as("__t"),
        sum(col("__rm2")).as("__s2"),
        max(col("c")).as("max_cnt"))
    aggd.select(
      col("n_keys"),
      col("__t").cast("long").as("n_rows"),
      col("max_cnt"),
      (col("max_cnt").cast("double") / col("__t").cast("double"))
        .as("top_share"),
      when(col("n_keys") > 1,
        col("__s2").cast("double") /
          (col("n_keys").cast("double") * col("__t").cast("double")) -
          (col("n_keys") + 1).cast("double") / col("n_keys").cast("double"))
        .as("gini_load"))
  }

  /** DuckDB replay of [[loadProfile]] over `inputSql` yielding the
    * key columns: same histogram, same rank-run masses (the prefix
    * sum is an ordinary window here — the histogram is
    * distinct-load-bounded in SQL; the Spark side decomposes it
    * because that bound is advisory).
    */
  def oracleSql(inputSql: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    val nn = keyCols.map(k => s"$k IS NOT NULL").mkString(" AND ")
    s"""WITH counts AS (
         SELECT $ks, COUNT(*) AS c FROM ($inputSql)
         WHERE $nn GROUP BY $ks),
       byval AS (SELECT c, COUNT(*) AS k FROM counts GROUP BY c),
       ranked AS (
         SELECT c, k,
           COALESCE(SUM(k) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         FROM byval),
       masses AS (
         SELECT CAST(SUM(k) AS HUGEINT) AS n_keys,
           SUM(CAST(c AS HUGEINT) * k) AS t,
           SUM(CAST(c AS HUGEINT) *
               (2 * CAST(k AS HUGEINT) * cum
                + CAST(k AS HUGEINT) * (CAST(k AS HUGEINT) + 1))) AS s2,
           MAX(c) AS max_cnt
         FROM ranked)
       SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(t AS BIGINT) AS n_rows,
         CAST(max_cnt AS BIGINT) AS max_cnt,
         CAST(max_cnt AS DOUBLE) / CAST(t AS DOUBLE) AS top_share,
         CASE WHEN n_keys > 1
           THEN CAST(s2 AS DOUBLE)
                / (CAST(n_keys AS DOUBLE) * CAST(t AS DOUBLE))
              - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE)
         END AS gini_load
       FROM masses"""
  }
}
