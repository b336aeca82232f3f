package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lead–lag cross-correlation between two aligned integer series —
  * "do clicks LEAD purchases, and by how many days": Pearson
  * correlation of (a_t, b_{t+lag}) for every lag in [−maxLag, maxLag],
  * the classic econometric lead-lag scan. Positive-lag peaks mean A
  * leads B. The pairwise companion to [[Changepoint]]/[[
  * graft.ml.Trend]]'s single-series monitors.
  *
  * Input contract: both frames are SERIES AT REST — one row per
  * integer time index `t` (aggregate the raw corpus to a bounded
  * grid first, e.g. per-day totals: the same "monitored summary, not
  * raw corpus" posture as [[Changepoint]]). Values ride
  * [[Quantized]]; every per-lag sum accumulates as DECIMAL(38,0) via
  * one lag-exploded aggregation, and each correlation is the pinned
  * `(n·Σab − Σa·Σb) / (√(n·Σa² − (Σa)²)·√(n·Σb² − (Σb)²))`
  * tree over exact terms — only the final sqrt/divide is IEEE, so
  * gate queries round per the transcendental convention (the sqrt
  * pair composes, unlike a single division).
  *
  * Shape: the A-side explodes its 2·maxLag+1 shifted copies map-side
  * (series-bounded × lags — tiny), ONE equi-join on the shifted index
  * against B, one aggregation to 2·maxLag+1 rows. No window, no
  * self-join of the raw corpus.
  */
object LeadLag {

  /** Correlation per lag: `(lag, n, corr)` for lag ∈ [−maxLag,
    * maxLag], using only time indexes where BOTH series have a row
    * (n counts the overlap at that lag; n < 2 or a constant side
    * yields NULL corr).
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, tCol: String,
                       valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 10000, s"maxLag out of range: $maxLag")
    val d = "decimal(38,0)"
    val at = Quantized.checkedLong(a(tCol), "LeadLag t")
    val av = Quantized.checkedLong(a(valueCol), "LeadLag a-value")
    val bt = Quantized.checkedLong(b(tCol), "LeadLag t")
    val bv = Quantized.checkedLong(b(valueCol), "LeadLag b-value")
    val aRows = a.select(at.as("t"), av.as("va"))
      .withColumn("__lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("lag", col("__lag").cast("long"))
      // the pair (a_t, b_{t+lag}) joins where B's index = t + lag
      .select(col("lag"), (col("t") + col("lag")).as("tb"), col("va"))
    val joined = aRows.join(
      b.select(bt.as("tb"), bv.as("vb")), Seq("tb"))
    val sums = joined.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum(col("va").cast(d)).as("sa"), sum(col("vb").cast(d)).as("sb"),
      sum(col("va").cast(d) * col("vb").cast(d)).as("sab"),
      sum(col("va").cast(d) * col("va").cast(d)).as("saa"),
      sum(col("vb").cast(d) * col("vb").cast(d)).as("sbb"))
    val num = (col("n").cast(d) * col("sab") - col("sa") * col("sb"))
      .cast("double")
    val va = (col("n").cast(d) * col("saa") - col("sa") * col("sa"))
      .cast("double")
    val vb = (col("n").cast(d) * col("sbb") - col("sb") * col("sb"))
      .cast("double")
    sums.select(col("lag"), col("n"),
      when(va > 0 && vb > 0, num / (sqrt(va) * sqrt(vb))).as("corr"))
  }

  /** DuckDB replay of [[crossCorrelation]]: same lag explosion,
    * HUGEINT sums, same pinned tail. `aSql`/`bSql` must yield
    * integral (t, v).
    */
  def oracleSql(aSql: String, bSql: String, maxLag: Int): String =
    s"""WITH a AS ($aSql), b AS ($bSql),
       lags AS (SELECT UNNEST(RANGE(-$maxLag, ${maxLag + 1})) AS lag),
       pairs AS (
         SELECT lags.lag, a.v AS va, b.v AS vb
         FROM a CROSS JOIN lags
         JOIN b ON b.t = a.t + lags.lag),
       sums AS (
         SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(CAST(va AS HUGEINT)) AS sa, SUM(CAST(vb AS HUGEINT)) AS sb,
           SUM(CAST(va AS HUGEINT) * vb) AS sab,
           SUM(CAST(va AS HUGEINT) * va) AS saa,
           SUM(CAST(vb AS HUGEINT) * vb) AS sbb
         FROM pairs GROUP BY lag)
       SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
         CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
           THEN CAST(n * sab - sa * sb AS DOUBLE)
                / (SQRT(CAST(n * saa - sa * sa AS DOUBLE))
                   * SQRT(CAST(n * sbb - sb * sb AS DOUBLE)))
         END AS corr
       FROM sums"""
}
