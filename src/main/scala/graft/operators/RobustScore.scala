package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group robust z-scores — median/MAD outlier scoring, the
  * rank-based sibling of [[Winsorize]] (which CAPS at percentiles) and
  * the standard quality-score outlier cull for corpus curation: unlike
  * mean/stddev z-scores, median and MAD have a 50% breakdown point, so
  * the outliers being hunted cannot drag the yardstick toward
  * themselves.
  *
  *   med  = group median of v
  *   mad  = group median of |v − med|
  *   z    = (v − med) / (1.4826 · mad)      (the normal-consistency
  *                                           constant, Rousseeuw &
  *                                           Croux 1993)
  *
  * 100 TB shape, the [[Winsorize]] / [[Sampling.scoreTiers]] pattern:
  * two percentile-aggregation passes (one row per group each,
  * map-side-combined — the corpus never sorts), boundaries broadcast
  * back, the score itself map-side arithmetic. Exact `percentile` is
  * the default (the a2-established Spark `percentile` ≡ DuckDB
  * `QUANTILE_CONT` parity surface); zero-MAD groups (> 50% of the
  * group at the median — constant-ish score columns) yield NULL z
  * rather than ±Inf, identically on both engines.
  *
  * The two medians cost two corpus passes; a profile pass that already
  * built a [[QuantileSketch]] can take med from the sketch instead —
  * this operator is the exact-parity form.
  */
object RobustScore {

  /** Append `<valueCol>_med`, `<valueCol>_mad`, `<valueCol>_rz` per
    * group. Null values pass through with null scores; NULL group keys
    * are a group like any other (the joins are null-safe — a plain
    * equi-join would silently DROP every null-keyed row, losing data
    * that was never scored).
    */
  def robustZ(df: DataFrame, groupCols: Seq[String],
              valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    def nsJoin(left: DataFrame, right: DataFrame): DataFrame = {
      val joined = left.join(broadcast(right),
        groupCols.map(k => left(k) <=> right(k)).reduce(_ && _))
      groupCols.foldLeft(joined)((d, k) => d.drop(right(k)))
    }
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as(s"${valueCol}_med"))
    val withMed = nsJoin(df, med)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(v - col(s"${valueCol}_med")), lit(0.5))
        .as(s"${valueCol}_mad"))
    nsJoin(withMed, mad)
      .withColumn(s"${valueCol}_rz",
        when(v.isNotNull && col(s"${valueCol}_mad") > 0,
          (v - col(s"${valueCol}_med")) /
            (lit(1.4826) * col(s"${valueCol}_mad"))))
  }

  /** Rows whose |robust z| is at most `cutoff` (plus rows with NULL z —
    * zero-MAD groups have no outlier evidence; nulls score null and are
    * kept for the caller to gate on `<valueCol>_rz IS NULL`).
    */
  def cullOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0, s"cutoff must be positive: $cutoff")
    robustZ(df, groupCols, valueCol)
      .filter(col(s"${valueCol}_rz").isNull ||
        abs(col(s"${valueCol}_rz")) <= cutoff)
  }
}
