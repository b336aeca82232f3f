package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization — clamp a value column to its group's
  * [lo, hi] exact percentiles, the standard outlier treatment before
  * training (the heavy-tail complement of the reference's IQR FILTERS,
  * which drop rows instead of capping them).
  *
  * 100 TB shape, same as [[Sampling.scoreTiers]]: the boundaries are
  * ONE exact-percentile aggregation row per group (map-side-combined
  * groupBy over the groups, never a sort of the corpus), broadcast-
  * joined back; the clamp itself is a map-side `greatest/least`. The
  * percentile interpolation is the a2/scoreTiers-established parity
  * surface (Spark `percentile` ≡ DuckDB `QUANTILE_CONT`).
  */
object Winsorize {

  /** Append `<valueCol>_w`: the value clamped to the group's
    * [`lo`, `hi`] percentile boundaries (plus the boundaries as
    * `__p_lo` / `__p_hi` for inspection). Null values pass through.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile range [$lo, $hi]")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(lo)).as("__p_lo"),
        percentile(col(valueCol), lit(hi)).as("__p_hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("__p_lo")),
          col("__p_hi")))
  }
}
