package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization — clamp a value column to its group's
  * [lo, hi] percentiles, the standard outlier treatment before
  * training (the heavy-tail complement of the reference's IQR FILTERS,
  * which drop rows instead of capping them).
  *
  * 100 TB shape, same as [[Sampling.scoreTiers]]: the boundaries are
  * ONE percentile-aggregation row per group (map-side-combined groupBy
  * over the groups, never a sort of the corpus), broadcast-joined back;
  * the clamp itself is a map-side `greatest/least`. The DEFAULT exact
  * percentile buffers each group's full value set inside the aggregate
  * — fine while a group fits one task's memory (and bounded when values
  * are quantized, which dedups the buffer). At extreme scale set
  * `approx = true`: `percentile_approx` keeps O(accuracy) state per
  * group with identical plan shape, and on quantized scores (spacing
  * wider than the sketch error) the boundaries — hence every clamped
  * value — are unchanged. The exact interpolation is the
  * a2/scoreTiers-established parity surface (Spark `percentile` ≡
  * DuckDB `QUANTILE_CONT`); the approx variant has no SQL-replayable
  * oracle, which is why exact stays the default below corpus scale.
  */
object Winsorize {

  /** Append `<valueCol>_w`: the value clamped to the group's
    * [`lo`, `hi`] percentile boundaries (plus the boundaries as
    * `__p_lo` / `__p_hi` for inspection). Null values pass through as
    * null — the clamp is guarded, because `greatest`/`least` would
    * otherwise silently SKIP the null and return the boundary.
    *
    * @param approx use `percentile_approx` (G-K sketch, bounded state
    *               per group) for the boundary pass instead of the
    *               exact buffering percentile — the 100 TB path.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double, hi: Double, approx: Boolean = false,
                accuracy: Int = 10000): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile range [$lo, $hi]")
    def pct(p: Double) =
      if (approx) percentile_approx(col(valueCol), lit(p), lit(accuracy)).cast("double")
      else percentile(col(valueCol), lit(p))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(pct(lo).as("__p_lo"), pct(hi).as("__p_hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"),
            col("__p_lo")), col("__p_hi"))))
  }
}
