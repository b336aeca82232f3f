package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window quantiles via rolling dyadic-sketch merges — the
  * "7-day p95" latency/size monitor at 100 TB, the quantile sibling
  * of [[SlidingDistinct]]: a windowed exact percentile re-sorts every
  * window's raw rows (each row processed `windowDays` times); here
  * the corpus is sketched ONCE per day ([[QuantileSketch]] — one
  * map-side-combined aggregation) and windows merge CELL TABLES,
  * because the dyadic CMS merge is plain addition.
  *
  * Same scatter shape as [[SlidingDistinct]]: each day's cells post
  * to every window containing the day (bounded offset explode + one
  * equi-shuffle, no range join), summed per (window-end day, cell);
  * the per-window quantile walks reuse [[QuantileSketch.Dq]]
  * unchanged — deterministic integer descent, so the whole rolling
  * pipeline (cells, scatter, walk) replays bit-for-bit in SQL.
  */
object RollingQuantile {

  /** Per-day trailing-window quantiles of `valueCol`:
    * `(groupCols…, day, q, q_value)` for each q, one row set per
    * OBSERVED (group, day); `valueCol` must lie on `[0, 2^levels)`
    * (the sketch's quantized universe — it aborts loudly otherwise).
    * With `groupCols` one independent rolling series per group, each
    * group's windows anchored to ITS OWN observed days (the
    * SlidingDistinct convention) — the scatter and merge keys widen,
    * the plan gains no stage.
    */
  def rollingQuantiles(df: DataFrame, tsCol: String, valueCol: String,
                       levels: Int, depth: Int, width: Int,
                       windowDays: Int, qs: Seq[Double],
                       groupCols: Seq[String] = Nil): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    // NULL timestamps abort loudly (the SlidingDistinct posture): a
    // NULL __day group would be silently dropped by the observed-day
    // equi-join downstream
    val withDay = df.withColumn("__day",
      when(col(tsCol).isNull, raise_error(lit(
          s"RollingQuantile.rollingQuantiles: NULL $tsCol — filter or " +
            "repair null timestamps upstream")))
        .otherwise(to_date(col(tsCol))))
    val daily = QuantileSketch.sketch(withDay, valueCol, levels, depth,
      width, groupCols = groupCols :+ "__day")
    // feeds the day list AND the scatter — cut once (Triangles lesson)
    val cells = daily.cells.localCheckpoint()
    val days = cells
      .select(groupCols.map(col) :+ col("__day").as("day"): _*).distinct()
    val scattered = cells
      .withColumn("__off", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(groupCols.map(col) ++ Seq(
        date_add(col("__day"), col("__off")).as("day"),
        col("lvl"), col("i"), col("bucket"), col("cnt")): _*)
    val rolled = scattered
      .join(broadcast(days), groupCols :+ "day")
      .groupBy((groupCols ++ Seq("day", "lvl", "i", "bucket")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    // no release() here: the distributed walk regime returns a LAZY
    // plan over the persisted cells — the caller releases via the
    // returned Dq if it probes repeatedly (the gate's one-shot read
    // lets the session clean up, like the t_dq gates)
    QuantileSketch.Dq(rolled, levels, depth, width, groupCols :+ "day")
      .quantiles(qs)
  }
}
