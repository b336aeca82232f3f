package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window distinct counts via rolling HLL merges — the
  * "7-day active users per day" family at 100 TB. A windowed
  * `COUNT(DISTINCT)` recomputes each window from raw rows (every row
  * processed `windowDays` times, distinct state per window); the
  * sketch form touches the corpus ONCE (the daily register build, a
  * map-side-combining max-agg) and then works entirely on register
  * tables — days × m rows — because register-wise max IS the HLL
  * union ([[HllSketch]]).
  *
  * The rolling merge is a SCATTER, not a range join: each day's
  * registers post themselves to every window that contains the day
  * (a bounded explode of `windowDays` offsets — one equi-shuffle on
  * the target day, no non-equi join, no per-window re-scan), then one
  * max-agg per (window-end day, bucket). Windows whose end falls
  * beyond the observed horizon are dropped against the broadcast
  * day list (days-bounded).
  *
  * Everything through `s_mass` is exact integers under any
  * partitioning (the HllSketch contract), so the whole rolling
  * pipeline replays bit-for-bit in SQL; `est` carries the one `ln`
  * of the linear-counting branch — gates round it per the house
  * transcendental convention.
  */
object SlidingDistinct {

  /** Per-day trailing-window distinct estimate of `valueCol`:
    * `(groupCols…, day, n_buckets, v_empty, s_mass, est_raw, est)` —
    * one row per OBSERVED (group, day) (`tsCol` is a timestamp; the
    * day is its date), the window covering that day and the
    * `windowDays − 1` before it. With `groupCols` one independent
    * rolling series per group (per-source 7-day active users — the
    * dashboard shape), each group's windows anchored to ITS OWN
    * observed days; the scatter/merge keys simply widen, so the plan
    * gains no stage.
    */
  def rollingDistinct(df: DataFrame, tsCol: String, valueCol: String,
                      p: Int, windowDays: Int,
                      groupCols: Seq[String] = Nil): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    // NULL timestamps abort loudly: a NULL __day would build a null-day
    // register group and then be SILENTLY dropped by the equi-join
    // against the observed-day list — this codebase's convention is a
    // loud in-plan abort, never silent row loss
    val withDay = df.withColumn("__day",
      when(col(tsCol).isNull, raise_error(lit(
          s"SlidingDistinct.rollingDistinct: NULL $tsCol — filter or " +
            "repair null timestamps upstream")))
        .otherwise(to_date(col(tsCol))))
    val daily = HllSketch.sketch(withDay, valueCol, p,
      groupCols = groupCols :+ "__day")
    // feeds the day list AND the scatter — cut once (Triangles lesson)
    val regs = daily.registers.localCheckpoint()
    val days = regs
      .select(groupCols.map(col) :+ col("__day").as("day"): _*).distinct()
    val scattered = regs
      .select(groupCols.map(col) ++ Seq(col("__day"), col("bucket"),
        col("reg"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off")): _*)
      .select(groupCols.map(col) ++ Seq(
        date_add(col("__day"), col("__off")).as("day"),
        col("bucket"), col("reg")): _*)
    val rolled = scattered
      .join(broadcast(days), groupCols :+ "day")
      .groupBy((groupCols ++ Seq("day", "bucket")).map(col): _*)
      .agg(max(col("reg")).as("reg"))
    HllSketch.Hll(rolled, p, groupCols :+ "day").estimate()
  }

  /** DuckDB replay of [[rollingDistinct]]: the same daily registers,
    * offset scatter, observed-day restriction and estimate trees.
    * `valuesSql` must yield (groupCols…, ts TIMESTAMP, v non-null).
    */
  def oracleSql(valuesSql: String, p: Int, windowDays: Int,
                groupCols: Seq[String] = Nil): String = {
    val g = groupCols.map(_ + ", ").mkString
    val sOn = (groupCols.map(c => s"d.$c = s.$c") :+ "d.day = s.day")
      .mkString(" AND ")
    s"""WITH vals AS (
         SELECT ${g}CAST(ts AS DATE) AS __day, v FROM ($valuesSql)),
       regs0 AS (${HllSketch.registersSql(
        s"SELECT ${g}__day, v FROM vals", p, groupCols :+ "__day")}),
       days AS (SELECT DISTINCT ${g}__day AS day FROM regs0),
       scattered AS (
         SELECT ${g}__day + CAST(off AS INTEGER) AS day, bucket, reg
         FROM regs0 CROSS JOIN (
           SELECT UNNEST(RANGE(0, $windowDays)) AS off)),
       regs AS (
         SELECT ${groupCols.map(c => s"s.$c, ").mkString}s.day, bucket,
           MAX(reg) AS reg
         FROM scattered s JOIN days d ON $sOn
         GROUP BY ${groupCols.map(c => s"s.$c, ").mkString}s.day, bucket)
       ${HllSketch.estimateSql(p, groupCols :+ "day")}"""
  }
}
