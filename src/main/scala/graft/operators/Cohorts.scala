package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: assign each key to the cohort of its first-ever
  * event day, then count distinct keys active at each day offset from
  * their cohort start — the retention-curve table behind every
  * engagement dashboard.
  *
  * Plan: one groupBy(key) for the cohort assignment, one key-equi join
  * to tag events (the cohort table is one row per key — broadcast when
  * it fits, hash join on the same key partitioning otherwise), one
  * (cohort, offset) aggregate with exact distinct (partial aggregation
  * on (cohort, offset, key) bounds the shuffle by active-key-days).
  */
object Cohorts {

  /** Output: (cohort_day yyyy-MM-dd, day_offset, n_active). */
  def retention(events: DataFrame, keyCol: String,
                tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val cohorts = events.groupBy(col(keyCol))
      .agg(min(day).as("__cohort"))
    events
      .join(cohorts, keyCol)
      .groupBy(col("__cohort"),
        datediff(day, col("__cohort")).as("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
      .select(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active"))
  }
}
