package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaffold completion: guarantee exactly one row per (grid_id, date)
  * combination, nulls where data is missing
  * (ref: src/pm25ml/collectors/gee/gee_export_pipeline.py:157-176,
  * ned_export_pipeline.py:227-258, pm25_pipeline.py:140-164).
  *
  * The scaffold invariant is what makes all downstream row-frame windows
  * correct (SURVEY.md §2.5): rolling "7 rows" ≡ "7 days" only because every
  * day exists exactly once per grid.
  */
object Scaffold {

  /** Calendar frame: one row per day of `month` (YYYY-MM). */
  def monthDates(spark: SparkSession, month: String): DataFrame = {
    val ym = java.time.YearMonth.parse(month)
    spark.range(1).select(
      explode(sequence(
        to_date(lit(ym.atDay(1).toString)),
        to_date(lit(ym.atEndOfMonth().toString)),
        expr("interval 1 day"))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("date"))
  }

  /** Cross grid × dates, left-join data onto it. `grid` must contain
    * distinct grid_id (the 33k-row dimension — broadcast).
    */
  def complete(data: DataFrame, grid: DataFrame, dates: DataFrame): DataFrame = {
    val spine = broadcast(grid.select("grid_id").distinct())
      .crossJoin(broadcast(dates.select("date").distinct()))
    spine.join(data, Seq("grid_id", "date"), "left")
  }

  def completeForMonth(data: DataFrame, grid: DataFrame, month: String): DataFrame =
    complete(data, grid, monthDates(data.sparkSession, month))
}
