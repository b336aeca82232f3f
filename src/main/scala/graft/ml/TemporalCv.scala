package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-origin (walk-forward) cross-validation folds — the
  * time-series complement of [[StratifiedGroupKFold]]: each fold
  * trains on everything up to a cut date and validates on the NEXT
  * slice, so no fold ever sees the future (random k-fold leaks
  * tomorrow into today's training set for forecasting targets).
  *
  * The k+1 cut dates split the DISTINCT date sequence into equal-count
  * segments by rank (so sparse/dense calendars fold evenly); fold f
  * (1-based) trains on dates ≤ cut_f and tests on (cut_f, cut_{f+1}].
  * Distinct dates are a tiny domain (thousands even over decades), so
  * the rank window runs on the aggregated date list and the fold
  * assignment broadcast-joins back — rows never shuffle for it.
  */
object TemporalCv {

  /** Per-(fold, role) assignment exploded over the rows: every input
    * row appears once per fold it participates in, tagged
    * `role ∈ {train, test}` — the shape a CV trainer iterates.
    */
  def rollingOriginFolds(df: DataFrame, dateCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = df.sparkSession
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(dateCol))
    // tiny domain: the window runs over DISTINCT dates only
    val ranked = df.select(col(dateCol)).distinct()
      .withColumn("__r", row_number().over(w))
    val n = ranked.count()
    // cut_f = the date at rank ceil(n*f/(k+1)), f = 1..k+1
    val cuts = ranked
      .withColumn("__f",
        explode(sequence(lit(1), lit(k + 1))))
      .filter(col("__r") === ceil(lit(n) * col("__f") / (k + 1)))
      .select(col("__f"), col(dateCol).as("__cut"))
    val folds = spark.range(1, k + 1).select(col("id").cast("int").as("fold"))
      .join(broadcast(cuts.withColumnRenamed("__f", "fold")
        .withColumnRenamed("__cut", "__cut_lo")), Seq("fold"))
      .join(broadcast(cuts
        .select((col("__f") - 1).as("fold"), col("__cut").as("__cut_hi"))),
        Seq("fold"))
    df.crossJoin(broadcast(folds))
      .withColumn("role",
        when(col(dateCol) <= col("__cut_lo"), lit("train"))
          .when(col(dateCol) <= col("__cut_hi"), lit("test")))
      .filter(col("role").isNotNull)
      .drop("__cut_lo", "__cut_hi")
  }
}
