package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.FloatType

import graft.functions.Rolling

/** K7 — the imputation stats columns attached after model prediction
  * (ref: src/pm25ml/imputation/from_model/regression_model_predictor.py:132-229):
  *
  *   {t}__predicted                      model output
  *   {t}__imputed_flag                   1 where the original target was missing
  *   {t}__imputed                        original where present, else predicted
  *   {t}__score                          original where present, else predicted·meanCvR²
  *   {t}__share_imputed_across_all_grids mean(flag) per date (A5)
  *   {t}__imputed_r7d                    7-day rolling mean of __imputed per grid (W5)
  *
  * W5 note: the reference predicts month-at-a-time and hand-carries the
  * previous month through a concat-filter dance (predictor.py:187-229);
  * here the window runs over whatever date span the frame holds — pass a
  * multi-month frame and the cross-month carry is just correct.
  */
object PredictorStats {

  def attach(df: DataFrame, target: String, predictedCol: String,
             meanCvR2: Double): DataFrame = {
    val t = col(target)
    val missing = t.isNull || isnan(t)
    val flagCol = s"${target}__imputed_flag"
    val impCol = s"${target}__imputed"

    val wDate = Window.partitionBy("date")

    val base = df
      .withColumn(s"${target}__predicted", col(predictedCol).cast(FloatType))
      .withColumn(flagCol, when(missing, 1).otherwise(0))
      .withColumn(impCol,
        when(missing, col(predictedCol)).otherwise(t).cast(FloatType))
      .withColumn(s"${target}__score",
        when(missing, col(predictedCol) * meanCvR2).otherwise(t).cast(FloatType))
      .withColumn(s"${target}__share_imputed_across_all_grids",
        avg(col(flagCol)).over(wDate).cast(FloatType))

    base.withColumn(s"${target}__imputed_r7d",
      Rolling.rollingMean(col(impCol), Seq(col("grid_id")), Seq(col("date")), 7)
        .cast(FloatType))
  }
}
