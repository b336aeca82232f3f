package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{StageRef, StageStorage}
import graft.features.FeatureGenerator
import graft.ml.{ImputationModel, ModelStore, PredictorStats}
import graft.operators._
import graft.orchestration.StageRunner
import graft.spatial.DailySpatialInterpolator

/** End-to-end pipeline facade mirroring the reference's stages s01→s09
  * (ref: src/pm25ml/run/s01..s09, setup/dependency_injection.py:172-461):
  *
  *   combine           → stage=combined_monthly
  *   spatialImpute     → stage=era5_spatially_imputed
  *   recombine         → stage=combined_with_spatial_interpolation
  *   generateFeatures  → stage=generated_features
  *   sample            → stage=sampled+<model>
  *   trainImputation   → model store
  *   imputePredict     → stage=imputed+<model> / stage=imputed
  *   finalPredict      → stage=final_prediction
  *   pivot (terminal)  → (time, y, x) cube
  *
  * Stage boundaries, names and idempotent skip semantics match the
  * reference; execution inside each stage is one declarative Spark plan.
  */
final class Pm25Pipeline(spark: SparkSession, storage: StageStorage,
                         grid: DataFrame, nGrids: Long) {
  import Pm25Pipeline._

  private val runner = new StageRunner(storage)

  /** s01 combine: per month, scaffold each dataset and wide-combine. The
    * planner resolves which partition each dataset contributes.
    */
  def runCombine(months: Seq[String], specs: Seq[CombinePlanner.DatasetSpec],
                 available: Map[String, Seq[String]],
                 readDataset: (String, String) => DataFrame): Unit = {
    val plans = CombinePlanner.plan(months, specs, available, nGrids)
    plans.foreach { p =>
      runner.runMonths(CombinedMonthly, Seq(p.month), _ => p.expectedRows, { month =>
        val tables = p.inputs.map { in =>
          val raw = readDataset(in.dataset, in.partition)
          val scaffolded =
            if (raw.columns.contains("date"))
              Scaffold.completeForMonth(WideCombiner.normalizeDate(raw), grid, month)
            else raw
          in.dataset -> scaffolded
        }
        WideCombiner.combine(tables)
      })
    }
  }

  /** s01 spatial imputation of the ERA5 column family (K1). Only the id +
    * value columns travel through the per-date shuffle (the reference's P3
    * projection, spatial_imputation_manager.py:54-59) — the imputed stage
    * holds just that family and the recombine overwrites it back into the
    * wide table.
    */
  def runSpatialImpute(months: Seq[String], valueColPattern: String): Unit =
    runner.runMonths(Era5SpatiallyImputed, months, _ => -1L, { month =>
      val df = storage.readMonth(CombinedMonthly, month)
      val valueCols = df.columns.filter(_.matches(valueColPattern)).toSeq
      val projected = df.select(("grid_id" +: "date" +: valueCols).map(col): _*)
      val withXy = projected.join(
        broadcast(grid.select(col("grid_id"), col("original_x").as("__x"),
          col("original_y").as("__y"))), Seq("grid_id"), "left")
      DailySpatialInterpolator
        .interpolate(withXy, "date", "__x", "__y", valueCols)
        .drop("__x", "__y")
    })

  /** s01 recombine: imputed columns overwrite the originals. */
  def runRecombine(months: Seq[String]): Unit =
    runner.runMonths(CombinedWithSpatial, months, _ => -1L, { month =>
      Recombiner.recombine(Seq(
        storage.readMonth(CombinedMonthly, month),
        storage.readMonth(Era5SpatiallyImputed, month)), overwriteColumns = true)
    })

  /** s02 feature generation per year (two-year slice semantics). Dynamic
    * partition overwrite replaces only the months of the target year, so
    * re-running a year is idempotent without clobbering the others.
    */
  def runGenerateFeatures(years: Seq[Int], cfg: FeatureGenerator.Config): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    years.foreach { y =>
      val months = storage.months(CombinedWithSpatial)
        .filter(m => m.take(4).toInt == y || m.take(4).toInt == y - 1)
      val slice = storage.scanStage(CombinedWithSpatial)
        .filter(col("month").isin(months: _*))
      val out = FeatureGenerator.generate(slice, y, cfg)
      out.withColumn("month", substring(col("date"), 1, 7))
        .write.mode("overwrite").partitionBy("month")
        .parquet(storage.stagePath(GeneratedFeatures))
    }
  }

  def scanGeneratedFeatures(): DataFrame =
    storage.scanStage(GeneratedFeatures)

  /** s03/s06 sampling → stage=sampled+<model>. */
  def runSample(model: String, targetCol: String, fraction: Double): Unit = {
    val features = scanGeneratedFeatures()
    val eligible = Sampling.filterTargetPresent(features, targetCol)
    val sampled = Sampling.stratifiedSplit(eligible, "grid__id_50km", fraction,
      Seq("grid_id", "date"))
    sampled.write.mode("overwrite")
      .parquet(storage.stagePath(StageRef("sampled", Some(model))))
  }

  def readSampled(model: String): DataFrame =
    spark.read.parquet(storage.stagePath(StageRef("sampled", Some(model))))

  /** s04/s07 train from a sampled frame: grouped CV + gate. The full
    * model passes `stratifyCol = Some("grid__k_region")` — the
    * reference's StratifiedGroupKFold contract (ref:
    * training/full_model_pipeline.py:126-172, setup/training_full.py:18-19).
    */
  def trainFromSample(sampled: DataFrame, features: Seq[String], target: String,
                      gate: ImputationModel.QualityGate,
                      hp: ImputationModel.Hyperparams,
                      k: Int = 10,
                      stratifyCol: Option[String] = None): ImputationModel.Trained = {
    val trained = ImputationModel.train(
      sampled.filter(col("split") === "training"),
      sampled.filter(col("split") === "test"),
      features, target, "grid__id_50km", k, hp, stratifyCol)
    gate.check(trained.cv.meanR2)
    trained
  }

  /** s07 full-model train: stratified-group CV over the full-model sample
    * (stratify k_region, group 50 km cell), persisted to the store.
    */
  def runTrainFull(store: ModelStore, model: String, features: Seq[String],
                   target: String, gate: ImputationModel.QualityGate,
                   hp: ImputationModel.Hyperparams,
                   k: Int = 10): ImputationModel.Trained = {
    val sampled = spark.read.parquet(storage.stagePath(StageRef("full_model_sample")))
    val trained = trainFromSample(sampled, features, target, gate, hp, k,
      stratifyCol = Some("grid__k_region"))
    store.save(model, runId(), trained)
    trained
  }

  /** s04 train: grouped CV + gates, persisted to the model store. */
  def runTrain(store: ModelStore, model: String, features: Seq[String],
               target: String, gate: ImputationModel.QualityGate,
               hp: ImputationModel.Hyperparams, k: Int = 10): ImputationModel.Trained = {
    val trained = trainFromSample(readSampled(model), features, target, gate, hp, k)
    store.save(model, runId(), trained)
    trained
  }

  /** s05 impute: predict + K7 stats over all months, write imputed+model. */
  def runImpute(model: String, trained: ImputationModel.Trained,
                target: String): Unit = {
    val features = scanGeneratedFeatures()
    val predicted = ImputationModel.predict(features, trained, s"${target}__predicted")
    val withStats = PredictorStats.attach(predicted, target,
      s"${target}__predicted", trained.cv.meanR2)
    withStats
      .select((Seq("grid_id", "date", "month") ++
        withStats.columns.filter(_.startsWith(s"${target}__"))).map(col): _*)
      .write.mode("overwrite").partitionBy("month")
      .parquet(storage.stagePath(StageRef("imputed", Some(model))))
  }

  /** s05 tail: force-recombine generated features + every model's imputed
    * stage into stage=imputed (ref: imputation_controller.py:48-56 — the
    * full-model stages read this materialized wide table).
    */
  def runRecombineImputed(months: Seq[String], imputedModels: Seq[String]): Unit =
    runner.runMonths(StageRef("imputed"), months, _ => -1L, { month =>
      val frames = storage.readMonth(GeneratedFeatures, month) +:
        imputedModels.map(m => storage.readMonth(StageRef("imputed", Some(m)), month))
      Recombiner.recombine(frames, overwriteColumns = true)
    }, force = true)

  /** s06 full-model sampling: generated features joined with EVERY
    * imputation model's __imputed columns, rows with observed ground
    * truth, stratified split (ref: sample/full_model_sampler.py:58-62;
    * the reference feeds aod+no2+co imputed columns into the full model).
    */
  def runFullModelSample(targetCol: String, fraction: Double,
                         imputedModels: Seq[String]): Unit = {
    val features = imputedModels.foldLeft(scanGeneratedFeatures()) { (acc, m) =>
      val imputed = storage.scanStage(StageRef("imputed", Some(m)))
      acc.join(imputed.select("grid_id",
        ("date" +: imputed.columns.filter(_.endsWith("__imputed")).toSeq): _*),
        Seq("grid_id", "date"), "left")
    }
    val eligible = Sampling.filterTargetPresent(features, targetCol)
    Sampling.stratifiedSplit(eligible, "grid__id_50km", fraction, Seq("grid_id", "date"))
      .write.mode("overwrite")
      .parquet(storage.stagePath(StageRef("full_model_sample")))
  }

  /** s08 final prediction over every row (include_stats=False semantics:
    * predictions only, no imputation stats —
    * ref: imputation/from_model/full_predict_controller.py:38-68).
    */
  def runFinalPredict(trained: ImputationModel.Trained, target: String): Unit = {
    val features = scanGeneratedFeatures()
    ImputationModel.predict(features, trained, s"${target}__predicted")
      .select(col("grid_id"), col("date"), col("month"),
        col(s"${target}__predicted"))
      .write.mode("overwrite").partitionBy("month")
      .parquet(storage.stagePath(FinalPrediction))
  }

  /** s09 outputs: months filter → join grid coords → pivot to (time, y, x)
    * cube → georeferenced artifact (ref: run/s09_outputs.py:15-45).
    */
  def runOutputs(months: Seq[String], predictedCol: String, outDir: String): Unit = {
    val pred = storage.scanStage(FinalPrediction)
      .filter(col("month").isin(months: _*))
      .join(broadcast(grid.select(col("grid_id"),
        col("original_x").as("x"), col("original_y").as("y"))), Seq("grid_id"))
    val cube = graft.raster.RasterPivot.toCube(pred, "date", "y", "x", predictedCol)
    graft.raster.GeoRasterWriter.write(spark, cube, outDir,
      graft.raster.GeoRasterWriter.CfMeta(
        title = "daily PM2.5 estimate", variable = "pm25",
        units = "ug m-3", crsEpsg = 7755,
        geoTransform = graft.raster.GeoRasterWriter.geoTransformOf(cube)))
  }

  private def runId(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd+HH-mm-ss")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
}

object Pm25Pipeline {
  val CombinedMonthly: StageRef = StageRef("combined_monthly")
  val Era5SpatiallyImputed: StageRef = StageRef("era5_spatially_imputed")
  val CombinedWithSpatial: StageRef = StageRef("combined_with_spatial_interpolation")
  val GeneratedFeatures: StageRef = StageRef("generated_features")
  val FinalPrediction: StageRef = StageRef("final_prediction")
}
