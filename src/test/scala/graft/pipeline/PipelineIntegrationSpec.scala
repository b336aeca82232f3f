package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{StageRef, StageStorage}
import graft.features.FeatureGenerator
import graft.ml.{ImputationModel, ModelStore}
import graft.operators.CombinePlanner

/** End-to-end run of the reference's stage sequence on a 16-cell world:
  * combine → spatial impute → recombine → feature gen → sample → train →
  * impute-with-stats. Every stage writes/reads the hive-partitioned
  * storage exactly as the production layout does.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nGrids = 16L

  private def grid = (0L until nGrids).map { gid =>
    val x = (gid % 4).toDouble
    val y = (gid / 4).toDouble
    (gid, x * 10000, y * 10000, 20.0 + x, 70.0 + y, (gid % 4) + 1)
  }.toDF("grid_id", "original_x", "original_y", "lat", "lon", "id_50km")

  private def months = Seq("2023-01", "2023-02")

  /** era5 temperature: plane over (x, y) + day drift; ~12% cells missing. */
  private def era5(month: String) = {
    val days = graft.core.TemporalConfig.ofMonths(month, month).daysInMonth(month)
    val rows = for {
      gid <- 0L until nGrids
      d <- 1 to days
    } yield {
      val x = (gid % 4).toDouble; val y = (gid / 4).toDouble
      val date = f"$month-$d%02d"
      val v = if ((gid + d) % 8 == 0) None
              else Some(280.0 + 2 * x + 3 * y + d * 0.1)
      (gid, date, v)
    }
    rows.toDF("grid_id", "date", "temperature_2m")
  }

  /** aot: fully observed deterministic function. */
  private def aot(month: String) = {
    val days = graft.core.TemporalConfig.ofMonths(month, month).daysInMonth(month)
    (for {
      gid <- 0L until nGrids
      d <- 1 to days
    } yield (gid, f"$month-$d%02d", 0.5 + 0.01 * gid + 0.001 * d))
      .toDF("grid_id", "date", "aot")
  }

  private def elevation = (0L until nGrids).map(g => (g, 100.0 + g))
    .toDF("grid_id", "elevation")

  test("full stage pipeline end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val storage = new StageStorage(spark, tmp)
    val pipe = new Pm25Pipeline(spark, storage, grid, nGrids)

    // ---- s01 combine
    val specs = Seq(
      CombinePlanner.DatasetSpec("era5_land", CombinePlanner.Monthly),
      CombinePlanner.DatasetSpec("merra_aot", CombinePlanner.Monthly),
      CombinePlanner.DatasetSpec("srtm", CombinePlanner.Static),
      CombinePlanner.DatasetSpec("grid", CombinePlanner.Static))
    val available = Map(
      "era5_land" -> months, "merra_aot" -> months,
      "srtm" -> Seq("static"), "grid" -> Seq("static"))
    def readDataset(name: String, partition: String) = name match {
      case "era5_land" => era5(partition)
      case "merra_aot" => aot(partition)
      case "srtm" => elevation
      case "grid" => grid.select(col("grid_id"), col("id_50km"), col("lat"), col("lon"))
    }
    pipe.runCombine(months, specs, available, readDataset)

    val jan = storage.readMonth(Pm25Pipeline.CombinedMonthly, "2023-01")
    assert(jan.count() === nGrids * 31)
    assert(jan.columns.contains("era5_land__temperature_2m"))
    assert(jan.columns.contains("srtm__elevation"))
    val missingBefore = jan.filter(col("era5_land__temperature_2m").isNull).count()
    assert(missingBefore > 0)

    // ---- s01 spatial imputation (K1) over the era5 family
    pipe.runSpatialImpute(months, "^era5_land__.*$")
    val imputedJan = storage.readMonth(Pm25Pipeline.Era5SpatiallyImputed, "2023-01")
    assert(imputedJan.filter(col("era5_land__temperature_2m").isNull).count() === 0)
    // interpolated cells land on the plane (interior cells are exact)
    val probe = imputedJan
      .filter(col("grid_id") === 5 && col("date") === "2023-01-03") // (x=1,y=1), missing since (5+3)%8==0
      .select(col("era5_land__temperature_2m").cast("double")).as[Double].head()
    assert(math.abs(probe - (280.0 + 2 * 1 + 3 * 1 + 3 * 0.1)) < 0.05)

    // ---- s01 recombine with overwrite
    pipe.runRecombine(months)
    val recombined = storage.readMonth(Pm25Pipeline.CombinedWithSpatial, "2023-01")
    assert(recombined.count() === nGrids * 31)
    assert(recombined.filter(col("era5_land__temperature_2m").isNull).count() === 0)

    // ---- s02 features (2023 only; no prior year present)
    pipe.runGenerateFeatures(Seq(2023), FeatureGenerator.Config(
      baseColumns = Seq("merra_aot__aot", "era5_land__temperature_2m")))
    val feats = pipe.scanGeneratedFeatures()
    assert(feats.count() === nGrids * (31 + 28))
    assert(feats.columns.contains("merra_aot__aot__mean_r7d"))
    assert(feats.columns.contains("cos_day_of_year"))

    // ---- s03 sample + s04 train + s05 impute for the aot model
    pipe.runSample("aod", "merra_aot__aot", fraction = 0.5)
    val sampled = pipe.readSampled("aod")
    assert(sampled.select("split").distinct().count() === 2)

    val store = new ModelStore(spark, s"$tmp/models")
    val trained = pipe.runTrain(store, "aod",
      features = Seq("era5_land__temperature_2m", "day_of_year", "srtm__elevation"),
      target = "merra_aot__aot",
      gate = ImputationModel.QualityGate(-10.0, 1.0), // wide gate for tiny data
      hp = ImputationModel.Hyperparams(maxIter = 5), k = 3)
    assert(store.latestRun("aod").isDefined)

    pipe.runImpute("aod", trained, "merra_aot__aot")
    val imputedStage = spark.read.parquet(
      storage.stagePath(StageRef("imputed", Some("aod"))))
    assert(imputedStage.count() === nGrids * 59)
    Seq("__predicted", "__imputed_flag", "__imputed", "__score",
        "__share_imputed_across_all_grids", "__imputed_r7d").foreach { suffix =>
      assert(imputedStage.columns.contains(s"merra_aot__aot$suffix"), suffix)
    }
    // aot was fully observed → nothing flagged imputed
    assert(imputedStage.filter(col("merra_aot__aot__imputed_flag") === 1).count() === 0)

    // ---- s05 tail: materialize stage=imputed (features + model outputs)
    pipe.runRecombineImputed(months, Seq("aod"))
    val imputedWide = storage.readMonth(StageRef("imputed"), "2023-01")
    assert(imputedWide.count() === nGrids * 31)
    assert(imputedWide.columns.contains("merra_aot__aot__imputed"))
    assert(imputedWide.columns.contains("cos_day_of_year"))

    // ---- s06 full-model sample → s07 train → s08 final predict → s09 output
    pipe.runFullModelSample("merra_aot__aot__imputed", fraction = 0.5,
      imputedModels = Seq("aod"))
    val fullSample = spark.read.parquet(
      storage.stagePath(StageRef("full_model_sample")))
    assert(fullSample.count() === nGrids * 59) // target fully present here
    val fullTrained = pipe.trainFromSample(
      fullSample,
      features = Seq("era5_land__temperature_2m", "day_of_year", "srtm__elevation"),
      target = "merra_aot__aot__imputed",
      gate = ImputationModel.QualityGate(-10.0, 1.0),
      hp = ImputationModel.Hyperparams(maxIter = 5), k = 3)
    pipe.runFinalPredict(fullTrained, "pm25")
    val finalPred = storage.scanStage(Pm25Pipeline.FinalPrediction)
    assert(finalPred.count() === nGrids * 59)
    assert(finalPred.columns.contains("pm25__predicted"))

    // s09: pivot January into a cube + georeferenced artifact
    val outDir = s"$tmp/raster"
    pipe.runOutputs(Seq("2023-01"), "pm25__predicted", outDir)
    val back = spark.read.parquet(s"$outDir/data.parquet")
    assert(back.count() === 31L * 4 * 4) // 31 days × 4×4 grid
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/meta.json")), "UTF-8")
    assert(meta.contains("\"crs_epsg\": 7755") && meta.contains("CF-1.8"))
  }
}
