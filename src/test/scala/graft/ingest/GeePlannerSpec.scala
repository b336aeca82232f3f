package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ingest.GeePlanner._

/** Mirrors the reference's feature-planner unit tests
  * (feature_planner__test.py) plus a value-level end-to-end in the shape
  * of the integration suite's dummy-raster expectations
  * (feature_planner__it.py:246-312).
  */
class GeePlannerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2×2 grid of 2×2 cells over [0,4)². */
  private def grid = Seq(
    (0L, 0.0, 0.0, 2.0, 2.0), (1L, 2.0, 0.0, 4.0, 2.0),
    (2L, 0.0, 2.0, 2.0, 4.0), (3L, 2.0, 2.0, 4.0, 4.0))
    .toDF("grid_id", "xmin", "ymin", "xmax", "ymax")

  private def planner = new GriddedFeatureCollectionPlanner(grid)

  // ---------------------------------------------------- FeaturePlan shape

  test("intermediate/wanted columns preserve mapping order") {
    val p = FeaturePlan("t", grid, Seq("key1" -> "value1", "key2" -> "value2"), 1)
    assert(p.intermediateColumns === Seq("key1", "key2"))
    assert(p.wantedColumns === Seq("value1", "value2"))
  }

  test("expected id/value columns split on the id-key names") {
    val p = FeaturePlan("t", grid,
      Seq("date" -> "date", "grid_id" -> "grid_id", "key1" -> "value1"), 1)
    assert(p.expectedIdColumns === Set("date", "grid_id"))
    assert(p.expectedValueColumns === Set("value1"))
  }

  test("availability delegates to the checker; absent checker means true") {
    assert(FeaturePlan("t", grid, Seq(), 1,
      Some(() => true)).isDataAvailable)
    assert(!FeaturePlan("t", grid, Seq(), 1,
      Some(() => false)).isDataAvailable)
    assert(FeaturePlan("t", grid, Seq(), 1, None).isDataAvailable)
  }

  // ------------------------------------------------ column-mapping rules

  private def pixels = Seq(
    // date, x, y, PM25, NO2 — two images (two rows) per site on 2023-01-01
    ("2023-01-01", 0.5, 0.5, 10.0, 100.0),
    ("2023-01-01", 0.5, 0.5, 20.0, 200.0),
    ("2023-01-01", 2.5, 0.5, 30.0, 300.0),
    ("2023-01-02", 0.5, 0.5, 40.0, 400.0),
    ("2023-01-03", 0.5, 0.5, 99.0, 999.0) // outside the requested dates
  ).toDF("date", "x", "y", "PM25", "NO2")

  test("daily average, single band: bare `mean` export") {
    val plan = planner.planDailyAverage(pixels, "ANY", Seq("PM25"),
      Seq("2023-01-01"))
    assert(plan.columnMappings ===
      Seq("date" -> "date", "grid_id" -> "grid_id", "mean" -> "PM25"))
  }

  test("daily average, multiple bands: `<band>_mean` exports") {
    val plan = planner.planDailyAverage(pixels, "ANY", Seq("NO2", "PM25"),
      Seq("2023-01-01"))
    assert(plan.columnMappings === Seq("date" -> "date",
      "grid_id" -> "grid_id", "NO2_mean" -> "NO2", "PM25_mean" -> "PM25"))
  }

  test("static feature: single and multiple band mappings") {
    val px = pixels.select("x", "y", "NO2", "PM25")
    assert(planner.planStaticFeature(px, "IMG", Seq("NO2")).columnMappings ===
      Seq("grid_id" -> "grid_id", "mean" -> "NO2"))
    assert(planner.planStaticFeature(px, "IMG", Seq("NO2", "PM25"))
      .columnMappings === Seq("grid_id" -> "grid_id",
        "NO2_mean" -> "NO2", "PM25_mean" -> "PM25"))
  }

  test("classified pixels: `<name>_mean` → name mappings") {
    val px = Seq(("2023-06-01", 0.5, 0.5, 1)).toDF("date", "x", "y", "land_cover")
    val plan = planner.planAnnualClassifiedPixels(px, "ANY", "land_cover",
      Seq("forest" -> Seq(1), "urban" -> Seq(2)), 2023)
    assert(plan.columnMappings === Seq("grid_id" -> "grid_id",
      "forest_mean" -> "forest", "urban_mean" -> "urban"))
  }

  // ----------------------------------------------------- name generation

  test("clean names: lowercase, separators dashed, parts double-underscored") {
    assert(cleanName("grid-daily-average", "ECMWF/ERA5_LAND/DAILY_AGGR",
      "2023-01") === "grid-daily-average__ecmwf-era5-land-daily-aggr__2023-01")
  }

  test("granularity: day < month < year < x, by shared prefix") {
    assert(commonGranularity(Seq("2023-01-01")) === "2023-01-01")
    assert(commonGranularity(Seq("2023-01-01", "2023-01-02")) === "2023-01")
    assert(commonGranularity(Seq("2023-01-01", "2023-02-01")) === "2023")
    assert(commonGranularity(Seq("2023-01-01", "2024-01-01")) === "x")
  }

  test("feature names assemble from kind, source, and granularity") {
    val plan = planner.planDailyAverage(pixels, "A/B_C", Seq("PM25"),
      Seq("2023-01-01", "2023-01-02"))
    assert(plan.featureName === "grid-daily-average__a-b-c__2023-01")
    assert(planner.planStaticFeature(pixels.select("x", "y", "PM25"),
      "IMG/ONE", Seq("PM25")).featureName === "single-image-grid__img-one")
  }

  // ----------------------------------------------------- value semantics

  test("daily average composites the image stack BEFORE the cell mean") {
    val plan = planner.planDailyAverage(pixels, "ANY", Seq("PM25", "NO2"),
      Seq("2023-01-01", "2023-01-02"))
    val got = plan.frame
      .select("date", "grid_id", "PM25_mean", "NO2_mean")
      .as[(String, Long, Double, Double)].collect().toSet
    // 2023-01-01 cell 0: site (0.5,0.5) composites (10+20)/2=15 — NOT the
    // row mean 20 a single-level mean would give; cell 1 holds site 30.
    assert(got === Set(
      ("2023-01-01", 0L, 15.0, 150.0),
      ("2023-01-01", 1L, 30.0, 300.0),
      ("2023-01-02", 0L, 40.0, 400.0)))
    assert(plan.expectedNRows === 4 * 2)
  }

  test("samples outside every grid cell drop (reduceRegions collects)") {
    val px = Seq(("2023-01-01", 9.5, 0.5, 1.0), ("2023-01-01", 0.5, 0.5, 2.0))
      .toDF("date", "x", "y", "v")
    val got = planner.planDailyAverage(px, "ANY", Seq("v"), Seq("2023-01-01"))
      .frame.select("grid_id", "mean").as[(Long, Double)].collect().toSet
    assert(got === Set((0L, 2.0)))
  }

  test("classified shares: remap→stack mean→cell mean, year filtered") {
    val px = Seq(
      // site (0.5,0.5): 2023 stack = classes 1, 4 → forest 1/2, urban 0
      ("2023-03-01", 0.5, 0.5, 1), ("2023-09-01", 0.5, 0.5, 4),
      // site (1.5,1.5): 2023 stack = classes 2, 2 → forest 0, urban 1
      ("2023-03-01", 1.5, 1.5, 2), ("2023-09-01", 1.5, 1.5, 2),
      // 2024 image must not leak into the 2023 summary
      ("2024-03-01", 0.5, 0.5, 2))
      .toDF("date", "x", "y", "land_cover")
    val plan = planner.planAnnualClassifiedPixels(px, "ANY", "land_cover",
      Seq("forest" -> Seq(1), "urban" -> Seq(2)), 2023)
    val got = plan.frame.select("grid_id", "forest_mean", "urban_mean")
      .as[(Long, Double, Double)].collect().toSet
    // cell 0 averages its two sites: forest (0.5+0)/2, urban (0+1)/2
    assert(got === Set((0L, 0.25, 0.5)))
    assert(plan.isDataAvailable)
    assert(!planner.planAnnualClassifiedPixels(px, "ANY", "land_cover",
      Seq("forest" -> Seq(1)), 2021).isDataAvailable)
  }

  test("grid assignment plans a broadcast hash join, not a nested loop") {
    val plan = planner.planDailyAverage(pixels, "ANY", Seq("PM25"),
      Seq("2023-01-01"))
    val physical = plan.frame.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }
}
