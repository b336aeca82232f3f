package graft.ingest

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Contracts
import graft.core.{Contracts => C}
import graft.core.HivePath
import graft.ingest.Connectors.NedDatasetDescriptor
import graft.queries.SourcePack

/** S15–S17 composition — the full NED export with an injected (local-file)
  * retriever: gate → executor-side granule decode → regrid → scaffold →
  * contract validation.
  */
class NedExportPipelineSpec extends AnyFunSuite {

  private def descriptor(days: Int) = NedDatasetDescriptor(
    "M2T1NXAER", "5.12.4",
    LocalDate.parse("2023-07-01"),
    LocalDate.parse("2023-07-01").plusDays(days - 1L),
    // W,S,E,N around the merraFixture's lats 10..50 / lons 70..75
    (69.0, 5.0, 76.0, 55.0),
    Map("AOD" -> "merra_aod"))

  test("upload path: gate, decode, regrid, scaffold, validate — end to end") {
    val spark = TestSpark.spark
    val tmp = java.nio.file.Files.createTempDirectory("ned-e2e")
    val p = SourcePack.merraFixture(tmp)
    val grid = spark.createDataFrame(Seq(
      (1L, 15.0, 71.5), (2L, 25.0, 73.5), (3L, 45.0, 74.5)))
      .toDF("grid_id", "lat", "lon")

    val pipe = new NedExportPipeline(
      grid, descriptor(days = 1),
      streamGranules = _ => Seq(p),
      readLong = (s, paths) =>
        NedGranule.readGranules(s, paths.mkString(","), "AOD"),
      nGrids = 3L)

    val out = pipe.readValidated(spark, "2023-07")
    val rows = out.collect()
    assert(rows.length === 3) // 3 grids × 1 day, scaffold-complete
    assert(out.columns.toSeq === Seq("grid_id", "date", "merra_aod"))
    assert(rows.forall(_.getString(1) == "2023-07-01"))
    // interior points interpolate to finite values
    assert(rows.count(r => !r.isNullAt(2) && !r.getFloat(2).isNaN) >= 2)
  }

  test("scaffold fills the full descriptor range even for days with no granule") {
    val spark = TestSpark.spark
    val tmp = java.nio.file.Files.createTempDirectory("ned-scaffold")
    val p = SourcePack.merraFixture(tmp)
    val grid = spark.createDataFrame(Seq((1L, 15.0, 71.5), (2L, 25.0, 73.5)))
      .toDF("grid_id", "lat", "lon")
    // 2-day range, 1 granule: the gate tolerates days-1, the scaffold
    // still emits rows (null value) for the uncovered day
    val pipe = new NedExportPipeline(
      grid, descriptor(days = 2),
      streamGranules = _ => Seq(p),
      readLong = (s, paths) =>
        NedGranule.readGranules(s, paths.mkString(","), "AOD"),
      nGrids = 2L)
    val out = pipe.readValidated(spark, "2023-07")
    assert(out.count() === 4) // 2 grids × 2 days
    val uncovered = out.where("date = '2023-07-02'").collect()
    assert(uncovered.length === 2)
    assert(uncovered.forall(_.isNullAt(2)))
  }

  test("granule gate rejects an empty or over-full retriever delivery") {
    val spark = TestSpark.spark
    val grid = spark.createDataFrame(Seq((1L, 15.0, 71.5)))
      .toDF("grid_id", "lat", "lon")
    def pipeWith(paths: Seq[String]) = new NedExportPipeline(
      grid, descriptor(days = 1),
      streamGranules = _ => paths,
      readLong = (_, _) => fail("reader must not run when the gate rejects"),
      nGrids = 1L)
    intercept[IllegalStateException] { pipeWith(Nil).read(spark, "p") }
    intercept[IllegalStateException] {
      pipeWith(Seq("a.nc4", "b.nc4")).read(spark, "p")
    }
  }

  test("declared config matches the scaffolded output shape") {
    val spark = TestSpark.spark
    val d = descriptor(days = 31)
    val pipe = new NedExportPipeline(
      spark.emptyDataFrame, d, _ => Nil, (_, _) => spark.emptyDataFrame,
      nGrids = 33074L)
    val cfg = pipe.config("2023-07")
    assert(cfg.expectedRows === 33074L * 31)
    assert(cfg.idColumns === Set("grid_id", "date"))
    assert(cfg.valueColumnTypes === Map("merra_aod" -> C.FloatValue))
  }

  // ---------------------------------------------------- fleet preflight

  private val countries = Map("india" -> 33074L)

  private def cfg(rows: Long, ids: Set[String]) = Contracts.PipelineConfig(
    "d", ids, Map("v" -> C.FloatValue), rows)

  test("preflight passes a well-formed monthly + static fleet") {
    val fleet = Seq(
      HivePath.parse("dataset=gee_modis/country=india/month=2023-07") ->
        cfg(33074L * 31, Set("date", "grid_id")),
      HivePath.parse("dataset=srtm_elevation/country=india") ->
        cfg(33074L, Set("grid_id")))
    assert(Contracts.preflight(fleet, countries) === Nil)
  }

  test("preflight rejects missing keys, bad countries, and shape mismatches") {
    def one(p: String, c: Contracts.PipelineConfig) =
      Contracts.preflight(Seq(HivePath.parse(p) -> c), countries)
    assert(one("country=india/month=2023-07", cfg(33074L * 31, Set("date", "grid_id")))
      .exists(_.msg.contains("dataset")))
    assert(one("dataset=x/month=2023-07", cfg(33074L * 31, Set("date", "grid_id")))
      .exists(_.msg.contains("country")))
    assert(one("dataset=x/country=narnia", cfg(33074L, Set("grid_id")))
      .exists(_.msg.contains("invalid country")))
    assert(one("dataset=x/country=india/month=2023-02", cfg(33074L * 31, Set("date", "grid_id")))
      .exists(_.msg.contains("rows")))
    assert(one("dataset=x/country=india", cfg(33074L, Set("date", "grid_id")))
      .exists(_.msg.contains("id columns")))
  }

  test("preflight rejects duplicate result subpaths") {
    val p = HivePath.parse("dataset=x/country=india")
    val violations = Contracts.preflight(
      Seq(p -> cfg(33074L, Set("grid_id")), p -> cfg(33074L, Set("grid_id"))),
      countries)
    assert(violations.exists(_.msg.contains("duplicate result subpath")))
  }
}
