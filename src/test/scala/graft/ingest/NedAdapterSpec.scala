package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NedAdapterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ned adapter: daily mean, bbox, regrid to centroids, archive shape") {
    // coarse 3×3 raster of v = lat + 2·lon with two sub-daily samples that
    // average to the plane, plus one out-of-bbox row
    val rows = for {
      lat <- Seq(0.0, 10.0, 20.0); lon <- Seq(0.0, 10.0, 20.0)
      delta <- Seq(-1.0, 1.0)
    } yield ("2023-01-01", lat, lon, lat + 2 * lon + delta)
    val long = (rows :+ (("2023-01-01", 99.0, 99.0, 1e9)))
      .toDF("date", "lat", "lon", "value")

    val grid = Seq((1L, 5.0, 5.0), (2L, 12.5, 7.5))
      .toDF("grid_id", "lat", "lon")

    val out = NedAdapter.toArchive(long, grid, "aot",
      method = "linear", bbox = Some((0.0, 20.0, 0.0, 20.0)))
    assert(out.columns.toSeq === Seq("grid_id", "date", "aot"))
    val byGrid = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(byGrid(1L) - (5 + 2 * 5)) < 1e-9)
    assert(math.abs(byGrid(2L) - (12.5 + 2 * 7.5)) < 1e-9)
  }

  test("grid assets: enrichment joins and coordinate normalization") {
    val grid = Seq((1L, 28.6, 77.2, 1000000.4, 2000000.6))
      .toDF("grid_id", "lat", "lon", "original_x", "original_y")
    val m50 = Seq((1L, 42L)).toDF("grid_id", "id_50km")
    val regions = Seq((1L, 3L)).toDF("grid_id", "k_region")
    val out = GridAssets.normalizeOriginalCoords(
      GridAssets.enrich(grid, m50, regions)).head()
    assert(out.getAs[Long]("id_50km") === 42L)
    assert(out.getAs[Long]("k_region") === 3L)
    assert(out.getAs[Double]("original_x") === 1000000.0)
    assert(out.getAs[Double]("original_y") === 2000001.0)
  }
}
