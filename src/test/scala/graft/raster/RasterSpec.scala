package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RasterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // coarse 3x3 raster of the plane v = lat + 2*lon
  private def rasterDf = (for {
    lat <- Seq(0.0, 10.0, 20.0)
    lon <- Seq(0.0, 10.0, 20.0)
  } yield (lat, lon, lat + 2 * lon)).toDF("lat", "lon", "value")

  test("bilinear regrid is exact on a bilinear field") {
    val raster = Regrid.toRaster(rasterDf)
    val targets = Seq((1L, 5.0, 5.0), (2L, 12.5, 7.5), (3L, 0.0, 20.0))
      .toDF("grid_id", "lat", "lon")
    val got = Regrid.interpolateAt(targets, raster, "linear")
      .select("grid_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - (5 + 2 * 5)) < 1e-9)
    assert(math.abs(got(2L) - (12.5 + 2 * 7.5)) < 1e-9)
    assert(math.abs(got(3L) - (0 + 2 * 20)) < 1e-9) // grid node exact
  }

  test("regrid clamps outside the raster extent (xarray edge behavior)") {
    val raster = Regrid.toRaster(rasterDf)
    val targets = Seq((1L, -5.0, 5.0), (2L, 25.0, 25.0)).toDF("grid_id", "lat", "lon")
    val got = Regrid.interpolateAt(targets, raster, "linear")
      .select("grid_id", "value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0 + 2 * 5.0) // clamped to lat=0 row
    assert(got(2L) === 20 + 2 * 20.0) // clamped to the far corner
  }

  test("nearest regrid snaps to the closest node") {
    val raster = Regrid.toRaster(rasterDf)
    val targets = Seq((1L, 4.0, 4.0), (2L, 6.0, 16.0)).toDF("grid_id", "lat", "lon")
    val got = Regrid.interpolateAt(targets, raster, "nearest")
      .select("grid_id", "value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0 + 2 * 0.0)   // nearest node (0,0)
    assert(got(2L) === 10.0 + 2 * 20.0) // nearest node (10,20)
  }

  test("raster pivot: long → cube → long round trip") {
    val long = Seq(
      ("2023-01-01", 0.0, 0.0, 1.0f), ("2023-01-01", 0.0, 1.0, 2.0f),
      ("2023-01-01", 1.0, 0.0, 3.0f), ("2023-01-01", 1.0, 1.0, 4.0f),
      ("2023-01-02", 0.0, 0.0, 5.0f), ("2023-01-02", 0.0, 1.0, 6.0f),
      ("2023-01-02", 1.0, 0.0, 7.0f) // one missing cell → NaN
    ).toDF("time", "y", "x", "value")
    val cube = RasterPivot.toCube(long, "time", "y", "x", "value")
    assert(cube.times.toSeq === Seq("2023-01-01", "2023-01-02"))
    assert(cube.values(0)(1)(1) === 4.0f)
    assert(cube.values(1)(1)(1).isNaN)
    val back = RasterPivot.toLong(spark, cube)
    assert(back.count() === 8)
    assert(back.filter(isnan(col("value"))).count() === 1)
  }
}
