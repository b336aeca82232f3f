package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.raster.NetCdf
import graft.raster.NetCdf._

/** S11 — granule extraction semantics against synthetic classic-NetCDF
  * files (ref: collectors/ned/data_reader_merra.py:26-110).
  */
class NedGranuleSpec extends AnyFunSuite {

  private val Fill = 1.0e15f

  /** MERRA-shaped granule: time×lat×lon (optionally ×lev), CF-packed. */
  private def granule(date: String = "2023-06-15", withLev: Boolean = false):
      NetCdf.File = {
    val nT = 2; val nLev = if (withLev) 2 else 1
    val lats = Array(10.0, 20.0, 30.0)
    val lons = Array(70.0, 72.0, 74.0, 76.0)
    // raw(t, [lev,] i, j) = t*100 + i*10 + j at lev 0; +1000 at lev 1;
    // cell (0,0) is fill at t=1, cell (2,3) fill at both times
    val data = for {
      t <- 0 until nT; l <- 0 until nLev; i <- 0 until 3; j <- 0 until 4
    } yield {
      if (i == 0 && j == 0 && t == 1) Fill
      else if (i == 2 && j == 3) Fill
      else (t * 100 + l * 1000 + i * 10 + j).toFloat
    }
    val varDims = if (withLev) Seq(0, 1, 2, 3) else Seq(0, 2, 3)
    val dims = Seq(Dim("time", nT), Dim("lev", nLev),
      Dim("lat", 3), Dim("lon", 4))
    File(
      dims = dims,
      gatts = Seq(Attr("RangeBeginningDate", Text(date))),
      vars = Seq(
        Var("lat", Seq(2), Seq.empty, Doubles(lats)),
        Var("lon", Seq(3), Seq.empty, Doubles(lons)),
        Var("T2M", varDims, Seq(
          Attr("_FillValue", Floats(Array(Fill))),
          Attr("scale_factor", Doubles(Array(0.5))),
          Attr("add_offset", Doubles(Array(10.0)))),
          Floats(data.toArray))))
  }

  private def bytesOf(f: NetCdf.File): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempFile("granule", ".nc")
    try {
      NetCdf.write(f, tmp.toString)
      java.nio.file.Files.readAllBytes(tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("time mean with CF unpacking and fill skipping") {
    val day = NedGranule.extractDay(bytesOf(granule()), "T2M")
    assert(day.date === "2023-06-15")
    assert(day.lats.toSeq === Seq(10.0, 20.0, 30.0))
    assert(day.lons.toSeq === Seq(70.0, 72.0, 74.0, 76.0))
    // cell (1,2): raw {12, 112} → unpacked {16, 66} → mean 41
    assert(math.abs(day.values(1)(2) - 41.0) < 1e-12)
    // cell (0,0): t=1 is fill → mean of single unpacked value 0*0.5+10
    assert(math.abs(day.values(0)(0) - 10.0) < 1e-12)
    // cell (2,3): all fill → NaN
    assert(day.values(2)(3).isNaN)
  }

  test("bbox subset is inclusive on both axes") {
    val day = NedGranule.extractDay(bytesOf(granule()), "T2M",
      bbox = Some((10.0, 20.0, 72.0, 74.0)))
    assert(day.lats.toSeq === Seq(10.0, 20.0))
    assert(day.lons.toSeq === Seq(72.0, 74.0))
    // unsubset cell (1,2) is now (1,1)
    assert(math.abs(day.values(1)(1) - 41.0) < 1e-12)
  }

  test("lev handling mirrors the reference's three cases") {
    val withLev = bytesOf(granule(withLev = true))
    val noLev = bytesOf(granule())
    // lev present + no selector → error
    assertThrows[IllegalArgumentException] {
      NedGranule.extractDay(withLev, "T2M")
    }
    // selector + no lev dim → error
    assertThrows[IllegalArgumentException] {
      NedGranule.extractDay(noLev, "T2M", level = Some(0))
    }
    // isel(lev=1): +1000 raw → +500 unpacked vs lev 0
    val l0 = NedGranule.extractDay(withLev, "T2M", level = Some(0))
    val l1 = NedGranule.extractDay(withLev, "T2M", level = Some(1))
    assert(math.abs((l1.values(1)(2) - l0.values(1)(2)) - 500.0) < 1e-9)
  }

  test("missing RangeBeginningDate raises") {
    val f = granule()
    val stripped = f.copy(gatts = Seq.empty)
    assertThrows[IllegalArgumentException] {
      NedGranule.extractDay(bytesOf(stripped), "T2M")
    }
  }

  test("readGranules parses per-file on executors into long rows") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("granules")
    NetCdf.write(granule("2023-06-15"), s"$dir/day1.nc")
    NetCdf.write(granule("2023-06-16"), s"$dir/day2.nc")
    val long = NedGranule.readGranules(spark, s"$dir/*.nc", "T2M")
    val rows = long.collect()
    // 12 cells − 1 all-fill = 11 per granule × 2 granules
    assert(rows.length === 22)
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq ===
      Seq("2023-06-15", "2023-06-16"))
    val cell = long.where("date = '2023-06-15' AND lat = 20.0 AND lon = 74.0")
      .select("value").collect()
    assert(math.abs(cell.head.getDouble(0) - 41.0) < 1e-12)
    // composes with the adapter: regrid the day rasters onto grid points
    val grid = spark.createDataFrame(Seq((1L, 15.0, 71.0), (2L, 25.0, 75.0)))
      .toDF("grid_id", "lat", "lon")
    val archived = NedAdapter.toArchive(long, grid, "t2m", method = "linear")
    assert(archived.count() === 4) // 2 grids × 2 days
  }
}
