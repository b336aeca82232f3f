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

  // ------------------------------------------------- HDF5 container path

  private val MerraFixture = java.nio.file.Paths.get(
    "/root/reference/src/pm25ml/collectors/ned/data_reader_merra__it_assets/" +
      "M2T1NXAER.5.12.4_MERRA2_400.tavg1_2d_aer_Nx.20230101_TOTEXTTAU_subsetted.nc4")

  private lazy val merraBytes: Array[Byte] =
    java.nio.file.Files.readAllBytes(MerraFixture)

  test("HDF5: real MERRA-2 .nc4 granule matches the reference IT expectations") {
    assume(java.nio.file.Files.exists(MerraFixture), "reference fixture absent")
    // same bbox + assertions as the reference's own integration test
    // (data_reader_merra__it.py:44-65): 41×33 cells, 2023-01-01
    val day = NedGranule.extractDay(merraBytes, "TOTEXTTAU",
      bbox = Some((10.0, 30.0, 70.0, 90.0)))
    assert(day.date === "2023-01-01")
    assert(day.lats.length === 41 && day.lons.length === 33)
    assert(day.lats.head === 10.0 && day.lats.last === 30.0)
    assert(day.lons.head === 70.0 && day.lons.last === 90.0)
    // MERRA-2 grid spacing is exactly 0.5° × 0.625°
    assert(day.lats.sliding(2).forall(a => a(1) - a(0) === 0.5))
    assert(day.lons.sliding(2).forall(a => math.abs(a(1) - a(0) - 0.625) < 1e-12))
    // AOD plausibility over India in January: finite, positive, < 5
    val vals = day.values.flatten
    assert(vals.forall(v => !v.isNaN && v > 0.0 && v < 5.0))
  }

  test("HDF5: structural decode — dense attrs, chunked+shuffle+deflate data") {
    assume(java.nio.file.Files.exists(MerraFixture), "reference fixture absent")
    val f = Hdf5.read(merraBytes)
    val kids = f.children(f.rootAddr).toMap
    assert(kids.keySet === Set("lat", "lon", "time", "TOTEXTTAU"))
    // dense (fractal-heap) root attributes, incl. vlen strings via the
    // global heap
    val ra = f.rootAttributes
    assert(ra.get("Format") === Some(Hdf5.Text("NetCDF-4/HDF-5")))
    assert(ra.get("LatitudeResolution") === Some(Hdf5.Text("0.5")))
    assert(ra.get("RangeBeginningDate") === Some(Hdf5.Text("2023-01-01")))
    // the hourly time axis decodes through the chunk pipeline: minutes
    val time = f.dataset("time", kids("time"))
    assert(time.dims.toSeq === Seq(24))
    assert(time.doubles.toSeq === (0 until 24).map(_ * 60.0))
    // variable dims resolve via DIMENSION_LIST references
    val v = f.dataset("TOTEXTTAU", kids("TOTEXTTAU"))
    assert(v.dims.toSeq === Seq(24, 66, 52))
    assert(v.attrNum("_FillValue").exists(_ > 1e14))
  }

  test("HDF5: readGranules end-to-end over the real fixture") {
    assume(java.nio.file.Files.exists(MerraFixture), "reference fixture absent")
    val spark = TestSpark.spark
    val long = NedGranule.readGranules(spark, MerraFixture.toString,
      "TOTEXTTAU", bbox = Some((10.0, 30.0, 70.0, 90.0)))
    assert(long.count() === 41L * 33L)
    val r = long.where("lat = 20.0 AND lon = 80.0").collect()
    assert(r.length === 1 && r.head.getString(0) === "2023-01-01")
  }
}
