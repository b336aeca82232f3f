package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S19 — the classic-NetCDF codec and the CF-1.8 terminal artifact
  * (ref: src/pm25ml/results/netcdf_final_result_writer.py:46-153).
  * No independent NetCDF reader ships in this environment, so correctness
  * rests on (a) a hand-computed byte-level golden of the on-disk layout
  * against the Unidata "NetCDF Classic Format Specification", and (b)
  * write→read round trips over every supported type.
  */
class NetCdfSpec extends AnyFunSuite {
  import NetCdf._

  test("minimal file matches the hand-computed classic-format bytes") {
    val f = File(
      dims = Seq(Dim("t", 2)),
      gatts = Seq.empty,
      vars = Seq(Var("v", Seq(0), Seq.empty, Floats(Array(1.5f, -2.5f)))))
    val tmp = java.nio.file.Files.createTempFile("nc_golden", ".nc")
    try {
      write(f, tmp.toString)
      val b = java.nio.file.Files.readAllBytes(tmp)
      // Offsets per the NetCDF Classic Format Specification (CDF-2):
      // magic "CDF\x02", numrecs, dim list, absent gatt list, var list.
      def i32(off: Int): Int =
        java.nio.ByteBuffer.wrap(b, off, 4).getInt
      def i64(off: Int): Long =
        java.nio.ByteBuffer.wrap(b, off, 8).getLong
      assert(b(0) == 'C' && b(1) == 'D' && b(2) == 'F' && b(3) == 2)
      assert(i32(4) == 0)            // numrecs
      assert(i32(8) == 0x0a)         // NC_DIMENSION
      assert(i32(12) == 1)           // ndims
      assert(i32(16) == 1)           // name len
      assert(b(20) == 't' && b(21) == 0 && b(22) == 0 && b(23) == 0)
      assert(i32(24) == 2)           // dim length
      assert(i32(28) == 0 && i32(32) == 0) // absent gatt list
      assert(i32(36) == 0x0b)        // NC_VARIABLE
      assert(i32(40) == 1)           // nvars
      assert(i32(44) == 1)           // var name len
      assert(b(48) == 'v')
      assert(i32(52) == 1)           // ndims of var
      assert(i32(56) == 0)           // dimid
      assert(i32(60) == 0 && i32(64) == 0) // absent var atts
      assert(i32(68) == NcFloat)
      assert(i32(72) == 8)           // vsize
      assert(i64(76) == 84L)         // begin == header size
      assert(b.length == 92)
      assert(i32(84) == java.lang.Float.floatToIntBits(1.5f))
      assert(i32(88) == java.lang.Float.floatToIntBits(-2.5f))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("write→read round trip preserves dims, attrs, and data of all types") {
    val f = File(
      dims = Seq(Dim("time", 2), Dim("y", 3), Dim("x", 4)),
      gatts = Seq(
        Attr("Conventions", Text("CF-1.8")),
        Attr("ints", Ints(Array(7, -9))),
        Attr("doubles", Doubles(Array(1.25, -0.5)))),
      vars = Seq(
        Var("time", Seq(0), Seq(Attr("axis", Text("T"))), Ints(Array(10, 11))),
        Var("scalar", Seq.empty, Seq.empty, Ints(Array(0))),
        Var("grid", Seq(0, 1, 2), Seq(Attr("f", Floats(Array(0.5f)))),
          Floats(Array.tabulate(24)(i => i * 0.25f)))))
    val tmp = java.nio.file.Files.createTempFile("nc_rt", ".nc")
    try {
      write(f, tmp.toString)
      val r = read(tmp.toString)
      assert(r.dims == f.dims)
      assert(r.gatts.map(_.name) == f.gatts.map(_.name))
      assert(r.gatts.collect { case Attr("ints", Ints(a)) => a.toSeq } ==
        Seq(Seq(7, -9)))
      assert(r.variable("time").attrs == f.variable("time").attrs)
      assert(r.variable("scalar").data == Ints(Array(0)) ||
        r.variable("scalar").data.asInstanceOf[Ints].a.toSeq == Seq(0))
      val grid = r.variable("grid").data.asInstanceOf[Floats].a
      assert(grid.toSeq == Array.tabulate(24)(i => i * 0.25f).toSeq)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("cfDays matches the reference's days-since-2000 time encoding") {
    assert(GeoRasterWriter.cfDays("2000-01-01") == 0)
    assert(GeoRasterWriter.cfDays("2000-01-02") == 1)
    assert(GeoRasterWriter.cfDays("2000-03-01") == 60) // 2000 is a leap year
    assert(GeoRasterWriter.cfDays("2024-01-15") ==
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2000, 1, 1),
        java.time.LocalDate.of(2024, 1, 15)).toInt)
  }

  test("toNetCdf assembles the CF-1.8 structure the reference writes") {
    val cube = RasterPivot.RasterCube(
      times = Array("2024-01-01", "2024-01-02"),
      ys = Array(100.0, 200.0, 300.0),
      xs = Array(10.0, 20.0),
      values = Array.tabulate(2, 3, 2)((t, y, x) => (t * 100 + y * 10 + x).toFloat))
    val meta = GeoRasterWriter.CfMeta("daily PM2.5 estimate", "pm25", "ug m-3",
      7755, GeoRasterWriter.geoTransformOf(cube))
    val f = GeoRasterWriter.toNetCdf(cube, meta)
    assert(f.gatts.collectFirst { case Attr("Conventions", Text(s)) => s } ==
      Some("CF-1.8"))
    assert(f.gatts.exists(_.name == "GeoTransform"))
    val time = f.variable("time")
    assert(time.data.asInstanceOf[Ints].a.toSeq ==
      Seq(GeoRasterWriter.cfDays("2024-01-01"), GeoRasterWriter.cfDays("2024-01-02")))
    assert(f.attr(time, "units") ==
      Some(Text("days since 2000-01-01 00:00:00")))
    val pm = f.variable("pm25")
    assert(pm.dims == Seq(0, 1, 2))
    assert(f.attr(pm, "grid_mapping") == Some(Text("spatial_ref")))
    assert(f.attr(pm, "_FillValue").exists {
      case Floats(a) => a.length == 1 && a(0).isNaN
      case _ => false
    })
    // Flatten order is row-major (time, y, x) — value at (t, y, x) lands at
    // t*nY*nX + y*nX + x.
    val flat = pm.data.asInstanceOf[Floats].a
    assert(flat(1 * 6 + 2 * 2 + 1) == cube.values(1)(2)(1))
    // EPSG:7755 expands to its public-registry LCC 2SP parameters.
    val sr = f.variable("spatial_ref")
    assert(f.attr(sr, "grid_mapping_name") ==
      Some(Text("lambert_conformal_conic")))
    assert(f.attr(sr, "false_easting") == Some(Doubles(Array(4000000.0))) ||
      f.attr(sr, "false_easting").exists {
        case Doubles(a) => a.toSeq == Seq(4000000.0); case _ => false
      })
    // Unknown CRS degrades to the EPSG id only.
    assert(!GeoRasterWriter.toNetCdf(cube, meta.copy(crsEpsg = 4326))
      .variable("spatial_ref").attrs.exists(_.name == "grid_mapping_name"))
  }

  test("writeNetCdf lands the artifact through the Hadoop FS path") {
    val spark = TestSpark.spark
    val cube = RasterPivot.RasterCube(
      times = Array("2024-02-10"),
      ys = Array(1.0, 2.0),
      xs = Array(5.0),
      values = Array(Array(Array(3.5f), Array(Float.NaN))))
    val dir = java.nio.file.Files.createTempDirectory("nc_fs").toString
    val meta = GeoRasterWriter.CfMeta("t", "pm25", "ug m-3", 7755,
      GeoRasterWriter.geoTransformOf(cube))
    GeoRasterWriter.writeNetCdf(spark, cube, s"$dir/out.nc", meta)
    val r = read(s"$dir/out.nc")
    assert(r.dim("time").length == 1 && r.dim("y").length == 2)
    val vals = r.variable("pm25").data.asInstanceOf[Floats].a
    assert(vals(0) == 3.5f && vals(1).isNaN)
  }
}
