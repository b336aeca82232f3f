package graft.raster

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S19 — the reference's terminal artifact is a CF-1.8 NetCDF file
  * (ref: src/pm25ml/results/netcdf_final_result_writer.py:46-153, via
  * h5netcdf). [[write]] emits three artifacts per run:
  *
  *   - `data.parquet/` + `meta.json` — the engine-native georeferenced
  *     pair (queryable long form; sidecar carries GeoTransform + EPSG);
  *   - `<variable>.nc` — a real CF-1.8 NetCDF file via the in-repo
  *     classic-format codec ([[NetCdf]]): time/y/x coordinate variables
  *     with CF attrs ("days since 2000-01-01", projection_x/y_coordinate),
  *     a `spatial_ref` grid-mapping variable (LCC 2SP parameters from the
  *     public EPSG registry for 7755), `_FillValue` NaN, and the GDAL-style
  *     `GeoTransform` global attribute — readable by xarray/netCDF4/GDAL.
  *
  * Documented divergence from the reference: classic NetCDF-3 has no zlib
  * chunk compression (an HDF5-container feature; no HDF5 lib ships here).
  * The cube is MBs per month, so size is immaterial.
  */
object GeoRasterWriter {

  final case class CfMeta(
      title: String,
      variable: String,
      units: String,
      crsEpsg: Int,
      // GDAL-style GeoTransform of the regular grid (x0, dx, 0, y0, 0, dy)
      geoTransform: (Double, Double, Double, Double, Double, Double))

  def metaJson(cube: RasterPivot.RasterCube, meta: CfMeta): String = {
    val gt = meta.geoTransform
    s"""{
       |  "conventions": "CF-1.8",
       |  "title": "${meta.title}",
       |  "variable": "${meta.variable}",
       |  "units": "${meta.units}",
       |  "crs_epsg": ${meta.crsEpsg},
       |  "geo_transform": [${gt._1}, ${gt._2}, ${gt._3}, ${gt._4}, ${gt._5}, ${gt._6}],
       |  "dims": {"time": ${cube.times.length}, "y": ${cube.ys.length}, "x": ${cube.xs.length}},
       |  "time_start": "${cube.times.headOption.getOrElse("")}",
       |  "time_end": "${cube.times.lastOption.getOrElse("")}",
       |  "dtype": "float32"
       |}""".stripMargin
  }

  /** Derive the GeoTransform from the cube's sorted axes (regular grid). */
  def geoTransformOf(cube: RasterPivot.RasterCube): (Double, Double, Double, Double, Double, Double) = {
    val dx = if (cube.xs.length > 1) cube.xs(1) - cube.xs(0) else 1.0
    val dy = if (cube.ys.length > 1) cube.ys(1) - cube.ys(0) else 1.0
    (cube.xs.headOption.getOrElse(0.0) - dx / 2, dx, 0.0,
      cube.ys.headOption.getOrElse(0.0) - dy / 2, 0.0, dy)
  }

  /** Write `dir/data.parquet/` (long form: time, y, x, value float32),
    * `dir/meta.json`, and `dir/<variable>.nc` (CF-1.8 NetCDF).
    */
  def write(spark: SparkSession, cube: RasterPivot.RasterCube, dir: String,
            meta: CfMeta): Unit = {
    RasterPivot.toLong(spark, cube)
      .write.mode("overwrite").parquet(s"$dir/data.parquet")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dir/meta.json"), true)
    try out.write(metaJson(cube, meta).getBytes("UTF-8")) finally out.close()
    writeNetCdf(spark, cube, s"$dir/${meta.variable}.nc", meta)
  }

  /** CF epoch used by the reference's time encoding
    * (ref: results/netcdf_final_result_writer.py:115-121).
    */
  private val CfEpoch = java.time.LocalDate.of(2000, 1, 1)

  /** Days-since-2000-01-01 for an ISO `yyyy-MM-dd[...]` time label. */
  def cfDays(time: String): Int = {
    val d = java.time.LocalDate.parse(time.take(10))
    java.time.temporal.ChronoUnit.DAYS.between(CfEpoch, d).toInt
  }

  /** CF grid-mapping attributes for the CRS. EPSG:7755 (the reference's
    * grid CRS) expands to its Lambert Conformal Conic 2SP parameters from
    * the public EPSG registry — what `pyproj.CRS.to_cf()` emits in the
    * reference (ref: results/netcdf_final_result_writer.py:137-142); other
    * codes carry the EPSG id only (no projection database ships here).
    */
  def cfGridMapping(epsg: Int): Seq[NetCdf.Attr] = {
    val base = Seq(
      NetCdf.Attr("epsg_code", NetCdf.Text(s"EPSG:$epsg")),
      NetCdf.Attr("crs_epsg", NetCdf.Ints(Array(epsg))))
    if (epsg == 7755) base ++ Seq(
      NetCdf.Attr("grid_mapping_name", NetCdf.Text("lambert_conformal_conic")),
      NetCdf.Attr("standard_parallel",
        NetCdf.Doubles(Array(12.472955, 35.17280444444444))),
      NetCdf.Attr("longitude_of_central_meridian", NetCdf.Doubles(Array(80.0))),
      NetCdf.Attr("latitude_of_projection_origin", NetCdf.Doubles(Array(24.0))),
      NetCdf.Attr("false_easting", NetCdf.Doubles(Array(4000000.0))),
      NetCdf.Attr("false_northing", NetCdf.Doubles(Array(4000000.0))),
      NetCdf.Attr("semi_major_axis", NetCdf.Doubles(Array(6378137.0))),
      NetCdf.Attr("inverse_flattening", NetCdf.Doubles(Array(298.257223563))))
    else base
  }

  /** Assemble the CF-1.8 in-memory file for a cube — separated from the
    * write so specs can assert structure without touching disk.
    */
  def toNetCdf(cube: RasterPivot.RasterCube, meta: CfMeta): NetCdf.File = {
    import NetCdf._
    val gt = meta.geoTransform
    val nT = cube.times.length; val nY = cube.ys.length; val nX = cube.xs.length
    val flat = new Array[Float](nT * nY * nX)
    var i = 0
    var t = 0
    while (t < nT) {
      var y = 0
      while (y < nY) {
        System.arraycopy(cube.values(t)(y), 0, flat, i, nX); i += nX; y += 1
      }
      t += 1
    }
    File(
      dims = Seq(Dim("time", nT), Dim("y", nY), Dim("x", nX)),
      gatts = Seq(
        Attr("Conventions", Text("CF-1.8")),
        Attr("title", Text(meta.title)),
        Attr("GeoTransform",
          Text(s"${gt._1} ${gt._2} ${gt._3} ${gt._4} ${gt._5} ${gt._6}"))),
      vars = Seq(
        Var("time", Seq(0), Seq(
          Attr("standard_name", Text("time")),
          Attr("axis", Text("T")),
          Attr("units", Text("days since 2000-01-01 00:00:00")),
          Attr("calendar", Text("gregorian"))),
          Ints(cube.times.map(cfDays))),
        Var("y", Seq(1), Seq(
          Attr("standard_name", Text("projection_y_coordinate")),
          Attr("long_name", Text("Northing")),
          Attr("units", Text("m")),
          Attr("axis", Text("Y"))),
          Doubles(cube.ys)),
        Var("x", Seq(2), Seq(
          Attr("standard_name", Text("projection_x_coordinate")),
          Attr("long_name", Text("Easting")),
          Attr("units", Text("m")),
          Attr("axis", Text("X"))),
          Doubles(cube.xs)),
        Var("spatial_ref", Seq.empty, cfGridMapping(meta.crsEpsg),
          Ints(Array(0))),
        Var(meta.variable, Seq(0, 1, 2), Seq(
          Attr("units", Text(meta.units)),
          Attr("long_name", Text(meta.title)),
          Attr("grid_mapping", Text("spatial_ref")),
          Attr("coordinates", Text("time y x")),
          Attr("_FillValue", Floats(Array(Float.NaN)))),
          Floats(flat))))
  }

  /** Write the cube as a CF-1.8 classic NetCDF file. Mirrors the
    * reference's temp-file-then-upload shape (the codec needs a local
    * seekable target; the destination may be any Hadoop FS —
    * ref: results/netcdf_final_result_writer.py:84-112).
    */
  def writeNetCdf(spark: SparkSession, cube: RasterPivot.RasterCube,
                  path: String, meta: CfMeta): Unit = {
    val tmp = java.nio.file.Files.createTempFile("graft_netcdf_", ".nc")
    try {
      NetCdf.write(toNetCdf(cube, meta), tmp.toString)
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.copyFromLocalFile(true, true, new Path(tmp.toString), new Path(path))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
