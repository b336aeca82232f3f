package graft.raster

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S19 substitute — the reference writes CF-1.8 NetCDF
  * (ref: src/pm25ml/results/netcdf_final_result_writer.py:46-153); no JVM
  * NetCDF library ships in this environment, so the engine writes the
  * documented equivalent: the dense cube as long-form parquet plus a JSON
  * sidecar carrying the CF metadata (grid mapping, units, axis order,
  * GeoTransform) so a downstream `xarray`/GDAL step can reconstruct the
  * NetCDF byte-for-byte semantics.
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

  /** Write `dir/data.parquet/` (long form: time, y, x, value float32) and
    * `dir/meta.json`.
    */
  def write(spark: SparkSession, cube: RasterPivot.RasterCube, dir: String,
            meta: CfMeta): Unit = {
    RasterPivot.toLong(spark, cube)
      .write.mode("overwrite").parquet(s"$dir/data.parquet")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dir/meta.json"), true)
    try out.write(metaJson(cube, meta).getBytes("UTF-8")) finally out.close()
  }
}
