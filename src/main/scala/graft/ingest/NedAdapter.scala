package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.raster.Regrid

/** S11/S12/K2 — adapter for NASA EarthData science files (MERRA-2 NetCDF,
  * OMI HDF-EOS). The binary readers themselves are format shims outside
  * the engine (no NetCDF/HDF library ships here; the reference uses
  * h5netcdf — ref: collectors/ned/data_readers.py:14-32,
  * data_reader_merra.py:26-98): they deliver long-form rows
  * `(date, lat, lon, value)`. This adapter implements everything from
  * there, matching the reference's semantics:
  *
  *  - per-day mean over the time dimension (MERRA hourly → daily,
  *    `mean(dim="time")` — ref: data_reader_merra.py:85-98);
  *  - bbox subset (ref: data_reader_omno2d.py:116-159);
  *  - K2 regrid of each day's raster onto the grid centroids
  *    (bilinear or nearest per dataset descriptor);
  *  - archive shape `(grid_id, date, value)`.
  */
object NedAdapter {

  /** Average duplicate (date, lat, lon) samples — the "mean over time
    * within day" step when the source is sub-daily.
    */
  def dailyMean(long: DataFrame): DataFrame =
    long.groupBy("date", "lat", "lon")
      .agg(avg("value").as("value"))

  /** Inclusive bounding-box subset. */
  def bboxSubset(long: DataFrame, latMin: Double, latMax: Double,
                 lonMin: Double, lonMax: Double): DataFrame =
    long.filter(col("lat").between(latMin, latMax) &&
                col("lon").between(lonMin, lonMax))

  /** Regrid each date's coarse raster onto the grid centroids. The whole
    * long frame is ingest-sized (a coarse satellite grid × days), so it is
    * collected ONCE and partitioned into per-date rasters driver-side —
    * one Spark job, not one scan per date. ALL per-date rasters then ride
    * a single broadcast map and one (grid × dates) plan interpolates by
    * the row's date — constant plan size however many dates the archive
    * holds (a per-date union would be thousands of plan branches and
    * broadcasts at the reference's ~2,500-day span), while the (big) grid
    * side stays distributed.
    */
  def regridDaily(long: DataFrame, grid: DataFrame, valueName: String,
                  method: String): DataFrame = {
    val spark = long.sparkSession
    val rows = long.select(col("date").cast("string"), col("lat").cast("double"),
      col("lon").cast("double"), col("value").cast("double")).collect()
    val rasters: Map[String, Regrid.Raster] =
      rows.groupBy(_.getString(0)).map { case (d, dayRows) =>
        val lats = dayRows.map(_.getDouble(1)).distinct.sorted
        val lons = dayRows.map(_.getDouble(2)).distinct.sorted
        val li = lats.zipWithIndex.toMap
        val lj = lons.zipWithIndex.toMap
        val m = Array.fill(lats.length, lons.length)(Double.NaN)
        dayRows.foreach(r => m(li(r.getDouble(1)))(lj(r.getDouble(2))) = r.getDouble(3))
        d -> Regrid.Raster(lats, lons, m)
      }
    val bc = spark.sparkContext.broadcast(rasters)
    val interp = method match {
      case "linear" =>
        udf((d: String, lat: Double, lon: Double) => bc.value(d).bilinear(lat, lon))
      case "nearest" =>
        udf((d: String, lat: Double, lon: Double) => bc.value(d).nearestValue(lat, lon))
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
    val dates = spark.createDataFrame(
      spark.sparkContext.parallelize(rasters.keys.toSeq.sorted.map(Tuple1(_))))
      .toDF("date")
    grid.select(col("grid_id"), col("lat").cast("double").as("lat"),
        col("lon").cast("double").as("lon"))
      .crossJoin(broadcast(dates))
      .withColumn(valueName, interp(col("date"), col("lat"), col("lon")))
      .select("grid_id", "date", valueName)
  }

  /** Full adapter: sub-daily long rows → daily archive frame. */
  def toArchive(long: DataFrame, grid: DataFrame, valueName: String,
                method: String = "linear",
                bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val subset = bbox.fold(long) { case (a, b, c, d) => bboxSubset(long, a, b, c, d) }
    regridDaily(dailyMean(subset), grid, valueName, method)
  }
}
