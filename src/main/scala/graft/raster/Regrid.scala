package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K2 — regrid a coarse regular (lat, lon) raster onto scattered target
  * points (the 33k grid centroids) by bilinear or nearest interpolation
  * (ref: src/pm25ml/collectors/ned/ned_export_pipeline.py:273-297,
  * xarray.interp; method per dataset descriptor).
  *
  * The raster arrives as a long DataFrame (lat, lon, value) on a regular
  * axis-aligned grid; it is broadcast to the executors as sorted axis
  * arrays + a dense value matrix, and the interpolation itself is a
  * partition-local computation over the (big) target side — no shuffle.
  */
object Regrid {

  final case class Raster(lats: Array[Double], lons: Array[Double],
                          values: Array[Array[Double]]) extends Serializable {
    private def bracket(axis: Array[Double], v: Double): (Int, Int, Double) = {
      // index of the cell [i, i+1] containing v, clamped to the edges,
      // plus the interpolation weight toward i+1
      if (v <= axis.head) (0, 0, 0.0)
      else if (v >= axis.last) (axis.length - 1, axis.length - 1, 0.0)
      else {
        var lo = 0
        var hi = axis.length - 1
        while (hi - lo > 1) {
          val mid = (lo + hi) / 2
          if (axis(mid) <= v) lo = mid else hi = mid
        }
        (lo, lo + 1, (v - axis(lo)) / (axis(lo + 1) - axis(lo)))
      }
    }

    def bilinear(lat: Double, lon: Double): Double = {
      val (i0, i1, wi) = bracket(lats, lat)
      val (j0, j1, wj) = bracket(lons, lon)
      val v00 = values(i0)(j0); val v01 = values(i0)(j1)
      val v10 = values(i1)(j0); val v11 = values(i1)(j1)
      val top = v00 * (1 - wj) + v01 * wj
      val bot = v10 * (1 - wj) + v11 * wj
      top * (1 - wi) + bot * wi
    }

    def nearestValue(lat: Double, lon: Double): Double = {
      val (i0, i1, wi) = bracket(lats, lat)
      val (j0, j1, wj) = bracket(lons, lon)
      val i = if (wi <= 0.5) i0 else i1
      val j = if (wj <= 0.5) j0 else j1
      values(i)(j)
    }
  }

  /** Collect a long (lat, lon, value) frame into a dense broadcastable
    * raster. The raster is ingest-sized (a few MB) — collecting it is the
    * point: it then rides the broadcast to every executor.
    */
  def toRaster(long: DataFrame, latCol: String = "lat", lonCol: String = "lon",
               valueCol: String = "value"): Raster = {
    val rows = long.select(col(latCol).cast("double"), col(lonCol).cast("double"),
      col(valueCol).cast("double")).collect()
    val lats = rows.map(_.getDouble(0)).distinct.sorted
    val lons = rows.map(_.getDouble(1)).distinct.sorted
    val li = lats.zipWithIndex.toMap
    val lj = lons.zipWithIndex.toMap
    val m = Array.fill(lats.length, lons.length)(Double.NaN)
    rows.foreach(r => m(li(r.getDouble(0)))(lj(r.getDouble(1))) = r.getDouble(2))
    Raster(lats, lons, m)
  }

  /** Interpolate raster values at each target row's (lat, lon). Runs as a
    * deterministic UDF over the broadcast raster — map-side only.
    */
  def interpolateAt(targets: DataFrame, raster: Raster, method: String,
                    latCol: String = "lat", lonCol: String = "lon",
                    outCol: String = "value"): DataFrame = {
    val spark = targets.sparkSession
    val bc = spark.sparkContext.broadcast(raster)
    val fn = method match {
      case "linear" => udf((lat: Double, lon: Double) => bc.value.bilinear(lat, lon))
      case "nearest" => udf((lat: Double, lon: Double) => bc.value.nearestValue(lat, lon))
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
    targets.withColumn(outCol, fn(col(latCol).cast("double"), col(lonCol).cast("double")))
  }
}
