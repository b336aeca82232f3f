package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.raster.NetCdf

/** S11 — file-based reader for NED science granules in classic NetCDF
  * (ref: collectors/ned/data_reader_merra.py:26-110; the reference opens
  * HDF5-container NetCDF-4 via h5netcdf — no HDF5 library ships here, so
  * this path covers the classic (CDF-1/2) container via the in-repo
  * [[graft.raster.NetCdf]] codec; HDF5 granules remain the documented
  * out-of-engine conversion).
  *
  * Reference semantics reproduced exactly:
  *   - expected dims lon/lat/time, optional lev;
  *   - the granule date comes from the `RangeBeginningDate` global
  *     attribute (error when absent);
  *   - single-variable extraction with CF unpacking (`scale_factor`,
  *     `add_offset`) and `_FillValue`/`missing_value` → NaN;
  *   - lev/descriptor-level mismatch errors both ways, `isel(lev=k)`;
  *   - inclusive lat/lon bbox subset (xarray `sel(slice)`);
  *   - NaN-skipping mean over the time dimension.
  *
  * Scale design: granules are parsed ON EXECUTORS — `spark.sparkContext
  * .binaryFiles` ships each file's bytes to a task, [[extractDay]] turns
  * it into one day's (lat, lon, value) rows. A year of granules is 365
  * independent tasks; nothing is collected to the driver.
  */
object NedGranule {

  final case class Day(date: String, lats: Array[Double], lons: Array[Double],
                       /** meanOverTime(lat)(lon), NaN where all-fill */
                       values: Array[Array[Double]])

  private def attrText(attrs: Seq[NetCdf.Attr], name: String): Option[String] =
    attrs.collectFirst { case NetCdf.Attr(`name`, NetCdf.Text(s)) => s }

  private def attrNum(attrs: Seq[NetCdf.Attr], name: String): Option[Double] =
    attrs.collectFirst {
      case NetCdf.Attr(`name`, NetCdf.Doubles(a)) if a.nonEmpty => a(0)
      case NetCdf.Attr(`name`, NetCdf.Floats(a)) if a.nonEmpty => a(0).toDouble
      case NetCdf.Attr(`name`, NetCdf.Ints(a)) if a.nonEmpty => a(0).toDouble
    }

  private def asDoubles(v: NetCdf.Value, what: String): Array[Double] = v match {
    case NetCdf.Doubles(a) => a
    case NetCdf.Floats(a) => a.map(_.toDouble)
    case NetCdf.Ints(a) => a.map(_.toDouble)
    case _ => throw new IllegalArgumentException(s"$what: unsupported nc type")
  }

  /** Extract one granule (already in memory) into a day raster. */
  def extractDay(bytes: Array[Byte], variable: String,
                 level: Option[Int] = None,
                 bbox: Option[(Double, Double, Double, Double)] = None): Day = {
    val f = NetCdf.readBytes(bytes)
    val date = attrText(f.gatts, "RangeBeginningDate").getOrElse(
      throw new IllegalArgumentException(
        "granule has no 'RangeBeginningDate' attribute"))
    val v = f.variable(variable)
    val dimNames = v.dims.map(f.dims(_).name)
    require(Set("time", "lat", "lon").subsetOf(dimNames.toSet),
      s"variable $variable dims $dimNames lack time/lat/lon")
    val hasLev = dimNames.contains("lev")
    if (hasLev && level.isEmpty)
      throw new IllegalArgumentException(
        "granule has a 'lev' dimension but no level was specified")
    if (!hasLev && level.isDefined)
      throw new IllegalArgumentException(
        "level specified but granule has no 'lev' dimension")
    require(dimNames == (if (hasLev) Seq("time", "lev", "lat", "lon")
                         else Seq("time", "lat", "lon")),
      s"unsupported dim order for $variable: $dimNames")

    val lats = asDoubles(f.variable("lat").data, "lat")
    val lons = asDoubles(f.variable("lon").data, "lon")
    val nT = f.dim("time").length
    val nLev = if (hasLev) f.dim("lev").length else 1
    val nLat = lats.length
    val nLon = lons.length
    val raw = asDoubles(v.data, variable)
    // CF unpacking + fill → NaN
    val fill = attrNum(v.attrs, "_FillValue")
      .orElse(attrNum(v.attrs, "missing_value"))
    val scale = attrNum(v.attrs, "scale_factor").getOrElse(1.0)
    val offset = attrNum(v.attrs, "add_offset").getOrElse(0.0)
    val lev = level.getOrElse(0)
    require(lev >= 0 && lev < nLev, s"level $lev outside [0, $nLev)")

    // NaN-skipping mean over time at the selected level
    val sums = Array.ofDim[Double](nLat, nLon)
    val counts = Array.ofDim[Int](nLat, nLon)
    var t = 0
    while (t < nT) {
      val base = ((t * nLev) + lev) * nLat * nLon
      var i = 0
      while (i < nLat) {
        var j = 0
        while (j < nLon) {
          val x = raw(base + i * nLon + j)
          val isFill = fill.exists(fv => x == fv) || x.isNaN
          if (!isFill) {
            sums(i)(j) += x * scale + offset
            counts(i)(j) += 1
          }
          j += 1
        }
        i += 1
      }
      t += 1
    }
    val mean = Array.tabulate(nLat, nLon) { (i, j) =>
      if (counts(i)(j) == 0) Double.NaN else sums(i)(j) / counts(i)(j)
    }

    bbox match {
      case None => Day(date, lats, lons, mean)
      case Some((latMin, latMax, lonMin, lonMax)) =>
        val li = lats.indices.filter(i => lats(i) >= latMin && lats(i) <= latMax)
        val lj = lons.indices.filter(j => lons(j) >= lonMin && lons(j) <= lonMax)
        Day(date,
          li.map(lats).toArray, lj.map(lons).toArray,
          li.map(i => lj.map(j => mean(i)(j)).toArray).toArray)
    }
  }

  /** Read a directory/glob of granules into the adapter's long form
    * `(date, lat, lon, value)` — one executor task per granule.
    */
  def readGranules(spark: SparkSession, pathGlob: String, variable: String,
                   level: Option[Int] = None,
                   bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, pds) =>
        val day = extractDay(pds.toArray(), variable, level, bbox)
        for {
          (lat, i) <- day.lats.zipWithIndex.iterator
          (lon, j) <- day.lons.zipWithIndex
          v = day.values(i)(j) if !v.isNaN
        } yield (day.date, lat, lon, v)
      }
      .toDF("date", "lat", "lon", "value")
  }
}
