package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.raster.NetCdf

/** S11 — file-based reader for NED science granules, covering BOTH
  * containers the reference consumes (ref: collectors/ned/
  * data_reader_merra.py:26-110, via h5netcdf):
  *
  *   - classic NetCDF (CDF-1/2) via the in-repo [[graft.raster.NetCdf]]
  *     codec;
  *   - netCDF-4 / HDF5 via the from-spec [[Hdf5]] reader (chunked +
  *     shuffle/deflate datasets, dense attributes, DIMENSION_LIST dim
  *     resolution) — real MERRA-2 downloads are this container.
  *
  * Reference semantics reproduced exactly in both:
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

  /** Container-independent payload of one granule variable. */
  private final case class Grid(date: String, dimNames: Seq[String],
                                lats: Array[Double], lons: Array[Double],
                                nT: Int, nLev: Int,
                                /** row-major (time, [lev,] lat, lon) */
                                raw: Array[Double],
                                fill: Option[Double], scale: Double,
                                offset: Double)

  /** Extract one granule (already in memory) into a day raster. Both
    * containers are routed here; the CF-unpack + time-mean + bbox kernel
    * below is shared.
    */
  def extractDay(bytes: Array[Byte], variable: String,
                 level: Option[Int] = None,
                 bbox: Option[(Double, Double, Double, Double)] = None): Day = {
    val g = if (Hdf5.isHdf5(bytes)) readHdf5(bytes, variable)
            else readClassic(bytes, variable)
    val hasLev = g.dimNames.contains("lev")
    if (hasLev && level.isEmpty)
      throw new IllegalArgumentException(
        "granule has a 'lev' dimension but no level was specified")
    if (!hasLev && level.isDefined)
      throw new IllegalArgumentException(
        "level specified but granule has no 'lev' dimension")
    require(g.dimNames == (if (hasLev) Seq("time", "lev", "lat", "lon")
                           else Seq("time", "lat", "lon")),
      s"unsupported dim order for $variable: ${g.dimNames}")
    meanSubset(g, level.getOrElse(0), bbox)
  }

  private def readClassic(bytes: Array[Byte], variable: String): Grid = {
    val f = NetCdf.readBytes(bytes)
    val date = attrText(f.gatts, "RangeBeginningDate").getOrElse(
      throw new IllegalArgumentException(
        "granule has no 'RangeBeginningDate' attribute"))
    val v = f.variable(variable)
    val dimNames = v.dims.map(f.dims(_).name)
    require(Set("time", "lat", "lon").subsetOf(dimNames.toSet),
      s"variable $variable dims $dimNames lack time/lat/lon")
    Grid(date, dimNames,
      asDoubles(f.variable("lat").data, "lat"),
      asDoubles(f.variable("lon").data, "lon"),
      f.dim("time").length,
      if (dimNames.contains("lev")) f.dim("lev").length else 1,
      asDoubles(v.data, variable),
      attrNum(v.attrs, "_FillValue").orElse(attrNum(v.attrs, "missing_value")),
      attrNum(v.attrs, "scale_factor").getOrElse(1.0),
      attrNum(v.attrs, "add_offset").getOrElse(0.0))
  }

  private def readHdf5(bytes: Array[Byte], variable: String): Grid = {
    val f = Hdf5.read(bytes)
    val date = f.rootAttributes.get("RangeBeginningDate").collect {
      case Hdf5.Text(s) => s
    }.getOrElse(throw new IllegalArgumentException(
      "granule has no 'RangeBeginningDate' attribute"))
    val kids = f.children(f.rootAddr).toMap
    val varAddr = kids.getOrElse(variable, throw new IllegalArgumentException(
      s"granule has no variable '$variable' (have ${kids.keys.mkString(", ")})"))
    val ds = f.dataset(variable, varAddr)
    val addrToName = kids.map(_.swap)
    // dim names via netCDF-4 DIMENSION_LIST object references; granules
    // written without dimension scales fall back to the canonical
    // (time,[lev],lat,lon) order the extractor requires anyway.
    val dimNames: Seq[String] = ds.attrs.get("DIMENSION_LIST") match {
      case Some(Hdf5.RefLists(refs)) if refs.length == ds.dims.length =>
        refs.toSeq.map(r => addrToName.getOrElse(r.headOption.getOrElse(-1L),
          throw new IllegalArgumentException("DIMENSION_LIST ref to unknown object")))
      case _ =>
        val canonical = if (ds.dims.length == 4) Seq("time", "lev", "lat", "lon")
                        else Seq("time", "lat", "lon")
        require(ds.dims.length == canonical.length,
          s"variable $variable has rank ${ds.dims.length}")
        canonical
    }
    require(Set("time", "lat", "lon").subsetOf(dimNames.toSet),
      s"variable $variable dims $dimNames lack time/lat/lon")
    def coord(n: String): Array[Double] =
      f.dataset(n, kids.getOrElse(n, throw new IllegalArgumentException(
        s"granule lacks coordinate dataset '$n'"))).doubles
    val nT = ds.dims(dimNames.indexOf("time"))
    val nLev = if (dimNames.contains("lev")) ds.dims(dimNames.indexOf("lev")) else 1
    Grid(date, dimNames, coord("lat"), coord("lon"), nT, nLev, ds.doubles,
      ds.attrNum("_FillValue").orElse(ds.attrNum("missing_value")),
      ds.attrNum("scale_factor").getOrElse(1.0),
      ds.attrNum("add_offset").getOrElse(0.0))
  }

  /** NaN-skipping mean over time at the selected level + inclusive bbox. */
  private def meanSubset(g: Grid, lev: Int,
                         bbox: Option[(Double, Double, Double, Double)]): Day = {
    val nLat = g.lats.length
    val nLon = g.lons.length
    require(lev >= 0 && lev < g.nLev, s"level $lev outside [0, ${g.nLev})")
    require(g.raw.length == g.nT.toLong * g.nLev * nLat * nLon,
      s"raw length ${g.raw.length} != ${g.nT}x${g.nLev}x${nLat}x$nLon")
    val sums = Array.ofDim[Double](nLat, nLon)
    val counts = Array.ofDim[Int](nLat, nLon)
    var t = 0
    while (t < g.nT) {
      val base = ((t * g.nLev) + lev) * nLat * nLon
      var i = 0
      while (i < nLat) {
        var j = 0
        while (j < nLon) {
          val x = g.raw(base + i * nLon + j)
          val isFill = g.fill.exists(fv => x == fv) || x.isNaN
          if (!isFill) {
            sums(i)(j) += x * g.scale + g.offset
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
      case None => Day(g.date, g.lats, g.lons, mean)
      case Some((latMin, latMax, lonMin, lonMax)) =>
        val li = g.lats.indices.filter(i => g.lats(i) >= latMin && g.lats(i) <= latMax)
        val lj = g.lons.indices.filter(j => g.lons(j) >= lonMin && g.lons(j) <= lonMax)
        Day(g.date,
          li.map(g.lats).toArray, lj.map(g.lons).toArray,
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
