package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S12 — HDF-EOS5 (OMI OMNO2d L3) granule reader (ref: collectors/ned/
  * data_reader_omno2d.py:33-159). HDF-EOS5 is an HDF5 container with a
  * conventional group layout; the structural decode rides [[Hdf5]] and
  * this object reproduces the reference's EOS-specific semantics:
  *
  *   - the granule date from `HDFEOS/ADDITIONAL/FILE_ATTRIBUTES` attrs
  *     `GranuleYear`/`GranuleMonth`/`GranuleDay`;
  *   - coordinates SYNTHESIZED (the file stores none) from the grid
  *     group's `GridSpan` + `GridSpacing` attributes, numpy-arange style
  *     with the half-cell centre adjustment, validated against
  *     `NumberOfLongitudesInGrid`/`NumberOfLatitudesInGrid`;
  *   - data at `HDFEOS/GRIDS/<grid>/Data Fields/<var>`, phony (lat, lon)
  *     dims, CF `_FillValue`/`missing_value` → NaN and
  *     `scale_factor`/`add_offset` unpacking (what xarray's decoding
  *     applies in the reference);
  *   - inclusive lat/lon bbox subset.
  *
  * Scale: like [[NedGranule]], whole granules parse on executors via
  * `binaryFiles` — a year of dailies is 365 independent tasks.
  */
object OmiGranule {

  final case class Day(date: String, lats: Array[Double], lons: Array[Double],
                       /** values(lat)(lon), NaN where fill */
                       values: Array[Array[Double]])

  /** numpy `arange(start, stop, step) + step/2` (the reference's centre
    * adjustment): length = ceil((stop-start)/step) computed in doubles.
    */
  private[ingest] def centreCoords(start: Double, stop: Double,
                                   step: Double): Array[Double] = {
    val n = math.ceil((stop - start) / step).toInt
    Array.tabulate(n)(i => start + i * step + step / 2.0)
  }

  private def parseTuple(s: String, what: String): Array[Double] = {
    val inner = s.trim.stripPrefix("(").stripSuffix(")")
    try inner.split(',').map(_.trim.toDouble)
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"unparseable $what: '$s'")
    }
  }

  private def attrNum(attrs: Map[String, Hdf5.AttrVal], n: String): Option[Double] =
    attrs.get(n).collect {
      case Hdf5.Nums(a) if a.nonEmpty => a(0)
      case Hdf5.Text(s) if s.nonEmpty => s.toDouble
    }

  private def attrText(attrs: Map[String, Hdf5.AttrVal], n: String): Option[String] =
    attrs.get(n).collect {
      case Hdf5.Text(s) => s
      case Hdf5.Nums(a) if a.nonEmpty =>
        if (a(0) == a(0).toLong) a(0).toLong.toString else a(0).toString
    }

  def extractDay(bytes: Array[Byte], variable: String,
                 gridName: String = "ColumnAmountNO2",
                 bbox: Option[(Double, Double, Double, Double)] = None): Day = {
    val f = Hdf5.read(bytes)

    // date from FILE_ATTRIBUTES (data_reader_omno2d.py:78-92)
    val fa = f.attributes(f.resolve("HDFEOS/ADDITIONAL/FILE_ATTRIBUTES"))
    def part(n: String): Int = attrText(fa, n).map(_.trim.toInt).getOrElse(
      throw new IllegalArgumentException(s"FILE_ATTRIBUTES lacks '$n'"))
    val date = f"${part("GranuleYear")}%04d-${part("GranuleMonth")}%02d-${part("GranuleDay")}%02d"

    // coords from GridSpan/GridSpacing (data_reader_omno2d.py:94-159)
    val gridAddr = f.resolve(s"HDFEOS/GRIDS/$gridName")
    val ga = f.attributes(gridAddr)
    val span = parseTuple(attrText(ga, "GridSpan").getOrElse(
      throw new IllegalArgumentException("grid lacks 'GridSpan'")), "GridSpan")
    val spacing = parseTuple(attrText(ga, "GridSpacing").getOrElse(
      throw new IllegalArgumentException("grid lacks 'GridSpacing'")), "GridSpacing")
    require(span.length == 4 && spacing.length == 2,
      s"GridSpan/GridSpacing arity: ${span.length}/${spacing.length}")
    val Array(minLon, maxLon, minLat, maxLat) = span
    val lons = centreCoords(minLon, maxLon, spacing(0))
    val lats = centreCoords(minLat, maxLat, spacing(1))
    attrNum(ga, "NumberOfLongitudesInGrid").foreach { n =>
      require(n.toInt == lons.length,
        s"lon length ${n.toInt} does not match generated grid length ${lons.length}")
    }
    attrNum(ga, "NumberOfLatitudesInGrid").foreach { n =>
      require(n.toInt == lats.length,
        s"lat length ${n.toInt} does not match generated grid length ${lats.length}")
    }

    // data field: phony dims are (lat, lon)
    val dfAddr = f.resolve(s"HDFEOS/GRIDS/$gridName/Data Fields")
    val kids = f.children(dfAddr).toMap
    val dsAddr = kids.getOrElse(variable, throw new IllegalArgumentException(
      s"grid has no data field '$variable' (have ${kids.keys.mkString(", ")})"))
    val ds = f.dataset(variable, dsAddr)
    require(ds.dims.length == 2 &&
      ds.dims(0) == lats.length && ds.dims(1) == lons.length,
      s"$variable dims ${ds.dims.toSeq} vs grid ${lats.length}x${lons.length}")
    val raw = ds.doubles
    val fill = ds.attrNum("_FillValue").orElse(ds.attrNum("missing_value"))
    val scale = ds.attrNum("scale_factor").getOrElse(1.0)
    val offset = ds.attrNum("add_offset").getOrElse(0.0)
    val vals = Array.tabulate(lats.length, lons.length) { (i, j) =>
      val x = raw(i * lons.length + j)
      if (fill.exists(fv => x == fv) || x.isNaN) Double.NaN
      else x * scale + offset
    }

    bbox match {
      case None => Day(date, lats, lons, vals)
      case Some((latMin, latMax, lonMin, lonMax)) =>
        val li = lats.indices.filter(i => lats(i) >= latMin && lats(i) <= latMax)
        val lj = lons.indices.filter(j => lons(j) >= lonMin && lons(j) <= lonMax)
        Day(date, li.map(lats).toArray, lj.map(lons).toArray,
          li.map(i => lj.map(j => vals(i)(j)).toArray).toArray)
    }
  }

  /** Read a glob of OMI granules into long `(date, lat, lon, value)` rows
    * — one executor task per granule, NaN cells dropped.
    */
  def readGranules(spark: SparkSession, pathGlob: String, variable: String,
                   gridName: String = "ColumnAmountNO2",
                   bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (_, pds) =>
        val day = extractDay(pds.toArray(), variable, gridName, bbox)
        for {
          (lat, i) <- day.lats.zipWithIndex.iterator
          (lon, j) <- day.lons.zipWithIndex
          v = day.values(i)(j) if !v.isNaN
        } yield (day.date, lat, lon, v)
      }
      .toDF("date", "lat", "lon", "value")
  }
}
