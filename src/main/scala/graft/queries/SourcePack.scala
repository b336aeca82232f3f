package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Connectors, NedExportPipeline, NedGranule, OmiGranule, ShapefileGrid, ShapefileWriter}
import graft.raster.NetCdf4

/** Science-granule source operators (SURVEY.md §2.1 S11/S12) at the gate:
  * each query WRITES a synthetic granule with the in-repo netCDF-4 writer
  * (old-style HDF5) whose cell values are a closed-form function of the
  * grid, then reads it back through the full executor-side decode path —
  * so the DuckDB oracle can recompute every output value independently.
  * Container-format fidelity against real-world files (new-style HDF5,
  * dense attrs, shuffle filter) is covered by the MERRA-2 fixture specs;
  * these queries gate the end-to-end semantics: CF unpack, fill→NaN,
  * time-mean, coord synthesis, bbox subset, long-row emission.
  */
object SourcePack extends QueryPack {

  /** MERRA-shaped netCDF-4 granule: v(t,i,j) = t + 2·lat + 3·lon, every
    * (t+i+j)%5==0 cell filled; CF-packed (scale 0.5, offset 10), chunked
    * (edge-padded) + deflate. Returns the granule path.
    */
  def merraFixture(dir: java.nio.file.Path): String = {
    val lats = Array(10.0, 20.0, 30.0, 40.0, 50.0)
    val lons = Array(70.0, 71.0, 72.0, 73.0, 74.0, 75.0)
    val data = Array.tabulate(4 * 5 * 6) { k =>
      val t = k / 30; val i = (k % 30) / 6; val j = k % 6
      if ((t + i + j) % 5 == 0) 9999f
      else (t + 2 * lats(i) + 3 * lons(j)).toFloat
    }
    val root = NetCdf4.Group("/",
      attrs = Seq(NetCdf4.Attr("RangeBeginningDate", NetCdf4.AText("2023-07-01"))),
      dsets = Seq(
        NetCdf4.Dset("lat", Seq(5), Nil, NetCdf4.F64(lats)),
        NetCdf4.Dset("lon", Seq(6), Nil, NetCdf4.F64(lons)),
        NetCdf4.Dset("time", Seq(4), Nil, NetCdf4.I32(Array(0, 60, 120, 180))),
        NetCdf4.Dset("AOD", Seq(4, 5, 6),
          Seq(NetCdf4.Attr("_FillValue", NetCdf4.AFloats(Array(9999f))),
            NetCdf4.Attr("scale_factor", NetCdf4.ADoubles(Array(0.5))),
            NetCdf4.Attr("add_offset", NetCdf4.ADoubles(Array(10.0)))),
          NetCdf4.F32(data), chunks = Some(Seq(3, 2, 6)), deflate = 5)))
    val p = s"$dir/granule.nc4"
    NetCdf4.write(root, p)
    p
  }

  /** OMI-shaped HDF-EOS5 granule: the EOS group layout with GridSpan /
    * GridSpacing coord synthesis metadata and v(i,j) = 3·lat + 2·lon,
    * every (i+j)%3==0 cell filled. Returns the granule path.
    */
  def omiFixture(dir: java.nio.file.Path): String = {
    val nLat = 4; val nLon = 6
    def lat(i: Int) = 2.5 + i * 5.0
    def lon(j: Int) = 2.5 + j * 5.0
    val data = Array.tabulate(nLat * nLon) { k =>
      val i = k / nLon; val j = k % nLon
      if ((i + j) % 3 == 0) 1e30f else (3 * lat(i) + 2 * lon(j)).toFloat
    }
    val dataFields = NetCdf4.Group("Data Fields", dsets = Seq(
      NetCdf4.Dset("ColumnAmountNO2", Seq(nLat, nLon),
        Seq(NetCdf4.Attr("_FillValue", NetCdf4.AFloats(Array(1e30f)))),
        NetCdf4.F32(data))))
    val grid = NetCdf4.Group("ColumnAmountNO2",
      attrs = Seq(
        NetCdf4.Attr("GridSpan", NetCdf4.AText("(0.0, 30.0, 0.0, 20.0)")),
        NetCdf4.Attr("GridSpacing", NetCdf4.AText("(5.0, 5.0)")),
        NetCdf4.Attr("NumberOfLongitudesInGrid", NetCdf4.AInts(Array(nLon))),
        NetCdf4.Attr("NumberOfLatitudesInGrid", NetCdf4.AInts(Array(nLat)))),
      groups = Seq(dataFields))
    val fileAttrs = NetCdf4.Group("FILE_ATTRIBUTES", attrs = Seq(
      NetCdf4.Attr("GranuleYear", NetCdf4.AInts(Array(2023))),
      NetCdf4.Attr("GranuleMonth", NetCdf4.AInts(Array(1))),
      NetCdf4.Attr("GranuleDay", NetCdf4.AInts(Array(11)))))
    val root = NetCdf4.Group("/", groups = Seq(
      NetCdf4.Group("HDFEOS", groups = Seq(
        NetCdf4.Group("ADDITIONAL", groups = Seq(fileAttrs)),
        NetCdf4.Group("GRIDS", groups = Seq(grid))))))
    val p = s"$dir/omi.he5"
    NetCdf4.write(root, p)
    p
  }

  /** MERRA-shaped granule whose unpacked field is PLANAR and all-valid:
    * raw(t,i,j) = t + 2·lat + 3·lon, CF scale 0.5 / offset 10, so the
    * 4-step time-mean is lat + 1.5·lon + 10.75 at every cell and bilinear
    * regrid reproduces the plane exactly. Returns the granule path.
    */
  def nedPlaneFixture(dir: java.nio.file.Path): String = {
    val lats = Array(10.0, 20.0, 30.0, 40.0, 50.0)
    val lons = Array(70.0, 71.0, 72.0, 73.0, 74.0, 75.0)
    val data = Array.tabulate(4 * 5 * 6) { k =>
      val t = k / 30; val i = (k % 30) / 6; val j = k % 6
      (t + 2 * lats(i) + 3 * lons(j)).toFloat
    }
    val root = NetCdf4.Group("/",
      attrs = Seq(NetCdf4.Attr("RangeBeginningDate", NetCdf4.AText("2023-07-01"))),
      dsets = Seq(
        NetCdf4.Dset("lat", Seq(5), Nil, NetCdf4.F64(lats)),
        NetCdf4.Dset("lon", Seq(6), Nil, NetCdf4.F64(lons)),
        NetCdf4.Dset("time", Seq(4), Nil, NetCdf4.I32(Array(0, 60, 120, 180))),
        NetCdf4.Dset("AOD", Seq(4, 5, 6),
          Seq(NetCdf4.Attr("scale_factor", NetCdf4.ADoubles(Array(0.5))),
            NetCdf4.Attr("add_offset", NetCdf4.ADoubles(Array(10.0)))),
          NetCdf4.F32(data), chunks = Some(Seq(2, 3, 4)), deflate = 4)))
    val p = s"$dir/plane.nc4"
    NetCdf4.write(root, p)
    p
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S11: netCDF-4 granule → CF unpack + fill→NaN + NaN-skipping
    // time-mean → long rows. Values are exact dyadic rationals on both
    // engines (ints scaled by 0.5, means over ≤4 exact doubles), so the
    // compare is bit-perfect.
    "s11_granule_read" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-s11")
      val p = merraFixture(tmp)
      NedGranule.readGranules(s, p, "AOD")
        .select(col("date"), col("lat"), col("lon"),
          round(col("value"), 4).as("value"))
        .orderBy("lat", "lon")
    }),

    // S15–S17 composition: the full NedExportPipeline with an injected
    // local-file retriever — granule-count gate (1 granule against a
    // 2-day descriptor: the tolerated days−1 case), executor-side decode,
    // daily regrid onto grid centroids derived from the customer table,
    // variable rename, and the missing-row scaffold (the uncovered second
    // day lands as NULL rows). The planar fixture makes every value
    // closed-form; float32 absorbs bilinear FP noise, so the compare is
    // exact.
    "s15_ned_export" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-s15")
      val p = nedPlaneFixture(tmp)
      val grid = graft.core.Tables.table(s, dir, "customer").select(
        col("c_custkey").as("grid_id"),
        (lit(10.0) + col("c_custkey") % 31).cast("double").as("lat"),
        (lit(70.0) + col("c_custkey") % 5).cast("double").as("lon"))
      val descriptor = Connectors.NedDatasetDescriptor(
        "M2T1NXAER", "5.12.4",
        java.time.LocalDate.parse("2023-07-01"),
        java.time.LocalDate.parse("2023-07-02"),
        (69.0, 5.0, 76.0, 55.0),
        Map("AOD" -> "merra_aod"))
      val pipe = new NedExportPipeline(
        grid, descriptor,
        streamGranules = _ => Seq(p),
        readLong = (sp, paths) =>
          NedGranule.readGranules(sp, paths.mkString(","), "AOD"),
        nGrids = grid.count())
      pipe.readValidated(s, "2023-07").orderBy("grid_id", "date")
    }),

    // S12: HDF-EOS5 grid → date from FILE_ATTRIBUTES, coords synthesized
    // from GridSpan/GridSpacing with the half-cell centre adjustment,
    // fill→NaN, inclusive bbox subset.
    "s12_omi_grid" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-s12")
      val p = omiFixture(tmp)
      OmiGranule.readGranules(s, p, "ColumnAmountNO2",
          bbox = Some((5.0, 20.0, 5.0, 25.0)))
        .orderBy("lat", "lon")
    }),

    // S13: shapefile→grid — write a geographic-CRS shapefile of square
    // cells with the in-repo sink, parse it back through the native
    // .shp/.dbf/.prj reader, and emit the signed-area centroids. All
    // coordinates are dyadic rationals and the square's shoelace
    // centroid divides 3s³ by 6s² (the 3 cancels), so every output
    // value is float-exact and the oracle states them in closed form.
    // S8: GEE-export CSV adapter — header read, rename mapping, junk
    // column drop, non-strict float coercion (malformed → null, the
    // polars strict=False semantics), grid_id int64 cast, and scaffold
    // completion to the plan dates with null gaps. Values are small
    // integers (float-exact); one cell is deliberately malformed and one
    // plan date has no data, so both null paths land in the output.
    "s8_gee_csv" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-s8")
      val rows = for (g <- 1 to 3; d <- 1 to 3) yield {
        val v = if (g == 2 && d == 2) "bad" else s"${g * 10 + d}"
        s"""$g,2023-07-0$d,$v,"{}""""
      }
      val csv = ("grid_id,date,mean_2m_air_temperature,.geo" +: rows)
        .mkString("\n")
      val p = tmp.resolve("export.csv")
      java.nio.file.Files.writeString(p, csv)
      graft.ingest.GeeCsvAdapter.read(s, p.toString,
          Map("mean_2m_air_temperature" -> "era5_temp"),
          scaffoldDates = (1 to 4).map(d => s"2023-07-0$d"))
        .orderBy("date", "grid_id")
    }),

    // S14/J7/F17: grid-asset enrichment — broadcast left joins of the
    // 50 km mapping (total) and region labels (partial → null gaps),
    // then the original-CRS integer-meter rounding. Deterministic grid
    // synthesized from the customer table, so every value is closed-form.
    "s14_grid_enrich" -> ((s, dir) => {
      val c = graft.core.Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("grid_id"))
      val grid = c.select(col("grid_id"),
        (lit(10.0) + col("grid_id") % 31).as("lat"),
        (lit(70.0) + col("grid_id") % 5).as("lon"),
        (col("grid_id") + lit(0.75)).as("original_x"),
        (col("grid_id") + lit(0.25)).as("original_y"))
      val mapping = c.select(col("grid_id"),
        floor(col("grid_id") / 7).cast("long").as("id_50km"))
      val regions = c.filter(col("grid_id") % 2 === 0)
        .select(col("grid_id"), (col("grid_id") % 4).as("k_region"))
      graft.ingest.GridAssets.normalizeOriginalCoords(
          graft.ingest.GridAssets.enrich(grid, mapping, regions))
        .orderBy("grid_id")
    }),

    "s13_shapefile_grid" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-s13")
      val half = 0.125
      val entries = (1 to 24).map { i =>
        val lon = 70.0 + i * 0.25
        val lat = 10.0 + i * 0.5
        (i.toLong, Array(
          lon - half, lat - half, lon - half, lat + half,
          lon + half, lat + half, lon + half, lat - half,
          lon - half, lat - half))
      }
      ShapefileWriter.write(tmp, "grid", entries.map(_._2),
        entries.map(_._1),
        """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]""")
      ShapefileGrid.buildFromDir(s, tmp.toString)
        .select("grid_id", "lat", "lon")
        .orderBy("grid_id")
    }))

  def oracles: Map[String, String] = Map(
    "s11_granule_read" ->
      """WITH t AS (SELECT unnest(range(0, 4)) AS t),
           la AS (SELECT unnest(range(0, 5)) AS i),
           lo AS (SELECT unnest(range(0, 6)) AS j),
         cells AS (
           SELECT 10.0 + i*10 AS lat, 70.0 + j AS lon, t FROM la, lo, t
           WHERE (t + i + j) % 5 <> 0)
         SELECT '2023-07-01' AS date, lat, lon,
           ROUND(AVG(0.5*(t + 2*lat + 3*lon) + 10), 4) AS value
         FROM cells GROUP BY lat, lon ORDER BY lat, lon""",
    // the regridded day evaluates the plane lat + 1.5·lon + 10.75 at each
    // grid centroid; the scaffolded day is NULL — both dyadic-exact in
    // float32 on both engines
    "s15_ned_export" ->
      """SELECT c_custkey AS grid_id, d.date AS date,
           CASE WHEN d.date = '2023-07-01'
                THEN CAST((10 + c_custkey % 31)
                          + 1.5 * (70 + c_custkey % 5) + 10.75 AS FLOAT)
                ELSE NULL END AS merra_aod
         FROM customer,
           (SELECT '2023-07-01' AS date UNION ALL SELECT '2023-07-02') d
         ORDER BY grid_id, date""",
    "s12_omi_grid" ->
      """WITH la AS (SELECT unnest(range(0, 4)) AS i),
           lo AS (SELECT unnest(range(0, 6)) AS j),
         cells AS (
           SELECT 2.5 + i*5 AS lat, 2.5 + j*5 AS lon, i, j FROM la, lo)
         SELECT '2023-01-11' AS date, lat, lon,
           CAST(3*lat + 2*lon AS DOUBLE) AS value
         FROM cells
         WHERE (i + j) % 3 <> 0
           AND lat BETWEEN 5 AND 20 AND lon BETWEEN 5 AND 25
         ORDER BY lat, lon""",
    "s8_gee_csv" ->
      """SELECT CAST(g AS BIGINT) AS grid_id,
                '2023-07-0' || d AS date,
                CASE WHEN d = 4 THEN NULL
                     WHEN g = 2 AND d = 2 THEN NULL
                     ELSE CAST(g * 10 + d AS FLOAT) END AS era5_temp
         FROM (SELECT unnest(range(1, 4)) AS g),
              (SELECT unnest(range(1, 5)) AS d)
         ORDER BY date, grid_id""",
    "s14_grid_enrich" ->
      """SELECT c_custkey AS grid_id,
                10.0 + c_custkey % 31 AS lat,
                70.0 + c_custkey % 5 AS lon,
                CAST(c_custkey + 1 AS DOUBLE) AS original_x,
                CAST(c_custkey AS DOUBLE) AS original_y,
                c_custkey // 7 AS id_50km,
                CASE WHEN c_custkey % 2 = 0 THEN c_custkey % 4 END AS k_region
         FROM customer ORDER BY grid_id""",
    "s13_shapefile_grid" ->
      """SELECT CAST(i AS BIGINT) AS grid_id,
                10.0 + i * 0.5 AS lat, 70.0 + i * 0.25 AS lon
         FROM (SELECT unnest(range(1, 25)) AS i)
         ORDER BY grid_id""")
}
