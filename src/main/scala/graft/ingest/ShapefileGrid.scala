package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S13 — one-time grid asset preparation from the packaged shapefile
  * (ref: src/pm25ml/collectors/grid.py:188-313: unzip → pyshp read →
  * pyproj reproject source CRS→EPSG:4326 → WKT + centroids → joins).
  *
  * No GDAL/JTS ships in this engine (the reference enforces its own
  * no-GDAL gate), so the three file formats are read directly — all are
  * small, public, fixed layouts:
  *   - ESRI `.shp` (ESRI Shapefile Technical Description, 1998): 100-byte
  *     header + [record header (big-endian), polygon record
  *     (little-endian: type 5, bbox, parts, points)];
  *   - dBASE `.dbf` (attributes; fixed-width ASCII fields);
  *   - `.prj` (OGC WKT CRS) — the Lambert Conformal Conic 2SP parameters
  *     are PARSED from the WKT, not hardcoded to EPSG:7755, and inverted
  *     with the EPSG Guidance Note 7-2 / Snyder formulas.
  *
  * Scale shape: a grid shapefile is a dimension ASSET (tens of thousands
  * of cells), not data — the reference builds it in driver memory too. So
  * parsing is deliberately driver-side, one-time, and the output parquet
  * is the broadcast-sized dimension every job consumes.
  */
object ShapefileGrid {

  // ------------------------------------------------------------- CRS

  /** Lambert Conformal Conic 2SP on an ellipsoid (EPSG method 9802).
    * Angles in radians. Forward/inverse per Snyder 15-1..15-11 / EPSG GN7-2.
    */
  final case class Lcc2Sp(a: Double, invF: Double, phi1: Double, phi2: Double,
                          phi0: Double, lambda0: Double, fe: Double, fn: Double) {
    private val f = if (invF == 0) 0.0 else 1.0 / invF
    private val e2 = 2 * f - f * f
    private val e = math.sqrt(e2)

    private def m(phi: Double) =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private def t(phi: Double) = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
    }
    private val n =
      if (math.abs(phi1 - phi2) < 1e-12) math.sin(phi1)
      else (math.log(m(phi1)) - math.log(m(phi2))) / (math.log(t(phi1)) - math.log(t(phi2)))
    private val bigF = m(phi1) / (n * math.pow(t(phi1), n))
    private def rho(phi: Double) = a * bigF * math.pow(t(phi), n)
    private val rho0 = rho(phi0)

    /** (lon, lat) → (easting, northing). */
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val r = rho(lat)
      val theta = n * (lon - lambda0)
      (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
    }

    /** (easting, northing) → (lon, lat). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sign = if (n >= 0) 1.0 else -1.0
      val rhoP = sign * math.sqrt(dx * dx + dy * dy)
      val thetaP = math.atan2(sign * dx, sign * dy)
      val tP = math.pow(rhoP / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(tP)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(tP * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 }
        else { phi = next; i += 1 }
      }
      (thetaP / n + lambda0, phi)
    }
  }

  /** A parsed .prj: either projected (LCC 2SP) or already geographic. */
  sealed trait Crs { def toLonLat(x: Double, y: Double): (Double, Double) }
  case object Geographic extends Crs {
    def toLonLat(x: Double, y: Double): (Double, Double) = (x, y)
  }
  final case class Projected(lcc: Lcc2Sp) extends Crs {
    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val (lon, lat) = lcc.inverse(x, y)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** Parse the WKT in a .prj. Supports GEOGCS (identity) and PROJCS with
    * a Lambert_Conformal_Conic projection; parameter names are matched
    * case-insensitively across the common spellings.
    */
  def parsePrj(wkt: String): Crs = {
    val up = wkt.toUpperCase
    if (!up.startsWith("PROJCS")) return Geographic
    require(up.contains("LAMBERT_CONFORMAL_CONIC") || up.contains("LAMBERT CONFORMAL CONIC"),
      s"unsupported projection in .prj (only LCC + geographic): ${wkt.take(80)}")
    val sph = """SPHEROID\s*\[\s*"[^"]*"\s*,\s*([0-9.Ee+-]+)\s*,\s*([0-9.Ee+-]+)""".r
    val (aAxis, invF) = sph.findFirstMatchIn(wkt) match {
      case Some(mm) => (mm.group(1).toDouble, mm.group(2).toDouble)
      case None     => throw new IllegalArgumentException("no SPHEROID in .prj")
    }
    val param = """PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([0-9.Ee+-]+)\s*\]""".r
    val params = param.findAllMatchIn(wkt)
      .map(mm => mm.group(1).toLowerCase -> mm.group(2).toDouble).toMap
    def p(names: String*): Double =
      names.flatMap(params.get).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"missing projection parameter ${names.head} in .prj"))
    def pOr(default: Double, names: String*): Double =
      names.flatMap(params.get).headOption.getOrElse(default)
    val sp1 = p("standard_parallel_1")
    Projected(Lcc2Sp(
      a = aAxis, invF = invF,
      phi1 = math.toRadians(sp1),
      phi2 = math.toRadians(pOr(sp1, "standard_parallel_2")),
      phi0 = math.toRadians(p("latitude_of_origin", "latitude_of_center")),
      lambda0 = math.toRadians(p("central_meridian", "longitude_of_center")),
      fe = pOr(0, "false_easting"), fn = pOr(0, "false_northing")))
  }

  // ------------------------------------------------------------- .shp

  /** One polygon: rings of (x, y) vertices, exterior ring(s) clockwise per
    * the ESRI spec, holes counter-clockwise.
    */
  final case class Poly(rings: Seq[Array[Double]]) { // flat x0,y0,x1,y1,…
    /** Signed-area-weighted centroid over all rings (holes carry opposite
      * orientation, so their contribution subtracts — same as shapely).
      */
    def centroid: (Double, Double) = {
      // translate to a local origin first: projected coordinates sit at
      // ~4e6 m, where the raw shoelace loses ~1e-5 m to cancellation
      val x0 = rings.head(0)
      val y0 = rings.head(1)
      var a = 0.0; var cx = 0.0; var cy = 0.0
      rings.foreach { r =>
        var i = 0
        val np = r.length / 2
        while (i < np) {
          val j = (i + 1) % np
          val xi = r(2 * i) - x0; val yi = r(2 * i + 1) - y0
          val xj = r(2 * j) - x0; val yj = r(2 * j + 1) - y0
          val cross = xi * yj - xj * yi
          a += cross
          cx += (xi + xj) * cross
          cy += (yi + yj) * cross
          i += 1
        }
      }
      if (math.abs(a) < 1e-30) { // degenerate: plain vertex mean
        val all = rings.flatMap(_.grouped(2).map(p => (p(0), p(1))))
        (all.map(_._1).sum / all.size, all.map(_._2).sum / all.size)
      } else (x0 + cx / (3 * a), y0 + cy / (3 * a))
    }

    def mapVertices(fn: (Double, Double) => (Double, Double)): Poly =
      Poly(rings.map { r =>
        val out = new Array[Double](r.length)
        var i = 0
        while (i < r.length) {
          val (x, y) = fn(r(i), r(i + 1)); out(i) = x; out(i + 1) = y; i += 2
        }
        out
      })

    /** OGC WKT. Single-ring → POLYGON; multi-ring keeps all rings in one
      * POLYGON (the grid cells are simple; hole/multi-part disambiguation
      * is not needed for centroid or join semantics).
      */
    def wkt: String =
      rings.map(_.grouped(2).map(p => s"${p(0)} ${p(1)}").mkString("(", ", ", ")"))
        .mkString("POLYGON (", ", ", ")")
  }

  /** Read every polygon in a .shp (shape types 5/15/25; Z/M ignored). */
  def readShp(path: Path): Seq[Poly] = {
    val bytes = Files.readAllBytes(path)
    val bb = ByteBuffer.wrap(bytes)
    require(bb.order(ByteOrder.BIG_ENDIAN).getInt(0) == 9994,
      s"not a shapefile (bad magic) at $path")
    val fileLen16 = bb.getInt(24) // length in 16-bit words, incl. header
    val out = Seq.newBuilder[Poly]
    var off = 100
    while (off < fileLen16 * 2) {
      val contentLen = bb.order(ByteOrder.BIG_ENDIAN).getInt(off + 4) * 2
      val rec = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      rec.position(off + 8)
      val shapeType = rec.getInt()
      if (shapeType == 5 || shapeType == 15 || shapeType == 25) {
        rec.position(rec.position() + 32) // bbox
        val numParts = rec.getInt()
        val numPoints = rec.getInt()
        val parts = Array.fill(numParts)(rec.getInt())
        val xs = new Array[Double](numPoints * 2)
        var i = 0
        while (i < numPoints) {
          xs(2 * i) = rec.getDouble(); xs(2 * i + 1) = rec.getDouble(); i += 1
        }
        val bounds = parts :+ numPoints
        out += Poly((0 until numParts).map { pi =>
          java.util.Arrays.copyOfRange(xs, bounds(pi) * 2, bounds(pi + 1) * 2)
        })
      } // null shapes (type 0) skipped
      off += 8 + contentLen
    }
    out.result()
  }

  // ------------------------------------------------------------- .dbf

  /** Read dBASE III attribute records as string maps (numeric parsing is
    * the caller's, mirroring pyshp's loose typing).
    */
  def readDbf(path: Path): Seq[Map[String, String]] = {
    val bytes = Files.readAllBytes(path)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recSize = bb.getShort(10) & 0xffff
    // field descriptors: 32 bytes each from offset 32 until 0x0D terminator
    var off = 32
    val fields = Seq.newBuilder[(String, Int)] // name, length
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11, "ASCII").takeWhile(_ != 0).trim
      val len = bytes(off + 16) & 0xff
      fields += name -> len
      off += 32
    }
    val fs = fields.result()
    (0 until nRec).map { r =>
      val base = headerSize + r * recSize
      var pos = base + 1 // skip deletion flag
      fs.map { case (name, len) =>
        val v = new String(bytes, pos, len, "ASCII").trim
        pos += len
        name -> v
      }.toMap
    }
  }

  // ------------------------------------------------------------- builder

  val schema: StructType = StructType(Seq(
    StructField("grid_id", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("original_x", DoubleType, nullable = false),
    StructField("original_y", DoubleType, nullable = false),
    StructField("geometry_wkt", StringType, nullable = false),
    StructField("original_geometry_wkt", StringType, nullable = false)))

  /** Build the bare grid frame from an extracted shapefile directory (or
    * any directory holding exactly one .shp/.dbf/.prj set). Per shape:
    * reproject vertices to 4326, centroid of BOTH geometries (the 4326
    * centroid is computed on the reprojected ring, like the reference's
    * `geom_reproj.centroid`), WKT of both (grid.py:283-313).
    */
  def buildFromDir(spark: SparkSession, dir: String): DataFrame = {
    def find(ext: String): Path = {
      val stream = Files.walk(Paths.get(dir))
      try {
        val it = stream.iterator()
        var hit: Path = null
        while (it.hasNext && hit == null) {
          val p = it.next()
          if (p.toString.toLowerCase.endsWith(ext)) hit = p
        }
        require(hit != null, s"no $ext under $dir")
        hit
      } finally stream.close()
    }
    val crs = parsePrj(new String(Files.readAllBytes(find(".prj")), "UTF-8"))
    val polys = readShp(find(".shp"))
    val attrs = readDbf(find(".dbf"))
    require(polys.size == attrs.size,
      s".shp has ${polys.size} shapes but .dbf has ${attrs.size} records")
    val rows = polys.zip(attrs).map { case (poly, at) =>
      val gid = at.getOrElse("grid_id",
        throw new IllegalArgumentException("grid_id not found in shapefile attributes"))
      val reproj = poly.mapVertices((x, y) => crs.toLonLat(x, y))
      val (lon, lat) = reproj.centroid
      val (ox, oy) = poly.centroid
      Row(gid.toDouble.toLong, lat, lon, ox, oy, reproj.wkt, poly.wkt)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Build from the zip the reference ships (grid_india_10km.zip layout). */
  def buildFromZip(spark: SparkSession, zipPath: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-shp")
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val es = zf.entries()
      while (es.hasMoreElements) {
        val e = es.nextElement()
        if (!e.isDirectory) {
          val target = tmp.resolve(Paths.get(e.getName).getFileName.toString)
          val in = zf.getInputStream(e)
          try Files.copy(in, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    buildFromDir(spark, tmp.toString)
  }

  /** Full asset prep: bare grid + 50 km mapping + regions → the parquet
    * [[GridAssets.load]] validates (grid.py:188-243).
    */
  def prepare(spark: SparkSession, shapefileDir: String, mapping50km: DataFrame,
              regions: DataFrame, outPath: String): Unit = {
    val grid = GridAssets.normalizeOriginalCoords(
      GridAssets.enrich(buildFromDir(spark, shapefileDir), mapping50km, regions))
    grid.write.mode("overwrite").parquet(outPath)
  }
}
