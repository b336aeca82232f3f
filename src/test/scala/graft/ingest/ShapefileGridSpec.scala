package graft.ingest

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S13 — shapefile→grid asset builder (ref: collectors/grid.py:188-313).
  * The spec WRITES a tiny synthetic shapefile set byte-by-byte (ESRI .shp
  * + dBASE .dbf + WKT .prj with EPSG:7755-style LCC parameters), then
  * builds and validates the grid parquet through the real path.
  */
class ShapefileGridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // EPSG:7755-style Lambert Conformal Conic 2SP over WGS84 (India NSF LCC)
  private val prjWkt =
    """PROJCS["WGS 84 / India NSF LCC",GEOGCS["WGS 84",DATUM["WGS_1984",
      |SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
      |UNIT["degree",0.0174532925199433]],
      |PROJECTION["Lambert_Conformal_Conic_2SP"],
      |PARAMETER["standard_parallel_1",12.472955],
      |PARAMETER["standard_parallel_2",35.172805],
      |PARAMETER["latitude_of_origin",24],PARAMETER["central_meridian",80],
      |PARAMETER["false_easting",4000000],PARAMETER["false_northing",4000000],
      |UNIT["metre",1]]""".stripMargin.replace("\n", "")

  private def lcc = ShapefileGrid.parsePrj(prjWkt) match {
    case ShapefileGrid.Projected(l) => l
    case other                      => fail(s"expected Projected, got $other")
  }

  test("LCC 2SP: forward/inverse round trip and unit scale at parallels") {
    val l = lcc
    // round trip across the India bbox
    for (lon <- Seq(68.0, 77.5, 88.0, 97.0); lat <- Seq(8.0, 20.0, 28.0, 37.0)) {
      val (x, y) = l.forward(math.toRadians(lon), math.toRadians(lat))
      val (lo, la) = l.inverse(x, y)
      assert(math.abs(math.toDegrees(lo) - lon) < 1e-9, s"lon at ($lon,$lat)")
      assert(math.abs(math.toDegrees(la) - lat) < 1e-9, s"lat at ($lon,$lat)")
    }
    // origin maps to the false origin
    val (x0, y0) = l.forward(math.toRadians(80), math.toRadians(24))
    assert(math.abs(x0 - 4000000) < 1e-6 && math.abs(y0 - 4000000) < 1e-6)

    // defining property: scale factor along a parallel is 1 at the
    // standard parallels, <1 between them, >1 outside
    def scaleAt(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val dlam = math.toRadians(1e-4)
      val (xa, ya) = l.forward(math.toRadians(80), phi)
      val (xb, yb) = l.forward(math.toRadians(80) + dlam, phi)
      val projected = math.hypot(xb - xa, yb - ya)
      val e2 = { val f = 1 / 298.257223563; 2 * f - f * f }
      val nu = 6378137.0 / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      projected / (nu * math.cos(phi) * dlam)
    }
    assert(math.abs(scaleAt(12.472955) - 1.0) < 1e-6)
    assert(math.abs(scaleAt(35.172805) - 1.0) < 1e-6)
    assert(scaleAt(24.0) < 1.0)
    assert(scaleAt(8.0) > 1.0 && scaleAt(38.0) > 1.0)
  }

  /** Square cell (10 km) centred on a projected point. */
  private def cell(cx: Double, cy: Double, half: Double = 5000.0): Array[Double] =
    // ESRI polygons: exterior ring clockwise
    Array(cx - half, cy - half, cx - half, cy + half, cx + half, cy + half,
      cx + half, cy - half, cx - half, cy - half)

  private def writeAsset(centersLonLat: Seq[(Long, Double, Double)]): Path = {
    val dir = Files.createTempDirectory("graft-shp-spec")
    val l = lcc
    val polys = centersLonLat.map { case (_, lon, lat) =>
      val (x, y) = l.forward(math.toRadians(lon), math.toRadians(lat))
      cell(x, y)
    }
    ShapefileWriter.write(dir, "grid", polys, centersLonLat.map(_._1), prjWkt)
    dir
  }

  private val centers = Seq(
    (101L, 77.20, 28.60), // Delhi-ish
    (102L, 72.85, 19.05), // Mumbai-ish
    (103L, 88.35, 22.55), // Kolkata-ish
    (104L, 80.25, 13.08)) // Chennai-ish

  test("build from .shp/.dbf/.prj: ids, centroids, WKT") {
    val dir = writeAsset(centers)
    val out = ShapefileGrid.buildFromDir(spark, dir.toString)
      .orderBy("grid_id").collect()
    assert(out.map(_.getLong(0)).toSeq === centers.map(_._1))
    centers.zip(out).foreach { case ((id, lon, lat), row) =>
      // reprojected centroid lands on the cell centre (5 km half-width →
      // centroid of the reprojected square stays within ~1e-4 deg)
      assert(math.abs(row.getDouble(1) - lat) < 1e-3, s"lat of $id")
      assert(math.abs(row.getDouble(2) - lon) < 1e-3, s"lon of $id")
      // original centroid is the projected centre, exactly (square cell)
      val l = lcc
      val (x, y) = l.forward(math.toRadians(lon), math.toRadians(lat))
      assert(math.abs(row.getDouble(3) - x) < 1e-6, s"x of $id")
      assert(math.abs(row.getDouble(4) - y) < 1e-6, s"y of $id")
      assert(row.getString(5).startsWith("POLYGON (("))
      assert(row.getString(6).startsWith("POLYGON (("))
    }
  }

  test("prepare: enrichment joins + normalization → GridAssets.load contract") {
    val dir = writeAsset(centers)
    val mapping = Seq((101L, 11L), (102L, 11L), (103L, 12L))
      .toDF("grid_id", "id_50km")
    val regions = Seq((101L, 1L), (103L, 2L), (104L, 2L))
      .toDF("grid_id", "k_region")
    val out = Files.createTempDirectory("graft-grid-out").resolve("grid").toString
    ShapefileGrid.prepare(spark, dir.toString, mapping, regions, out)
    val loaded = GridAssets.load(spark, out).orderBy("grid_id").collect()
    assert(loaded.length === 4)
    // left-join semantics: missing mappings stay null
    assert(loaded(3).isNullAt(loaded(3).fieldIndex("id_50km")))
    assert(loaded(1).isNullAt(loaded(1).fieldIndex("k_region")))
    assert(loaded(0).getLong(loaded(0).fieldIndex("id_50km")) === 11L)
    // normalized original coords are integer metres
    val ox = loaded(0).getDouble(loaded(0).fieldIndex("original_x"))
    assert(ox === math.round(ox).toDouble)
  }

  test("zip extraction path") {
    val dir = writeAsset(centers.take(2))
    val zipPath = Files.createTempFile("graft-grid", ".zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    try {
      Seq("grid.shp", "grid.dbf", "grid.prj").foreach { n =>
        zos.putNextEntry(new java.util.zip.ZipEntry(s"grid_india_10km/$n"))
        zos.write(Files.readAllBytes(dir.resolve(n)))
        zos.closeEntry()
      }
    } finally zos.close()
    val out = ShapefileGrid.buildFromZip(spark, zipPath.toString)
    assert(out.count() === 2)
    assert(out.select("grid_id").as[Long].collect().sorted.toSeq === Seq(101L, 102L))
  }
}
