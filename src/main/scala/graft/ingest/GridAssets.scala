package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13/S14/F17 — the grid dimension asset
  * (ref: src/pm25ml/collectors/grid.py:30-120,188-313).
  *
  * The reference builds the grid once from a shapefile (pyogrio + pyproj
  * reprojection EPSG:7755→4326). [[ShapefileGrid]] performs that one-time
  * prep natively (.shp/.dbf/.prj parse + LCC 2SP inverse — no GDAL, by
  * design: the reference itself enforces a no-GDAL gate); this object
  * holds the schema contract, the joins that enrich the grid (50 km
  * mapping, region labels), and the original-CRS coordinate
  * normalization (round-to-integer meters, F17 — grid.py:223-228).
  */
object GridAssets {

  val schema: StructType = StructType(Seq(
    StructField("grid_id", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("original_x", DoubleType, nullable = false),
    StructField("original_y", DoubleType, nullable = false),
    StructField("id_50km", LongType, nullable = true),
    StructField("k_region", LongType, nullable = true)))

  /** J7/S14 — enrich the bare grid with the 50 km mapping and region
    * table (left joins on grid_id, both dimension-sized → broadcast).
    */
  def enrich(grid: DataFrame, mapping50km: DataFrame, regions: DataFrame): DataFrame =
    grid
      .join(broadcast(mapping50km), Seq("grid_id"), "left")
      .join(broadcast(regions), Seq("grid_id"), "left")

  /** F17 — normalize original-CRS coords to integer meters. */
  def normalizeOriginalCoords(grid: DataFrame): DataFrame =
    grid
      .withColumn("original_x", round(col("original_x"), 0))
      .withColumn("original_y", round(col("original_y"), 0))

  /** Load + validate the prepared grid parquet. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val missing = schema.fieldNames.toSet -- df.columns.toSet
    require(missing.isEmpty, s"grid asset missing columns: ${missing.toSeq.sorted.mkString(",")}")
    normalizeOriginalCoords(df)
  }
}
