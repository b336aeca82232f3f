package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.table
import graft.raster.Regrid
import graft.spatial.DailySpatialInterpolator

/** The out-of-relational kernels (SURVEY.md §2.9) driven through the
  * harness tables. Delaunay-barycentric interpolation is not portably
  * SQL-expressible, so these are rows-only checks; exact numeric behavior
  * is golden-tested in SpatialSpec / RasterSpec.
  */
object KernelPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1: scatter the part table onto a synthetic 2-D plane (hash-scattered
    // coordinates — regular lattices are the Delaunay worst case), punch
    // deterministic holes, fill them per "date" group with linear+nearest
    // interpolation. Four date groups exercise the per-day parallelism.
    "k1_spatial_interpolate" -> ((s, dir) => {
      val pts = table(s, dir, "part")
        .select(col("p_partkey"),
          (pmod(col("p_partkey") * 2654435761L, lit(100000L)).cast("double") / 100.0)
            .as("x"),
          (pmod(col("p_partkey") * 40503L + 7L, lit(100000L)).cast("double") / 100.0)
            .as("y"),
          when(col("p_size") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("p_retailprice")).as("v"),
          concat(lit("2024-01-0"), (col("p_partkey") % 4 + 1)).as("date"))
      DailySpatialInterpolator.interpolate(pts, "date", "x", "y", Seq("v"))
        .select(col("p_partkey"), round(col("v"), 4).as("v_filled"))
        .orderBy("p_partkey")
    }),

    // K2: regrid a coarse raster (built from the region table) onto
    // customer "coordinates" by bilinear interpolation.
    "k2_regrid_bilinear" -> ((s, dir) => {
      val rasterDf = s.range(0, 25).select(
        ((col("id") % 5) * 10).cast("double").as("lat"),
        (floor(col("id") / 5) * 10).cast("double").as("lon"),
        ((col("id") % 5) * 10 + floor(col("id") / 5) * 10 * 2).cast("double").as("value"))
      val raster = Regrid.toRaster(rasterDf)
      val targets = table(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 40).cast("double").as("lat"),
          (col("c_custkey") % 35).cast("double").as("lon"))
      Regrid.interpolateAt(targets, raster, "linear")
        .select(col("c_custkey"), round(col("value"), 4).as("value"))
        .orderBy("c_custkey")
    }))

  // K2 on a bilinear field is exact → the oracle computes the plane
  // directly (lat + 2·lon; all targets fall inside the raster extent).
  def oracles: Map[String, String] = Map(
    "k2_regrid_bilinear" ->
      """SELECT c_custkey,
         ROUND(CAST(c_custkey % 40 AS DOUBLE)
             + 2 * CAST(c_custkey % 35 AS DOUBLE), 4) AS value
         FROM customer ORDER BY c_custkey""")
}
