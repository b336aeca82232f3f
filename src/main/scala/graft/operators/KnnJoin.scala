package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Nearest-neighbor joins (J6/K3 — ref: src/pm25ml/collectors/pm25/
  * pm25_pipeline.py:166-189, BallTree haversine k=1).
  *
  * The dimension side (the 33k-cell grid) is broadcast; candidates are
  * scored with a codegen'd haversine column expression and ranked per left
  * row. For k=1 over a ~33k dimension this is a broadcast nested loop —
  * no shuffle of the fact side at all, which is the right trade at 100 TB
  * (the alternative, a spatial-bucket join, only pays off when BOTH sides
  * are huge).
  */
object KnnJoin {
  final val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * degrees in, pure column expression.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** For each left row, the k nearest right rows by haversine distance.
    * `right` must be dimension-sized (it is broadcast whole).
    *
    * k=1 avoids the rank window entirely: a lexicographic `min(struct)`
    * aggregation with map-side partial combine — the |left|×|right|
    * candidate rows never shuffle, only one row per left key does.
    */
  def nearest(left: DataFrame, right: DataFrame, k: Int,
              leftKey: String, leftLat: String, leftLon: String,
              rightKey: String, rightLat: String, rightLon: String): DataFrame = {
    val dist = haversineKm(col(leftLat), col(leftLon), col(rightLat), col(rightLon))
    val crossed = left.crossJoin(broadcast(right)).withColumn("dist_km", dist)
    if (k == 1) {
      val rightCols = right.columns.toSeq :+ "dist_km"
      val leftCols = left.columns.filterNot(_ == leftKey).toSeq
      val best = crossed
        .groupBy(col(leftKey))
        .agg(min(struct((Seq("dist_km", rightKey) ++ leftCols ++
          rightCols.filterNot(c => c == rightKey || c == "dist_km"))
          .map(col): _*)).as("__best"))
      (Seq("dist_km", rightKey) ++ leftCols ++
        rightCols.filterNot(c => c == rightKey || c == "dist_km"))
        .foldLeft(best)((d, c) => d.withColumn(c, col("__best").getField(c)))
        .drop("__best")
    } else {
      val w = Window.partitionBy(leftKey).orderBy(col("dist_km"), col(rightKey))
      crossed
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .drop("__rk")
    }
  }
}
