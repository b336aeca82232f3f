package graft.raster

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K4 — terminal pivot of the long prediction table into a (time, y, x)
  * cube (ref: src/pm25ml/collectors/grid.py:122-185, xarray round trip;
  * written by the reference as CF NetCDF, here as the documented
  * substitute: a georeferenced long/dense pair, SURVEY.md §7 step 9).
  *
  * The cube is driver-sized by construction (33k cells × days at float32 —
  * a few MB per month), so collecting the pivoted result is the correct
  * terminal move; everything before it stays distributed.
  */
object RasterPivot {

  final case class RasterCube(times: Array[String], ys: Array[Double],
                              xs: Array[Double], values: Array[Array[Array[Float]]])

  /** Hard cap on rows the terminal pivot will collect (~100M ≈ 2-3 GB of
    * Rows — a year of the production grid is ~12M). The pivot is
    * driver-side BY DESIGN (it feeds the single-file NetCDF artifact);
    * the guard turns a silent driver OOM on mis-sized input into an
    * actionable error.
    */
  val MaxCollectRows: Long = 100000000L

  /** Pivot (date, y, x, value) rows into a dense cube. Cells absent from
    * the frame are NaN — callers should have scaffolded already.
    */
  def toCube(df: DataFrame, timeCol: String, yCol: String, xCol: String,
             valueCol: String): RasterCube = {
    val n = df.count()
    require(n <= MaxCollectRows,
      s"$n rows exceed the terminal-pivot collect bound $MaxCollectRows — " +
        "the raster cube is a driver-side artifact; write the long frame " +
        "partitioned instead, or pivot per time slice")
    val rows = df.select(col(timeCol).cast("string"), col(yCol).cast("double"),
      col(xCol).cast("double"), col(valueCol).cast("float")).collect()
    val times = rows.map(_.getString(0)).distinct.sorted
    val ys = rows.map(_.getDouble(1)).distinct.sorted
    val xs = rows.map(_.getDouble(2)).distinct.sorted
    val ti = times.zipWithIndex.toMap
    val yi = ys.zipWithIndex.toMap
    val xi = xs.zipWithIndex.toMap
    val cube = Array.fill(times.length, ys.length, xs.length)(Float.NaN)
    rows.foreach { r =>
      val v = if (r.isNullAt(3)) Float.NaN else r.getFloat(3)
      cube(ti(r.getString(0)))(yi(r.getDouble(1)))(xi(r.getDouble(2))) = v
    }
    RasterCube(times, ys, xs, cube)
  }

  /** Flatten a cube back to a long frame — the inverse, used to write the
    * georeferenced parquet artifact and in round-trip tests.
    */
  def toLong(spark: org.apache.spark.sql.SparkSession, cube: RasterCube): DataFrame = {
    import spark.implicits._
    val rows = for {
      (t, ti) <- cube.times.zipWithIndex.toSeq
      (y, yi) <- cube.ys.zipWithIndex.toSeq
      (x, xi) <- cube.xs.zipWithIndex.toSeq
    } yield (t, y, x, cube.values(ti)(yi)(xi))
    rows.toDF("time", "y", "x", "value")
  }
}
