package graft.spatial

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K1 — per-day scattered-data interpolation of missing cells
  * (ref: src/pm25ml/imputation/spatial/daily_spatial_interpolator.py:31-114):
  *
  * For each date and each value column, valid (non-null, non-NaN) cells are
  * interpolation sources. Missing cells inside the convex hull get the
  * Delaunay-barycentric "linear" value (scipy griddata(method="linear")
  * parity); cells still missing (outside the hull, or when triangulation is
  * degenerate) get the value of the nearest source (griddata "nearest").
  * Only originally-valid cells are ever sources. Coordinates are planar
  * (EPSG:7755 x/y in the reference).
  *
  * Execution: `groupByKey(date)` → per-group JVM kernel — the one place the
  * engine drops below declarative SQL, as the reference does with scipy.
  * Each group is one day of one grid (~33k rows): comfortably in-memory per
  * task, and days parallelize across the cluster. The shuffle key is the
  * date, so adding months scales horizontally without skew.
  */
object DailySpatialInterpolator {

  /** Interpolate one day's column in place. Returns filled values. */
  def interpolateColumn(x: Array[Double], y: Array[Double],
                        v: Array[Double]): Array[Double] = {
    val n = v.length
    val out = v.clone()
    val validIdx = (0 until n).filter(i => !v(i).isNaN).toArray
    val missingIdx = (0 until n).filter(i => v(i).isNaN).toArray
    if (missingIdx.isEmpty || validIdx.isEmpty) return out

    val sx = validIdx.map(x)
    val sy = validIdx.map(y)
    val sv = validIdx.map(v)

    // linear pass (inside hull)
    val tri = Delaunay.triangulate(sx, sy)
    val stillMissing = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (tri.triangles.nonEmpty) {
      missingIdx.foreach { i =>
        tri.locate(x(i), y(i)) match {
          case Some((t, (w1, w2, w3))) =>
            out(i) = w1 * sv(t.a) + w2 * sv(t.b) + w3 * sv(t.c)
          case None => stillMissing += i
        }
      }
    } else stillMissing ++= missingIdx

    // nearest pass (outside hull / degenerate triangulation)
    if (stillMissing.nonEmpty) {
      val kd = KdTree(sx, sy)
      stillMissing.foreach { i =>
        out(i) = sv(kd.nearest(x(i), y(i)))
      }
    }
    out
  }

  /** Interpolate every column of `valueCols` per date group. Input must
    * carry (`dateCol`, `xCol`, `yCol`, valueCols…); output preserves all
    * input columns with valueCols filled (doubles; cast downstream as
    * needed). Null and NaN both count as missing.
    *
    * Distribution: explicit `repartition(n, date)` + `sortWithinPartitions`
    * + a run-grouping `mapPartitions`, NOT `groupByKey.flatMapGroups` —
    * the kernel is CPU-bound while the shuffled bytes are tiny, and AQE's
    * size-based coalescing collapsed the lambda-keyed exchange to one
    * partition (measured ~serial execution of 62 day-interpolations).
    * An explicit numPartitions repartition is exempt from AQE coalescing.
    */
  def interpolate(df: DataFrame, dateCol: String, xCol: String, yCol: String,
                  valueCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    // value columns normalized to double so the kernel sees one type
    val normalized = valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast("double")))
    val schema = normalized.schema
    val dateIdx = schema.fieldIndex(dateCol)
    val xIdx = schema.fieldIndex(xCol)
    val yIdx = schema.fieldIndex(yCol)
    val vIdxs = valueCols.map(schema.fieldIndex)

    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)

    def interpolateGroup(buf: Array[Row]): Iterator[Row] = {
      buf.find(r => r.isNullAt(xIdx) || r.isNullAt(yIdx)).foreach { r =>
        throw new IllegalStateException(
          s"row with null coordinates in date group ${r.get(dateIdx)} — " +
            "is a grid_id missing from the grid dimension?")
      }
      val x = buf.map(_.getDouble(xIdx))
      val y = buf.map(_.getDouble(yIdx))
      val filled = vIdxs.map { vi =>
        val v = buf.map(r => if (r.isNullAt(vi)) Double.NaN else r.getDouble(vi))
        interpolateColumn(x, y, v)
      }
      buf.iterator.zipWithIndex.map { case (r, ri) =>
        val vals = r.toSeq.toArray
        vIdxs.zipWithIndex.foreach { case (vi, k) =>
          val fv = filled(k)(ri)
          vals(vi) = if (fv.isNaN) null else fv
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }

    // 4× overpartitioning: date keys hash-collide at 1× (31 dates into 32
    // bins → max loads of 3-4 serial triangulations); at 4× nearly every
    // date gets its own task
    val parallelism = spark.sparkContext.defaultParallelism * 4
    normalized
      .repartition(parallelism, col(dateCol))
      .sortWithinPartitions(col(dateCol))
      .mapPartitions { rows =>
        // consecutive runs of equal date = one interpolation group
        new Iterator[Iterator[Row]] {
          private val it = rows.buffered
          def hasNext: Boolean = it.hasNext
          def next(): Iterator[Row] = {
            val d = it.head.get(dateIdx)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (it.hasNext && it.head.get(dateIdx) == d) buf += it.next()
            interpolateGroup(buf.toArray)
          }
        }.flatten
      }
  }
}
