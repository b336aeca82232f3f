package graft.spatial

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K1 at 100× grid density — tile-split-with-halo spatial interpolation.
  *
  * [[DailySpatialInterpolator.interpolate]] keys the kernel on the date:
  * days parallelize, but one day is one task. That is the right plan at
  * the reference's fixed 33k-point grid (a day triangulates in tens of
  * ms); at 100× the density a single day's Delaunay is a minutes-long
  * straggler. This variant splits the plane into a gx × gy tile grid and
  * keys the kernel on (date, tile): each task triangulates only the
  * sources inside its tile expanded by a `halo` margin, interpolates the
  * tile's own missing cells, and emits only the tile-interior rows —
  * (days × tiles)-way parallelism with bounded per-task memory.
  *
  * Fidelity contract: a target's interpolation uses only sources within
  * the halo, so tiled output equals the untiled kernel exactly wherever
  * the containing Delaunay triangle (linear pass) or nearest source
  * (fallback pass) lies within `halo` of the tile — choose `halo` ≳ a few
  * source spacings and the outputs agree bit-for-bit (the same source
  * triangle yields the same barycentric arithmetic). A tile whose
  * halo-expanded extent contains NO source for a date leaves its cells
  * null rather than reaching across the plane — sizing tiles/halo so
  * every tile sees sources is part of the contract (trivially true at the
  * densities where tiling is worth it).
  */
object TiledInterpolator {

  /** Interpolate `valueCols` per (date, tile) group. `gx` × `gy` tiles
    * cover the global x/y extent; `halo` is an absolute margin in
    * coordinate units. Output preserves the input columns (value columns
    * as filled doubles), one row per input row.
    */
  def interpolate(df: DataFrame, dateCol: String, xCol: String, yCol: String,
                  valueCols: Seq[String], gx: Int, gy: Int,
                  halo: Double): DataFrame = {
    require(gx >= 1 && gy >= 1, s"tile grid must be positive (got $gx x $gy)")
    require(halo > 0, s"halo must be positive (got $halo)")
    val spark = df.sparkSession

    val normalized = df.select(df.columns.map { c =>
      if (valueCols.contains(c)) col(c).cast("double").as(c) else col(c)
    }.toIndexedSeq: _*)

    // global extent: one tiny agg — the grid is a fixed dimension, its
    // bbox is 4 doubles
    val ext = normalized.agg(
      min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol))).head()
    require(!ext.anyNull, "cannot tile an empty frame or null coordinates")
    val (xMin, xMax) = (ext.getDouble(0), ext.getDouble(1))
    val (yMin, yMax) = (ext.getDouble(2), ext.getDouble(3))
    // degenerate extents (single column/row of points) still tile: width
    // epsilon keeps floor() in range
    val tw = math.max((xMax - xMin) / gx, 1e-9)
    val th = math.max((yMax - yMin) / gy, 1e-9)

    def tileOf(c: String, origin: Double, step: Double, nTiles: Int) =
      least(lit(nTiles - 1), greatest(lit(0),
        floor((col(c) - lit(origin)) / lit(step)).cast("int")))

    // every row lands in its core tile; rows that carry at least one
    // source value additionally replicate into neighbouring tiles whose
    // halo-expanded extent contains them (≤4 tiles for halo < tile size)
    val isSource = valueCols
      .map(c => col(c).isNotNull && !isnan(col(c)))
      .reduce(_ || _)
    val tiled = normalized
      .withColumn("__ctx", tileOf(xCol, xMin, tw, gx))
      .withColumn("__cty", tileOf(yCol, yMin, th, gy))
      .withColumn("__tx", explode(sequence(
        least(lit(gx - 1), greatest(lit(0),
          floor((col(xCol) - lit(halo) - lit(xMin)) / lit(tw)).cast("int"))),
        least(lit(gx - 1), greatest(lit(0),
          floor((col(xCol) + lit(halo) - lit(xMin)) / lit(tw)).cast("int"))))))
      .withColumn("__ty", explode(sequence(
        least(lit(gy - 1), greatest(lit(0),
          floor((col(yCol) - lit(halo) - lit(yMin)) / lit(th)).cast("int"))),
        least(lit(gy - 1), greatest(lit(0),
          floor((col(yCol) + lit(halo) - lit(yMin)) / lit(th)).cast("int"))))))
      .withColumn("__core", col("__tx") === col("__ctx") && col("__ty") === col("__cty"))
      .filter(col("__core") || isSource)
      .drop("__ctx", "__cty")

    val schema = tiled.schema
    val dateIdx = schema.fieldIndex(dateCol)
    val xIdx = schema.fieldIndex(xCol)
    val yIdx = schema.fieldIndex(yCol)
    val vIdxs = valueCols.map(schema.fieldIndex)
    val txIdx = schema.fieldIndex("__tx")
    val tyIdx = schema.fieldIndex("__ty")
    val coreIdx = schema.fieldIndex("__core")
    val outCols = df.columns.toIndexedSeq

    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)

    def key(r: Row): (Any, Int, Int) = (r.get(dateIdx), r.getInt(txIdx), r.getInt(tyIdx))

    def interpolateGroup(buf: Array[Row]): Iterator[Row] = {
      val x = buf.map(_.getDouble(xIdx))
      val y = buf.map(_.getDouble(yIdx))
      val filled = vIdxs.map { vi =>
        val v = buf.map(r => if (r.isNullAt(vi)) Double.NaN else r.getDouble(vi))
        DailySpatialInterpolator.interpolateColumn(x, y, v)
      }
      buf.iterator.zipWithIndex
        .filter { case (r, _) => r.getBoolean(coreIdx) }
        .map { case (r, ri) =>
          val vals = r.toSeq.toArray
          vIdxs.zipWithIndex.foreach { case (vi, k) =>
            val fv = filled(k)(ri)
            vals(vi) = if (fv.isNaN) null else fv
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
    }

    // explicit repartition count — exempt from AQE size-based coalescing
    // (same trap DailySpatialInterpolator documents)
    val parallelism = spark.sparkContext.defaultParallelism * 4
    tiled
      .repartition(parallelism, col(dateCol), col("__tx"), col("__ty"))
      .sortWithinPartitions(col(dateCol), col("__tx"), col("__ty"))
      .mapPartitions { rows =>
        new Iterator[Iterator[Row]] {
          private val it = rows.buffered
          def hasNext: Boolean = it.hasNext
          def next(): Iterator[Row] = {
            val k = key(it.head)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (it.hasNext && key(it.head) == k) buf += it.next()
            interpolateGroup(buf.toArray)
          }
        }.flatten
      }
      .select(outCols.map(col): _*)
  }
}
