package graft.spatial

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TiledInterpolatorSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  /** Jittered 40×40 grid (general position — no cocircular ambiguity, no
    * equidistant nearest ties), deterministic missing pattern, 3 dates.
    */
  private def frame(curved: Boolean) = {
    import spark.implicits._
    val rows = for {
      d <- 1 to 3
      i <- 0 until 40
      j <- 0 until 40
    } yield {
      // strong-mixing jitter (30% of spacing, 1000 distinct offsets):
      // a short-period pattern leaves exactly-cocircular quads whose
      // Delaunay diagonal is insertion-order-dependent
      val x = i * 10.0 + ((i * 2654435761L + j * 40503L + 17) % 1000) * 0.003
      val y = j * 10.0 + ((i * 48611L + j * 2246822519L + 5) % 1000) * 0.003
      val v =
        if (curved) 2.0 * x + 3.0 * y + 0.001 * x * y
        else 2.0 * x + 3.0 * y + 1.0
      val missing = (i * 13 + j * 7 + d) % 10 == 0
      (s"2023-07-0$d", i * 40L + j, x, y, if (missing) None else Some(v))
    }
    rows.toDF("date", "cell_id", "x", "y", "v")
  }

  private def collectVals(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Option[Double]] =
    df.select("date", "cell_id", "v").collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap

  test("tiled equals untiled bit-for-bit on a jittered curved field") {
    val df = frame(curved = true)
    val untiled = collectVals(
      DailySpatialInterpolator.interpolate(df, "date", "x", "y", Seq("v")))
    val tiled = collectVals(
      TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
        gx = 3, gy = 3, halo = 60.0))
    assert(tiled.size === untiled.size)
    assert(tiled.size === 3 * 40 * 40)
    // the unique Delaunay triangulation of a general-position point set
    // restricted to tile+halo contains the same interior triangles as the
    // global one, so the interpolated values are the same doubles (this
    // held only after the incircle determinant fix in Delaunay — the
    // cached-circumcenter test left order-dependent non-Delaunay meshes)
    val diffs = untiled.collect {
      case (k, uv) if tiled(k) != uv => (k, uv, tiled(k))
    }
    assert(diffs.isEmpty, s"${diffs.size} diffs; first: ${diffs.take(3)}")
  }

  test("every missing cell is filled and valid cells pass through unchanged") {
    val df = frame(curved = false)
    val out = TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
      gx = 4, gy = 2, halo = 60.0)
    assert(out.where(col("v").isNull).count() === 0)
    // interior cells sit inside every local hull, so the linear pass must
    // reproduce the plane exactly; global-edge cells can fall outside the
    // source hull and take the nearest source's value instead (same as
    // the untiled kernel)
    val i = floor(col("cell_id") / 40)
    val j = col("cell_id") % 40
    val offPlane = out
      .where(i >= 1 && i <= 38 && j >= 1 && j <= 38)
      .withColumn("expected", lit(2.0) * col("x") + lit(3.0) * col("y") + 1.0)
      .where(abs(col("v") - col("expected")) > 1e-9)
      .count()
    assert(offPlane === 0)
  }

  test("schema and row multiplicity are preserved (halo copies never leak)") {
    val df = frame(curved = false)
    val out = TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
      gx = 3, gy = 3, halo = 50.0)
    assert(out.columns.toSeq === Seq("date", "cell_id", "x", "y", "v"))
    assert(out.count() === df.count())
    assert(out.select("date", "cell_id").distinct().count() === df.count())
  }

  test("a tile whose halo sees no source leaves nulls (documented contract)") {
    import spark.implicits._
    // two clusters 10,000 apart; the right cluster is all-missing and the
    // halo (100) cannot reach the left cluster's sources
    val rows =
      (0 until 20).map(i => ("2023-07-01", i.toLong, i * 10.0, i * 7.0,
        Some(i * 1.0))) ++
      (0 until 5).map(i => ("2023-07-01", 100L + i, 10000.0 + i * 10.0,
        10000.0 + i * 10.0, Option.empty[Double]))
    val df = rows.toDF("date", "cell_id", "x", "y", "v")
    val out = TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
      gx = 4, gy = 4, halo = 100.0)
    assert(out.where(col("cell_id") >= 100 && col("v").isNull).count() === 5)
    // the untiled kernel would have filled them from across the plane —
    // the tiled contract trades that reach for bounded per-task work
    val untiled = DailySpatialInterpolator.interpolate(
      df, "date", "x", "y", Seq("v"))
    assert(untiled.where(col("v").isNull).count() === 0)
  }

  test("plan: one shuffle to (date, tile) — AQE cannot serialize the kernel") {
    val df = frame(curved = false)
    val out = TiledInterpolator.interpolate(df, "date", "x", "y", Seq("v"),
      gx = 3, gy = 3, halo = 60.0)
    out.count()
    val partitions = out.rdd.getNumPartitions
    assert(partitions === spark.sparkContext.defaultParallelism * 4)
  }
}
