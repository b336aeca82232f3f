package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

/** Production-geometry check for K1: one day of the reference's workload is
  * ~33k points on a REGULAR 10 km grid — the degenerate (cocircular) case
  * for Delaunay. This spec pins correctness and bounds the runtime.
  */
class InterpolatorScaleSpec extends AnyFunSuite {

  test("33k-point regular grid day interpolates correctly and fast") {
    val n = 182 // 182×182 = 33,124 ≈ the 33,074-cell India grid
    val pts = for (yy <- 0 until n; xx <- 0 until n) yield (xx, yy)
    val x = pts.map(_._1.toDouble * 10000).toArray // 10 km spacing in meters
    val y = pts.map(_._2.toDouble * 10000).toArray
    def plane(xx: Double, yy: Double) = 1e-5 * xx + 2e-5 * yy + 3.0
    val v = pts.map { case (xx, yy) =>
      // ~3% deterministic holes
      if ((xx * 31 + yy * 17) % 37 == 0) Double.NaN
      else plane(xx * 10000, yy * 10000)
    }.toArray
    val nHoles = v.count(_.isNaN)
    assert(nHoles > 800)

    val t0 = System.nanoTime()
    val out = DailySpatialInterpolator.interpolateColumn(x, y, v)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"33k-point day: $secs%.2f s, $nHoles holes filled")

    // all holes filled; interior holes land on the plane
    assert(out.forall(!_.isNaN))
    var checked = 0
    pts.zipWithIndex.foreach { case ((xx, yy), i) =>
      if (v(i).isNaN && xx > 0 && xx < n - 1 && yy > 0 && yy < n - 1) {
        assert(math.abs(out(i) - plane(xx * 10000, yy * 10000)) < 1e-6,
          s"hole at ($xx,$yy)")
        checked += 1
      }
    }
    assert(checked > 700)
    // envelope: a day must stay well under a minute for 80 months × 30 days
    // to parallelize acceptably (reference does this in scipy per day too)
    assert(secs < 60.0, f"too slow: $secs%.1f s")
  }
}
