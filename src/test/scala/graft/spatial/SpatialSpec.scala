package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planeValue(x: Double, y: Double): Double = 2 * x + 3 * y + 1

  test("delaunay: barycentric interpolation is exact on a plane") {
    val rnd = new scala.util.Random(42)
    val px = Array.fill(200)(rnd.nextDouble() * 10)
    val py = Array.fill(200)(rnd.nextDouble() * 10)
    val tri = Delaunay.triangulate(px, py)
    assert(tri.triangles.nonEmpty)
    // interior probe points must all locate and reproduce the plane
    var located = 0
    for (_ <- 1 to 500) {
      val x = 2 + rnd.nextDouble() * 6
      val y = 2 + rnd.nextDouble() * 6
      tri.locate(x, y).foreach { case (t, (w1, w2, w3)) =>
        located += 1
        val v = w1 * planeValue(px(t.a), py(t.a)) +
          w2 * planeValue(px(t.b), py(t.b)) +
          w3 * planeValue(px(t.c), py(t.c))
        assert(math.abs(v - planeValue(x, y)) < 1e-9, s"at ($x,$y)")
      }
    }
    assert(located > 490) // interior of a dense cloud: nearly all must land
  }

  test("delaunay: degenerate inputs yield empty triangulation") {
    assert(Delaunay.triangulate(Array(0.0, 1.0), Array(0.0, 1.0)).triangles.isEmpty)
    val collinear = Delaunay.triangulate(
      Array(0.0, 1.0, 2.0, 3.0), Array(0.0, 1.0, 2.0, 3.0))
    assert(collinear.triangles.isEmpty)
  }

  test("kdtree nearest matches brute force") {
    val rnd = new scala.util.Random(7)
    val px = Array.fill(500)(rnd.nextDouble() * 100)
    val py = Array.fill(500)(rnd.nextDouble() * 100)
    val kd = KdTree(px, py)
    for (_ <- 1 to 200) {
      val x = rnd.nextDouble() * 120 - 10
      val y = rnd.nextDouble() * 120 - 10
      val got = kd.nearest(x, y)
      val want = (0 until 500).minBy(i =>
        (px(i) - x) * (px(i) - x) + (py(i) - y) * (py(i) - y))
      val dg = (px(got) - x) * (px(got) - x) + (py(got) - y) * (py(got) - y)
      val dw = (px(want) - x) * (px(want) - x) + (py(want) - y) * (py(want) - y)
      assert(dg === dw) // same distance (ties may pick either index)
    }
  }

  test("interpolateColumn: 4x4 grid — linear inside hull, nearest outside") {
    // grid x,y in {0..3} like the reference's test fixture
    // (daily_spatial_interpolator__test.py:8-55)
    val pts = for (yy <- 0 to 3; xx <- 0 to 3) yield (xx.toDouble, yy.toDouble)
    val x = pts.map(_._1).toArray
    val y = pts.map(_._2).toArray
    // plane values, with an interior and a corner hole
    val v = pts.map { case (xx, yy) => planeValue(xx, yy) }.toArray
    val iInterior = pts.indexOf((1.0, 1.0))
    val iCorner = pts.indexOf((0.0, 0.0))
    v(iInterior) = Double.NaN
    v(iCorner) = Double.NaN
    val out = DailySpatialInterpolator.interpolateColumn(x, y, v)
    // interior: inside the hull of valid points → exact plane value
    assert(math.abs(out(iInterior) - planeValue(1, 1)) < 1e-9)
    // corner (0,0): outside valid hull? hull spans (0,1),(1,0).. → on the
    // boundary diagonal; either linear-on-edge or nearest — both land on a
    // neighbor consistent value. Check it's one of the plausible fills:
    val nearestVals = Seq(planeValue(0, 1), planeValue(1, 0), planeValue(1, 1),
      (planeValue(0, 1) + planeValue(1, 0)) / 2)
    assert(nearestVals.exists(nv => math.abs(out(iCorner) - nv) < 1e-9))
    // sources unchanged
    val iSource = pts.indexOf((2.0, 2.0))
    assert(out(iSource) === planeValue(2, 2))
  }

  test("interpolate DataFrame: per-date, per-column independence") {
    val rows = for {
      d <- Seq("2023-01-01", "2023-01-02")
      yy <- 0 to 3; xx <- 0 to 3
    } yield {
      val gid = (yy * 4 + xx).toLong
      val base = planeValue(xx, yy)
      // day 2 shifted by 100; hole at (2,1) day 1 col a, (1,2) day 2 col b
      val shift = if (d == "2023-01-02") 100.0 else 0.0
      val a = if (d == "2023-01-01" && xx == 2 && yy == 1) None else Some(base + shift)
      val b = if (d == "2023-01-02" && xx == 1 && yy == 2) None else Some(-base + shift)
      (gid, d, xx.toDouble, yy.toDouble, a, b)
    }
    val df = rows.toDF("grid_id", "date", "x", "y", "va", "vb")
    val out = DailySpatialInterpolator.interpolate(df, "date", "x", "y", Seq("va", "vb"))
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    // filled holes reproduce the (shifted) planes exactly
    val (a1, _) = out(("2023-01-01", 2.0, 1.0))
    assert(math.abs(a1 - planeValue(2, 1)) < 1e-9)
    val (_, b2) = out(("2023-01-02", 1.0, 2.0))
    assert(math.abs(b2 - (-planeValue(1, 2) + 100)) < 1e-9)
    // untouched cells stay exact
    val (a2, b1) = out(("2023-01-02", 2.0, 1.0))
    assert(a2 === planeValue(2, 1) + 100)
  }
}
