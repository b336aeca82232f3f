package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DegreeProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 3)
      : org.apache.spark.sql.Row =
    DegreeProfile.profile(edges.toDF("src", "dst").repartition(parts),
      "src", "dst").head()

  /** Reference Pearson over both edge orientations. */
  private def refAssort(edges: Seq[(Long, Long)]): Double = {
    val ce = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val deg = ce.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
    val xy = ce.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = xy.size.toDouble
    val sx = xy.map(_._1).sum.toDouble
    val sy = xy.map(_._2).sum.toDouble
    val sxy = xy.map(p => p._1 * p._2).sum.toDouble
    val sxx = xy.map(p => p._1 * p._1).sum.toDouble
    val syy = xy.map(p => p._2 * p._2).sum.toDouble
    (m * sxy - sx * sy) / (math.sqrt(m * sxx - sx * sx) *
      math.sqrt(m * syy - sy * sy))
  }

  test("star graph: maximally disassortative, exact counts") {
    val star = (1L to 5L).map(l => (100L, 100L + l))
    val r = run(star)
    assert(r.getAs[Long]("n_nodes") === 6L)
    assert(r.getAs[Long]("n_edges") === 5L)
    assert(r.getAs[Long]("min_deg") === 1L)
    assert(r.getAs[Long]("max_deg") === 5L)
    assert(r.getAs[Long]("sum_deg_sq") === 25L + 5L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
  }

  test("regular graph (cycle): zero degree variance reports NULL, not 0/0") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = run(cyc)
    assert(r.getAs[Long]("min_deg") === 2L)
    assert(r.getAs[Long]("max_deg") === 2L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("pseudo-random graph matches the reference Pearson; layout-invariant") {
    val edges = (1 to 300).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) % 40, (h >>> 40) % 40)
    }.filter(e => e._1 != e._2)
    val want = refAssort(edges)
    val a1 = run(edges, parts = 1).getAs[Double]("assortativity")
    val a2 = run(edges.reverse, parts = 17).getAs[Double]("assortativity")
    assert(math.abs(a1 - want) < 1e-12)
    assert(a1 === a2)
  }

  test("duplicates, reverses and self-loops collapse before counting") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ Seq((1L, 1L))
    val r = run(noisy)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_nodes") === 3L)
  }
}
