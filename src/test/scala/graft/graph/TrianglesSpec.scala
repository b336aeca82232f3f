package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 3)
      : Map[Long, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("src", "dst").repartition(parts), "src", "dst")
      .collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("tri_cnt"),
          r.getAs[Double]("lcc"))))
      .toMap

  /** Brute-force reference: all C(n,3) vertex triples over the
    * canonical edge set — no orientation, no Spark.
    */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    val ce = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = ce.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val deg = nodes.map(n => n -> ce.count(e => e._1 == n || e._2 == n).toLong).toMap
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if ce((x, y)) && ce((x, z)) && ce((y, z))
    } yield (x, y, z)
    val cnt = nodes.map(n =>
      n -> tris.count(t => t._1 == n || t._2 == n || t._3 == n).toLong).toMap
    nodes.map { n =>
      val d = deg(n)
      val lcc = if (d >= 2) (2.0 * cnt(n)) / (d * (d - 1)) else 0.0
      n -> ((d, cnt(n), lcc))
    }.toMap
  }

  test("K4 plus a pendant: known counts and coefficients") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = run(k4 :+ ((1L, 5L)))
    assert(got(2L) === ((3L, 3L, 1.0)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(got(4L) === ((3L, 3L, 1.0)))
    // node 1: degree 4, still in all 3 K4 triangles, lcc = 6/12
    assert(got(1L) === ((4L, 3L, 0.5)))
    // the pendant: degree 1, no triangle, lcc 0 by convention
    assert(got(5L) === ((1L, 0L, 0.0)))
  }

  test("a star has zero triangles everywhere; hub emits no wedges") {
    val star = (1L to 6L).map(l => (100L, l + 100L))
    val got = run(star)
    assert(got.values.forall(_._2 === 0L))
    assert(got(100L)._1 === 6L)
  }

  test("duplicate, reversed and self-loop edges collapse to set semantics") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ tri ++ Seq((1L, 1L), (2L, 2L))
    assert(run(noisy) === run(tri))
    assert(run(tri)(1L) === ((2L, 1L, 1.0)))
  }

  test("pseudo-random graph matches the brute-force triple scan") {
    // deterministic multiplicative stream, ~120 edges over 28 nodes
    val edges = (1 to 160).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) % 28, (h >>> 40) % 28)
    }.filter(e => e._1 != e._2)
    assert(run(edges) === brute(edges))
  }

  test("result is invariant to partitioning and input layout") {
    val edges = (1 to 200).map { i =>
      val h = i * 0x9E3779B97F4A7C15L
      (math.abs((h >>> 5) % 40), math.abs((h >>> 33) % 40))
    }.filter(e => e._1 != e._2)
    assert(run(edges, parts = 1) === run(edges.reverse, parts = 17))
  }
}
