package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 24,
                  parts: Int = 3): Map[Long, Long] =
    KCore.kCore(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", k, maxRounds)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg"))
      .toMap

  /** Reference peel over Scala collections. */
  private def ref(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var ce = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var changed = true
    while (changed) {
      val deg = ce.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = ce.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != ce.size
      ce = next
    }
    ce.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
  }

  test("K5 with pendant chains: the core survives, the chains peel over rounds") {
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    // a 3-link chain off node 1: all three links are sub-k, gone in one
    // synchronous sweep, and node 1 drops back to exactly deg 4
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L))
    val got = run(k5 ++ chain, k = 4)
    assert(got === (1L to 5L).map(_ -> 4L).toMap)
  }

  test("k=2 on a tree is empty; k=2 on a cycle keeps the cycle") {
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L))
    assert(run(tree, 2) === Map.empty)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(cyc, 2) === (1L to 4L).map(_ -> 2L).toMap)
  }

  test("pseudo-random graph matches the reference peel at several k") {
    val edges = (1 to 400).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) % 60, (h >>> 40) % 60)
    }.filter(e => e._1 != e._2)
    Seq(2, 4, 7).foreach { k =>
      assert(run(edges, k) === ref(edges, k), s"k=$k")
    }
  }

  test("non-convergence within maxRounds aborts loudly") {
    // a 12-node path needs ~6 synchronous rounds to peel at k=2
    val path = (1L to 12L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] { run(path, 2, maxRounds = 3) }
    assert(ex.getMessage.contains("not converged"))
    // with rounds to spare it converges (to empty)
    assert(run(path, 2, maxRounds = 10) === Map.empty)
  }

  test("invariant to partitioning and layout") {
    val edges = (1 to 500).map { i =>
      val h = i * 0x9E3779B97F4A7C15L
      (math.abs((h >>> 5) % 70), math.abs((h >>> 33) % 70))
    }.filter(e => e._1 != e._2)
    assert(run(edges, 5, parts = 1) === run(edges.reverse, 5, parts = 17))
  }
}
