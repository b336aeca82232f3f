package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int, parts: Int = 3): Map[Long, Int] =
    Bfs.hopDistances(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", seeds.toDF("node"), maxHops)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("hops"))
      .toMap

  /** Reference BFS over Scala collections. */
  private def ref(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int): Map[Long, Int] = {
    val adj = edges.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0).toMap
    var frontier = seeds.distinct
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil)).distinct
        .filterNot(dist.contains)
      next.foreach(n => dist += n -> h)
      frontier = next
    }
    dist
  }

  test("chain graph: hops count levels; maxHops truncates the walk") {
    val chain = (1L to 9L).map(i => (i, i + 1))
    assert(run(chain, Seq(1L), 10) === (1 to 10).map(i => i.toLong -> (i - 1)).toMap)
    val cut = run(chain, Seq(1L), 3)
    assert(cut === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("multi-source: nearest seed wins; direction is respected") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 3L), (3L, 10L), (4L, 1L))
    val got = run(edges, Seq(1L, 10L), 5)
    // node 4 has only an OUT-edge to 1 — unreachable
    assert(got === Map(1L -> 0, 10L -> 0, 2L -> 1, 3L -> 1))
  }

  test("seeds outside the graph still appear at hop 0") {
    val got = run(Seq((1L, 2L)), Seq(1L, 99L), 2)
    assert(got === Map(1L -> 0, 99L -> 0, 2L -> 1))
  }

  test("early stop: cycle settles before maxHops and matches reference") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cyc, Seq(1L), 50) === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("pseudo-random graph matches the reference BFS under any layout") {
    val edges = (1 to 300).map { i =>
      val h = i * 2654435761L
      ((h >>> 8) % 50, (h >>> 40) % 50)
    }.filter(e => e._1 != e._2)
    val seeds = Seq(0L, 7L, 13L)
    val want = ref(edges, seeds, 6)
    assert(run(edges, seeds, 6, parts = 1) === want)
    assert(run(edges.reverse, seeds, 6, parts = 17) === want)
  }
}
