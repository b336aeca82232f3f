package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000L

  /** Independent reference: the same integer recurrence simulated over
    * Scala maps — no Spark, no SQL.
    */
  private def simulate(edges: Seq[(Long, Long)], iters: Int, scale: Long,
                       dampNum: Long = 85L, dampDen: Long = 100L,
                       seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val seedSet = seeds.map(_.intersect(nodes.toSet)).getOrElse(nodes.toSet)
    val n = nodes.size.toLong
    val sN = seedSet.size.toLong
    val tele = ((dampDen - dampNum) * n * scale) / (dampDen * sN)
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filter(v => outdeg.getOrElse(v, 0L) == 0L)
        .map(r).sum
      val inc = es.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map { v =>
        val t = if (seedSet(v)) tele else 0L
        val d = if (seedSet(v)) dang / sN else 0L
        v -> (t + (dampNum * (inc.getOrElse(v, 0L) + d)) / dampDen)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  seeds: Option[Seq[Long]] = None,
                  parts: Int = 3): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst").repartition(parts), "src", "dst",
        iterations = iters, scale = Scale,
        seeds = seeds.map(s => s.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("three-cycle: symmetric ranks equal the simulated fixed point") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, 6)
    assert(got === simulate(edges, 6, Scale))
    // symmetry: a cycle is vertex-transitive, all ranks identical
    assert(got.values.toSet.size === 1)
  }

  test("dangling sink: mass is redistributed, matches simulation") {
    // 1 -> 2, 3 -> 2: node 2 is a pure sink (dangling)
    val edges = Seq((1L, 2L), (3L, 2L))
    val got = run(edges, 8)
    assert(got === simulate(edges, 8, Scale))
    assert(got(2L) > got(1L), "sink should outrank sources")
  }

  test("star hub outranks leaves and matches simulation on a mixed graph") {
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L),
      (9L, 1L), (1L, 2L), (2L, 3L))
    val got = run(edges, 10)
    assert(got === simulate(edges, 10, Scale))
    assert(got(9L) === got.values.max, "hub has max rank")
  }

  test("partition invariance: 1, 3 and 16 partitions give identical ranks") {
    val edges = (1L to 40L).map(i => (i, i * 7 % 41 + 1))
    val a = run(edges, 5, parts = 1)
    val b = run(edges, 5, parts = 3)
    val c = run(edges, 5, parts = 16)
    assert(a === b)
    assert(b === c)
  }

  test("reliable-checkpoint mode is bit-identical across the iterative ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gckpt").toString
    try {
      val ckpt = Some(dir)
      val edges = (1L to 50L).map(i => (i, i * 11 % 53 % 50 + 1)).toDF("src", "dst")
      val prLocal = PageRank.ranks(edges, "src", "dst", iterations = 4,
          scale = Scale)
        .as[(Long, Long, Long)].collect().toSet
      val prReliable = PageRank.ranks(edges, "src", "dst", iterations = 4,
          scale = Scale, checkpointDir = ckpt)
        .as[(Long, Long, Long)].collect().toSet
      assert(prLocal === prReliable)
      val kcLocal = KCore.kCore(edges, "src", "dst", k = 2)
        .as[(Long, Long)].collect().toSet
      val kcReliable = KCore.kCore(edges, "src", "dst", k = 2,
          checkpointDir = ckpt)
        .as[(Long, Long)].collect().toSet
      assert(kcLocal === kcReliable)
      val seeds = Seq(1L).toDF("node")
      val bfsLocal = Bfs.hopDistances(edges, "src", "dst", seeds, maxHops = 6)
        .as[(Long, Int)].collect().toSet
      val bfsReliable = Bfs.hopDistances(edges, "src", "dst", seeds,
          maxHops = 6, checkpointDir = ckpt)
        .as[(Long, Int)].collect().toSet
      assert(bfsLocal === bfsReliable)
      // reliable mode really wrote distributed-FS state
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("duplicate edges collapse to set semantics") {
    val once = run(Seq((1L, 2L), (2L, 1L)), 4)
    val dup = run(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)), 4)
    assert(once === dup)
  }

  test("seeded: teleport mass flows only to seeds; matches simulation") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    // 20 iterations: past the transient (0.85^20 ≈ 4%), so the seed's
    // steady-state dominance is established, not just approached
    val got = run(edges, 20, seeds = Some(Seq(1L)))
    assert(got === simulate(edges, 20, Scale, seeds = Some(Set(1L))))
    // node 4 has no in-edges and is not a seed: rank decays to 0
    assert(got(4L) === 0L)
    assert(got(1L) === got.values.max)
  }

  test("seed set outside the graph fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq((1L, 2L)), 2, seeds = Some(Seq(99L)))
    }
    assert(ex.getMessage.contains("seed set"))
  }

  test("fixed-point headroom guard fires before a 64-bit overflow could") {
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
        "src", "dst", iterations = 2, scale = Long.MaxValue / 300)
    }
    assert(ex.getMessage.contains("headroom"))
  }

  test("convergence stop: a vertex-transitive cycle stops after one step") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    // on a cycle every iteration maps scale -> scale: the L1 delta is 0
    // after step 1, so tolPpb stops the loop; the result must equal the
    // full fixed-iteration run (the fixed point was already reached)
    val converged = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst",
        iterations = 50, scale = Scale, tolPpb = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged === simulate(edges, 50, Scale))
  }

  test("weighted ranks split contributions by weight; match a local simulation") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val got = PageRank.weightedRanks(
        edges.toDF("src", "dst", "w").repartition(3), "src", "dst", "w",
        iterations = 12, scale = Scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent local replay of the weighted recurrence
    val outw = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val tele = (15L * n * Scale) / (100L * n)
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to 12) {
      val inc = edges.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _, w) => (r(u) * w) / outw(u) }.sum
      }
      r = nodes.map(v => v -> (tele + (85L * inc.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(got === r)
    // node 2 receives 3/4 of node 1's mass, node 3 only 1/4
    assert(got(2L) > got(3L))
  }

  test("weighted ranks reject non-positive weights loudly") {
    val ex = intercept[Exception] {
      PageRank.weightedRanks(
        Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), "src", "dst", "w",
        iterations = 2, scale = Scale)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("positive integer weights")),
      ex.toString)
  }

  test("oracleSql replays the Spark ranks over an in-memory DuckDB-free check") {
    // not a DuckDB run (driver-side only) — but the generated SQL must at
    // least reference every parameter it was built from
    val sql = PageRank.oracleSql("SELECT 1 AS src, 2 AS dst", 3,
      scale = 12345L, dampNum = 9L, dampDen = 10L,
      seedsSql = Some("SELECT 1 AS node"))
    assert(sql.contains("pr3") && !sql.contains("pr4"))
    assert(sql.contains("12345"))
    assert(sql.contains("(9 *"))
    assert(sql.contains("// 10 AS rank"))
    assert(sql.contains("is_seed"))
  }
}
