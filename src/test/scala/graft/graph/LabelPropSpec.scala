package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)], rounds: Int = 4,
                     dir: Option[String] = None): Map[Long, Long] =
    LabelProp.propagate(edges.toDF("s", "d"), "s", "d", rounds,
        checkpointDir = dir)
      .as[(Long, Long)].collect().toMap

  private val twoTriangles = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), // triangle A
    (4L, 5L), (5L, 6L), (4L, 6L), // triangle B
    (3L, 4L))                     // bridge

  test("two bridged triangles settle into two communities") {
    val l = labels(twoTriangles)
    assert(l(1L) === l(2L) && l(2L) === l(3L))
    assert(l(4L) === l(5L) && l(5L) === l(6L))
    assert(l(1L) !== l(4L))
  }

  test("hand-replayed sync rounds: exact labels after 4 steps") {
    // round-by-round replay of the (max count, min label) rule gives
    // {1,2,3} -> 1 and {4,5,6} -> 3 after 4 synchronous rounds
    val l = labels(twoTriangles)
    assert(l === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("edge set semantics: duplicates, reverses and self-loops collapse") {
    val noisy = twoTriangles ++ twoTriangles.map(_.swap) ++
      Seq((1L, 1L), (5L, 5L))
    assert(labels(noisy) === labels(twoTriangles))
  }

  test("partitioning-invariant") {
    val df = twoTriangles.toDF("s", "d")
    val one = LabelProp.propagate(df.repartition(1), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    val many = LabelProp.propagate(df.repartition(16), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  test("reliable checkpoint mode is bit-identical to localCheckpoint") {
    val tmp = java.nio.file.Files.createTempDirectory("lp-ckpt").toString
    try assert(labels(twoTriangles, dir = Some(tmp)) === labels(twoTriangles))
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("a clique adopts its minimum id as the community label") {
    val clique = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val l = labels(clique)
    assert(l.values.toSet === Set(1L))
  }
}
