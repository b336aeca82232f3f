package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oldDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")
  private val newDf = Seq(
    (1L, "a", 10.0),          // unchanged
    (2L, "b", 99.0),          // changed value
    (4L, "X", 40.0),          // changed label
    (5L, "e", 50.0))          // added; 3 removed
    .toDF("k", "s", "v")

  test("per-key verdicts cover all four statuses") {
    val out = SnapshotDiff.diff(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("summary counts match the verdicts") {
    val out = SnapshotDiff.summary(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .orderBy("status").as[(String, Long)].collect().toSeq
    assert(out === Seq(
      ("added", 1L), ("changed", 2L), ("removed", 1L), ("unchanged", 1L)))
  }

  test("null compare values are tracked null-safely, not treated as change") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val out = SnapshotDiff.diff(o, n, Seq("k"), Seq("s"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "unchanged"), (2L, "changed")))
  }

  test("null keys drop — a keyless row cannot be tracked") {
    val o = Seq((Some(1L), "a"), (None, "ghost")).toDF("k", "s")
    val n = Seq((Some(1L), "a")).toDF("k", "s")
    val out = SnapshotDiff.diff(o, n, Seq("k"), Seq("s"))
    assert(out.count() === 1L)
  }

  test("composite keys join on all parts") {
    val o = Seq((1L, "p", 5.0), (1L, "q", 6.0)).toDF("k1", "k2", "v")
    val n = Seq((1L, "p", 5.0), (1L, "q", 7.0)).toDF("k1", "k2", "v")
    val out = SnapshotDiff.diff(o, n, Seq("k1", "k2"), Seq("v"))
      .orderBy("k2").select("k2", "status").as[(String, String)]
      .collect().toSeq
    assert(out === Seq(("p", "unchanged"), ("q", "changed")))
  }
}
