package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TransitionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("golden: counts, row totals and probabilities") {
    val df = Seq(
      (1L, 1, "A"), (1L, 2, "B"), (1L, 3, "A"), (1L, 4, "B"),
      (2L, 1, "A"), (2L, 2, "C"))
      .toDF("user", "t", "st")
    val out = Transitions.transitionMatrix(df, Seq("user"), Seq("t"), "st")
      .orderBy("prev", "next")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("A", "B", 2L, 3L, 2.0 / 3.0),
      ("A", "C", 1L, 3L, 1.0 / 3.0),
      ("B", "A", 1L, 1L, 1.0)))
  }

  test("probabilities sum to 1 per prev state") {
    val df = (1 to 500).map(i =>
      (i % 13L, i, Seq("x", "y", "z")(i % 3))).toDF("user", "t", "st")
    val sums = Transitions.transitionMatrix(df, Seq("user"), Seq("t"), "st")
      .groupBy("prev").agg(sum("prob").as("p")).as[(String, Double)]
      .collect()
    sums.foreach { case (prev, p) =>
      assert(math.abs(p - 1.0) < 1e-12, s"prev=$prev")
    }
  }

  test("first event per sequence contributes no pair; singleton users vanish") {
    val df = Seq((1L, 1, "A"), (2L, 1, "B"), (2L, 2, "B"))
      .toDF("user", "t", "st")
    val out = Transitions.transitionMatrix(df, Seq("user"), Seq("t"), "st")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("B", "B", 1L, 1L, 1.0)))
  }

  test("deterministic under a tie-breaking order column") {
    val df = Seq((1L, 10, 1L, "A"), (1L, 10, 2L, "B"), (1L, 10, 3L, "C"))
      .toDF("user", "ts", "id", "st")
    val m = Transitions
      .transitionMatrix(df, Seq("user"), Seq("ts", "id"), "st")
      .orderBy("prev").as[(String, String, Long, Long, Double)]
      .collect().toSeq
    assert(m === Seq(("A", "B", 1L, 1L, 1.0), ("B", "C", 1L, 1L, 1.0)))
  }
}
